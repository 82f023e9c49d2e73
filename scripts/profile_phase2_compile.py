"""Root-cause data for the phase-2 compile slowdown around the Pallas
rollout custom call (VERDICT r3 weak #5 / next #5).

Round-3 finding: the fused EM-rollout kernel (ops/rollout_pallas) beats
the XLA scan standalone (2.8 vs 5.9 ms at the flagship shape), but
training's `auto` backend stays on the scan because the full two-phase
train step compiles ~3x slower when phase 1 is the opaque Pallas custom
call. This script measures, on the current backend:

  for sim_backend in (xla, pallas):
      - compile wall time of the jitted train step (cold vs warm cache
        is visible in the JSON: run once with a fresh
        JAX_COMPILATION_CACHE_DIR to get cold numbers)
      - steady-state step time (relay-safe sync barrier)
      - standalone phase-1 rollout time (no grad), same shapes

Writes ONE JSON object to stdout. Run on the chip via bin/r4_queue.sh;
runs on CPU too (numbers then only show compile-time structure, not
hardware step time).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from sde_sampler_tpu.utils.device import ensure_cpu_backend  # noqa: E402

ensure_cpu_backend()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BATCH = 2048
EM_STEPS = 200  # overridable via --batch/--em-steps for CPU smokes


def _build_solver(sim_backend: str):
    from sde_sampler_tpu.utils.config import compose, locate

    cfg = compose(
        REPO_ROOT / "conf",
        "base",
        [
            "target=funnel",
            "solver=dis",
            "loss.method=lv",
            f"train_batch_size={BATCH}",
            f"train_timesteps.steps={EM_STEPS}",
            "+loss.two_phase=True",
            "+loss.noise_pregen=True",
            "+loss.scan_unroll=8",
            f"+loss.sim_backend={sim_backend}",
            "out_dir=/tmp/phase2_profile",
            "plot_results=False",
            "eval_init=False",
        ],
    )
    return locate(cfg["solver"]["_target_"])(cfg)


def profile(sim_backend: str) -> dict:
    import jax

    from sde_sampler_tpu.utils.device import sync

    solver = _build_solver(sim_backend)
    out: dict = {"sim_backend": sim_backend}

    # compile + first-execution wall time of the full train step
    t0 = time.time()
    metrics = solver.step()
    sync(metrics["train/loss"])
    out["first_step_s"] = round(time.time() - t0, 3)

    # steady-state step time
    for _ in range(3):  # flush any secondary compiles (EMA etc.)
        metrics = solver.step()
    sync(metrics["train/loss"])
    t0 = time.time()
    n = 20
    for _ in range(n):
        metrics = solver.step()
    sync(metrics["train/loss"])
    out["step_ms"] = round((time.time() - t0) / n * 1e3, 3)

    # forward-only loss (phase-1 rollout + phase-2 batched eval, NO grad),
    # jitted fresh: separates "compiling around the custom call at all"
    # from "compiling the BACKWARD around the custom call" — the r3
    # hypothesis is that the slowdown lives in the grad transform.
    params = solver.train_state.params
    clips = solver.current_clips()

    def fwd(p, key):
        loss_val, _ = solver.compute_loss_traced(p, key, clips)
        return loss_val

    fn = jax.jit(fwd)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    sync(fn(params, key))
    out["forward_compile_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    for i in range(10):
        v = fn(params, jax.random.fold_in(key, i))
    sync(v)
    out["forward_ms"] = round((time.time() - t0) / 10 * 1e3, 3)
    return out


if __name__ == "__main__":
    import argparse

    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=BATCH)
    parser.add_argument("--em-steps", type=int, default=EM_STEPS)
    args = parser.parse_args()
    BATCH, EM_STEPS = args.batch, args.em_steps

    runs = []
    for b in ("xla", "pallas"):
        try:
            runs.append(profile(b))
        except Exception as exc:  # pallas needs a real TPU (no interpret
            # flag at the loss call sites — documented in rollout_pallas)
            runs.append(
                {"sim_backend": b,
                 "error": f"{type(exc).__name__}: {exc}"[:300]}
            )
    results = {
        "backend": jax.default_backend(),
        "batch": BATCH,
        "em_steps": EM_STEPS,
        "cache_dir": os.environ.get("JAX_COMPILATION_CACHE_DIR"),
        "runs": runs,
    }
    print(json.dumps(results))
