"""Ablation timing for the flagship DIS train step (VERDICT r2 item 1).

Times variants of the paper-scale DIS funnel step (batch 2048 x 200 EM, lv
loss) to locate where the 66us/EM-step goes — the analytic matmul work is
<1us, so the loop is overhead-bound and the question is which overhead:

  base           current defaults (per-step threefry, remat, unroll=1)
  unroll{4,8}    lax.scan unroll — amortizes loop-boundary overhead
  pregen         noise_pregen=True — one (T,B,d) draw instead of per-step
                 4-way key splits + normal()
  pregen_unroll8 both
  noremat        store activations instead of recomputing in backward
  noremat_pregen both
  fwd            loss forward only (no grad, no optimizer) — isolates the
                 backward cost

Usage: python scripts/perf_ablate.py [--iters N] [--batch B] [--em-steps T]
       [--steps-per-call K] [--variants a,b,...] [--batch-sweep 2048,8192,...]

Timing closes every window with utils.device.sync() (materializes a scalar;
`block_until_ready` is NOT a barrier on the relay-attached TPU).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from sde_sampler_tpu.utils.device import ensure_cpu_backend  # noqa: E402

ensure_cpu_backend()

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

VARIANTS = {
    "base": [],
    "unroll4": ["+loss.scan_unroll=4"],
    "unroll8": ["+loss.scan_unroll=8"],
    "pregen": ["+loss.noise_pregen=True"],
    "pregen_unroll8": ["+loss.noise_pregen=True", "+loss.scan_unroll=8"],
    "noremat": ["+loss.remat=False"],
    "noremat_pregen": ["+loss.remat=False", "+loss.noise_pregen=True"],
    "two_phase": ["+loss.two_phase=True"],
    "two_phase_unroll8": ["+loss.two_phase=True", "+loss.scan_unroll=8"],
    "two_phase_unroll16": ["+loss.two_phase=True", "+loss.scan_unroll=16"],
    "two_phase_unroll40": ["+loss.two_phase=True", "+loss.scan_unroll=40"],
    "two_phase_simxla_u8": [
        "+loss.two_phase=True", "+loss.sim_backend=xla",
        "+loss.scan_unroll=8",
    ],
    "two_phase_pallas": ["+loss.two_phase=True", "+loss.sim_backend=pallas"],
    "fwd": [],  # special-cased: forward-only timing on the base build
}


def build_solver(batch, em_steps, extra=()):
    from sde_sampler_tpu.utils.config import compose, locate

    cfg = compose(
        REPO_ROOT / "conf",
        "base",
        [
            "target=funnel",
            "solver=dis",
            "loss.method=lv",
            f"train_batch_size={batch}",
            f"train_timesteps.steps={em_steps}",
            "out_dir=/tmp/perf_ablate_out",
            "plot_results=False",
            "eval_init=False",
            *extra,
        ],
    )
    return locate(cfg["solver"]["_target_"])(cfg)


def sync(metrics):
    from sde_sampler_tpu.utils import device as device_lib

    leaf = metrics["train/loss"] if isinstance(metrics, dict) else metrics
    return device_lib.sync(leaf)


def time_steps(solver, iters, steps_per_call, warmup=3):
    step = (
        solver.step
        if steps_per_call == 1
        else lambda: solver.step_chunk(steps_per_call)
    )
    for _ in range(warmup):
        metrics = step()
    sync(metrics)
    n_calls = max(iters // steps_per_call, 1)
    start = time.time()
    for _ in range(n_calls):
        metrics = step()
    sync(metrics)
    return time.time() - start, n_calls * steps_per_call


def time_forward(solver, iters, warmup=3):
    """Loss forward only (no grad): jit of compute_loss_traced."""
    import jax

    fwd = jax.jit(
        lambda params, key, clips: solver.compute_loss_traced(
            params, key, clips
        )[0]
    )
    params = solver.train_state.params
    clips = solver.current_clips()
    key = solver.train_state.key

    import jax.random as jr

    def call(i):
        return fwd(params, jr.fold_in(key, i), clips)

    for i in range(warmup):
        loss = call(i)
    sync(loss)
    start = time.time()
    for i in range(iters):
        loss = call(i)
    sync(loss)
    return time.time() - start, iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--em-steps", type=int, default=200)
    p.add_argument("--steps-per-call", type=int, default=10)
    p.add_argument("--variants", type=str, default=",".join(VARIANTS))
    p.add_argument(
        "--batch-sweep", type=str, default="",
        help="comma list of batch sizes timed with base config",
    )
    args = p.parse_args()

    import jax

    backend = jax.default_backend()
    for name in [v for v in args.variants.split(",") if v]:
        extra = VARIANTS[name]
        solver = build_solver(args.batch, args.em_steps, extra)
        if name == "fwd":
            elapsed, n = time_forward(solver, max(args.iters, 30))
        else:
            elapsed, n = time_steps(solver, args.iters, args.steps_per_call)
        per_step = elapsed / n
        print(json.dumps({
            "variant": name,
            "backend": backend,
            "batch": args.batch,
            "em_steps": args.em_steps,
            "sec_per_opt_step": per_step,
            "us_per_em_step": per_step / args.em_steps * 1e6,
            "em_batch_per_sec": args.em_steps * args.batch / per_step,
        }), flush=True)
        del solver

    for b in [int(x) for x in args.batch_sweep.split(",") if x]:
        solver = build_solver(b, args.em_steps, [])
        elapsed, n = time_steps(solver, args.iters, args.steps_per_call)
        per_step = elapsed / n
        print(json.dumps({
            "variant": f"batch{b}",
            "backend": backend,
            "batch": b,
            "em_steps": args.em_steps,
            "sec_per_opt_step": per_step,
            "us_per_em_step": per_step / args.em_steps * 1e6,
            "em_batch_per_sec": args.em_steps * b / per_step,
        }), flush=True)
        del solver


if __name__ == "__main__":
    main()
