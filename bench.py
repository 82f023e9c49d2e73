"""Benchmark: EM-trajectory training throughput on the flagship config.

Measures EM steps x batch / sec / chip for the paper-scale DIS configuration
(funnel d=10 target, batch 2048, 200 EM steps per trajectory, log-variance
loss — reference conf/solver/oc_base.yaml:12-19 hyperparameters) on real TPU
hardware, end to end including the backward pass and optimizer update.

Also reports:
- `flops_per_step` / `mfu`: analytic control-net matmul FLOPs per optimizer
  step (forward + 2x backward per dense kernel) against the chip's bf16 MXU
  peak. The 64-wide control nets underfill the 128x128 MXU, so MFU is a
  diagnostic, not the headline (the workload is dispatch/VPU-bound).
- `bf16_value`: the same measurement under the bf16 matmul policy
  (`matmul_precision=bfloat16`, see conf/base.yaml).
- `--n-devices N`: data-parallel bench over an N-device mesh (global batch
  kept at 2048, sharded over the 'dp' axis). Falls back to a re-exec'd
  CPU-virtual mesh when fewer real devices exist (numbers then only show
  scaling, not absolute throughput).

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
A100/PyTorch estimate used for `vs_baseline` is 2.7e6 EM steps x batch /
sec: the reference's per-iteration cost is a Python loop of 200 EM steps,
each dispatching ~30 small CUDA kernels (control-net forward, SDE
coefficients, RND accumulators) at 5-10us launch overhead, plus the
backward pass over the unrolled graph => ~150ms per training iteration at
batch 2048, i.e. 200*2048/0.15 ~= 2.7e6. This estimate is recorded here
until a measured A100 number is available.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

from sde_sampler_tpu.utils.device import ensure_cpu_backend  # noqa: E402

ensure_cpu_backend()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_A100_TORCH = 2.7e6  # EM steps x batch / sec (estimate, see above)


from sde_sampler_tpu.utils.device import relay_dead as _relay_dead  # noqa: E402

# bf16 MXU peak per chip (dense). v5e (v5litepod): 197 TFLOP/s bf16.
PEAK_FLOPS_BF16 = {
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
}


def _build_solver(batch, em_steps, extra=()):
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
            "out_dir=/tmp/bench_out",
            "plot_results=False",
            "eval_init=False",
            *extra,
        ],
    )
    return locate(cfg["solver"]["_target_"])(cfg)


def _model_flops_per_step(solver, batch, em_steps):
    """Analytic matmul FLOPs per optimizer step.

    Each dense kernel of shape (fan_in, fan_out) costs 2*fan_in*fan_out
    FLOPs per sample in the forward pass; the backward pass adds ~2x
    (input-grad + weight-grad matmuls) => 6*prod(shape) per sample per
    control-net evaluation, once per EM step.
    """
    import jax
    import numpy as np

    fwd = sum(
        2 * int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(solver.train_state.params)
        if getattr(p, "ndim", 0) == 2
    )
    return 3 * fwd * batch * em_steps


def _sync(metrics):
    """Force a REAL device->host sync (see utils/device.sync: on the
    relay-attached TPU `jax.block_until_ready` returns before queued
    programs finish — it inflated round-1/2 numbers ~2-13x)."""
    from sde_sampler_tpu.utils import device as device_lib

    return device_lib.sync(metrics["train/loss"])


def _measure(solver, n_iters=50, warmup=3, steps_per_call=1):
    step = (
        solver.step
        if steps_per_call == 1
        else lambda: solver.step_chunk(steps_per_call)
    )
    for _ in range(warmup):
        metrics = step()
    _sync(metrics)
    n_calls = max(n_iters // steps_per_call, 1)
    start = time.time()
    for _ in range(n_calls):
        metrics = step()
    _sync(metrics)
    return time.time() - start, n_calls * steps_per_call


def _device_peak():
    import jax

    kind = jax.devices()[0].device_kind
    for name, peak in PEAK_FLOPS_BF16.items():
        if name.lower() in kind.lower():
            return peak
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-devices", type=int, default=1)
    parser.add_argument(
        "--skip-bf16", action="store_true",
        help="skip the bf16 matmul-policy datapoint",
    )
    # enough steps that real compute dominates the single end-of-window
    # sync (one tunnel round trip, ~0.5-1.5 s on a relay-attached TPU)
    parser.add_argument("--iters", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=2048)
    parser.add_argument("--em-steps", type=int, default=200)
    parser.add_argument(
        "--no-scaling", action="store_true",
        help="skip the virtual-8-device data-parallel scaling record",
    )
    parser.add_argument(
        "--steps-per-call", type=int, default=10,
        help="optimizer steps fused per dispatch (fori_loop step chunking; "
        "amortizes host/tunnel round trips)",
    )
    parser.add_argument(
        "--no-fast", action="store_true",
        help="measure only the reference-faithful scan path (per-step "
        "threefry, fused fwd+bwd scan) instead of the two-phase LV fast "
        "path",
    )
    args = parser.parse_args()

    # A dead relay makes any axon-backend device op hang forever. The
    # single-device bench needs the chip -> fail fast with an honest error
    # line. The n_devices>1 CPU-virtual scaling path never needs it -> skip
    # the jax.devices() query (it would hang too) and go straight to the
    # clean re-exec.
    dead = _relay_dead()
    half_open = False
    if not dead and args.n_devices == 1:
        # A half-open relay (port accepts, backend gone — MULTICHIP_r03's
        # failure mode) passes the TCP check but hangs the first device
        # op; probe it in a watchdog subprocess before committing.
        from sde_sampler_tpu.utils.device import device_probe

        half_open = not device_probe(timeout_s=150)
    if (dead or half_open) and args.n_devices == 1:
        why = (
            "TPU relay tunnel is down (nothing listening on "
            "127.0.0.1:8082)" if dead else
            "TPU relay port accepts TCP but the backend never answered a "
            "jax.devices() probe within 150s (half-open relay)"
        )
        print(json.dumps({
            "metric": "em_traj_throughput",
            "value": None,
            "unit": "EM steps x batch / sec / chip",
            "vs_baseline": None,
            "error": why + " — cannot reach the chip; last good "
                     "measurement: BENCH_r02.json / RESULTS.md round-3 "
                     "throughput table (5.94e7 via logs/r3/perf_ablate*)",
        }))
        raise SystemExit(3)

    if args.n_devices > 1:
        if dead:
            too_few = True
        else:
            import jax

            too_few = len(jax.devices()) < args.n_devices
    else:
        too_few = False

    if too_few:
        # Not enough real chips: re-exec on a CPU-virtual mesh (the axon
        # sitecustomize locks the device count at startup, so a clean
        # subprocess is required — same pattern as __graft_entry__.py).
        import subprocess

        env = os.environ.copy()
        env.pop("PYTHONPATH", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.n_devices}"
        )
        cmd = [sys.executable, str(Path(__file__).resolve()),
               "--n-devices", str(args.n_devices), "--skip-bf16",
               "--no-scaling",
               "--iters", str(args.iters), "--batch", str(args.batch),
               "--em-steps", str(args.em_steps),
               "--steps-per-call", str(args.steps_per_call)]
        if args.no_fast:
            cmd.append("--no-fast")
        raise SystemExit(subprocess.run(cmd, env=env).returncode)

    batch = args.batch
    em_steps = args.em_steps
    n_devices = args.n_devices
    extra = [f"n_devices={n_devices}"] if n_devices > 1 else []

    # Fast path (round-3): two-phase LV training — the detached-control
    # rollout records states, one batched MXU-friendly control evaluation
    # carries all gradients (losses/oc.py _two_phase_loss; gradients equal
    # the scan path, tests/test_two_phase.py) — plus pregenerated noise
    # and scan unroll. 1.9x the scan path on hardware (r3 ablations).
    FAST = [
        "+loss.two_phase=True",
        "+loss.noise_pregen=True",
        "+loss.scan_unroll=8",
    ]
    fast = not args.no_fast

    solver = _build_solver(batch, em_steps, extra + (FAST if fast else []))
    elapsed, n_iters = _measure(
        solver, n_iters=args.iters, steps_per_call=args.steps_per_call
    )
    value = em_steps * batch * n_iters / elapsed / n_devices

    flops_per_step = _model_flops_per_step(solver, batch, em_steps)
    peak = _device_peak()
    steps_per_sec = n_iters / elapsed
    mfu = (
        flops_per_step * steps_per_sec / (peak * n_devices)
        if peak
        else None
    )

    result = {
        "steps_per_call": args.steps_per_call,
        "fast_path": fast,
        "metric": "em_traj_throughput",
        "value": value,
        "unit": f"EM steps x batch / sec / chip (DIS funnel d=10, batch {batch}, {em_steps} steps, lv loss)",
        "vs_baseline": value / BASELINE_A100_TORCH,
        "n_devices": n_devices,
        "flops_per_step": flops_per_step,
        "mfu": mfu,
        "mfu_note": "analytic ctrl-net matmul FLOPs vs bf16 MXU peak; "
        "64-wide nets underfill the 128x128 MXU (dispatch/VPU-bound)",
    }

    if not args.no_scaling and n_devices == 1:
        # Functional data-parallel scaling record on a virtual 8-device CPU
        # mesh (tiny shapes — validates the full sharded train-step path;
        # absolute numbers are CPU-host-bound, not TPU throughput).
        import subprocess

        env = os.environ.copy()
        env.pop("PYTHONPATH", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        # The dp8 leg runs the PRODUCTION config — fast path included
        # (VERDICT r4 #7: correctness under a mesh is dryrun-covered; the
        # driver artifact should match what production actually runs).
        cmd = [sys.executable, str(Path(__file__).resolve()),
               "--n-devices", "8", "--skip-bf16", "--no-scaling",
               "--iters", "4", "--batch", "512", "--em-steps", "20",
               "--steps-per-call", "2"]
        try:
            proc = subprocess.run(
                cmd, env=env, capture_output=True, text=True, timeout=1200
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
            result["dp8_virtual"] = (
                json.loads(line) if proc.returncode == 0 and line else
                {"ok": False, "rc": proc.returncode}
            )
            result["dp8_virtual"]["ok"] = proc.returncode == 0
        except Exception as exc:  # never fail the headline bench
            result["dp8_virtual"] = {"ok": False, "error": str(exc)}

    if fast and n_devices == 1:
        # continuity record: the reference-faithful scan path
        ref_solver = _build_solver(batch, em_steps, extra)
        ref_elapsed, ref_iters = _measure(
            ref_solver, n_iters=min(args.iters, 500),
            steps_per_call=args.steps_per_call,
        )
        result["reference_path_value"] = (
            em_steps * batch * ref_iters / ref_elapsed / n_devices
        )
        del ref_solver

    if not args.skip_bf16:
        bf16_solver = _build_solver(
            batch, em_steps,
            extra + ["matmul_precision=bfloat16"] + (FAST if fast else []),
        )
        bf16_elapsed, bf16_iters = _measure(
            bf16_solver, n_iters=args.iters,
            steps_per_call=args.steps_per_call,
        )
        result["bf16_value"] = (
            em_steps * batch * bf16_iters / bf16_elapsed / n_devices
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
