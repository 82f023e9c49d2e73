"""Benchmark: EM-trajectory training throughput on the flagship config.

Measures EM steps x batch / sec / chip for the paper-scale DIS configuration
(funnel d=10 target, batch 2048, 200 EM steps per trajectory, log-variance
loss — reference conf/solver/oc_base.yaml:12-19 hyperparameters) on real TPU
hardware, end to end including the backward pass and optimizer update.

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


def main():
    import jax

    from sde_sampler_tpu.utils.config import compose, locate

    batch = 2048
    em_steps = 200
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
        ],
    )
    solver = locate(cfg["solver"]["_target_"])(cfg)

    # Warmup / compile
    for _ in range(3):
        metrics = solver.step()
    jax.block_until_ready(metrics["train/loss"])

    n_iters = 50
    start = time.time()
    for _ in range(n_iters):
        metrics = solver.step()
    jax.block_until_ready(metrics["train/loss"])
    elapsed = time.time() - start

    n_chips = 1  # throughput is reported per chip
    value = em_steps * batch * n_iters / elapsed / n_chips
    result = {
        "metric": "em_traj_throughput",
        "value": value,
        "unit": "EM steps x batch / sec / chip (DIS funnel d=10, batch 2048, 200 steps, lv loss)",
        "vs_baseline": value / BASELINE_A100_TORCH,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
