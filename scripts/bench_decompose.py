"""Decomposition microbench for the flagship DIS train step (round-3 perf).

Times, with the relay-safe sync (utils/device.sync), on the real chip:
  1. the full train step (fwd+bwd+optim) at several `loss.scan_unroll`s,
  2. the loss forward alone (and with remat off),
  3. ad-hoc scans isolating the body's ingredients at the same shapes:
       - PRNG-only      (per-step key split + normal(B, d))
       - matmul-chain   (per-step 3x (B,64)@(64,64) + GELU = the MLP skeleton)
       - matmul-chain in bf16
     These bound what the control-net/PRNG parts of one EM step can cost,
     i.e. an achievable-ceiling roofline for the scan-based design.

Writes one JSON line per variant; run with the chip idle (touch
/tmp/chip_hold to pause the round-3 queues first).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from sde_sampler_tpu.utils.device import ensure_cpu_backend  # noqa: E402

ensure_cpu_backend()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sde_sampler_tpu.utils import device as device_lib  # noqa: E402

B, T, D, W = 2048, 200, 10, 64


def _build_solver(extra=()):
    from sde_sampler_tpu.utils.config import compose, locate

    cfg = compose(
        REPO_ROOT / "conf", "base",
        ["target=funnel", "solver=dis", "loss.method=lv",
         f"train_batch_size={B}", f"train_timesteps.steps={T}",
         "out_dir=/tmp/bench_decomp", "plot_results=False",
         "eval_init=False", *extra],
    )
    return locate(cfg["solver"]["_target_"])(cfg)


def _time(fn, n=50, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn()
    device_lib.sync(out)
    start = time.time()
    for _ in range(n):
        out = fn()
    device_lib.sync(out)
    return (time.time() - start) / n


def report(name, secs, n_steps=T, note=""):
    rec = {
        "variant": name,
        "ms": secs * 1e3,
        "us_per_em_step": secs / n_steps * 1e6,
        "em_batch_per_sec": n_steps * B / secs,
    }
    if note:
        rec["note"] = note
    print(json.dumps(rec), flush=True)
    return rec


def bench_train_steps(unrolls, iters):
    for u in unrolls:
        extra = [f"+loss.scan_unroll={u}"] if u != 1 else []
        solver = _build_solver(extra)
        step = lambda: solver.step_chunk(10)["train/loss"]
        secs = _time(step, n=max(1, iters // 10)) / 10
        report(f"train_step_unroll{u}", secs,
               note="full fwd+bwd+optim, 10-step dispatch chunks")
        del solver


def bench_loss_fwd(iters):
    for remat, name in [(True, "loss_fwd"), (False, "loss_fwd_noremat")]:
        extra = [] if remat else ["+loss.remat=False"]
        solver = _build_solver(extra)
        clips = solver.current_clips()
        params = solver.train_state.params
        fwd = jax.jit(
            lambda p, k: solver.compute_loss_traced(p, k, clips)[0]
        )
        key = jax.random.PRNGKey(0)
        secs = _time(lambda: fwd(params, key), n=iters)
        report(name, secs, note="loss forward only (no grad/optimizer)")
        del solver


def bench_ingredients(iters):
    key0 = jax.random.PRNGKey(0)

    # PRNG-only scan: the body's per-step key split + EM noise draw.
    @jax.jit
    def prng_scan(key):
        def body(carry, _):
            x, key = carry
            key, k_noise, _k_ctrl, _k_div = jax.random.split(key, 4)
            db = jax.random.normal(k_noise, (B, D))
            return (x + db, key), None

        (x, _), _ = jax.lax.scan(
            body, (jnp.zeros((B, D)), key), None, length=T
        )
        return x

    secs = _time(lambda: prng_scan(key0), n=iters)
    report("prng_only_scan", secs,
           note="per-step split(4) + normal(B,d) — the body's PRNG cost")

    # Bulk PRNG: all EM noise drawn in ONE call (the precompute alternative).
    @jax.jit
    def prng_bulk(key):
        return jax.random.normal(key, (T, B, D)).sum(axis=0)

    secs = _time(lambda: prng_bulk(key0), n=iters)
    report("prng_bulk", secs, note="one normal(T,B,d) draw (precompute)")

    # Matmul-chain scan: the MLP skeleton of one EM step (3 dense layers).
    def matmul_chain(dtype):
        ws = [
            jax.random.normal(jax.random.PRNGKey(i), (W, W), dtype) * 0.1
            for i in range(3)
        ]
        w_in = jax.random.normal(jax.random.PRNGKey(9), (D, W), dtype) * 0.1
        w_out = jax.random.normal(jax.random.PRNGKey(10), (W, D), dtype) * 0.1

        @jax.jit
        def run(x0):
            def body(x, _):
                h = x @ w_in
                for w in ws:
                    h = jax.nn.gelu(h @ w)
                return x + h @ w_out, None

            x, _ = jax.lax.scan(body, x0, None, length=T)
            return x

        x0 = jnp.zeros((B, D), dtype)
        return _time(lambda: run(x0), n=iters)

    report("matmul_chain_f32", matmul_chain(jnp.float32),
           note="per-step 5 dense (in/3xhidden/out) + GELU, f32")
    report("matmul_chain_bf16", matmul_chain(jnp.bfloat16),
           note="same, bf16")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--unrolls", type=str, default="1,2,4,8,16")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-fwd", action="store_true")
    ap.add_argument("--skip-ingredients", action="store_true")
    args = ap.parse_args()

    print(json.dumps({
        "shape": {"batch": B, "em_steps": T, "dim": D, "width": W},
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
    }), flush=True)

    if not args.skip_ingredients:
        bench_ingredients(args.iters)
    if not args.skip_fwd:
        bench_loss_fwd(args.iters)
    if not args.skip_train:
        bench_train_steps(
            [int(u) for u in args.unrolls.split(",")], args.iters
        )
