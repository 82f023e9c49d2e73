"""Staged hardware probe for the fused Pallas rollout-sim kernel.

Run ONE stage per invocation (a crashed Mosaic kernel wedges the relay
chip for 15-90 min — probe incrementally, smallest first, with an outer
`timeout`):

  python bin/rollout_probe.py 1   # linear ctrl, tiny shapes
  python bin/rollout_probe.py 2   # flagship LerpCtrl stack, tiny shapes
  python bin/rollout_probe.py 3   # flagship full shape + timing vs XLA scan

Each stage prints OK plus a max-abs-diff against the lax.scan reference.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sde_sampler_tpu.ops.rollout_pallas import fused_sim_rollout, sde_step_fn
from sde_sampler_tpu.utils import device as device_lib


def scan_reference(step_fn, params, x0, ts, dbs):
    def body(x, inp):
        s, t, db = inp
        return step_fn(params, s, t, x, db), x

    x_T, xs = jax.lax.scan(body, x0, (ts[:-1], ts[1:], dbs))
    return xs, x_T


def flagship(d=10):
    from sde_sampler_tpu.distr.funnel import Funnel
    from sde_sampler_tpu.distr.gauss import IsotropicGauss
    from sde_sampler_tpu.eq.sdes import VP
    from sde_sampler_tpu.models.mlp import FourierMLP, TimeEmbed
    from sde_sampler_tpu.models.reparam import LerpCtrl

    target = Funnel(dim=d, n_reference_samples=1000)
    prior = IsotropicGauss(dim=d, loc=0.0, scale=1.0)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0,
             scale_diff_coeff=1.0, terminal_t=1.0, generative=True)
    ctrl = LerpCtrl(
        base_model=FourierMLP(dim=d, num_layers=4, channels=64),
        score_model=TimeEmbed(dim_out=1, num_layers=4, channels=64,
                              last_bias_init={"constant": 1.0}),
        sde=sde, prior_score=prior.score, target_score=target.score,
        clip_model=10.0, clip_score=10.0, detach_score=False,
    )
    variables = ctrl.init(
        jax.random.PRNGKey(0), jnp.zeros(()), jnp.zeros((2, d))
    )
    bundle = {"params": variables["params"]}

    def apply_ctrl(p, s, x):
        return ctrl.apply({"params": p["params"]}, s, x)

    step = sde_step_fn(apply_ctrl, drift=sde.drift, diff=sde.diff)
    return step, bundle, prior


def run_case(step, params, B, d, T, key=0, time_it=False):
    x0 = jax.random.normal(jax.random.PRNGKey(key), (B, d))
    ts = jnp.linspace(0.0, 1.0, T + 1)
    dts = (ts[1:] - ts[:-1])[:, None, None]
    dbs = jax.random.normal(jax.random.PRNGKey(key + 1), (T, B, d))
    dbs = dbs * jnp.sqrt(dts)

    fused = jax.jit(lambda p, x, db: fused_sim_rollout(step, p, x, ts, db))
    ref = jax.jit(lambda p, x, db: scan_reference(step, p, x, ts, db))

    # Parity under 'highest' matmul precision: at the default TPU precision
    # both backends use bf16 MXU passes whose rounding differs, which is
    # statistically irrelevant for an SDE sim but masks real bugs here.
    with jax.default_matmul_precision("highest"):
        xs, xT = fused(params, x0, dbs)
        float(jnp.abs(xT).max())  # materialize (real barrier)
        xs_r, xT_r = ref(params, x0, dbs)
        diff = float(jnp.abs(xs - xs_r).max())
        diff_T = float(jnp.abs(xT - xT_r).max())
    print(f"OK shapes={tuple(xs.shape)} maxdiff xs={diff:.2e} xT={diff_T:.2e}")
    assert diff < 2e-4 and diff_T < 2e-4, "MISMATCH"

    if time_it:
        for fn, name in ((fused, "pallas"), (ref, "xla_scan")):
            out = fn(params, x0, dbs)
            device_lib.sync(out[1])
            start = time.time()
            n = 20
            for _ in range(n):
                out = fn(params, x0, dbs)
            device_lib.sync(out[1])
            el = (time.time() - start) / n
            print(f"{name}: {el*1e3:.2f} ms/rollout "
                  f"({el/T*1e6:.2f} us/step)")


def main():
    stage = int(sys.argv[1])
    print("backend:", jax.default_backend())
    if stage == 1:
        params = {"w": jnp.eye(4) * 0.2, "b": jnp.asarray(0.1)}

        def apply_ctrl(p, s, x):
            return jnp.dot(x, p["w"]) + p["b"] * s

        step = sde_step_fn(apply_ctrl, drift=lambda s, x: -0.5 * x,
                           diff=lambda s, x: 1.1)
        run_case(step, params, B=128, d=4, T=8)
    elif stage == 2:
        step, bundle, prior = flagship()
        run_case(step, bundle, B=256, d=10, T=12)
    elif stage == 3:
        step, bundle, prior = flagship()
        run_case(step, bundle, B=2048, d=10, T=200, time_it=True)
    print(f"STAGE {stage} PASSED")


if __name__ == "__main__":
    main()
