"""Untrained Langevin (ULA) baseline solver.

Parity with /root/reference/sde_sampler/solver/langevin.py: prior sample →
Euler-Maruyama rollout of the overdamped Langevin SDE → burn-in-discarded
time-averaged expectations. The rollout is one jitted `lax.scan`.
"""
from __future__ import annotations

import time

import jax

from sde_sampler_tpu.distr.base import EXPECTATION_FNS
from sde_sampler_tpu.eq.integrator import Integrator
from sde_sampler_tpu.eq.sdes import LangevinSDE
from sde_sampler_tpu.solver.base import Solver
from sde_sampler_tpu.utils import device as device_lib
from sde_sampler_tpu.utils.common import Results
from sde_sampler_tpu.utils.config import instantiate


class LangevinSolver(Solver):
    save_attrs: list[str] = []

    def __init__(self, cfg: dict):
        super().__init__(cfg=cfg)
        self.integrator: Integrator = instantiate(cfg["integrator"])
        self.sde: LangevinSDE = instantiate(
            cfg["sde"], target_score=self.target.score
        )
        self.prior = instantiate(cfg["prior"])
        self.eval_ts = instantiate(cfg["eval_timesteps"])()
        self.burn_steps = cfg.get("eval_expectation_burn", 0)
        if self.burn_steps >= len(self.eval_ts):
            raise ValueError("Specify more eval_steps than burn_steps.")

    def run(self) -> Results:
        from sde_sampler_tpu.parallel import mesh as mesh_lib

        start_time = time.time()
        x = self.prior.sample(
            self.next_key(), (self.cfg["eval_batch_size"],)
        )
        ts = self.eval_ts
        # ULA chains are independent: the batch shards over the dp mesh and
        # the scan runs SPMD (no collectives needed until the host reduce).
        xs = jax.jit(
            lambda key, x0: self.integrator.integrate(
                self.sde,
                ts=ts,
                x_init=mesh_lib.shard_batch(x0, self.mesh),
                key=key,
            )
        )(self.next_key(), x)
        device_lib.sync(xs)  # relay-safe barrier (utils/device.sync)

        metrics = {"eval/sample_time": time.time() - start_time}

        exp_samples = xs[self.burn_steps:].reshape(-1, self.target.dim)
        expectation_preds = {
            name: float(fn(exp_samples).mean())
            for name, fn in EXPECTATION_FNS.items()
        }
        return Results(
            samples=xs[-1],
            weights=None,
            log_norm_const_preds=None,
            ts=ts,
            xs=xs,
            metrics=metrics,
            expectation_preds=expectation_preds,
        )
