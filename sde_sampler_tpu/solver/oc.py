"""Diffusion-based solvers: Bridge (DIS), PIS, DDS, EulerDDS, SubtrajBridge.

Capability parity with /root/reference/sde_sampler/solver/oc.py. Each solver
wires a prior, an SDE, reparametrized controls, and a trajectory loss into
the Trainable train loop.

TPU-native differences from the reference:
- Evaluation computes BOTH log Z estimators (with/without Ito integral) from
  ONE rollout (the reference runs two, solver/oc.py:75-99).
- Plot trajectories come from a separate small rollout (`traj_batch_size`)
  instead of materializing the full (T+1, eval_batch, d) tensor.
- SubtrajBridge keeps fixed shapes under jit by clipping the time grid to
  [t_init, t_end] (steps outside the subtrajectory have dt = 0 and are
  no-ops), so random subtrajectory endpoints never retrace.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sde_sampler_tpu.distr.base import Distribution, sample_uniform
from sde_sampler_tpu.distr.delta import Delta
from sde_sampler_tpu.distr.gauss import Gauss
from sde_sampler_tpu.eq.integrator import EulerIntegrator
from sde_sampler_tpu.eq.sdes import OU, ControlledSDE
from sde_sampler_tpu.eval.plots import get_plots
from sde_sampler_tpu.losses.oc import BaseOCLoss
from sde_sampler_tpu.parallel import mesh as mesh_lib
from sde_sampler_tpu.solver.base import Trainable
from sde_sampler_tpu.utils import device as device_lib
from sde_sampler_tpu.utils.common import Results, clip_norm
from sde_sampler_tpu.utils.config import instantiate


class TrainableDiff(Trainable):
    """Shared plumbing for diffusion solvers."""

    def __init__(self, cfg: dict):
        super().__init__(cfg=cfg)

        # Train (timestep grids are setup-time constants -> host backend)
        self.train_batch_size: int = cfg["train_batch_size"]
        with device_lib.host_device():
            self.train_ts = instantiate(cfg["train_timesteps"])()
            self.eval_ts = instantiate(cfg["eval_timesteps"])()
        self.clip_target = cfg.get("clip_target")
        self.eval_batch_size: int = cfg["eval_batch_size"]
        self.traj_batch_size: int = min(
            cfg.get("traj_batch_size", 512), self.eval_batch_size
        )
        self.eval_integrator = EulerIntegrator()

        self._eval_fn = jax.jit(
            self._eval_impl, static_argnames=("batch_size", "return_traj")
        )

    # -- models ---------------------------------------------------------------
    def setup_models(self):
        cfg = self.cfg
        self.prior: Distribution = instantiate(cfg["prior"])
        self.sde: OU | None = instantiate(cfg.get("sde"))
        self.generative_ctrl = instantiate(
            cfg["generative_ctrl"],
            sde=self.sde,
            prior_score=self.prior.score,
            target_score=self.target.score,
        )
        self.register_scheduled_clips("generative_ctrl", self.generative_ctrl)
        self.inference_ctrl = None

    def init_params(self) -> dict:
        t0 = jnp.zeros(())
        x0 = jnp.zeros((2, self.target.dim))
        params = {
            "generative_ctrl": self.generative_ctrl.init(
                self.next_key(), t0, x0
            )["params"]
        }
        if self.inference_ctrl is not None:
            params["inference_ctrl"] = self.inference_ctrl.init(
                self.next_key(), t0, x0
            )["params"]
        return params

    def ctrl_fn(self, module, params_sub, clips_sub) -> Callable:
        return lambda t, x: module.apply(
            {"params": params_sub}, t, x, clips=clips_sub
        )

    def bound_loss(self, params, clips) -> BaseOCLoss:
        """Bind current parameters into the loss's control closures."""
        ctrls = {
            "generative_ctrl": self.ctrl_fn(
                self.generative_ctrl,
                params["generative_ctrl"],
                clips.get("generative_ctrl"),
            )
        }
        if self.inference_ctrl is not None:
            ctrls["inference_ctrl"] = self.ctrl_fn(
                self.inference_ctrl,
                params["inference_ctrl"],
                clips.get("inference_ctrl"),
            )
        # Apply-form control for the fused Pallas rollout sim (params enter
        # the kernel as explicit VMEM inputs instead of closure captures).
        gen_clips = clips.get("generative_ctrl")
        ctrls["ctrl_apply"] = lambda p, t, x: self.generative_ctrl.apply(
            {"params": p}, t, x, clips=gen_clips
        )
        ctrls["ctrl_params"] = params["generative_ctrl"]
        ctrls["mesh_active"] = self.mesh is not None
        return self.loss.with_ctrls(**ctrls)

    def clipped_target_unnorm_log_prob(self, x):
        return clip_norm(self.target.unnorm_log_prob(x), self.clip_target)

    # -- loss -----------------------------------------------------------------
    def _call_loss(self, loss: BaseOCLoss, key, ts, x):
        raise NotImplementedError

    def _call_loss_eval(self, loss: BaseOCLoss, key, ts, x, return_traj):
        raise NotImplementedError

    def compute_loss_traced(self, params, key, clips):
        k_prior, k_loss = jax.random.split(key)
        x = self.prior.sample(k_prior, (self.train_batch_size,))
        x = mesh_lib.shard_batch(x, self.mesh)
        loss = self.bound_loss(params, clips)
        return self._call_loss(loss, k_loss, self.train_ts, x)

    # -- evaluation -----------------------------------------------------------
    def _eval_impl(self, params, key, clips, batch_size, return_traj):
        k_prior, k_loss = jax.random.split(key)
        x = self.prior.sample(k_prior, (batch_size,))
        x = mesh_lib.shard_batch(x, self.mesh)
        loss = self.bound_loss(params, clips)
        result = self._call_loss_eval(
            loss, k_loss, self.eval_ts, x, return_traj
        )
        stats = BaseOCLoss.compute_results_arrays(
            result.rnd, result.rnd_no_ito, max_rnd=loss.max_rnd
        )
        return {
            "samples": result.samples,
            "xs": result.xs,
            **stats,
        }

    def compute_results(self) -> Results:
        params = self.eval_params()
        clips = self.current_clips()

        start_time = time.time()
        out = self._eval_fn(
            params, self.next_key(), clips,
            batch_size=self.eval_batch_size, return_traj=False,
        )
        # Relay-safe barrier: block_until_ready is NOT a device barrier on
        # the tunneled TPU (see utils/device.sync).
        device_lib.sync(out["samples"])
        sample_time = time.time() - start_time

        xs = ts = None
        if self.plot_results:
            traj_out = self._eval_fn(
                params, self.next_key(), clips,
                batch_size=self.traj_batch_size, return_traj=True,
            )
            xs = traj_out["xs"]
            ts = self.eval_ts

        log_norm_const_preds = {
            "log_norm_const_lb_ito": float(out["log_norm_const_lb_ito"]),
            "log_norm_const_is": float(out["log_norm_const_is"]),
            "log_norm_const_lb": float(out["log_norm_const_lb"]),
            # Finite-filtered LB variants: identical to the unfiltered
            # (reference-parity) means whenever no eval trajectory
            # diverged (n_nonfinite_rnd == 0); otherwise they are the
            # published fallback (RESULTS.md reporting convention — the
            # unfiltered mean is -inf as soon as ONE of 100k trajectories
            # blows up, which says nothing about the other 99.97%).
            "log_norm_const_lb_ito_finite": float(
                out["log_norm_const_lb_ito_finite"]
            ),
            "log_norm_const_lb_finite": float(
                out["log_norm_const_lb_finite"]
            ),
            # max_rnd-filtered variants (the training filter applied at
            # eval): the table-fallback convention — finite-only filtering
            # leaves finite ~1e33 outliers in (funnel seed 3, logs/r4).
            "log_norm_const_lb_ito_filtered": float(
                out["log_norm_const_lb_ito_filtered"]
            ),
            "log_norm_const_lb_filtered": float(
                out["log_norm_const_lb_filtered"]
            ),
        }
        metrics = {
            "eval/sample_time": sample_time,
            "eval/lv_loss": float(out["lv_loss"]),
            # count of diverged eval trajectories (rnd = +/-inf or nan)
            "eval/n_nonfinite_rnd": float(out["n_nonfinite_rnd"]),
            # count dropped by the eval-side training filter (non-finite
            # OR rnd >= max_rnd)
            "eval/n_filtered_rnd": float(out["n_filtered_rnd"]),
        }
        results = Results(
            samples=out["samples"],
            weights=out["weights"],
            log_norm_const_preds=log_norm_const_preds,
            ts=ts,
            xs=xs,
            metrics=metrics,
        )

        # Trajectories of the inference process (plots only)
        if (
            self.plot_results
            and getattr(self, "inference_sde", None) is not None
            and hasattr(self.target, "sample")
        ):
            results.plots.update(self._inference_plots(params, clips))
        return results

    def _inference_plots(self, params, clips) -> dict:
        # target sampling is host-bound setup math (device policy: eager
        # ops on the tunneled accelerator cost ~0.5-1.5 s each)
        with device_lib.host_device():
            x_target = self.target.sample(
                self.next_key(), (self.traj_batch_size,)
            )
        # Jit ONCE with params/clips as arguments: a fresh per-eval
        # jit(lambda) closing over device-resident params would recompile
        # (and pull the constants host-side) on every evaluation — the
        # ~20 s-per-compile pattern CLAUDE.md warns about.
        if not hasattr(self, "_inference_rollout_jit"):

            def rollout(ic_params, ic_clips, key, x):
                sde = self.inference_sde
                if self.inference_ctrl is not None:
                    sde = ControlledSDE(
                        sde=self.inference_base_sde,
                        ctrl=self.ctrl_fn(
                            self.inference_ctrl, ic_params, ic_clips
                        ),
                    )
                return self.eval_integrator.integrate(
                    sde=sde, ts=self.eval_ts, x_init=x, key=key,
                    timesteps=self.eval_ts,
                )

            self._inference_rollout_jit = jax.jit(rollout)

        ts = self.eval_ts
        ic_params = (
            params["inference_ctrl"] if self.inference_ctrl is not None
            else None
        )
        xs = self._inference_rollout_jit(
            ic_params, clips.get("inference_ctrl"), self.next_key(), x_target
        )
        # plotting (incl. its internal ground-truth sampling) is host-bound
        with device_lib.host_device():
            plots = get_plots(
                distr=self.prior,
                samples=xs[-1],
                ts=ts,
                xs=xs,
                marginal_dims=self.eval_marginal_dims,
                domain=self.target.domain,
                sample_key=self.next_key(),
            )
        return {f"{k}_inference": v for k, v in plots.items()}


class Bridge(TrainableDiff):
    """Time-reversal solver (DIS when inference_ctrl is None)."""

    def setup_models(self):
        super().setup_models()
        cfg = self.cfg
        self.inference_base_sde: OU = instantiate(cfg["sde"], generative=False)
        self.inference_sde = self.inference_base_sde
        if cfg.get("inference_ctrl"):
            self.inference_ctrl = instantiate(
                cfg["inference_ctrl"],
                sde=self.sde,
                prior_score=self.prior.score,
                target_score=self.target.score,
            )
            self.register_scheduled_clips(
                "inference_ctrl", self.inference_ctrl
            )
            # the controlled inference SDE is re-bound with live params at
            # evaluation time (see _inference_plots)
            self.inference_sde = ControlledSDE(
                sde=self.inference_base_sde, ctrl=None
            )
        elif not isinstance(self.prior, Gauss):
            raise ValueError("Can only be used with Gaussian prior.")

        self.loss: BaseOCLoss = instantiate(
            self.cfg["loss"],
            generative_ctrl=None,
            sde=self.sde,
            inference_ctrl=None,
            filter_samples=getattr(self.target, "filter", None),
        )

    def _call_loss(self, loss, key, ts, x):
        return loss(
            key, ts, x,
            self.clipped_target_unnorm_log_prob,
            initial_log_prob=self.prior.log_prob,
        )

    def _call_loss_eval(self, loss, key, ts, x, return_traj):
        return loss.eval(
            key, ts, x,
            self.clipped_target_unnorm_log_prob,
            initial_log_prob=self.prior.log_prob,
            return_traj=return_traj,
        )


class PIS(TrainableDiff):
    """Path integral sampler: Dirac prior + analytic reference control."""

    def setup_models(self):
        super().setup_models()
        if not isinstance(self.prior, Delta):
            raise ValueError("Can only be used with dirac delta prior.")
        self.reference_distr = self.sde.marginal_distr(
            t=self.sde.terminal_t, x_init=self.prior.loc
        )
        self.loss: BaseOCLoss = instantiate(
            self.cfg["loss"],
            generative_ctrl=None,
            sde=self.sde,
            filter_samples=getattr(self.target, "filter", None),
        )
        inference_base = instantiate(self.cfg["sde"], generative=False)
        self.inference_sde = ControlledSDE(
            sde=inference_base, ctrl=self.analytic_inference_ctrl
        )

    def analytic_inference_ctrl(self, t, x):
        loc, var = self.sde.marginal_params(t, self.prior.loc)
        score = (loc - x) / var
        return self.sde.diff(t, x) * jnp.clip(score, None, 1e5)

    def _call_loss(self, loss, key, ts, x):
        return loss(
            key, ts, x,
            self.clipped_target_unnorm_log_prob,
            self.reference_distr.log_prob,
        )

    def _call_loss_eval(self, loss, key, ts, x, return_traj):
        return loss.eval(
            key, ts, x,
            self.clipped_target_unnorm_log_prob,
            self.reference_distr.log_prob,
            return_traj=return_traj,
        )


class DDS(TrainableDiff):
    """Denoising diffusion sampler with the exponential integrator."""

    def setup_models(self):
        super().setup_models()
        if not isinstance(self.prior, Gauss):
            raise ValueError("Can only be used with Gaussian prior.")
        self.reference_distr = self.prior
        self.loss: BaseOCLoss = instantiate(
            self.cfg["loss"],
            generative_ctrl=None,
            sde=self.sde,
            filter_samples=getattr(self.target, "filter", None),
        )

    _call_loss = PIS._call_loss
    _call_loss_eval = PIS._call_loss_eval


class EulerDDS(TrainableDiff):
    """DDS objectives with a plain Euler-Maruyama integrator."""

    def setup_models(self):
        super().setup_models()
        if not isinstance(self.prior, Gauss):
            raise ValueError("Can only be used with Gaussian prior.")
        self.inference_sde = instantiate(self.cfg["sde"], generative=False)
        self.reference_distr = self.sde.marginal_distr(
            self.sde.terminal_t,
            x_init=self.prior.loc,
            var_init=self.prior.scale**2,
        )
        if not (
            np.allclose(self.reference_distr.loc, self.prior.loc)
            and np.allclose(self.reference_distr.scale, self.prior.scale)
        ):
            raise ValueError(
                "Make sure that the Gaussian is the invariant distribution "
                "of the SDE."
            )
        self.loss: BaseOCLoss = instantiate(
            self.cfg["loss"],
            generative_ctrl=None,
            sde=self.sde,
            reference_ctrl=self.reference_ctrl,
            filter_samples=getattr(self.target, "filter", None),
        )

    def reference_ctrl(self, t, x):
        return self.sde.diff(t, x) * self.prior.score(x)

    _call_loss = PIS._call_loss
    _call_loss_eval = PIS._call_loss_eval


class SubtrajBridge(Bridge):
    """Log-variance training over random sub-trajectories.

    Shapes stay static under jit: the full time grid is clipped to
    [ts[idx_init], ts[idx_end]] so out-of-window steps have dt = 0 (no-op EM
    updates, zero cost increments). Endpoint log-densities come from the
    learned potential (PotentialCtrl.unnorm_log_prob) except at t=0 / t=T,
    selected with `lax.cond` on the dynamic endpoint indices.
    """

    def __init__(self, cfg: dict):
        super().__init__(cfg=cfg)
        if not hasattr(self.generative_ctrl, "unnorm_log_prob"):
            raise ValueError("Needs an unnormalized log density.")
        if self.loss.method not in ["lv", "lv_traj"]:
            raise ValueError("Can only be used with log-variance loss.")
        if self.target.domain is None:
            raise ValueError("Need a domain for sampling.")
        self.subtraj_prob = cfg.get("subtraj_prob", 0.5)
        self.fix_terminal = cfg.get("fix_terminal", False)
        self.subtraj_steps = cfg.get("subtraj_steps")
        if self.fix_terminal and self.subtraj_steps is not None:
            raise ValueError(
                "Cannot fix subtrajectory steps with fixed terminal time."
            )
        self.lerp_domain = cfg.get("lerp_domain", True)
        self._rng = np.random.default_rng(int(cfg.get("seed", 0)) + 1)
        # Compile buckets: a subtrajectory of m grid points runs on a
        # next-power-of-two window of the grid (dynamic start, static
        # length), so a 10-step subtrajectory costs ~16 NN forwards instead
        # of the full 200 (dt=0-padded tail only up to the bucket edge).
        # At most log2(T) compiles; cached per bucket length.
        self.bucket_subtraj = bool(cfg.get("bucket_subtraj", True))
        self._subtraj_jits: dict[int, Callable] = {}

    def _potential_log_prob(self, params, clips, t, x, detach: bool):
        out = self.generative_ctrl.apply(
            {"params": params["generative_ctrl"]},
            t, x, clips=clips.get("generative_ctrl"),
            method="unnorm_log_prob",
        )
        if self.inference_ctrl is not None:
            out = out + self.inference_ctrl.apply(
                {"params": params["inference_ctrl"]},
                t, x, clips=clips.get("inference_ctrl"),
                method="unnorm_log_prob",
            )
        if detach:
            out = jax.lax.stop_gradient(out)
        return out

    def _bucket_len(self, n_points: int) -> int:
        """Smallest power-of-two window >= n_points (capped at grid size)."""
        n = int(self.train_ts.shape[0])
        if not self.bucket_subtraj:
            return n
        return min(1 << max(n_points - 1, 1).bit_length(), n)

    def _subtraj_fn(self, bucket_len: int) -> Callable:
        if bucket_len not in self._subtraj_jits:
            def loss_traced(params, key, clips, idx_init, idx_end):
                return self.compute_subtraj_loss_traced(
                    params, key, clips, idx_init, idx_end,
                    bucket_len=bucket_len,
                )

            self._subtraj_jits[bucket_len] = jax.jit(
                self._make_train_step_impl(loss_traced), donate_argnums=(0,)
            )
        return self._subtraj_jits[bucket_len]

    def compute_subtraj_loss_traced(
        self, params, key, clips, idx_init, idx_end, bucket_len: int | None = None
    ):
        ts = self.train_ts
        n = ts.shape[0]
        t_init = ts[idx_init]
        t_end = ts[idx_end]

        # Initial points: uniform on the (lerped) domain
        k_unif, k_loss = jax.random.split(key)
        domain = self.target.domain
        if self.lerp_domain:
            w = t_init / self.sde.terminal_t
            domain = self.prior.domain + (domain - self.prior.domain) * w
        x = sample_uniform(k_unif, domain, batchsize=self.train_batch_size)
        x = mesh_lib.shard_batch(x, self.mesh)

        # Clip the grid: steps outside [t_init, t_end] become dt = 0 no-ops.
        # With a bucket, only the power-of-two window starting at idx_init is
        # scanned (dynamic_slice clamps the start when idx_init+len > n; the
        # clip then also zeroes any leading out-of-window steps).
        if bucket_len is not None and bucket_len < n:
            window = jax.lax.dynamic_slice_in_dim(ts, idx_init, bucket_len)
            sub_ts = jnp.clip(window, t_init, t_end)
        else:
            sub_ts = jnp.clip(ts, t_init, t_end)

        # Endpoint log-probabilities. The terminal potential is detached,
        # the initial one carries gradients (reference solver/oc.py:348-361
        # via torch.set_grad_enabled(detach)).
        def initial_log_prob(xx):
            return jax.lax.cond(
                idx_init == 0,
                lambda: self.prior.log_prob(xx),
                lambda: self._potential_log_prob(
                    params, clips, t_init, xx, detach=False
                ),
            )

        def terminal_log_prob(xx):
            return jax.lax.cond(
                idx_end == n - 1,
                lambda: self.clipped_target_unnorm_log_prob(xx),
                lambda: self._potential_log_prob(
                    params, clips, t_end, xx, detach=True
                ),
            )

        loss_obj = self.bound_loss(params, clips)
        loss, metrics = loss_obj(
            k_loss, sub_ts, x, terminal_log_prob,
            initial_log_prob=initial_log_prob,
        )
        loss = loss * (idx_end - idx_init + 1).astype(loss.dtype) / n
        return loss, metrics

    def step_chunk(self, n: int):
        """Subtrajectory sampling needs fresh host-side randomness (coin
        flip + endpoint indices) every step; the fused multi-step dispatch
        would compile only the inherited full-trajectory loss and silently
        skip subtrajectory training. Run the n steps individually."""
        metrics = None
        for _ in range(n):
            metrics = self.step()
        return metrics

    def step(self):
        if self._rng.random() > self.subtraj_prob:
            return super().step()
        ts_len = self.train_ts.shape[0]
        idx_init = int(self._rng.integers(0, ts_len - 1))
        if self.fix_terminal:
            idx_end = ts_len - 1
        elif self.subtraj_steps is not None:
            idx_end = min(idx_init + int(self.subtraj_steps), ts_len - 1)
        else:
            idx_end = int(self._rng.integers(idx_init + 1, ts_len))

        start_t = time.time()
        clips = self.current_clips()
        bucket = self._bucket_len(idx_end - idx_init + 1)
        self.train_state, metrics = self._subtraj_fn(bucket)(
            self.train_state, clips,
            jnp.asarray(idx_init), jnp.asarray(idx_end),
        )
        self._host_step += 1
        self.scheduler.step()
        metrics["train/time_per_step"] = time.time() - start_t
        return metrics
