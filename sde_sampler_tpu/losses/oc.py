"""Trajectory losses: Girsanov RND accumulation along scan-compiled rollouts.

Capability parity with /root/reference/sde_sampler/losses/oc.py
(TimeReversalLoss for DIS/Bridge, ReferenceSDELoss for PIS/EulerDDS,
ExponentialIntegratorSDELoss for DDS; methods kl / kl_ito / lv / lv_traj,
sample filtering, max_rnd cutoff, detached sde control with optional
exploration noise/dropout for the log-variance loss).

TPU-first design: each simulate() is ONE `jax.lax.scan` whose carry is
(x, rnd, ito, key); the control-network forward is fused into the scan body
and rematerialized (`jax.checkpoint`) in the backward pass instead of storing
per-step activations. Both log Z estimators (with and without the Ito
integral) come from a single evaluation rollout by accumulating the Ito term
separately — the reference needs two full rollouts (solver/oc.py:75-99).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Divergence helpers (reference utils/autograd.py, via forward-mode jvp)
# ---------------------------------------------------------------------------


def divx_exact(fn: Callable, t, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact divergence via d forward-mode JVPs; returns (div (B,1), fn(t,x))."""
    f = lambda xx: fn(t, xx)
    value = f(x)
    d = x.shape[-1]

    if d <= 64:
        # One batched JVP sweep; the (d, B, d) buffer is tiny at these dims.
        def one(e):
            return jax.jvp(f, (x,), (jnp.tile(e[None, :], (x.shape[0], 1)),))[1]

        jvs = jax.vmap(one)(jnp.eye(d, dtype=x.dtype))  # (d, B, d)
        div = jnp.einsum("ibi->b", jvs)[:, None]
        return div, value

    # High-d: accumulate the Jacobian diagonal sequentially — O(B*d) live
    # memory instead of the O(B*d^2) vmapped stack (scan stays
    # reverse-differentiable, unlike fori_loop with traced state).
    def body(acc, i):
        e = jnp.zeros((d,), x.dtype).at[i].set(1.0)
        _, jv = jax.jvp(f, (x,), (jnp.broadcast_to(e, x.shape),))
        return acc + jnp.take(jv, i, axis=-1)[:, None], None

    div, _ = jax.lax.scan(
        body, jnp.zeros((x.shape[0], 1), x.dtype), jnp.arange(d)
    )
    return div, value


def divx_hutchinson(
    fn: Callable, t, x: jnp.ndarray, key: jax.Array,
    noise_type: str = "rademacher", n_samples: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hutchinson estimator of the divergence; returns (div (B,1), fn(t,x))."""
    f = lambda xx: fn(t, xx)
    value = f(x)
    div = jnp.zeros((x.shape[0], 1), dtype=x.dtype)
    for i in range(n_samples):
        sub = jax.random.fold_in(key, i)
        if noise_type == "rademacher":
            noise = (
                jax.random.randint(sub, x.shape, 0, 2).astype(x.dtype) * 2 - 1.0
            )
        elif noise_type == "gauss":
            noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
        else:
            raise NotImplementedError(f"Undefined noise type {noise_type}.")
        _, jv = jax.jvp(f, (x,), (noise,))
        div = div + (jv * noise).sum(axis=-1, keepdims=True)
    return div / n_samples, value


# ---------------------------------------------------------------------------
# Masked reductions (filtering without dynamic shapes)
# ---------------------------------------------------------------------------


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = mask.sum()
    return jnp.where(mask, x, 0.0).sum() / jnp.maximum(n, 1)


def masked_var(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Unbiased variance over masked entries (matches torch.Tensor.var)."""
    n = mask.sum()
    mu = masked_mean(x, mask)
    ss = jnp.where(mask, (x - mu) ** 2, 0.0).sum()
    return ss / jnp.maximum(n - 1, 1)


class RolloutResult(NamedTuple):
    samples: jnp.ndarray          # (B, d) terminal states
    rnd: jnp.ndarray              # (B, 1) RND including the Ito integral
    rnd_no_ito: jnp.ndarray       # (B, 1) RND without the Ito integral
    xs: jnp.ndarray | None        # (T+1, B', d) trajectory (optional)


# Production default for the two-phase fast path (two_phase +
# noise_pregen + scan_unroll=8) on detached-control methods (lv/lv_traj).
# A/B-validated at 60k paper-scale steps twice: round 3 (RESULTS.md: IS
# err 0.0268 two-phase vs 0.0257 standard, ESS 0.2275 vs 0.2328) and
# round 4, where the SAME two-phase-trained checkpoint was re-evaluated
# through the standard path (logs/r4/funnel_dis_lv_twophase REEVAL: IS
# err 0.0243 fast-eval vs 0.0246 standard-eval, LB-Ito 0.4335 vs 0.4344,
# 0 nonfinite trajectories) — the VERDICT r3 next-#4 gate. Flipped True
# 2026-08-18: lv/lv_traj production runs now train on the two-phase fast
# path (~7 ms/step on funnel paper scale vs 13.5 ms standard). Explicit
# config values always override; kl/kl_ito are never affected (the
# trajectory is differentiated through the drift there).
FAST_PATH_DEFAULT = True

# HBM ceiling for the pregen-noise path in `simulate`: pregen materializes
# the full (T-1, B, d) Brownian buffer on device, which is a pure perf
# trade (hoisted PRNG) with no structural need outside the two-phase
# training loss. At eval scale it can dwarf HBM — cox d=1600 on the
# 800-step fine grid at eval_batch 100k is a 512 GB buffer, which OOM'd
# the r5 cox_whitened_60k cell on a 16 GB v5e. Above this ceiling
# `simulate` falls back to drawing noise inside the scan body (identical
# estimator, different PRNG stream). 4 GiB keeps every previously
# validated pregen eval (mw_50d: 3.7 GiB) on its proven path.
PREGEN_MAX_BYTES = 4 * 1024**3


class BaseOCLoss:
    """Shared loss plumbing: filtering, reductions, eval statistics."""

    def __init__(
        self,
        generative_ctrl: Callable,
        sde=None,
        method: str = "kl",
        traj_per_sample: int = 1,
        filter_samples: Callable | None = None,
        max_rnd: float | None = None,
        sde_ctrl_dropout: float | None = None,
        sde_ctrl_noise: float | None = None,
        remat: bool = True,
        scan_unroll: int | None = None,
        noise_pregen: bool | None = None,
        two_phase: bool | None = None,
        sim_backend: str = "auto",
        **kwargs,
    ):
        self.generative_ctrl = generative_ctrl
        self.sde = sde
        if method not in ["kl", "kl_ito", "lv", "lv_traj"]:
            raise ValueError("Unknown loss method.")
        self.method = method
        if traj_per_sample == 1 and self.method == "lv_traj":
            raise ValueError("Cannot compute variance over a single trajectory.")
        self.traj_per_sample = traj_per_sample
        self.filter_samples = filter_samples
        self.max_rnd = max_rnd
        self.sde_ctrl_noise = sde_ctrl_noise
        self.sde_ctrl_dropout = sde_ctrl_dropout
        self.remat = remat
        # scan_unroll: lax.scan unroll factor for the rollout loop —
        # unrolling lets XLA fuse across EM steps (fewer kernel launches /
        # loop boundaries) at the cost of compile time; 1 = reference-
        # faithful loop. noise_pregen: hoist ALL per-step PRNG work
        # (threefry key splits + normal draws) out of the scan into one
        # batched draw passed in through the scan xs — the rollout body is
        # dominated by per-op overhead on tiny buffers. Changes the RNG
        # *stream* (not the distribution), so recorded runs must pin it
        # explicitly. Both resolve from the fast-path default below when
        # left as None (assigned after two_phase resolves).
        # Two-phase log-variance training (TPU-first redesign of the
        # reference's per-step backward, losses/oc.py:156-230 there): for
        # lv/lv_traj the SDE is driven by stop_gradient(u), so the
        # trajectory itself carries NO parameter gradient. Phase 1 rolls
        # out a lean, non-differentiable scan (carry = x only) that records
        # the trajectory; phase 2 re-evaluates the control net on all
        # (T, B) states in ONE batched call — a large MXU-friendly matmul —
        # and computes the cost/Ito/terminal terms differentiably. The
        # gradient equals the scan-path gradient exactly (same states, same
        # noise, same formulas); only summation order differs (fp-level).
        # Invalid for kl/kl_ito, where x is differentiated through the
        # drift.
        if two_phase and method in ("kl", "kl_ito"):
            raise ValueError(
                "two_phase requires a detached-control method (lv/lv_traj); "
                f"got {method}."
            )
        # None = production default (FAST_PATH_DEFAULT above): the three
        # fast-path knobs resolve together so the validated configuration
        # is what ships, while any explicit value wins.
        if two_phase is None:
            two_phase = FAST_PATH_DEFAULT and method in ("lv", "lv_traj")
        self.two_phase = two_phase
        if noise_pregen is None:
            noise_pregen = two_phase
        if scan_unroll is None:
            scan_unroll = 8 if two_phase else 1
        self.noise_pregen = noise_pregen
        self.scan_unroll = scan_unroll
        # Phase-1 simulation backend: "xla" = lax.scan; "pallas" = the
        # fused rollout kernel (ops/rollout_pallas) — the whole rollout in
        # one Mosaic launch. The kernel beats the scan standalone (2.8 vs
        # 5.9 ms at the flagship shape, hardware-measured r3), but the
        # FULL train step is ~2x slower around it: 15.9 vs 8.15 ms/step
        # on-chip (results/r4/phase2_compile.json; scripts/
        # profile_phase2_compile.py). Root cause is steady-state, not
        # compile time (pallas first-step compiled FASTER there, 15.1 vs
        # 22.5 s): the opaque custom call is a fusion barrier, so the
        # recorded trajectory must be fully materialized in the kernel's
        # layout and re-read by phase 2 / the metrics path, where the
        # scan's rollout fuses into its consumers. Hence "auto" resolves
        # to the scan for TRAINING; the kernel's clean win is the eval /
        # bench rollout (pure sim, trajectory consumed once).
        # Mesh runs always keep the scan (pallas under pjit not wired).
        if sim_backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"Unknown sim_backend {sim_backend}.")
        self.sim_backend = sim_backend
        # attached by the solver (solver/oc.py bound_loss): apply-form
        # control + its params, and whether a device mesh is active
        self.ctrl_apply = None
        self.ctrl_params = None
        self.mesh_active = False

    def _resolve_sim_backend(self, needs_step_keys: bool, dim: int) -> str:
        if (
            self.ctrl_apply is None
            or needs_step_keys
            or self.mesh_active
        ):
            return "xla"
        if dim < 2:
            # Mirror sinkhorn_pallas.pallas_applicable: a d=1 target makes
            # the control net's first layer a (B,1)x(1,width) MXU dot — the
            # degenerate contracted-dim pattern that wedged the chip AND
            # killed the relay on 2026-08-17. Never launch it, even when
            # sim_backend="pallas" was requested explicitly; any future d=1
            # kernel must go through the staged bin/pallas_probe.sh protocol
            # first.
            return "xla"
        if self.sim_backend == "auto":
            return "xla"
        return self.sim_backend

    def _pregen_fits(self, ts, x) -> bool:
        """Trace-time check that the (T-1, B, d) pregen noise buffer fits.

        Shapes are static under jit, so this is plain Python arithmetic at
        trace time; see PREGEN_MAX_BYTES for the rationale.
        """
        nbytes = (
            (ts.shape[0] - 1)
            * x.shape[0]
            * x.shape[-1]
            * jnp.dtype(x.dtype).itemsize
        )
        return nbytes <= PREGEN_MAX_BYTES

    def _pregen_scan_inputs(self, key, ts, x, scale_sqrt_dt: bool = True):
        """(noise increments, per-step keys) drawn up-front for the scan.

        `scale_sqrt_dt=True` gives Brownian increments dW ~ N(0, dt);
        False gives standard normals (DDS exponential integrator scales
        them itself). The per-step keys are only materialized when the body
        actually consumes randomness beyond the EM noise (exploration
        noise/dropout of the detached control, Hutchinson probes);
        otherwise the scan carries no key at all.
        """
        k_noise, k_steps = jax.random.split(key)
        n = ts.shape[0] - 1
        assert self._pregen_fits(ts, x), (
            "pregen noise buffer exceeds PREGEN_MAX_BYTES; simulate() gates "
            "this — only the two-phase training loss reaches here "
            f"unconditionally (shape {(n,) + x.shape})"
        )
        dbs = jax.random.normal(k_noise, (n,) + x.shape, dtype=x.dtype)
        if scale_sqrt_dt:
            dts = (ts[1:] - ts[:-1])[:, None, None]
            dbs = dbs * jnp.sqrt(dts)
        step_keys = jax.random.split(k_steps, n)
        return dbs, step_keys

    # -- sde control for the log-variance loss ------------------------------
    def generative_and_sde_ctrl(self, t, x, key):
        """Detached control driving the SDE; live control in the cost."""
        generative_ctrl = self.generative_ctrl(t, x)
        sde_ctrl = jax.lax.stop_gradient(generative_ctrl)
        if self.sde_ctrl_noise is not None:
            key, sub = jax.random.split(key)
            sde_ctrl = sde_ctrl + self.sde_ctrl_noise * jax.random.normal(
                sub, sde_ctrl.shape
            )
        if self.sde_ctrl_dropout is not None:
            key, sub = jax.random.split(key)
            mask = jax.random.uniform(sub, sde_ctrl.shape) > self.sde_ctrl_dropout
            neutral = -(self.sde.drift(t, x) / self.sde.diff(t, x))
            neutral = jnp.broadcast_to(neutral, sde_ctrl.shape)
            sde_ctrl = jnp.where(mask, neutral, sde_ctrl)
        return generative_ctrl, sde_ctrl

    # -- filtering & loss reduction -----------------------------------------
    def filter(self, rnd, samples=None):
        mask = jnp.ones_like(rnd, dtype=bool)
        if samples is not None and self.filter_samples is not None:
            filt = self.filter_samples(samples)
            # a (B,)-shaped filter would broadcast to a (B, B) mask that
            # silently neutralizes filtering (reference asserts the same,
            # its losses/oc.py:77); shapes are static, so this check runs
            # at trace time
            if filt.shape != rnd.shape:
                raise ValueError(
                    f"filter_samples must return shape {rnd.shape}, got "
                    f"{filt.shape}"
                )
            mask = mask & filt
        if self.max_rnd is None:
            return mask & jnp.isfinite(rnd)
        return mask & (rnd < self.max_rnd)

    def compute_loss(self, rnd, samples=None):
        mask = self.filter(rnd, samples=samples)
        if self.method == "lv_traj":
            r = self.traj_per_sample
            rnd = rnd.reshape(r, -1, 1)
            mask = mask.reshape(r, -1, 1).all(axis=0)
            n_filtered = r * (mask.size - mask.sum())
            mu = rnd.mean(axis=0, keepdims=True)
            var = ((rnd - mu) ** 2).sum(axis=0) / (r - 1)  # (B', 1)
            loss = masked_mean(var, mask)
        else:
            n_filtered = mask.size - mask.sum()
            if self.method == "lv":
                loss = masked_var(rnd, mask)
            else:
                loss = masked_mean(rnd, mask)
        return loss, {"train/n_filtered": n_filtered}

    @staticmethod
    def compute_results_arrays(
        rnd: jnp.ndarray,
        rnd_no_ito: jnp.ndarray,
        max_rnd: float | None = None,
    ) -> dict:
        """Device-side eval statistics (both log Z estimators in one pass).

        A diverged trajectory (rnd = +inf, or finite-but-astronomical;
        funnel-tail EM blowup, seen in ~0.03% of 100k-sample evals for
        some seeds' trained controls) makes the unfiltered lower-bound
        means -inf or garbage. Those stay as the primary
        (reference-parity) estimators; two diagnostic families make such
        evals informative:
          *_finite    — non-finite rnd dropped;
          *_filtered  — the TRAINING filter applied at eval: non-finite
                        dropped AND rnd < max_rnd (the same cutoff the
                        reference's filter_rnd applies during training,
                        /root/reference/sde_sampler/losses/oc.py:50-58) —
                        this is the table-fallback convention, since a
                        finite 1e33 outlier still wrecks the finite mean
                        (observed: funnel seed 3, logs/r4).
        With max_rnd=None the filtered variants equal the finite ones.
        """
        neg_rnd = -rnd
        log_weights_max = neg_rnd.max()
        weights = jnp.exp(neg_rnd - log_weights_max)

        def masked(v, mask):
            return jnp.where(mask, v, 0.0).sum() / jnp.maximum(mask.sum(), 1)

        fin = jnp.isfinite(rnd)
        filt = fin if max_rnd is None else fin & (rnd < max_rnd)
        fin_no_ito = jnp.isfinite(rnd_no_ito)
        filt_no_ito = (
            fin_no_ito if max_rnd is None else fin_no_ito & (rnd_no_ito < max_rnd)
        )

        return {
            "weights": weights,
            "log_norm_const_lb_ito": neg_rnd.mean(),
            "log_norm_const_is": jnp.log(weights.mean()) + log_weights_max,
            "log_norm_const_lb": (-rnd_no_ito).mean(),
            "log_norm_const_lb_ito_finite": masked(neg_rnd, fin),
            "log_norm_const_lb_finite": masked(-rnd_no_ito, fin_no_ito),
            "log_norm_const_lb_ito_filtered": masked(neg_rnd, filt),
            "log_norm_const_lb_filtered": masked(-rnd_no_ito, filt_no_ito),
            "n_nonfinite_rnd": (~fin).sum(),
            "n_filtered_rnd": (~filt).sum(),
            "lv_loss": rnd.var(ddof=1),
        }

    def _repeat_traj(self, x):
        if self.traj_per_sample != 1:
            x = jnp.tile(x[None], (self.traj_per_sample, 1, 1))
            x = x.reshape(-1, x.shape[-1])
        return x

    def with_ctrls(self, **kwargs) -> "BaseOCLoss":
        """Shallow copy with control closures bound (used inside jit traces,
        where the controls capture the current parameter pytree)."""
        import copy

        new = copy.copy(self)
        for name, value in kwargs.items():
            setattr(new, name, value)
        return new

    def __call__(self, key, ts, x, *args, **kwargs):
        raise NotImplementedError

    def eval(self, key, ts, x, *args, **kwargs):
        raise NotImplementedError


class TimeReversalLoss(BaseOCLoss):
    """Time-reversal RND loss (DIS; Bridge when inference_ctrl is given).

    Formulas follow reference losses/oc.py:156-230: running cost
    ½|u+v|²dt (KL) or (u+v)·(ū−½(u−v))dt (LV), inference-divergence term
    σ·div(v)dt, Ito integral (u+v)·dW, eval-only −∫div(drift) and initial
    log-prob, terminal −log ρ(X_T).
    """

    def __init__(
        self,
        *args,
        inference_ctrl: Callable | None = None,
        div_estimator: str | None = None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.inference_ctrl = inference_ctrl
        self.div_estimator = div_estimator

    def simulate(
        self,
        key: jax.Array,
        ts: jnp.ndarray,
        x: jnp.ndarray,
        terminal_unnorm_log_prob: Callable,
        initial_log_prob: Callable | None = None,
        train: bool = True,
        change_sde_ctrl: bool = False,
        return_traj: bool = False,
    ) -> RolloutResult:
        if train and self.method in ["kl", "kl_ito"]:
            rnd0 = jnp.zeros((x.shape[0], 1), dtype=x.dtype)
        else:
            rnd0 = initial_log_prob(x)

        use_div_estimator = self.div_estimator if train else None

        def step_core(x, rnd, ito, s, t, db, k_ctrl, k_div):
            if change_sde_ctrl:
                generative_ctrl, sde_ctrl = self.generative_and_sde_ctrl(
                    s, x, k_ctrl
                )
            else:
                sde_ctrl = generative_ctrl = self.generative_ctrl(s, x)
            sde_diff = self.sde.diff(s, x)
            dt = t - s

            if self.inference_ctrl is None:
                gen_plus = gen_minus = generative_ctrl
            else:
                if use_div_estimator is None:
                    div_ctrl, inference_ctrl = divx_exact(
                        self.inference_ctrl, s, x
                    )
                else:
                    div_ctrl, inference_ctrl = divx_hutchinson(
                        self.inference_ctrl, s, x, k_div,
                        noise_type=use_div_estimator,
                    )
                # assumes the diffusion coefficient is independent of x
                rnd = rnd + sde_diff * div_ctrl * dt
                gen_plus = generative_ctrl + inference_ctrl
                gen_minus = generative_ctrl - inference_ctrl

            if change_sde_ctrl:
                cost = gen_plus * (sde_ctrl - 0.5 * gen_minus)
                rnd = rnd + cost.sum(axis=-1, keepdims=True) * dt
            else:
                rnd = rnd + 0.5 * (gen_plus**2).sum(axis=-1, keepdims=True) * dt

            if not train:
                rnd = rnd - self.sde.drift_div_int(s, t, x)

            x_next = (
                x + (self.sde.drift(s, x) + sde_diff * sde_ctrl) * dt
                + sde_diff * db
            )
            ito = ito + (gen_plus * db).sum(axis=-1, keepdims=True)
            return x_next, rnd, ito

        # Whether the body consumes randomness beyond the EM noise
        # (exploration noise/dropout of the detached control, Hutchinson
        # probes). Distinct keys for each use — sharing one key across a
        # split AND a fold_in breaks the single-use contract and can
        # correlate the divergence probes with the exploration noise.
        needs_step_keys = (
            change_sde_ctrl
            and (
                self.sde_ctrl_noise is not None
                or self.sde_ctrl_dropout is not None
            )
        ) or (
            self.inference_ctrl is not None and use_div_estimator is not None
        )

        if self.noise_pregen and self._pregen_fits(ts, x):
            dbs, step_keys = self._pregen_scan_inputs(key, ts, x)

            def body(carry, inp):
                x, rnd, ito = carry
                s, t, db = inp[:3]
                if needs_step_keys:
                    k_ctrl, k_div = jax.random.split(inp[3])
                else:
                    k_ctrl = k_div = None
                x_next, rnd, ito = step_core(
                    x, rnd, ito, s, t, db, k_ctrl, k_div
                )
                out = x_next if return_traj else None
                return (x_next, rnd, ito), out

            xs = (ts[:-1], ts[1:], dbs)
            if needs_step_keys:
                xs = xs + (step_keys,)
            if self.remat and train:
                body = jax.checkpoint(body)
            (x_T, rnd, ito), traj = jax.lax.scan(
                body,
                (x, rnd0, jnp.zeros((x.shape[0], 1), dtype=x.dtype)),
                xs,
                unroll=self.scan_unroll,
            )
        else:

            def body(carry, inp):
                x, rnd, ito, key = carry
                s, t = inp
                key, k_noise, k_ctrl, k_div = jax.random.split(key, 4)
                db = jax.random.normal(
                    k_noise, x.shape, dtype=x.dtype
                ) * jnp.sqrt(t - s)
                x_next, rnd, ito = step_core(
                    x, rnd, ito, s, t, db, k_ctrl, k_div
                )
                out = x_next if return_traj else None
                return (x_next, rnd, ito, key), out

            if self.remat and train:
                body = jax.checkpoint(body)
            zeros = jnp.zeros((x.shape[0], 1), dtype=x.dtype)
            (x_T, rnd, ito, _), traj = jax.lax.scan(
                body, (x, rnd0, zeros, key), (ts[:-1], ts[1:]),
                unroll=self.scan_unroll,
            )
        rnd = rnd - terminal_unnorm_log_prob(x_T)
        xs = None
        if return_traj:
            xs = jnp.concatenate([x[None], traj], axis=0)
        return RolloutResult(x_T, rnd + ito, rnd, xs)

    def _two_phase_loss(
        self, key, ts, x, terminal_unnorm_log_prob, initial_log_prob
    ):
        """lv/lv_traj loss with the trajectory rollout outside autodiff.

        Phase 1: value-only EM rollout recording every state (the sde is
        driven by the DETACHED control, so xs carries no param gradient —
        stop_gradient makes that structural and lets autodiff drop the
        scan transpose entirely). Phase 2: one vmapped control evaluation
        over all (T, B) states — batched matmuls on the MXU — produces the
        running cost and Ito increments differentiably. Same states, same
        noise, same formulas as the scan path; only the fp summation order
        differs.
        """
        rnd0 = initial_log_prob(x)
        dbs, step_keys = self._pregen_scan_inputs(key, ts, x)
        needs_step_keys = (
            self.sde_ctrl_noise is not None
            or self.sde_ctrl_dropout is not None
            or (
                self.inference_ctrl is not None
                and self.div_estimator is not None
            )
        )

        if self._resolve_sim_backend(needs_step_keys, x.shape[-1]) == "pallas":
            from sde_sampler_tpu.ops.rollout_pallas import (
                fused_sim_rollout,
                sde_step_fn,
            )

            step = sde_step_fn(
                self.ctrl_apply, drift=self.sde.drift, diff=self.sde.diff
            )
            xs, x_T = fused_sim_rollout(step, self.ctrl_params, x, ts, dbs)
        else:

            def sim_body(x, inp):
                s, t, db = inp[:3]
                k_ctrl = (
                    jax.random.split(inp[3])[0] if needs_step_keys else None
                )
                _, sde_ctrl = self.generative_and_sde_ctrl(s, x, k_ctrl)
                sde_diff = self.sde.diff(s, x)
                x_next = (
                    x
                    + (self.sde.drift(s, x) + sde_diff * sde_ctrl) * (t - s)
                    + sde_diff * db
                )
                return x_next, x

            scan_xs = (ts[:-1], ts[1:], dbs)
            if needs_step_keys:
                scan_xs = scan_xs + (step_keys,)
            x_T, xs = jax.lax.scan(
                sim_body, x, scan_xs, unroll=self.scan_unroll
            )
        x_T = jax.lax.stop_gradient(x_T)
        xs = jax.lax.stop_gradient(xs)

        def per_step(s, t, x_k, db, k=None):
            if needs_step_keys:
                k_ctrl, k_div = jax.random.split(k)
            else:
                k_ctrl = k_div = None
            generative_ctrl, sde_ctrl = self.generative_and_sde_ctrl(
                s, x_k, k_ctrl
            )
            dt = t - s
            extra = 0.0
            if self.inference_ctrl is None:
                gen_plus = gen_minus = generative_ctrl
            else:
                if self.div_estimator is None:
                    div_ctrl, inference_ctrl = divx_exact(
                        self.inference_ctrl, s, x_k
                    )
                else:
                    div_ctrl, inference_ctrl = divx_hutchinson(
                        self.inference_ctrl, s, x_k, k_div,
                        noise_type=self.div_estimator,
                    )
                extra = self.sde.diff(s, x_k) * div_ctrl * dt
                gen_plus = generative_ctrl + inference_ctrl
                gen_minus = generative_ctrl - inference_ctrl
            cost = (gen_plus * (sde_ctrl - 0.5 * gen_minus)).sum(
                axis=-1, keepdims=True
            ) * dt + extra
            ito = (gen_plus * db).sum(axis=-1, keepdims=True)
            return cost, ito

        args = (ts[:-1], ts[1:], xs, dbs)
        if needs_step_keys:
            args = args + (step_keys,)
        costs, itos = jax.vmap(per_step)(*args)
        rnd_no_ito = rnd0 + costs.sum(0) - terminal_unnorm_log_prob(x_T)
        rnd = rnd_no_ito + itos.sum(0)
        return self.compute_loss(rnd, samples=x_T)

    def __call__(
        self, key, ts, x, terminal_unnorm_log_prob, initial_log_prob=None
    ):
        x = self._repeat_traj(x)
        if self.two_phase:
            return self._two_phase_loss(
                key, ts, x, terminal_unnorm_log_prob, initial_log_prob
            )
        change_sde_ctrl = self.method in ["lv", "lv_traj"]
        result = self.simulate(
            key, ts, x,
            terminal_unnorm_log_prob=terminal_unnorm_log_prob,
            initial_log_prob=initial_log_prob,
            train=True,
            change_sde_ctrl=change_sde_ctrl,
            return_traj=False,
        )
        rnd = result.rnd if self.method != "kl" else result.rnd_no_ito
        return self.compute_loss(rnd, samples=result.samples)

    def eval(
        self, key, ts, x, terminal_unnorm_log_prob, initial_log_prob=None,
        return_traj: bool = True,
    ) -> RolloutResult:
        return self.simulate(
            key, ts, x,
            terminal_unnorm_log_prob=terminal_unnorm_log_prob,
            initial_log_prob=initial_log_prob,
            train=False,
            change_sde_ctrl=False,
            return_traj=return_traj,
        )


class ReferenceSDELoss(BaseOCLoss):
    """RND against a reference SDE with known marginal (PIS, EulerDDS)."""

    def __init__(self, *args, reference_ctrl: Callable | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.reference_ctrl = reference_ctrl

    def simulate(
        self,
        key: jax.Array,
        ts: jnp.ndarray,
        x: jnp.ndarray,
        terminal_unnorm_log_prob: Callable,
        reference_log_prob: Callable,
        train: bool = True,
        change_sde_ctrl: bool = False,
        return_traj: bool = False,
    ) -> RolloutResult:
        def step_core(x, rnd, ito, s, t, db, k_extra):
            if change_sde_ctrl:
                generative_ctrl, sde_ctrl = self.generative_and_sde_ctrl(
                    s, x, k_extra
                )
            else:
                sde_ctrl = generative_ctrl = self.generative_ctrl(s, x)
            sde_diff = self.sde.diff(s, x)
            dt = t - s

            if self.reference_ctrl is None:
                gen_minus_ref = gen_plus_ref = generative_ctrl
            else:
                reference_ctrl = self.reference_ctrl(s, x)
                gen_minus_ref = generative_ctrl - reference_ctrl
                gen_plus_ref = generative_ctrl + reference_ctrl

            if change_sde_ctrl:
                cost = gen_minus_ref * (sde_ctrl - 0.5 * gen_plus_ref)
                rnd = rnd + cost.sum(axis=-1, keepdims=True) * dt
            else:
                rnd = rnd + 0.5 * (gen_minus_ref**2).sum(
                    axis=-1, keepdims=True
                ) * dt

            x_next = (
                x + (self.sde.drift(s, x) + sde_diff * sde_ctrl) * dt
                + sde_diff * db
            )
            ito = ito + (gen_minus_ref * db).sum(axis=-1, keepdims=True)
            return x_next, rnd, ito

        needs_step_keys = change_sde_ctrl and (
            self.sde_ctrl_noise is not None
            or self.sde_ctrl_dropout is not None
        )
        zeros = jnp.zeros((x.shape[0], 1), dtype=x.dtype)

        if self.noise_pregen and self._pregen_fits(ts, x):
            dbs, step_keys = self._pregen_scan_inputs(key, ts, x)

            def body(carry, inp):
                x, rnd, ito = carry
                s, t, db = inp[:3]
                k_extra = inp[3] if needs_step_keys else None
                x_next, rnd, ito = step_core(x, rnd, ito, s, t, db, k_extra)
                out = x_next if return_traj else None
                return (x_next, rnd, ito), out

            scan_xs = (ts[:-1], ts[1:], dbs)
            if needs_step_keys:
                scan_xs = scan_xs + (step_keys,)
            if self.remat and train:
                body = jax.checkpoint(body)
            (x_T, rnd, ito), traj = jax.lax.scan(
                body, (x, zeros, zeros), scan_xs, unroll=self.scan_unroll
            )
        else:

            def body(carry, inp):
                x, rnd, ito, key = carry
                s, t = inp
                key, k_noise, k_extra = jax.random.split(key, 3)
                db = jax.random.normal(
                    k_noise, x.shape, dtype=x.dtype
                ) * jnp.sqrt(t - s)
                x_next, rnd, ito = step_core(x, rnd, ito, s, t, db, k_extra)
                out = x_next if return_traj else None
                return (x_next, rnd, ito, key), out

            if self.remat and train:
                body = jax.checkpoint(body)
            (x_T, rnd, ito, _), traj = jax.lax.scan(
                body, (x, zeros, zeros, key), (ts[:-1], ts[1:]),
                unroll=self.scan_unroll,
            )
        rnd = rnd + reference_log_prob(x_T) - terminal_unnorm_log_prob(x_T)
        xs = None
        if return_traj:
            xs = jnp.concatenate([x[None], traj], axis=0)
        return RolloutResult(x_T, rnd + ito, rnd, xs)

    def _two_phase_loss(
        self, key, ts, x, terminal_unnorm_log_prob, reference_log_prob
    ):
        """See TimeReversalLoss._two_phase_loss — same two-phase structure
        with the reference-SDE cost/Ito formulas."""
        dbs, step_keys = self._pregen_scan_inputs(key, ts, x)
        needs_step_keys = (
            self.sde_ctrl_noise is not None
            or self.sde_ctrl_dropout is not None
        )

        if self._resolve_sim_backend(needs_step_keys, x.shape[-1]) == "pallas":
            from sde_sampler_tpu.ops.rollout_pallas import (
                fused_sim_rollout,
                sde_step_fn,
            )

            step = sde_step_fn(
                self.ctrl_apply, drift=self.sde.drift, diff=self.sde.diff
            )
            xs, x_T = fused_sim_rollout(step, self.ctrl_params, x, ts, dbs)
        else:

            def sim_body(x, inp):
                s, t, db = inp[:3]
                k_ctrl = (
                    jax.random.split(inp[3])[0] if needs_step_keys else None
                )
                _, sde_ctrl = self.generative_and_sde_ctrl(s, x, k_ctrl)
                sde_diff = self.sde.diff(s, x)
                x_next = (
                    x
                    + (self.sde.drift(s, x) + sde_diff * sde_ctrl) * (t - s)
                    + sde_diff * db
                )
                return x_next, x

            scan_xs = (ts[:-1], ts[1:], dbs)
            if needs_step_keys:
                scan_xs = scan_xs + (step_keys,)
            x_T, xs = jax.lax.scan(
                sim_body, x, scan_xs, unroll=self.scan_unroll
            )
        x_T = jax.lax.stop_gradient(x_T)
        xs = jax.lax.stop_gradient(xs)

        def per_step(s, t, x_k, db, k=None):
            k_ctrl = jax.random.split(k)[0] if needs_step_keys else None
            generative_ctrl, sde_ctrl = self.generative_and_sde_ctrl(
                s, x_k, k_ctrl
            )
            dt = t - s
            if self.reference_ctrl is None:
                gen_minus_ref = gen_plus_ref = generative_ctrl
            else:
                reference_ctrl = self.reference_ctrl(s, x_k)
                gen_minus_ref = generative_ctrl - reference_ctrl
                gen_plus_ref = generative_ctrl + reference_ctrl
            cost = (gen_minus_ref * (sde_ctrl - 0.5 * gen_plus_ref)).sum(
                axis=-1, keepdims=True
            ) * dt
            ito = (gen_minus_ref * db).sum(axis=-1, keepdims=True)
            return cost, ito

        args = (ts[:-1], ts[1:], xs, dbs)
        if needs_step_keys:
            args = args + (step_keys,)
        costs, itos = jax.vmap(per_step)(*args)
        rnd_no_ito = (
            costs.sum(0)
            + reference_log_prob(x_T)
            - terminal_unnorm_log_prob(x_T)
        )
        rnd = rnd_no_ito + itos.sum(0)
        return self.compute_loss(rnd, samples=x_T)

    def __call__(
        self, key, ts, x, terminal_unnorm_log_prob, reference_log_prob
    ):
        x = self._repeat_traj(x)
        if self.two_phase:
            return self._two_phase_loss(
                key, ts, x, terminal_unnorm_log_prob, reference_log_prob
            )
        change_sde_ctrl = self.method in ["lv", "lv_traj"]
        result = self.simulate(
            key, ts, x,
            terminal_unnorm_log_prob=terminal_unnorm_log_prob,
            reference_log_prob=reference_log_prob,
            train=True,
            change_sde_ctrl=change_sde_ctrl,
            return_traj=False,
        )
        rnd = result.rnd if self.method != "kl" else result.rnd_no_ito
        return self.compute_loss(rnd, samples=result.samples)

    def eval(
        self, key, ts, x, terminal_unnorm_log_prob, reference_log_prob=None,
        return_traj: bool = True,
    ) -> RolloutResult:
        return self.simulate(
            key, ts, x,
            terminal_unnorm_log_prob=terminal_unnorm_log_prob,
            reference_log_prob=reference_log_prob,
            train=False,
            change_sde_ctrl=False,
            return_traj=return_traj,
        )


class ExponentialIntegratorSDELoss(BaseOCLoss):
    """DDS exponential integrator (Vargas et al.), reference oc.py:394-505.

    Update: β_k = clip(α√dt, 0, 1), a_k = √(1-β_k²),
    x ← a_k·x + β_k²σ²·u + σ·β_k·ε with running cost β_k²σ²·½|u|² and
    Ito increment σ·β_k·u·ε.
    """

    def __init__(self, *args, alpha: float, sigma: float, **kwargs):
        super().__init__(*args, **kwargs)
        self.alpha = float(alpha)
        self.sigma = float(sigma)

    def simulate(
        self,
        key: jax.Array,
        ts: jnp.ndarray,
        x: jnp.ndarray,
        terminal_unnorm_log_prob: Callable,
        reference_log_prob: Callable,
        train: bool = True,
        change_sde_ctrl: bool = False,
        return_traj: bool = False,
    ) -> RolloutResult:
        sigma = self.sigma

        def step_core(x, rnd, ito, s, t, noise, k_extra):
            if change_sde_ctrl:
                generative_ctrl, sde_ctrl = self.generative_and_sde_ctrl(
                    s, x, k_extra
                )
                running_cost = (
                    generative_ctrl * (sde_ctrl - 0.5 * generative_ctrl)
                ).sum(axis=-1, keepdims=True)
            else:
                sde_ctrl = generative_ctrl = self.generative_ctrl(s, x)
                running_cost = 0.5 * (generative_ctrl**2).sum(
                    axis=-1, keepdims=True
                )
            dt = t - s

            beta_k = jnp.clip(self.alpha * jnp.sqrt(dt), 0.0, 1.0)
            alpha_k = jnp.sqrt(1.0 - beta_k**2)
            rnd = rnd + beta_k**2 * sigma**2 * running_cost
            x_next = (
                x * alpha_k
                + (beta_k**2) * (sigma**2) * sde_ctrl
                + sigma * beta_k * noise
            )
            ito = ito + (sigma * generative_ctrl * noise * beta_k).sum(
                axis=-1, keepdims=True
            )
            return x_next, rnd, ito

        needs_step_keys = change_sde_ctrl and (
            self.sde_ctrl_noise is not None
            or self.sde_ctrl_dropout is not None
        )
        zeros = jnp.zeros((x.shape[0], 1), dtype=x.dtype)

        if self.noise_pregen and self._pregen_fits(ts, x):
            noises, step_keys = self._pregen_scan_inputs(
                key, ts, x, scale_sqrt_dt=False
            )

            def body(carry, inp):
                x, rnd, ito = carry
                s, t, noise = inp[:3]
                k_extra = inp[3] if needs_step_keys else None
                x_next, rnd, ito = step_core(
                    x, rnd, ito, s, t, noise, k_extra
                )
                out = x_next if return_traj else None
                return (x_next, rnd, ito), out

            scan_xs = (ts[:-1], ts[1:], noises)
            if needs_step_keys:
                scan_xs = scan_xs + (step_keys,)
            if self.remat and train:
                body = jax.checkpoint(body)
            (x_T, rnd, ito), traj = jax.lax.scan(
                body, (x, zeros, zeros), scan_xs, unroll=self.scan_unroll
            )
        else:

            def body(carry, inp):
                x, rnd, ito, key = carry
                s, t = inp
                key, k_noise, k_extra = jax.random.split(key, 3)
                noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
                x_next, rnd, ito = step_core(
                    x, rnd, ito, s, t, noise, k_extra
                )
                out = x_next if return_traj else None
                return (x_next, rnd, ito, key), out

            if self.remat and train:
                body = jax.checkpoint(body)
            (x_T, rnd, ito, _), traj = jax.lax.scan(
                body, (x, zeros, zeros, key), (ts[:-1], ts[1:]),
                unroll=self.scan_unroll,
            )
        rnd = rnd + reference_log_prob(x_T) - terminal_unnorm_log_prob(x_T)
        xs = None
        if return_traj:
            xs = jnp.concatenate([x[None], traj], axis=0)
        return RolloutResult(x_T, rnd + ito, rnd, xs)

    def _two_phase_loss(
        self, key, ts, x, terminal_unnorm_log_prob, reference_log_prob
    ):
        """Two-phase lv for the exponential-integrator update rule."""
        sigma = self.sigma
        noises, step_keys = self._pregen_scan_inputs(
            key, ts, x, scale_sqrt_dt=False
        )
        needs_step_keys = (
            self.sde_ctrl_noise is not None
            or self.sde_ctrl_dropout is not None
        )

        def beta_alpha(s, t):
            beta_k = jnp.clip(self.alpha * jnp.sqrt(t - s), 0.0, 1.0)
            return beta_k, jnp.sqrt(1.0 - beta_k**2)

        if self._resolve_sim_backend(needs_step_keys, x.shape[-1]) == "pallas":
            from sde_sampler_tpu.ops.rollout_pallas import (
                exp_integrator_step_fn,
                fused_sim_rollout,
            )

            step = exp_integrator_step_fn(
                self.ctrl_apply, alpha=self.alpha, sigma=sigma
            )
            xs, x_T = fused_sim_rollout(
                step, self.ctrl_params, x, ts, noises
            )
        else:

            def sim_body(x, inp):
                s, t, noise = inp[:3]
                k_ctrl = (
                    jax.random.split(inp[3])[0] if needs_step_keys else None
                )
                _, sde_ctrl = self.generative_and_sde_ctrl(s, x, k_ctrl)
                beta_k, alpha_k = beta_alpha(s, t)
                x_next = (
                    x * alpha_k
                    + (beta_k**2) * (sigma**2) * sde_ctrl
                    + sigma * beta_k * noise
                )
                return x_next, x

            scan_xs = (ts[:-1], ts[1:], noises)
            if needs_step_keys:
                scan_xs = scan_xs + (step_keys,)
            x_T, xs = jax.lax.scan(
                sim_body, x, scan_xs, unroll=self.scan_unroll
            )
        x_T = jax.lax.stop_gradient(x_T)
        xs = jax.lax.stop_gradient(xs)

        def per_step(s, t, x_k, noise, k=None):
            k_ctrl = jax.random.split(k)[0] if needs_step_keys else None
            generative_ctrl, sde_ctrl = self.generative_and_sde_ctrl(
                s, x_k, k_ctrl
            )
            beta_k, _ = beta_alpha(s, t)
            running_cost = (
                generative_ctrl * (sde_ctrl - 0.5 * generative_ctrl)
            ).sum(axis=-1, keepdims=True)
            cost = beta_k**2 * sigma**2 * running_cost
            ito = (sigma * generative_ctrl * noise * beta_k).sum(
                axis=-1, keepdims=True
            )
            return cost, ito

        args = (ts[:-1], ts[1:], xs, noises)
        if needs_step_keys:
            args = args + (step_keys,)
        costs, itos = jax.vmap(per_step)(*args)
        rnd_no_ito = (
            costs.sum(0)
            + reference_log_prob(x_T)
            - terminal_unnorm_log_prob(x_T)
        )
        rnd = rnd_no_ito + itos.sum(0)
        return self.compute_loss(rnd, samples=x_T)

    __call__ = ReferenceSDELoss.__call__
    eval = ReferenceSDELoss.eval
