"""Reparametrized controls: problem-structure wrappers around backbones.

Capability parity with /root/reference/sde_sampler/models/reparam.py:
ClippedCtrl, ScoreCtrl (PIS-grad trick), CancelDriftCtrl (langevin init),
LerpCtrl / LerpPriorCtrl / LerpTargetCtrl (DIS init), PotentialCtrl
(control as σ·∇ of a learned scalar potential, exposing `unnorm_log_prob`
for subtrajectory losses).

All wrappers are flax modules callable as `ctrl(t, x)`; clip thresholds can
be overridden per call via the `clips` dict so the MultiStepParams scheduler
can change them without retracing (clip values enter the graph as dynamic
scalars when scheduled).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def _clip(value, max_norm):
    if max_norm is None:
        return value
    return jnp.clip(value, -max_norm, max_norm)


def _mul(a, b):
    """a * b, collapsing a (1, 1) factor to a scalar first.

    Numerically identical to broadcasting; required inside Mosaic kernel
    traces (ops/rollout_pallas), which cannot broadcast (1, 1) -> (B, d)
    across sublanes and lanes in one op.
    """
    if getattr(b, "shape", None) == (1, 1):
        return a * b[0, 0]
    return a * b


def _pick(clips: dict | None, key: str, default):
    if clips is not None and key in clips and clips[key] is not None:
        return clips[key]
    return default


class ClippedCtrl(nn.Module):
    """Plain clipped backbone control."""

    base_model: nn.Module
    clip_model: float | None = None
    name_tag: str = "ctrl"
    # accepted for config parity even when unused by this class
    sde: Any = None
    prior_score: Callable | None = None
    target_score: Callable | None = None

    def clipped_base_model(self, t, x, clips=None):
        out = self.base_model(t, x)
        return _clip(out, _pick(clips, "clip_model", self.clip_model))

    def __call__(self, t, x, clips=None):
        return self.clipped_base_model(t, x, clips)


class ScoreCtrl(ClippedCtrl):
    """NN control plus scaled target score modulated by a learned t-net."""

    score_model: nn.Module | None = None
    detach_score: bool = True
    scale_score: float = 1.0
    clip_score: float | None = None

    def clipped_target_score(self, t, x, clips=None):
        x = jax.lax.stop_gradient(x) if self.detach_score else x
        out = self.target_score(x)
        return _clip(out, _pick(clips, "clip_score", self.clip_score))

    def clipped_score_model(self, t, x, clips=None):
        out = self.score_model(t, x)
        return _clip(out, _pick(clips, "clip_model", self.clip_model))

    def __call__(self, t, x, clips=None):
        ctrl = self.clipped_base_model(t, x, clips)
        score = self.scale_score * self.clipped_target_score(t, x, clips)
        if self.score_model is not None:
            score = _mul(score, self.clipped_score_model(t, x, clips))
        return ctrl + score


class CancelDriftCtrl(ScoreCtrl):
    """u = NN + (scale·score − drift)/σ; langevin_init ties scale to σ²/2."""

    langevin_init: bool = False

    def __call__(self, t, x, clips=None):
        ctrl = self.clipped_base_model(t, x, clips)
        sde_diff = self.sde.diff(t, x)
        if self.langevin_init:
            scale = sde_diff**2 / 2
        else:
            scale = self.scale_score
        score = scale * self.clipped_target_score(t, x, clips)
        if self.score_model is not None:
            score = _mul(score, self.clipped_score_model(t, x, clips))
        return ctrl + (score - self.sde.drift(t, x)) / sde_diff


class LerpCtrl(ScoreCtrl):
    """u = NN + σ·lerp(prior score, target score; t/T) (DIS init)."""

    hard_constrain: bool = False
    scale_lerp: float = 1.0

    def clipped_interpolated_score(self, t, x, clips=None):
        x = jax.lax.stop_gradient(x) if self.detach_score else x
        target = self.target_score(x)
        prior = self.prior_score(x)
        w = t / self.sde.terminal_t
        out = prior + (target - prior) * w
        return _clip(out, _pick(clips, "clip_score", self.clip_score))

    def constrain(self, output, t):
        T = self.sde.terminal_t
        return 4 * output * (T - t) * t / T**2

    def __call__(self, t, x, clips=None):
        ctrl = self.clipped_base_model(t, x, clips)
        if self.hard_constrain:
            ctrl = self.constrain(ctrl, t)
        score = self.scale_score * self.clipped_interpolated_score(t, x, clips)
        if self.score_model is not None:
            score_model = self.clipped_score_model(t, x, clips)
            if self.hard_constrain:
                score_model = self.constrain(score_model, t)
            score = _mul(score, score_model)
        return ctrl + self.sde.diff(t, x) * score


class LerpPriorCtrl(LerpCtrl):
    """One-sided lerp toward the prior score (used as inference control)."""

    def clipped_interpolated_score(self, t, x, clips=None):
        x = jax.lax.stop_gradient(x) if self.detach_score else x
        out = (1.0 - t / self.sde.terminal_t) * self.prior_score(x)
        return _clip(out, _pick(clips, "clip_score", self.clip_score))

    def constrain(self, output, t):
        return 2 * output * t / self.sde.terminal_t


class LerpTargetCtrl(LerpCtrl):
    """One-sided lerp toward the target score."""

    def clipped_interpolated_score(self, t, x, clips=None):
        x = jax.lax.stop_gradient(x) if self.detach_score else x
        out = t / self.sde.terminal_t * self.target_score(x)
        return _clip(out, _pick(clips, "clip_score", self.clip_score))

    def constrain(self, output, t):
        return 2 * output * (1.0 - t / self.sde.terminal_t)


class PotentialCtrl(ClippedCtrl):
    """u = σ(t)·∇ₓ Φ(t, x) for a learned scalar potential Φ.

    `unnorm_log_prob` exposes Φ so subtrajectory losses can treat the
    potential as an unnormalized intermediate log-density.
    """

    def unnorm_log_prob(self, t, x, clips=None):
        return self.clipped_base_model(t, x, clips)

    def __call__(self, t, x, clips=None):
        def potential_sum(xx):
            return self.clipped_base_model(t, xx, clips).sum()

        grad = jax.grad(potential_sum)(x)
        return self.sde.diff(t, x) * grad
