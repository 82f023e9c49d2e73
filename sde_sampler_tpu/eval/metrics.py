"""Evaluation metrics: expectation/logZ/stddev errors, ESS, domain fraction.

Capability parity with /root/reference/sde_sampler/eval/metrics.py. Runs on
host over device arrays pulled once per evaluation; heavy reductions stay on
device via jnp.
"""
from __future__ import annotations

import logging
from numbers import Number
from typing import Callable

import jax
import jax.numpy as jnp

from sde_sampler_tpu.distr.base import EXPECTATION_FNS, Distribution


def abs_and_rel_error(
    prediction: Number, target: Number, suffix: str = "", eps: float = 1e-8
) -> dict[str, float]:
    magnitude = abs(target) + eps
    error = abs(prediction - target)
    return {
        f"error{suffix}": error,
        f"rel_error{suffix}": error / magnitude,
    }


def compute_errors(
    prediction,
    target=None,
    name: str = "error",
    weights=None,
    eps: float = 1e-8,
) -> dict[str, float]:
    output = {}
    if isinstance(prediction, Number):
        output[f"eval/{name}"] = prediction
    else:
        prediction = jnp.asarray(prediction)
        if prediction.ndim == 0:
            output[f"eval/{name}"] = float(prediction)
        else:
            assert prediction.ndim == 2 and prediction.shape[-1] == 1
            output[f"eval/{name}"] = float(prediction.mean())
            if weights is not None:
                weights = jnp.asarray(weights)
                assert weights.shape == prediction.shape
                weighted = (prediction * weights).sum() / weights.sum()
                output[f"eval/{name}_is"] = float(weighted)

    if target is not None:
        if not isinstance(target, Number):
            target = float(jnp.asarray(target))
        for key_name, pred in output.copy().items():
            suffix = key_name.replace("eval", "")
            output.update(
                abs_and_rel_error(
                    prediction=pred, target=target, suffix=suffix, eps=eps
                )
            )
    return output


def frac_inside_domain(samples, domain) -> float:
    assert samples.shape[-1] == domain.shape[0]
    inside = (domain[:, 0] <= samples) & (samples <= domain[:, 1])
    return float(inside.all(axis=-1).mean())


def get_metrics(
    distr: Distribution,
    samples,
    weights=None,
    log_norm_const_preds: dict | None = None,
    expectation_preds: dict | None = None,
    marginal_dims: list[int] | None = None,
    sample_losses: dict[str, Callable] | None = None,
    sample_key: jax.Array | None = None,
) -> dict[str, float]:
    marginal_dims = marginal_dims or []
    if not all(d < distr.dim for d in marginal_dims):
        logging.warning("Removing non-existent marginal dims for metrics.")
        marginal_dims = [d for d in marginal_dims if d < distr.dim]

    metrics: dict[str, float] = {}
    expectation_preds = expectation_preds or {}
    log_norm_const_preds = log_norm_const_preds or {}
    samples = jnp.asarray(samples)

    # Expectations
    for name, fn in EXPECTATION_FNS.items():
        target = distr.expectations.get(name)
        prediction = fn(samples)
        metrics.update(
            compute_errors(
                prediction=prediction, target=target, name=name, weights=weights
            )
        )
        if name in expectation_preds:
            metrics.update(
                compute_errors(
                    prediction=expectation_preds[name],
                    target=target,
                    name=name + "_direct",
                    weights=weights,
                )
            )

    # Log normalization constant
    for name, pred in log_norm_const_preds.items():
        pred = float(pred) if not isinstance(pred, Number) else pred
        metrics.update(
            compute_errors(
                prediction=pred, target=distr.log_norm_const, name=name
            )
        )

    # ESS
    if weights is not None:
        weights = jnp.asarray(weights)
        assert weights.shape == (samples.shape[0], 1)
        ess = float(weights.sum() ** 2 / (weights**2).sum())
        metrics["eval/effective_sample_size"] = ess
        metrics["eval/norm_effective_sample_size"] = ess / weights.shape[0]

    # Stddevs (ddof=1: torch's .std(dim=0) is Bessel-corrected)
    stddevs = samples.std(axis=0, ddof=1)
    avg_stddev = float(stddevs.mean())
    means = samples.mean(axis=0)
    metrics["eval/avg_stddev"] = avg_stddev
    for dim in marginal_dims:
        metrics[f"eval/stddev_{dim}"] = float(stddevs[dim])
        metrics[f"eval/avg_{dim}"] = float(means[dim])

    if distr.stddevs is not None:
        assert distr.stddevs.shape == stddevs.shape
        metrics["error/avg_marginal_stddev"] = float(
            jnp.abs(stddevs - distr.stddevs).mean()
        )
        metrics.update(
            compute_errors(
                prediction=avg_stddev,
                target=float(distr.stddevs.mean()),
                name="avg_stddev",
            )
        )

    # Samples inside domain
    if distr.domain is not None:
        metrics["eval/frac_pred_in_domain"] = frac_inside_domain(
            samples, distr.domain
        )

    # Sample-based losses (e.g. Sinkhorn against ground truth). These run on
    # the accelerator regardless of where the surrounding metric math lives.
    if sample_losses is not None:
        if hasattr(distr, "sample"):
            from sde_sampler_tpu.utils import device as device_lib

            if sample_key is not None:
                key = sample_key
            else:
                # deterministic fallback; built on host (never create PRNG
                # keys on the tunneled accelerator — see CLAUDE.md)
                with device_lib.host_device():
                    key = jax.random.PRNGKey(0)
            gt_samples = distr.sample(key, (samples.shape[0],))
            assert gt_samples.shape == samples.shape
            if distr.domain is not None:
                metrics["eval/frac_groundtruth_in_domain"] = frac_inside_domain(
                    gt_samples, distr.domain
                )
            samples_acc = device_lib.to_accelerator(jnp.asarray(samples))
            gt_acc = device_lib.to_accelerator(jnp.asarray(gt_samples))
            metrics.update(
                {
                    "error/" + name: float(loss(samples_acc, gt_acc))
                    for name, loss in sample_losses.items()
                }
            )
        else:
            logging.warning(
                "Sampling not implemented for distribution %s.",
                distr.__class__.__name__,
            )

    # Objective (global optimization targets)
    if hasattr(distr, "objective"):
        # objective returns (n, 1); squeeze the single-row result
        metrics["eval/obj_avg"] = float(
            distr.objective(samples.mean(axis=0, keepdims=True)).squeeze()
        )
        obj = distr.objective(samples)
        metrics["eval/avg_obj"] = float(obj.mean())
        metrics["eval/min_obj"] = float(obj.min())

    return metrics
