"""Evaluation plots (matplotlib backend).

Capability parity with /root/reference/sde_sampler/eval/plots.py (1-d
marginal histograms with true-marginal overlays and IS-weighted variants,
2-d density heatmaps, trajectory-evolution plots with terminal-value hue,
2-d contours, ground-truth comparisons, unified `save_fig`). The reference
renders with plotly, which is unavailable here; matplotlib produces the same
PNG artifacts under the same plot keys.
"""
from __future__ import annotations

import itertools
import logging
from pathlib import Path
from typing import Callable

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from scipy.ndimage import gaussian_filter  # noqa: E402

from sde_sampler_tpu.distr.base import Distribution  # noqa: E402


def _np(x):
    return np.asarray(x)


def plot_contours_2d(
    log_prob: Callable,
    domain,
    nbins: int = 200,
    levels: int = 50,
    thresh: float = -1000.0,
    ax: plt.Axes | None = None,
):
    if ax is None:
        _, ax = plt.subplots(1)
    domain = _np(domain)
    x = np.linspace(*domain[0], nbins)
    y = np.linspace(*domain[1], nbins)
    xg, yg = np.meshgrid(x, y, indexing="ij")
    xy = np.stack([xg, yg], axis=-1).reshape(-1, 2)
    log_p = _np(log_prob(xy)).reshape(xg.shape)
    ax.contour(xg, yg, np.clip(log_p, thresh, None), levels=levels)
    ax.set_ylabel(r"$x_1$")
    ax.set_xlabel(r"$x_2$")
    return ax.get_figure()


def plot_marginal_2d(
    x,
    dim1: int = 0,
    dim2: int = 1,
    weights=None,
    nbins: int = 100,
    domain=None,
    smoothing: float = 0.1,
    ax: plt.Axes | None = None,
    scatter: bool = False,
) -> plt.Figure:
    data = _np(x)[:, [dim1, dim2]]
    if ax is None:
        fig, ax = plt.subplots(1, 1)
    if domain is not None:
        domain = _np(domain)[[dim1, dim2]]
        hist_range = [tuple(domain[0]), tuple(domain[1])]
    else:
        hist_range = None
    if weights is not None:
        weights = _np(weights).squeeze(-1)
    finite = np.isfinite(data).all(axis=-1)
    heatmap, binsx, binsy = np.histogram2d(
        data[finite, 0], data[finite, 1], bins=nbins, range=hist_range,
        weights=None if weights is None else weights[finite], density=True,
    )
    heatmap = gaussian_filter(heatmap, sigma=smoothing)
    extent = [binsx[0], binsx[-1], binsy[0], binsy[-1]]
    palette = plt.get_cmap("Blues").copy()
    palette.set_under("white", 0.0)
    ax.imshow(
        heatmap.T, extent=extent, vmin=0.0, origin="lower", cmap=palette,
        aspect="auto",
    )
    if scatter:
        ax.scatter(x=data[:, 0], y=data[:, 1], s=0.001, c="k")
    ax.set_ylabel(rf"$x_{dim2 + 1:d}$")
    ax.set_xlabel(rf"$x_{dim1 + 1:d}$")
    return ax.get_figure()


def plot_marginal(
    x,
    weights=None,
    marginal: Callable | None = None,
    dim: int = 0,
    nbins: int = 100,
    domain=None,
    **_,
) -> plt.Figure:
    data = _np(x)[:, dim]
    finite = np.isfinite(data)
    data = data[finite]
    if domain is None:
        rng = (float(data.min()), float(data.max()))
    else:
        rng = tuple(_np(domain)[dim])

    fig, ax = plt.subplots(1, 1)
    heights, bins = np.histogram(data, bins=nbins, range=rng, density=True)
    centers = (bins[:-1] + bins[1:]) / 2
    width = bins[1] - bins[0]
    ax.bar(centers, heights, width=width, alpha=0.85, label="histogram")
    if weights is not None:
        # pair weights with the SAME finite mask (truncation would misalign
        # every weight after the first dropped sample)
        w = _np(weights).squeeze(-1)[finite]
        heights_w, _ = np.histogram(
            data, bins=nbins, range=rng, weights=w, density=True
        )
        ax.bar(
            centers, heights_w, width=width, alpha=0.5, label="histogram_is"
        )
    if marginal is not None:
        xlin = np.linspace(*rng, nbins)
        marginal_eval = _np(marginal(xlin.reshape(-1, 1), dim=dim))
        ax.plot(xlin, marginal_eval.reshape(-1), "k-", label="marginal")
    ax.legend()
    ax.set_xlabel(rf"$x_{dim + 1:d}$")
    return fig


def plot_evolution(
    ts,
    xs,
    dim: int = 0,
    ntraj: int = 50,
    domain=None,
    **_,
) -> plt.Figure:
    fig, ax = plt.subplots(1, 1)
    ts = _np(ts)
    trajs = _np(xs)[:, :, dim].T  # (B, T+1)
    mask = np.isfinite(trajs).all(axis=1)
    discard = mask.size - mask.sum()
    if discard > 0:
        logging.warning("Filtering %d trajectories with non-finite values.", discard)
    if discard < mask.size:
        trajs = trajs[mask][:ntraj]
        terminal = trajs[:, -1]
        hues = (terminal - terminal.min()) / (
            1e-8 + terminal.max() - terminal.min()
        )
        cmap = plt.get_cmap("hsv")
        for traj, hue in zip(trajs, hues):
            ax.plot(ts, traj, lw=0.4, color=cmap(float(hue)))
    if domain is not None:
        ax.set_ylim(*_np(domain)[dim])
    ax.set_xlabel("t")
    ax.set_ylabel(rf"$x_{dim + 1:d}$")
    return fig


def get_plots(
    distr: Distribution,
    samples,
    weights=None,
    ts=None,
    xs=None,
    marginal_dims: list[int] | None = None,
    decimals: int = 6,
    nbins: int = 100,
    domain=None,
    sample_key=None,
) -> dict[str, plt.Figure]:
    plots: dict[str, plt.Figure] = {}
    marginal_dims = marginal_dims or []
    if domain is None and distr.domain is not None:
        domain = distr.domain if bool(np.isfinite(_np(distr.domain)).all()) else None

    if not all(d < distr.dim for d in marginal_dims):
        logging.warning("Removing non-existent marginal dims for plotting.")
        marginal_dims = [d for d in marginal_dims if d < distr.dim]

    for d in marginal_dims:
        if ts is not None and xs is not None:
            plots[f"plots/traj_{d}"] = plot_evolution(
                ts=ts, xs=xs, dim=d, domain=domain
            )
        plots[f"plots/hist_{d}"] = plot_marginal(
            x=samples,
            weights=weights,
            marginal=getattr(distr, "marginal", None),
            dim=d,
            nbins=nbins,
            domain=domain,
        )

    for dim1, dim2 in itertools.combinations(marginal_dims, r=2):
        plots[f"plots/density_{dim1}_{dim2}"] = plot_marginal_2d(
            x=samples, dim1=dim1, dim2=dim2, nbins=nbins, domain=domain,
        )

    if hasattr(distr, "sample"):
        import jax

        key = sample_key if sample_key is not None else jax.random.PRNGKey(0)
        gt_samples = distr.sample(key, (min(samples.shape[0], 10**5),))
        for dim1, dim2 in itertools.combinations(marginal_dims, r=2):
            plots[f"plots/groundtruth_density_{dim1}_{dim2}"] = plot_marginal_2d(
                x=gt_samples, dim1=dim1, dim2=dim2, nbins=nbins, domain=domain,
            )

    return plots


def save_fig(fig, path: Path | str):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        from PIL.Image import Image

        if isinstance(fig, Image):
            fig.save(path)
            return
    except ImportError:
        pass
    if isinstance(fig, plt.Figure):
        fig.savefig(path)
        plt.close(fig)
    else:
        raise ValueError(f"Unknown figure type {type(fig)}.")
