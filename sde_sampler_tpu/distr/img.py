"""2-d density defined by a grayscale image (labrador.jpg by default).

Capability parity with /root/reference/sde_sampler/distr/img.py: crop +
white-cutoff + Gaussian-blur stack builds an energy grid; the density is the
gradient-interpolated pixel energy with a quadratic penalty outside the
image; sampling draws pixels from the normalized density with uniform
sub-pixel jitter. Image preprocessing runs once in numpy/scipy on host; the
per-sample energy is pure jax.numpy gather math (jit/vmap-friendly).
"""
from __future__ import annotations

import math
from collections.abc import Sequence
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter

from .base import DATA_DIR, Distribution


class Img(Distribution):
    def __init__(
        self,
        dim: int = 2,
        mean: Sequence[int] = (350, 350),
        scale: Sequence[int] = (100, 100),
        outside_penalty: float = 1.0,
        path: str | Path = DATA_DIR / "labrador.jpg",
        embed: Sequence[int] | None = None,
        crop: Sequence[int] = (10, 710, 240, 940),
        white_cutoff: float = 225.0,
        gauss_sigma: float = 3.0,
        background: float = 0.01,
        domain=3.5,
        n_reference_samples: int = int(1e7),
        **kwargs,
    ):
        super().__init__(
            dim=dim,
            domain=domain,
            n_reference_samples=n_reference_samples,
            **kwargs,
        )
        self.path = Path(path)
        self.outside_penalty = outside_penalty

        import matplotlib.image as mpimg

        img = mpimg.imread(self.path)
        img = img.mean(axis=2).astype(np.float32)
        img[img > white_cutoff] = 255
        img /= img.max()
        if crop is not None:
            img = img[crop[0]: crop[1], crop[2]: crop[3]]
        if embed is not None:
            tmp = np.ones((embed[0], embed[1]), dtype=np.float32)
            sx = (embed[0] - img.shape[0]) // 2
            sy = (embed[1] - img.shape[1]) // 2
            tmp[sx: img.shape[0] + sx, sy: img.shape[1] + sy] = img
            img = tmp

        img_blur = gaussian_filter(img, sigma=gauss_sigma)
        density = (1.0 - img_blur) + background * (
            gaussian_filter(img, sigma=10)
            + gaussian_filter(img, sigma=20)
            + gaussian_filter(img, sigma=50)
        )
        density = density[::-1]
        energy = -np.log(density)
        energy -= energy.min()

        ix, iy = np.meshgrid(
            np.arange(density.shape[1]), np.arange(density.shape[0])
        )
        density_normed = density.astype(np.float64)
        density_normed /= density_normed.sum()

        self.idx = jnp.asarray(
            np.vstack([ix.flatten(), iy.flatten()]).T, dtype=jnp.int32
        )
        self.log_density_flat = jnp.asarray(
            np.log(density_normed.flatten()), dtype=jnp.float32
        )
        # inverse-CDF sampling table: jax.random.categorical would
        # materialize an (n_samples, n_pixels) gumbel tensor (~2TB at the
        # reference's 1e6 samples x 490k pixels)
        self.density_cdf = jnp.asarray(
            np.cumsum(density_normed.flatten()), dtype=jnp.float32
        )
        self.pixel_energy = jnp.asarray(energy, dtype=jnp.float32)
        self.maxindex_x = self.pixel_energy.shape[1] - 1
        self.maxindex_y = self.pixel_energy.shape[0] - 1
        self.mean = jnp.asarray([mean], dtype=jnp.float32)
        self.scale = jnp.asarray([scale], dtype=jnp.float32)

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        xs = x * self.scale + self.mean
        i = xs.astype(jnp.int32)
        ix, iy = i[:, 0], i[:, 1]
        dx = xs[:, 0] - ix.astype(jnp.float32)
        dy = xs[:, 1] - iy.astype(jnp.float32)

        # Gradient-interpolated energy at the closest inside pixel
        ix_in = jnp.clip(ix, 1, self.maxindex_x - 1)
        iy_in = jnp.clip(iy, 1, self.maxindex_y - 1)
        e0 = self.pixel_energy[iy_in, ix_in]
        dedx = 0.5 * (
            self.pixel_energy[iy_in, ix_in + 1]
            - self.pixel_energy[iy_in, ix_in - 1]
        )
        dedy = 0.5 * (
            self.pixel_energy[iy_in + 1, ix_in]
            - self.pixel_energy[iy_in - 1, ix_in]
        )
        image_energy = (e0 + dx * dedx + dy * dedy)[:, None]

        # Quadratic penalty outside the image
        pen_x = jnp.maximum(jnp.maximum(-ix, 0), jnp.maximum(ix - self.maxindex_x, 0))
        pen_y = jnp.maximum(jnp.maximum(-iy, 0), jnp.maximum(iy - self.maxindex_y, 0))
        # square in float: int32 pen**2 wraps negative for |pen| >= 46341
        # (the reference squares in torch int64)
        pen_x = pen_x.astype(jnp.float32)
        pen_y = pen_y.astype(jnp.float32)
        penalty = (self.outside_penalty * (pen_x**2 + pen_y**2))[:, None]

        return -image_energy - penalty

    def score(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        """Analytic score: the energy is linear in the sub-pixel offsets, so
        ∇ₓ log ρ = -(dE/dx, dE/dy)·scale. The outside-penalty depends on x
        only through the integer cast (zero gradient a.e.), matching the
        autodiff of `unnorm_log_prob` exactly while avoiding TPU-hostile
        gather-transpose scatters in the rollout."""
        xs = x * self.scale + self.mean
        i = xs.astype(jnp.int32)
        ix_in = jnp.clip(i[:, 0], 1, self.maxindex_x - 1)
        iy_in = jnp.clip(i[:, 1], 1, self.maxindex_y - 1)
        dedx = 0.5 * (
            self.pixel_energy[iy_in, ix_in + 1]
            - self.pixel_energy[iy_in, ix_in - 1]
        )
        dedy = 0.5 * (
            self.pixel_energy[iy_in + 1, ix_in]
            - self.pixel_energy[iy_in - 1, ix_in]
        )
        return -jnp.stack([dedx, dedy], axis=-1) * self.scale

    def sample(self, key: jax.Array, shape: tuple | None = None) -> jnp.ndarray:
        shape = tuple(shape or ())
        n = math.prod(shape)
        key_cat, key_unif = jax.random.split(key)
        u = jax.random.uniform(key_cat, (n,))
        i = jnp.clip(
            jnp.searchsorted(self.density_cdf, u, side="right"),
            0, self.density_cdf.shape[0] - 1,
        )
        ixy = self.idx[i].reshape(*shape, 2).astype(jnp.float32)
        xy = ixy + jax.random.uniform(key_unif, (*shape, 2)) - 0.5
        return (xy - self.mean) / self.scale

    # -- plots ---------------------------------------------------------------
    def plot_energies(self, axs=None):
        import matplotlib.image as mpimg
        from matplotlib import pyplot as plt

        if axs is None:
            _, axs = plt.subplots(ncols=3, nrows=1, figsize=(20, 6))
        axs[0].imshow(mpimg.imread(self.path))
        energy = np.asarray(self.pixel_energy)
        axs[1].imshow(np.exp(-energy[::-1]), vmin=0, vmax=1, cmap="gray_r")
        axs[2].contourf(
            energy, 20, vmin=energy.min(), vmax=energy.max(), cmap="Spectral"
        )
        for ax in axs:
            ax.axis("off")
        return axs[0].get_figure()

    def plot_samples(self, samples, nbins=100, vmax=250.0, ax=None):
        from matplotlib import pyplot as plt

        samples = np.asarray(samples)
        domain = None if self.domain is None else np.asarray(self.domain)
        if ax is None:
            _, ax = plt.subplots()
        ax.hist2d(
            samples[:, 0], samples[:, 1], bins=nbins, vmax=vmax,
            range=domain, cmap="gray_r",
        )
        if domain is not None:
            ax.set_xlim(*domain[0])
            ax.set_ylim(*domain[1])
        ax.axis("off")
        return ax.get_figure()

    def plots(self, samples, nbins=100, vmax=250.0):
        from matplotlib import pyplot as plt

        fig, axes = plt.subplots(nrows=1, ncols=2, figsize=(6, 3))
        fig.subplots_adjust(wspace=0.05)
        results = {
            "prediction": samples,
            "groundtruth": self.sample(
                jax.random.PRNGKey(0), (samples.shape[0],)
            ),
        }
        for ax, (name, x) in zip(axes, results.items()):
            ax.set_title(name, fontsize=15)
            fig = self.plot_samples(samples=x, nbins=nbins, vmax=vmax, ax=ax)
        return {
            "plots/comparison": fig,
            "plots/groundtruth": self.plot_energies(),
        }
