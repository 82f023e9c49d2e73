"""196-d target: log-density of a NICE normalizing flow on 14x14 MNIST.

Capability parity with /root/reference/sde_sampler/distr/nice.py: additive
coupling layers (shift MLP on alternating halves) + diagonal log-scaling,
standard-logistic latent prior, chunked flow sampling, and sample-grid image
plots. The flow is a pure-functional JAX model (params pytree + jit/vmap
friendly apply), trained by scripts/train_nice.py.

Checkpoints are .npz pytrees (data/nice.npz). When no checkpoint exists the
target falls back to a seeded random flow so the 196-d pipeline remains
exercisable end-to-end (a warning is emitted; results are then not
comparable to the MNIST-trained reference flow).
"""
from __future__ import annotations

import logging
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .base import DATA_DIR, Distribution


# ---------------------------------------------------------------------------
# Standard logistic latent prior
# ---------------------------------------------------------------------------


class StandardLogistic:
    @staticmethod
    def log_prob(x):
        return -(jax.nn.softplus(x) + jax.nn.softplus(-x))

    @staticmethod
    def sample(key, shape, eps: float = 1e-20):
        z = jax.random.uniform(key, shape, minval=eps, maxval=1.0 - eps)
        return jnp.log(z) - jnp.log(1.0 - z)


# ---------------------------------------------------------------------------
# Functional NICE flow
# ---------------------------------------------------------------------------


def _linear_init(key, fan_in, fan_out):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def init_nice_params(
    key: jax.Array,
    in_out_dim: int = 196,
    mid_dim: int = 500,
    hidden: int = 5,
    coupling: int = 4,
) -> dict:
    half = in_out_dim // 2
    layers = []
    for _ in range(coupling):
        key, *subs = jax.random.split(key, hidden + 2)
        mlp = [_linear_init(subs[0], half, mid_dim)]
        for i in range(hidden - 1):
            mlp.append(_linear_init(subs[1 + i], mid_dim, mid_dim))
        mlp.append(_linear_init(subs[hidden], mid_dim, half))
        layers.append(mlp)
    return {
        "couplings": layers,
        "scale": jnp.zeros((1, in_out_dim)),
    }


def _coupling_shift(mlp, off):
    h = off
    for layer in mlp[:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    return h @ mlp[-1]["w"] + mlp[-1]["b"]


def _coupling_apply(mlp, x, mask_config: int, reverse: bool):
    b, w = x.shape
    x = x.reshape(b, w // 2, 2)
    if mask_config:
        on, off = x[:, :, 0], x[:, :, 1]
    else:
        off, on = x[:, :, 0], x[:, :, 1]
    shift = _coupling_shift(mlp, off)
    on = on - shift if reverse else on + shift
    if mask_config:
        x = jnp.stack((on, off), axis=2)
    else:
        x = jnp.stack((off, on), axis=2)
    return x.reshape(b, w)


def nice_f(params, x, mask_config: int = 1):
    """x -> (z, log_det_jacobian)."""
    for i, mlp in enumerate(params["couplings"]):
        x = _coupling_apply(mlp, x, (mask_config + i) % 2, reverse=False)
    z = x * jnp.exp(params["scale"])
    return z, jnp.sum(params["scale"])


def nice_g(params, z, mask_config: int = 1):
    """z -> x (inverse of f)."""
    x = z * jnp.exp(-params["scale"])
    for i, mlp in reversed(list(enumerate(params["couplings"]))):
        x = _coupling_apply(mlp, x, (mask_config + i) % 2, reverse=True)
    return x


def nice_log_prob(params, x, mask_config: int = 1):
    z, log_det = nice_f(params, x, mask_config)
    return jnp.sum(StandardLogistic.log_prob(z), axis=1) + log_det


def nice_sample(params, key, size: int, in_out_dim: int, mask_config: int = 1):
    z = StandardLogistic.sample(key, (size, in_out_dim))
    return nice_g(params, z, mask_config)


def save_nice_checkpoint(path, params, meta: dict):
    flat, treedef = jax.tree_util.tree_flatten(params)
    np.savez_compressed(
        path,
        *[np.asarray(leaf) for leaf in flat],
        **{f"meta_{k}": v for k, v in meta.items()},
    )


def load_nice_checkpoint(path):
    data = np.load(path)
    meta = {
        k[len("meta_"):]: data[k].item()
        for k in data.files
        if k.startswith("meta_")
    }
    leaves = [
        jnp.asarray(data[k]) for k in data.files if not k.startswith("meta_")
    ]
    template = init_nice_params(
        jax.random.PRNGKey(0),
        in_out_dim=int(meta["in_out_dim"]),
        mid_dim=int(meta["mid_dim"]),
        hidden=int(meta["hidden"]),
        coupling=int(meta["coupling"]),
    )
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


# ---------------------------------------------------------------------------
# Target distribution
# ---------------------------------------------------------------------------


class Nice(Distribution):
    """NICE flow trained on resized MNIST as a 196-d target density."""

    def __init__(
        self,
        params: dict | None = None,
        checkpoint: str | Path = DATA_DIR / "nice.npz",
        mean_data_path: str | Path = DATA_DIR / "mnist_mean.npy",
        sample_chunk_size: int = 10000,
        dim: int = 196,
        log_norm_const: float = 0.0,
        n_reference_samples: int = int(1e6),
        mid_dim: int = 500,
        hidden: int = 5,
        coupling: int = 4,
        mask_config: int = 1,
    ):
        super().__init__(
            dim=dim,
            log_norm_const=log_norm_const,
            n_reference_samples=n_reference_samples,
        )
        self.shape = (14, 14)
        if not self.dim == math.prod(self.shape):
            raise ValueError(f"Dimension is {self.dim} but needs to be 196.")
        self.sample_chunk_size = sample_chunk_size
        self.mask_config = mask_config

        # 28x28 MNIST mean, area-resized to 14x14 (2x2 average pooling is the
        # antialias resize for an exact factor of 2)
        mean28 = np.load(mean_data_path).reshape(28, 28)
        mean14 = mean28.reshape(14, 2, 14, 2).mean(axis=(1, 3))
        self.mean = jnp.asarray(mean14.reshape(1, self.dim))

        if params is not None:
            self.params = params
        elif Path(checkpoint).exists():
            self.params, meta = load_nice_checkpoint(checkpoint)
            self.mask_config = int(meta.get("mask_config", mask_config))
        else:
            logging.warning(
                "No NICE checkpoint at %s; using a seeded random flow. Run "
                "scripts/train_nice.py to train on MNIST.", checkpoint,
            )
            self.params = init_nice_params(
                jax.random.PRNGKey(42),
                in_out_dim=dim,
                mid_dim=mid_dim,
                hidden=hidden,
                coupling=coupling,
            )

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        lp = nice_log_prob(self.params, x, self.mask_config)
        return lp[:, None] + self.log_norm_const

    def sample(self, key: jax.Array, shape: tuple | None = None) -> jnp.ndarray:
        shape = tuple(shape or (1,))
        if len(shape) > 1:
            raise ValueError("Can only sample shapes (batch_size,).")
        size = shape[0]
        chunks = []
        remaining = size
        while remaining > 0:
            key, sub = jax.random.split(key)
            n = min(remaining, self.sample_chunk_size)
            chunks.append(
                nice_sample(self.params, sub, n, self.dim, self.mask_config)
            )
            remaining -= n
        samples = jnp.concatenate(chunks)
        assert samples.shape == (size, self.dim)
        return samples

    def plots(self, samples, n_max: int = 64) -> dict:
        from PIL import Image

        samples = np.asarray(samples[:n_max]) + np.asarray(self.mean)
        imgs = samples.reshape(-1, *self.shape)
        # normalize each image to [0, 1] and tile into a grid
        lo = imgs.min(axis=(1, 2), keepdims=True)
        hi = imgs.max(axis=(1, 2), keepdims=True)
        imgs = (imgs - lo) / np.maximum(hi - lo, 1e-8)
        n = imgs.shape[0]
        ncol = 8
        nrow = -(-n // ncol)
        pad = nrow * ncol - n
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad, *self.shape))])
        grid = (
            imgs.reshape(nrow, ncol, *self.shape)
            .transpose(0, 2, 1, 3)
            .reshape(nrow * self.shape[0], ncol * self.shape[1])
        )
        arr = np.clip(grid * 255 + 0.5, 0, 255).astype(np.uint8)
        return {"plots/samples": Image.fromarray(arr)}
