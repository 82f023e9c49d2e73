"""Control-network backbones in flax.linen.

Capability parity with /root/reference/sde_sampler/models/mlp.py: TimeEmbed
(sin/cos features over 64 log-spaced frequencies with a learned phase),
FourierMLP (default control backbone), FeedForward, DenseNet, and
LevelNet/MultilevelNet.

TPU-first details:
- `t` is a scalar inside a scan step, so time embeddings are computed once
  with batch 1 and broadcast against the (B, C) state embedding instead of
  being recomputed per sample (the reference expands t to the batch first).
- Dense layers use torch-compatible fan-in uniform init so training dynamics
  match the reference; last layers are zero-initialized per the configs.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sde_sampler_tpu.ops import mosaic_compat

_ACTIVATIONS: dict[str, Callable] = {
    # exact (erf) GELU: the reference's torch.nn.GELU default
    # (conf/model/base/fouriermlp.yaml) — keeps imported torch checkpoints
    # bit-comparable; jax.nn.gelu defaults to the tanh approximation.
    # Inside Mosaic kernel traces this transparently switches to a
    # polynomial erf (Mosaic has no erf lowering; see ops/mosaic_compat).
    "gelu": mosaic_compat.gelu_exact,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "sigmoid": jax.nn.sigmoid,
}


def get_activation(name) -> Callable:
    if callable(name):
        return name
    return _ACTIVATIONS[name]


def torch_fan_in_uniform(scale: float = 1.0):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias.

    This is torch.nn.Linear's default (kaiming_uniform with a=sqrt(5)).
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) == 2 else shape[-1]
        bound = scale / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _bias_fan_in_uniform(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def make_init(spec):
    """Build a flax initializer from a config spec.

    Accepts None (torch default), "zeros", or {"constant": value}.
    """
    if spec is None:
        return None
    if callable(spec):
        return spec
    if spec == "zeros":
        return nn.initializers.zeros_init()
    # linen freezes dict attributes, so accept any mapping
    if hasattr(spec, "get") and spec.get("constant") is not None:
        val = float(spec["constant"])
        return lambda key, shape, dtype=jnp.float32: jnp.full(shape, val, dtype)
    raise ValueError(f"Unknown initializer spec: {spec!r}")


class TorchLinear(nn.Module):
    """Dense layer with torch-default initialization."""

    features: int
    use_bias: bool = True
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel_init = self.kernel_init or torch_fan_in_uniform()
        bias_init = self.bias_init or _bias_fan_in_uniform(fan_in)
        kernel = self.param("kernel", kernel_init, (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias
        return y


def _as_t_batch(t) -> jnp.ndarray:
    """Normalize t to a (n, 1) column; scalars stay (1, 1) for broadcasting."""
    t = jnp.asarray(t, dtype=jnp.float32)
    t = t.reshape(-1, 1)
    return t


class TimeEmbed(nn.Module):
    """Sinusoidal time features (learned phase) followed by an MLP head."""

    dim_out: int
    num_layers: int = 2
    channels: int = 64
    activation: str | Callable = "gelu"
    last_bias_init: object = None
    last_weight_init: object = None

    @nn.compact
    def __call__(self, t, *args):
        act = get_activation(self.activation)
        t = _as_t_batch(t)
        if mosaic_compat.in_mosaic_trace():
            # Mosaic has no float-iota; integer iota + affine matches
            # jnp.linspace to ~2e-5 relative (fp32 rounding differences)
            idx = jax.lax.broadcasted_iota(
                jnp.int32, (1, self.channels), 1
            ).astype(jnp.float32)
            timestep_coeff = 0.1 + idx * ((100.0 - 0.1) / (self.channels - 1))
        else:
            timestep_coeff = jnp.linspace(0.1, 100, self.channels)[None, :]
        timestep_phase = self.param(
            "timestep_phase", nn.initializers.normal(1.0), (1, self.channels)
        )
        angle = timestep_coeff * t + timestep_phase
        embed = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=1)
        embed = act(TorchLinear(self.channels, name="hidden_0")(embed))
        for i in range(self.num_layers - 2):
            embed = act(TorchLinear(self.channels, name=f"hidden_{i + 1}")(embed))
        return TorchLinear(
            self.dim_out,
            kernel_init=make_init(self.last_weight_init),
            bias_init=make_init(self.last_bias_init),
            name="out",
        )(embed)


class FourierMLP(nn.Module):
    """Default control backbone: x-embed + t-embed summed, GELU MLP."""

    dim: int
    dim_out: int | None = None
    num_layers: int = 4
    channels: int = 64
    activation: str | Callable = "gelu"
    last_bias_init: object = None
    last_weight_init: object = None

    @nn.compact
    def __call__(self, t, x):
        act = get_activation(self.activation)
        embed_t = TimeEmbed(
            dim_out=self.channels,
            num_layers=2,
            channels=self.channels,
            activation=self.activation,
            name="timestep_embed",
        )(t)
        embed_x = TorchLinear(self.channels, name="input_embed")(x)
        # embed_t is (1, C) for scalar t and broadcasts over the batch.
        embed = embed_x + embed_t
        for i in range(self.num_layers - 2):
            embed = TorchLinear(self.channels, name=f"hidden_{i}")(act(embed))
        return TorchLinear(
            self.dim_out or self.dim,
            kernel_init=make_init(self.last_weight_init),
            bias_init=make_init(self.last_bias_init),
            name="out",
        )(act(embed))


class FeedForward(nn.Module):
    """Plain MLP on concat(t, x) with optional normalization layers."""

    dim: int
    arch: Sequence[int] = (64, 64)
    dim_out: int | None = None
    activation: str | Callable = "gelu"
    use_layernorm: bool = False
    last_bias_init: object = None
    last_weight_init: object = None

    @nn.compact
    def __call__(self, t, x):
        act = get_activation(self.activation)
        t = _as_t_batch(t)
        t = jnp.broadcast_to(t, (x.shape[0], 1))
        h = jnp.concatenate([t, x], axis=1)
        for i, width in enumerate(self.arch):
            h = act(
                TorchLinear(
                    width, use_bias=not self.use_layernorm, name=f"hidden_{i}"
                )(h)
            )
            if self.use_layernorm:
                h = nn.LayerNorm(name=f"norm_{i}")(h)
        return TorchLinear(
            self.dim_out or self.dim,
            kernel_init=make_init(self.last_weight_init),
            bias_init=make_init(self.last_bias_init),
            name="out",
        )(h)


class DenseNet(nn.Module):
    """Densely-concatenated MLP on concat(t, x)."""

    dim: int
    arch: Sequence[int] = (200, 200)
    dim_out: int | None = None
    activation: str | Callable = "relu"
    last_bias_init: object = None
    last_weight_init: object = None

    @nn.compact
    def __call__(self, t, x):
        act = get_activation(self.activation)
        t = _as_t_batch(t)
        t = jnp.broadcast_to(t, (x.shape[0], 1))
        h = jnp.concatenate([t, x], axis=1)
        for i, width in enumerate(self.arch):
            h = jnp.concatenate(
                [h, act(TorchLinear(width, name=f"hidden_{i}")(h))], axis=1
            )
        return TorchLinear(
            self.dim_out or self.dim,
            kernel_init=make_init(self.last_weight_init),
            bias_init=make_init(self.last_bias_init),
            name="out",
        )(h)


class LevelNet(nn.Module):
    """Single level of the multilevel architecture."""

    dim: int
    dim_embed: int
    level: int
    dim_out: int | None = None
    activation: str | Callable = "gelu"
    use_layernorm: bool = False
    last_bias_init: object = None
    last_weight_init: object = None

    @nn.compact
    def __call__(self, t, x, res_tensors=None):
        act = get_activation(self.activation)
        t = _as_t_batch(t)
        t = jnp.broadcast_to(t, (x.shape[0], 1))
        h = jnp.concatenate([t, x], axis=1)
        out_tensors = []
        # embed + inner layers drop their bias under normalization
        # (reference mlp.py:227-233: bias = normalization_factory is None);
        # the final projection always keeps it
        h = TorchLinear(
            self.dim_embed, use_bias=not self.use_layernorm, name="dense_0"
        )(h)
        n_inner = 2**self.level
        for i in range(n_inner):
            if self.use_layernorm:
                h = nn.LayerNorm(name=f"norm_{i}")(h)
            h = act(h)
            is_last = i == n_inner - 1
            width = (self.dim_out or self.dim) if is_last else self.dim_embed
            init_kwargs = {}
            if is_last:
                init_kwargs = dict(
                    kernel_init=make_init(self.last_weight_init),
                    bias_init=make_init(self.last_bias_init),
                )
            else:
                init_kwargs = dict(use_bias=not self.use_layernorm)
            h = TorchLinear(width, name=f"dense_{i + 1}", **init_kwargs)(h)
            if res_tensors is not None:
                h = h + res_tensors[i]
            if i % 2 or self.level == 0:
                out_tensors.append(h)
        return out_tensors


class MultilevelNet(nn.Module):
    """Multilevel residual network (reference mlp.py:264-304)."""

    dim: int
    dim_out: int | None = None
    factor: int = 5
    levels: int = 4
    activation: str | Callable = "gelu"
    use_layernorm: bool = False
    last_bias_init: object = None
    last_weight_init: object = None

    @nn.compact
    def __call__(self, t, x):
        res_tensors = None
        for level in reversed(range(self.levels)):
            res_tensors = LevelNet(
                dim=self.dim,
                dim_embed=self.factor * (self.dim + 1),
                level=level,
                dim_out=self.dim_out,
                activation=self.activation,
                use_layernorm=self.use_layernorm,
                last_bias_init=self.last_bias_init,
                last_weight_init=self.last_weight_init,
                name=f"level_{level}",
            )(t, x, res_tensors)
        assert res_tensors is not None
        return res_tensors[-1]
