"""NICE flow certification tests.

The published 196-d NICE benchmark density cannot be reproduced here (no
MNIST in the image), so the flow math itself is certified against a torch
implementation with identical weights: same log_prob to 1e-5 and same
g(z) sampling transform (reference: /root/reference/sde_sampler/distr/
nice.py:43-212). Plus invertibility and checkpoint-determinism checks.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sde_sampler_tpu.distr import nice as nice_lib

torch = pytest.importorskip("torch")


def _build_torch_nice(in_out_dim, mid_dim, hidden, coupling, mask_config):
    """Minimal torch NICE mirroring the reference modules (additive
    couplings on even/odd interleaved halves + diagonal log-scaling,
    standard-logistic prior)."""
    import torch.nn as tnn

    class TorchCoupling(tnn.Module):
        def __init__(self, mask_config):
            super().__init__()
            self.mask_config = mask_config
            dims = (
                [(in_out_dim // 2, mid_dim)]
                + [(mid_dim, mid_dim)] * (hidden - 1)
                + [(mid_dim, in_out_dim // 2)]
            )
            self.layers = tnn.ModuleList(
                [tnn.Linear(i, o) for i, o in dims]
            )

        def forward(self, x, reverse=False):
            b, w = x.shape
            x = x.reshape(b, w // 2, 2)
            if self.mask_config:
                on, off = x[:, :, 0], x[:, :, 1]
            else:
                off, on = x[:, :, 0], x[:, :, 1]
            h = off
            for layer in self.layers[:-1]:
                h = torch.relu(layer(h))
            shift = self.layers[-1](h)
            on = on - shift if reverse else on + shift
            if self.mask_config:
                x = torch.stack((on, off), dim=2)
            else:
                x = torch.stack((off, on), dim=2)
            return x.reshape(b, w)

    class TorchNice(tnn.Module):
        def __init__(self):
            super().__init__()
            self.couplings = tnn.ModuleList(
                [TorchCoupling((mask_config + i) % 2) for i in range(coupling)]
            )
            self.scale = tnn.Parameter(torch.zeros(1, in_out_dim))

        def f(self, x):
            for c in self.couplings:
                x = c(x)
            return x * torch.exp(self.scale), self.scale.sum()

        def g(self, z):
            x = z * torch.exp(-self.scale)
            for c in reversed(self.couplings):
                x = c(x, reverse=True)
            return x

        def log_prob(self, x):
            z, log_det = self.f(x)
            prior_ll = -(
                tnn.functional.softplus(z) + tnn.functional.softplus(-z)
            ).sum(dim=1)
            return prior_ll + log_det

    return TorchNice()


def _copy_params_to_torch(params, model):
    with torch.no_grad():
        for mlp, tc in zip(params["couplings"], model.couplings):
            for layer, tl in zip(mlp, tc.layers):
                tl.weight.copy_(torch.from_numpy(np.asarray(layer["w"]).T))
                tl.bias.copy_(torch.from_numpy(np.asarray(layer["b"])))
        model.scale.copy_(torch.from_numpy(np.asarray(params["scale"])))


@pytest.fixture(scope="module")
def flows():
    in_out_dim, mid_dim, hidden, coupling, mask_config = 12, 32, 3, 4, 1
    params = nice_lib.init_nice_params(
        jax.random.PRNGKey(7),
        in_out_dim=in_out_dim,
        mid_dim=mid_dim,
        hidden=hidden,
        coupling=coupling,
    )
    # Non-trivial scaling so the log-det term is exercised
    params = dict(
        params,
        scale=0.1
        * jax.random.normal(jax.random.PRNGKey(8), (1, in_out_dim)),
    )
    model = _build_torch_nice(in_out_dim, mid_dim, hidden, coupling, mask_config)
    _copy_params_to_torch(params, model)
    return params, model, in_out_dim, mask_config


def test_log_prob_matches_torch(flows):
    params, model, dim, mask_config = flows
    x = np.random.default_rng(0).normal(size=(64, dim)).astype("float32")
    jax_lp = np.asarray(nice_lib.nice_log_prob(params, jnp.asarray(x), mask_config))
    with torch.no_grad():
        torch_lp = model.log_prob(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(jax_lp, torch_lp, rtol=1e-5, atol=1e-5)


def test_sampling_transform_matches_torch(flows):
    params, model, dim, mask_config = flows
    z = np.random.default_rng(1).logistic(size=(32, dim)).astype("float32")
    jax_x = np.asarray(nice_lib.nice_g(params, jnp.asarray(z), mask_config))
    with torch.no_grad():
        torch_x = model.g(torch.from_numpy(z)).numpy()
    np.testing.assert_allclose(jax_x, torch_x, rtol=1e-5, atol=1e-5)


def test_flow_invertible(flows):
    params, _, dim, mask_config = flows
    x = jnp.asarray(np.random.default_rng(2).normal(size=(16, dim)), jnp.float32)
    z, _ = nice_lib.nice_f(params, x, mask_config)
    x_rec = nice_lib.nice_g(params, z, mask_config)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, flows):
    params, _, dim, mask_config = flows
    path = tmp_path / "nice.npz"
    nice_lib.save_nice_checkpoint(
        path,
        params,
        {
            "in_out_dim": dim,
            "mid_dim": 32,
            "hidden": 3,
            "coupling": 4,
            "mask_config": mask_config,
        },
    )
    loaded, meta = nice_lib.load_nice_checkpoint(path)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(8, dim)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(nice_lib.nice_log_prob(loaded, x, mask_config)),
        np.asarray(nice_lib.nice_log_prob(params, x, mask_config)),
    )
    assert int(meta["mask_config"]) == mask_config
