"""Torch-checkpoint import: reference-architecture torch nets converted to
flax params must reproduce outputs exactly.

The torch modules here re-create the reference's module/parameter naming
(reference models/mlp.py:43-125: timestep_phase, hidden_layer ModuleList,
out_layer, input_embed) so their state_dicts look exactly like a reference
checkpoint's `generative_ctrl` entries.
"""
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from sde_sampler_tpu.models.mlp import FourierMLP, TimeEmbed  # noqa: E402
from sde_sampler_tpu.utils.torch_import import (  # noqa: E402
    convert_state_dict,
    merge_params,
)

CH = 64


class RefTimeEmbed(nn.Module):
    def __init__(self, dim_out, channels=CH, num_layers=2):
        super().__init__()
        self.register_buffer(
            "timestep_coeff",
            torch.linspace(0.1, 100, channels).unsqueeze(0),
            persistent=False,
        )
        self.timestep_phase = nn.Parameter(torch.randn(1, channels))
        self.hidden_layer = nn.ModuleList(
            [nn.Linear(2 * channels, channels)]
            + [nn.Linear(channels, channels) for _ in range(num_layers - 2)]
        )
        self.out_layer = nn.Linear(channels, dim_out)

    def forward(self, t):
        t = t.view(-1, 1)
        angle = self.timestep_coeff * t + self.timestep_phase
        e = torch.cat([torch.sin(angle), torch.cos(angle)], dim=1)
        for layer in self.hidden_layer:
            e = torch.nn.functional.gelu(layer(e))
        return self.out_layer(e)


class RefFourierMLP(nn.Module):
    def __init__(self, dim, channels=CH, num_layers=4):
        super().__init__()
        self.input_embed = nn.Linear(dim, channels)
        self.timestep_embed = RefTimeEmbed(channels)
        self.hidden_layer = nn.ModuleList(
            nn.Linear(channels, channels) for _ in range(num_layers - 2)
        )
        self.out_layer = nn.Linear(channels, dim)

    def forward(self, t, x):
        t = t.view(-1, 1).expand(x.shape[0], 1)
        e = self.input_embed(x) + self.timestep_embed(t)
        for layer in self.hidden_layer:
            e = layer(torch.nn.functional.gelu(e))
        return self.out_layer(torch.nn.functional.gelu(e))


def test_fourier_mlp_conversion_matches_torch():
    dim = 7
    torch.manual_seed(0)
    ref = RefFourierMLP(dim)
    params = convert_state_dict(ref.state_dict())

    model = FourierMLP(dim=dim)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, dim)).astype(np.float32)
    t = 0.37
    with torch.no_grad():
        want = ref(torch.tensor(t), torch.from_numpy(x)).numpy()
    got = model.apply({"params": params}, jnp.asarray(t), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-6)


def test_time_embed_conversion_matches_torch():
    torch.manual_seed(2)
    ref = RefTimeEmbed(dim_out=1, num_layers=4)
    params = convert_state_dict(ref.state_dict())
    model = TimeEmbed(dim_out=1, num_layers=4)
    t = 0.81
    with torch.no_grad():
        want = ref(torch.tensor(t)).numpy()
    got = model.apply({"params": params}, jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-6)


def test_params_file_warm_start(tmp_path):
    """End to end: a reference-shaped ckpt converted by the import script
    loads through params_file= and lands (bitwise) in the train state."""
    from pathlib import Path

    from sde_sampler_tpu.utils.config import compose, locate

    torch.manual_seed(3)
    base = RefFourierMLP(10)
    score = RefTimeEmbed(dim_out=1, num_layers=4)  # conf/model/base/time_embed.yaml
    state = {
        **{f"base_model.{k}": v for k, v in base.state_dict().items()},
        **{f"score_model.{k}": v for k, v in score.state_dict().items()},
    }
    ckpt_pt = tmp_path / "ref_ckpt.pt"
    torch.save({"generative_ctrl": state, "n_steps": 123}, ckpt_pt)

    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "import_torch_ckpt",
        Path(__file__).parents[1] / "scripts" / "import_torch_ckpt.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_pkl = tmp_path / "converted.pkl"
    sys.argv = ["import_torch_ckpt", str(ckpt_pt), str(out_pkl)]
    mod.main()

    cfg = compose(
        Path(__file__).parents[1] / "conf",
        "base",
        [
            "target=funnel", "solver=dis", "train_batch_size=8",
            "train_timesteps.steps=4", "eval_init=False",
            "plot_results=False", "store_last_ckpt=False",
            f"params_file={out_pkl}", f"out_dir={tmp_path}",
        ],
    )
    solver = locate(cfg["solver"]["_target_"])(cfg)
    got = solver.train_state.params["generative_ctrl"]
    want = pickle.load(open(out_pkl, "rb"))["generative_ctrl"]
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: jnp.array_equal(jnp.asarray(a), jnp.asarray(b)),
            got, want,
        )
    )
    assert chex_equal

    # architecture mismatch is rejected with a clear error
    with pytest.raises(ValueError, match="does not match"):
        merge_params(
            {"generative_ctrl": {"w": jnp.zeros((2, 2))}},
            {"generative_ctrl": {"w": np.zeros((3, 3))}},
        )
