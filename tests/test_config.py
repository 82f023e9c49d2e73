"""Config engine tests: composition, overrides, interpolation, instantiate."""
from pathlib import Path

import pytest

from sde_sampler_tpu.utils.config import (
    ConfigError,
    compose,
    instantiate,
    resolve_interpolations,
)

CONF = Path(__file__).parents[1] / "conf"


def test_quickstart_composition():
    cfg = compose(CONF, "base", ["target=dw_shift", "solver=basic_dis", "loss.method=lv"])
    assert cfg["loss"]["method"] == "lv"
    assert cfg["loss"]["_target_"].endswith("TimeReversalLoss")
    assert cfg["target"]["shift"] == 1.5
    assert cfg["train_steps"] == 10000
    assert cfg["generative_ctrl"]["_target_"].endswith("LerpCtrl")
    assert cfg["generative_ctrl"]["base_model"]["dim"] == 1
    assert cfg["prior"]["dim"] == 1


def test_group_and_value_overrides():
    cfg = compose(
        CONF, "base",
        ["target=funnel", "solver=pis", "optim.lr=0.001", "+extra.flag=3"],
    )
    assert cfg["solver"]["_target_"].endswith("PIS")
    assert cfg["prior"]["_target_"].endswith("Delta")
    assert cfg["optim"]["lr"] == 0.001
    assert cfg["extra"]["flag"] == 3
    # scale_loss uses the eval resolver with the target dim
    assert cfg["scale_loss"] == pytest.approx(1 / 10)


def test_override_into_interpolated_dict():
    """A dotted override into an interpolation-valued key materializes the
    aliased dict first (regression: `eval_timesteps.steps=400` when
    `eval_timesteps: ${train_timesteps}` clobbered the alias with a bare
    {steps: 400} dict, dropping _target_)."""
    cfg = compose(
        CONF, "base",
        ["target=funnel", "solver=dis", "eval_timesteps.steps=400"],
    )
    assert cfg["eval_timesteps"]["steps"] == 400
    assert "_target_" in cfg["eval_timesteps"]
    # the aliased source keeps its own value
    assert cfg["train_timesteps"]["steps"] == 200
    ts = instantiate(cfg["eval_timesteps"])()
    assert ts.shape[0] == 401


def test_eval_resolver_typing():
    cfg = compose(CONF, "base", ["solver=dis", "target=gmm"])
    # nested ${eval:"0.02**(100/${train_steps})"} must be a float
    assert isinstance(cfg["lr_scheduler"]["gamma"], float)
    assert isinstance(cfg["ema"]["update_after_step"], float | int)
    assert cfg["ema"]["update_after_step"] == cfg["train_steps"] - 1500


def test_number_coercion():
    cfg = compose(CONF, "base", ["solver=dis", "target=gmm"])
    assert isinstance(cfg["loss"]["max_rnd"], float)
    assert cfg["loss"]["max_rnd"] == 1e8


def test_dds_group_with_null_sde():
    cfg = compose(CONF, "base", ["solver=dds", "target=gmm"])
    assert "sde" not in cfg or not cfg.get("sde")
    assert cfg["train_timesteps"]["rescale_t"] == "cosine"
    assert cfg["prior"]["scale"] == cfg["loss"]["sigma"]


def test_instantiate_partial_and_nested():
    cfg = {
        "_target_": "sde_sampler_tpu.utils.common.get_timesteps",
        "_partial_": True,
        "start": 0.0,
        "end": 1.0,
        "steps": 10,
    }
    fn = instantiate(cfg)
    ts = fn()
    assert ts.shape == (11,)


def test_missing_group_option_errors():
    with pytest.raises(ConfigError):
        compose(CONF, "base", ["solver=does_not_exist"])


def test_interpolation_cycle_detection():
    cfg = {"a": "${b}", "b": "${a}"}
    with pytest.raises(ConfigError):
        resolve_interpolations(cfg)
