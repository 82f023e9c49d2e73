"""`loss.scan_unroll` is a pure scheduling knob: lax.scan(unroll=k) must not
change the computed loss (same body, same keys, same order)."""
from pathlib import Path

import jax

from sde_sampler_tpu.utils.config import compose, locate

CONF = Path(__file__).parents[1] / "conf"

TINY = [
    "solver=dis",
    "target=dw_shift",
    "train_steps=1",
    "train_batch_size=16",
    "train_timesteps.steps=12",
    "eval_batch_size=32",
    "eval_init=False",
    "plot_results=False",
    "store_last_ckpt=False",
    "~eval_sample_losses",
]


def _loss(tmp_path, unroll):
    overrides = TINY + [f"out_dir={tmp_path}/u{unroll}"]
    if unroll != 1:
        overrides.append(f"+loss.scan_unroll={unroll}")
    cfg = compose(CONF, "base", overrides)
    solver = locate(cfg["solver"]["_target_"])(cfg)
    clips = solver.current_clips()
    loss, _ = jax.jit(
        lambda p, k: solver.compute_loss_traced(p, k, clips)
    )(solver.train_state.params, jax.random.PRNGKey(42))
    return float(loss)


def test_unroll_matches_loop(tmp_path):
    base = _loss(tmp_path, 1)
    for unroll in (3, 4):
        assert _loss(tmp_path, unroll) == base
