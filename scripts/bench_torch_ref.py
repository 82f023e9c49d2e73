"""Measured torch-vs-JAX throughput baseline on identical (CPU) hardware.

The headline `vs_baseline` in bench.py compares against an *estimated* A100
PyTorch number (no GPU in this environment). This script adds a measured
datapoint: a minimal, freshly written PyTorch implementation of the
reference's DIS training iteration (per-EM-step Python loop, LV loss,
autograd through the per-step cost terms — the computation pattern of
reference losses/oc.py:156-230 + solver/base.py:399-454, with t expanded to
the batch as the reference's models do) timed against this repo's jitted
`lax.scan` train step, both on the same host CPU.

Config matches bench.py: funnel d=10 target, DIS (VP sde + LerpCtrl over a
FourierMLP), log-variance loss, batch/steps configurable.

Usage: python scripts/bench_torch_ref.py [--batch 2048] [--em-steps 200]
       [--iters 10]
Prints one JSON line with both numbers and the same-host speedup.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

# Keep everything on host silicon: this benchmark is a same-hardware
# comparison, the tunneled TPU must not be touched. The axon sitecustomize
# pre-imports jax at interpreter startup, so mutating JAX_PLATFORMS here is
# too late — jax.config.update is the reliable override (see conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import torch  # noqa: E402
from torch import nn  # noqa: E402

BETA_MIN, BETA_MAX, TERMINAL_T = 0.1, 10.0, 1.0  # conf/sde/vp_10.yaml
DIM = 10  # funnel


# --------------------------------------------------------------------------
# Torch re-implementation of the reference computation pattern
# --------------------------------------------------------------------------
class TorchTimeEmbed(nn.Module):
    """Sin/cos features over 64 log-spaced freqs + learned phase + MLP.

    Mirrors the reference TimeEmbed (models/mlp.py:43-82): t arrives as a
    (B, 1) column (the reference expands scalar t to the batch)."""

    def __init__(self, dim_out: int, channels: int = 64):
        super().__init__()
        self.register_buffer("coeff", torch.linspace(0.1, 100, channels)[None])
        self.phase = nn.Parameter(torch.randn(1, channels))
        self.net = nn.Sequential(
            nn.Linear(2 * channels, channels), nn.GELU(),
            nn.Linear(channels, dim_out),
        )

    def forward(self, t: torch.Tensor) -> torch.Tensor:
        angle = self.coeff * t + self.phase
        return self.net(torch.cat([torch.sin(angle), torch.cos(angle)], dim=1))


class TorchFourierMLP(nn.Module):
    """x-embed + t-embed summed, GELU MLP, zero-init last layer."""

    def __init__(self, dim: int, channels: int = 64, num_layers: int = 4):
        super().__init__()
        self.t_embed = TorchTimeEmbed(channels, channels)
        self.x_embed = nn.Linear(dim, channels)
        self.hidden = nn.ModuleList(
            nn.Linear(channels, channels) for _ in range(num_layers - 2)
        )
        self.out = nn.Linear(channels, dim)
        nn.init.zeros_(self.out.weight)
        nn.init.zeros_(self.out.bias)

    def forward(self, t: torch.Tensor, x: torch.Tensor) -> torch.Tensor:
        h = self.x_embed(x) + self.t_embed(t)
        for layer in self.hidden:
            h = layer(torch.nn.functional.gelu(h))
        return self.out(torch.nn.functional.gelu(h))


def funnel_unnorm_log_prob(x: torch.Tensor) -> torch.Tensor:
    """Neal's funnel, variance dim-1 (distr/funnel.py)."""
    first, other = x[:, :1], x[:, 1:]
    lp_first = -0.5 * first**2 / (DIM - 1) - 0.5 * math.log(
        2 * math.pi * (DIM - 1)
    )
    lp_other = (
        -0.5 * (other**2).sum(dim=1, keepdim=True) * torch.exp(-first)
        - 0.5 * (DIM - 1) * (first + math.log(2 * math.pi))
    )
    return lp_first + lp_other


def funnel_score(x: torch.Tensor) -> torch.Tensor:
    first, other = x[:, :1], x[:, 1:]
    e = torch.exp(-first)
    d_first = (
        -first / (DIM - 1)
        + 0.5 * (other**2).sum(dim=1, keepdim=True) * e
        - 0.5 * (DIM - 1)
    )
    return torch.cat([d_first, -other * e], dim=1)


def prior_score(x: torch.Tensor) -> torch.Tensor:
    return -x  # IsotropicGauss(scale=1)


def beta(s: float) -> float:
    # generative direction: schedule runs beta_max -> beta_min (eq/sdes.py VP)
    return BETA_MAX + (BETA_MIN - BETA_MAX) * s / TERMINAL_T


class LerpCtrlTorch(nn.Module):
    """u = clip(NN) + sigma * clip(lerp(prior, target score)) * t_net(t)."""

    def __init__(self, dim: int, clip: float = 10.0):
        super().__init__()
        self.base = TorchFourierMLP(dim)
        self.score_net = TorchTimeEmbed(1)
        nn.init.zeros_(self.score_net.net[-1].weight)
        nn.init.ones_(self.score_net.net[-1].bias)
        self.clip = clip

    def forward(self, t: torch.Tensor, x: torch.Tensor) -> torch.Tensor:
        ctrl = torch.clamp(self.base(t, x), -self.clip, self.clip)
        w = float(t.reshape(-1)[0]) / TERMINAL_T
        score = prior_score(x) + (funnel_score(x) - prior_score(x)) * w
        score = torch.clamp(score, -self.clip, self.clip)
        sigma = math.sqrt(beta(float(t.reshape(-1)[0])))
        return ctrl + sigma * score * self.score_net(t)


def torch_train_iteration(ctrl, opt, batch: int, em_steps: int):
    """One reference-style DIS/LV training iteration (per-step Python loop)."""
    x = torch.randn(batch, DIM)
    rnd = -0.5 * (x**2).sum(dim=1, keepdim=True) - 0.5 * DIM * math.log(
        2 * math.pi
    )
    ito = torch.zeros(batch, 1)
    dt = TERMINAL_T / em_steps
    sqrt_dt = math.sqrt(dt)
    for k in range(em_steps):
        s = k * dt
        t_col = torch.full((batch, 1), s)
        u = ctrl(t_col, x)
        u_det = u.detach()
        # LV running cost u·(u_sde − ½u) with u_sde = detached u
        rnd = rnd + (u * (u_det - 0.5 * u)).sum(dim=1, keepdim=True) * dt
        sigma = math.sqrt(beta(s))
        drift = -0.5 * beta(s) * x
        db = torch.randn(batch, DIM) * sqrt_dt
        x = (x + (drift + sigma * u_det) * dt + sigma * db).detach()
        ito = ito + (u * db).sum(dim=1, keepdim=True)
    rnd = rnd - funnel_unnorm_log_prob(x)
    loss = (rnd + ito).var()
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss)


def measure_torch(batch: int, em_steps: int, iters: int) -> float:
    torch.manual_seed(0)
    ctrl = LerpCtrlTorch(DIM)
    opt = torch.optim.Adam(ctrl.parameters(), lr=1e-3)
    for _ in range(2):
        torch_train_iteration(ctrl, opt, batch, em_steps)
    t0 = time.time()
    for _ in range(iters):
        torch_train_iteration(ctrl, opt, batch, em_steps)
    return em_steps * batch * iters / (time.time() - t0)


def measure_jax_cpu(batch: int, em_steps: int, iters: int) -> float:
    assert jax.default_backend() == "cpu", (
        "refusing to run the same-host baseline on the TPU: "
        f"{jax.default_backend()}"
    )

    from sde_sampler_tpu.utils.config import compose, locate

    cfg = compose(
        REPO_ROOT / "conf",
        "base",
        [
            "target=funnel", "solver=dis", "loss.method=lv",
            f"train_batch_size={batch}",
            f"train_timesteps.steps={em_steps}",
            "out_dir=/tmp/bench_torch_ref", "plot_results=False",
            "eval_init=False",
        ],
    )
    solver = locate(cfg["solver"]["_target_"])(cfg)
    for _ in range(2):
        metrics = solver.step()
    jax.block_until_ready(metrics["train/loss"])
    t0 = time.time()
    for _ in range(iters):
        metrics = solver.step()
    jax.block_until_ready(metrics["train/loss"])
    return em_steps * batch * iters / (time.time() - t0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=2048)
    parser.add_argument("--em-steps", type=int, default=200)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--skip-jax", action="store_true")
    args = parser.parse_args()

    torch.set_num_threads(os.cpu_count() or 1)
    torch_tput = measure_torch(args.batch, args.em_steps, args.iters)
    result = {
        "metric": "em_traj_throughput_samehost_cpu",
        "unit": "EM steps x batch / sec",
        "torch_reference_pattern": torch_tput,
        "batch": args.batch,
        "em_steps": args.em_steps,
        "threads": torch.get_num_threads(),
    }
    if not args.skip_jax:
        jax_tput = measure_jax_cpu(args.batch, args.em_steps, args.iters)
        result["jax_this_repo"] = jax_tput
        result["samehost_speedup"] = jax_tput / torch_tput
    print(json.dumps(result))


if __name__ == "__main__":
    main()
