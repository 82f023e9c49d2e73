"""Generate a self-sampled evaluation set for the JAX-native AlaDip target.

The reference ships MD-simulated validation data for alanine dipeptide
(eval_data_path in /root/reference/sde_sampler/distr/aladip.py:202-210,
loaded from a torch pickle that is not in this image). This script
produces the equivalent reference set natively: long unadjusted Langevin
(ULA) chains on the JAX vacuum Boltzmann density in the normalized
internal-coordinate space (which the transform whitens, so a single step
size is well-conditioned across bonds/angles/dihedrals), with burn-in,
thinning, and L-form chirality filtering.

Caveat recorded with the data: ULA has O(dt) bias and phi/psi barrier
crossings at 300 K are rare, so this is a *self-consistent* reference for
Sinkhorn/marginal comparisons against the same energy — not ground-truth
MD. dt and chain counts chosen so the bonded marginals equilibrate and
multiple Ramachandran basins are populated from dispersed inits.

Usage: python scripts/gen_aladip_eval.py [--chains 4096] [--steps 20000]
       [--dt 0.01] [--out data/aladip_eval.npy]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from sde_sampler_tpu.utils.device import ensure_cpu_backend  # noqa: E402

ensure_cpu_backend()

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chains", type=int, default=4096)
    parser.add_argument("--steps", type=int, default=20000)
    parser.add_argument("--dt", type=float, default=0.01)
    parser.add_argument("--burn-frac", type=float, default=0.5)
    parser.add_argument("--thin", type=int, default=200)
    parser.add_argument("--init-scale", type=float, default=0.6)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--out", type=Path, default=REPO_ROOT / "data" / "aladip_eval.npy"
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from sde_sampler_tpu.distr.aladip import AlaDip, filter_chirality
    from sde_sampler_tpu.utils.device import host_device

    target = AlaDip(backend="jax", env="vacuum", temperature=300)
    score = jax.jit(target.score)

    # ALL eager PRNG/setup math on the host backend (CLAUDE.md: an eager
    # op on the tunneled TPU costs ~0.5-1.5 s), incl. the per-chunk keys
    # pre-split once up front; only the jitted chunk runs on the chip.
    n_chunks = args.steps // 100
    with host_device():
        key = jax.random.PRNGKey(args.seed)
        k_init, k_dih, k_noise = jax.random.split(key, 3)
        # bonds/angles: near the anchor (their marginals are unimodal);
        # dihedrals: UNIFORM over the circle so chains start in every
        # Ramachandran basin and relax locally — near-anchor inits never
        # cross the 300 K phi/psi barriers in 20k ULA steps. Normalized
        # dihedral units are rad / std (default_std dih = 0.2).
        import numpy as np_mod

        x = jax.random.normal(k_init, (args.chains, 60)) * args.init_scale
        kinds = target._tf.kinds  # 0=bond 1=angle 2=dihedral
        dih = jax.random.uniform(
            k_dih, (args.chains, 60), minval=-np_mod.pi, maxval=np_mod.pi
        ) / jnp.asarray(target._tf.std)
        x = jnp.where(jnp.asarray(kinds == 2), dih, x)
        chunk_keys = jax.random.split(k_noise, n_chunks)

    logp_mean = jax.jit(lambda xx: target.unnorm_log_prob(xx[:64]).mean())
    phi_psi = jax.jit(target.phi_psi)
    filt = jax.jit(filter_chirality)

    dt = args.dt
    n_steps = args.steps
    burn = int(n_steps * args.burn_frac)
    keep_every = args.thin

    @jax.jit
    def chunk(x, key, n=100):
        def body(carry, k):
            x = carry
            # steric-clash inits can give inf energy -> nan score; zero it
            # so the noise term walks the chain out of the singularity
            g = jnp.nan_to_num(jnp.clip(score(x), -1e3, 1e3))
            x = x + dt * g + jnp.sqrt(2.0 * dt) * jax.random.normal(
                k, x.shape
            )
            return x, None

        keys = jax.random.split(key, n)
        x, _ = jax.lax.scan(body, x, keys)
        # reset any chain that still diverged to a fresh near-anchor state
        k_reset = jax.random.fold_in(key, 7)
        fresh = jax.random.normal(k_reset, x.shape) * 0.3
        ok = jnp.isfinite(x).all(axis=-1, keepdims=True)
        return jnp.where(ok, x, fresh)

    kept = []
    t0 = time.time()
    for i in range(n_chunks):
        x = chunk(x, chunk_keys[i])
        step = (i + 1) * 100
        if step > burn and step % keep_every == 0:
            kept.append(np.asarray(x))
        if step % 2000 == 0:
            lp = float(logp_mean(x))  # jitted; float() = relay-safe sync
            print(
                f"step {step}/{n_steps} mean logp {lp:.1f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )

    samples = np.concatenate(kept, axis=0)
    mask = np.asarray(filt(jnp.asarray(samples)))[:, 0]
    l_frac = float(mask.mean())
    samples = samples[mask]
    phi, psi = phi_psi(jnp.asarray(samples[:50000]))
    print(
        f"kept {len(samples)} L-form samples (L fraction {l_frac:.3f}); "
        f"phi range [{float(phi.min()):.2f}, {float(phi.max()):.2f}]"
    )
    args.out.parent.mkdir(parents=True, exist_ok=True)
    # Atomic write: np.save is not atomic and a timeout/SIGKILL mid-write
    # would leave a truncated .npy that skip-if-exists gates then trust
    # forever (advisor r4). Write a sibling tmp and os.replace into place.
    tmp = args.out.with_name(args.out.stem + ".tmp.npy")
    np.save(tmp, samples.astype(np.float32))
    np.load(tmp, mmap_mode="r")  # sanity: parseable header before publish
    os.replace(tmp, args.out)
    print(f"wrote {args.out} shape {samples.shape}")


if __name__ == "__main__":
    main()
