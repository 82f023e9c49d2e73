"""Alanine-dipeptide Boltzmann target (60-d internal coordinates).

Capability parity with /root/reference/sde_sampler/distr/aladip.py: Boltzmann
density of alanine dipeptide in internal (z-matrix) coordinates with OpenMM
energies via the boltzgen TransformedBoltzmann(Parallel) stack, chirality
filtering of training samples, and Ramachandran / marginal evaluation plots
against a validation set.

TPU-native integration, two backends:

- ``backend="jax"`` (default resolution of "auto" when OpenMM is absent):
  a fully JAX-native stack — AMBER ff99SB-form vacuum energy
  (aladip_ff.py) composed with a clean-room internal-coordinate transform
  (aladip_transform.py). log-prob, score (exact autodiff — no host
  round-trip), filtering and Ramachandran plots all run inside jit on the
  TPU. This is strictly more capable than the reference's host-bound
  OpenMM evaluation for the vacuum environment.
- ``backend="openmm"``: reference-faithful OpenMM/boltzgen path; the
  energy enters the jitted rollout through `jax.pure_callback` (forward)
  and a `jax.custom_vjp` whose backward queries OpenMM forces through the
  same host bridge. Requires openmm/openmmtools/boltzgen (absent here).

The chirality filter is pure JAX in both backends (usable inside the loss
without any host callback). The (17, 26) default indices are dihedrals
around the N-CA axis in BOTH the boltzgen layout and this repo's
(aladip_transform.py) layout; for the jax backend the L/D discrimination
was verified empirically (L-form ensemble diff ~0 +/- 0.5, mirrored
D-form wraps to ~-4.3 — far past the 0.8 threshold).
"""
from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .base import DATA_DIR, Distribution

_Z_MATRIX_INTERNAL = [
    (0, [1, 4, 6]),
    (1, [4, 6, 8]),
    (2, [1, 4, 0]),
    (3, [1, 4, 0]),
    (4, [6, 8, 14]),
    (5, [4, 6, 8]),
    (7, [6, 8, 4]),
    (9, [8, 6, 4]),
    (10, [8, 6, 4]),
    (11, [10, 8, 6]),
    (12, [10, 8, 11]),
    (13, [10, 8, 11]),
    (15, [14, 8, 16]),
    (16, [14, 8, 6]),
    (17, [16, 14, 15]),
    (18, [16, 14, 8]),
    (19, [18, 16, 14]),
    (20, [18, 16, 19]),
    (21, [18, 16, 19]),
]
_CART_INDICES_INTERNAL = [8, 6, 14]

_Z_MATRIX_MIXED = [
    (0, [1, 4, 6]),
    (1, [4, 6, 8]),
    (2, [1, 4, 0]),
    (3, [1, 4, 0]),
    (4, [6, 8, 14]),
    (5, [4, 6, 8]),
    (7, [6, 8, 4]),
    (11, [10, 8, 6]),
    (12, [10, 8, 11]),
    (13, [10, 8, 11]),
    (15, [14, 8, 16]),
    (16, [14, 8, 6]),
    (17, [16, 14, 15]),
    (18, [16, 14, 8]),
    (19, [18, 16, 14]),
    (20, [18, 16, 19]),
    (21, [18, 16, 19]),
]
_CART_INDICES_MIXED = [6, 8, 9, 10, 14]


def filter_chirality(
    x: jnp.ndarray,
    ind: tuple = (17, 26),
    mean_diff: float = -0.043,
    threshold: float = 0.8,
) -> jnp.ndarray:
    """L-form filter on internal coordinates (reference aladip.py:411-436).

    Returns a (B, 1) boolean mask selecting samples whose wrapped dihedral
    difference is within `threshold` of the L-form mean.
    """
    raw = x[:, ind[0]] - x[:, ind[1]]
    diffs = jnp.stack([raw, raw + 2 * jnp.pi, raw - 2 * jnp.pi], axis=1)
    min_idx = jnp.abs(diffs).argmin(axis=1)
    diff = jnp.take_along_axis(diffs, min_idx[:, None], axis=1)[:, 0]
    return (jnp.abs(diff - mean_diff) < threshold)[:, None]


def make_host_log_prob_bridge(distr, torch_mod):
    """jax <-> torch host bridge for a Boltzmann-style distribution.

    `distr` needs `log_prob(torch.Tensor) -> torch.Tensor`; energies/forces
    are evaluated on host (OpenMM is CPU-only) and enter jitted rollouts via
    `jax.pure_callback`. The returned `log_prob_fn` carries a custom VJP
    whose backward queries host forces, so scores flow through jit/scan/
    grad; `score_fn` is the direct force callback.

    Factored out of AlaDip so the callback shapes and VJP semantics are
    testable without openmm/boltzgen (tests/test_aladip.py uses a torch
    Gaussian stand-in).
    """

    def _host_log_prob(x_np: np.ndarray) -> np.ndarray:
        x_t = torch_mod.from_numpy(np.asarray(x_np, dtype=np.float64))
        with torch_mod.no_grad():
            lp = distr.log_prob(x_t)
        return np.asarray(lp, dtype=np.float32).reshape(-1, 1)

    def _host_log_prob_grad(x_np: np.ndarray) -> np.ndarray:
        x_t = torch_mod.from_numpy(
            np.asarray(x_np, dtype=np.float64)
        ).requires_grad_(True)
        lp = distr.log_prob(x_t)
        (grad,) = torch_mod.autograd.grad(lp.sum(), x_t)
        return np.asarray(grad, dtype=np.float32)

    @jax.custom_vjp
    def log_prob_fn(x):
        return jax.pure_callback(
            _host_log_prob,
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
            x,
            vmap_method="sequential",
        )

    def fwd(x):
        return log_prob_fn(x), x

    def bwd(x, ct):
        grad = jax.pure_callback(
            _host_log_prob_grad,
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            x,
            vmap_method="sequential",
        )
        return (grad * ct,)

    log_prob_fn.defvjp(fwd, bwd)

    def score_fn(x):
        return jax.pure_callback(
            _host_log_prob_grad,
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            x,
            vmap_method="sequential",
        )

    return log_prob_fn, score_fn


class AlaDip(Distribution):
    def __init__(
        self,
        dim: int = 60,
        data_path: Path | str | None = DATA_DIR / "position_min_energy.npy",
        temperature: int = 1000,
        energy_cut: float = 1.0e8,
        energy_max: float = 1.0e20,
        n_threads: int = 4,
        transform: str = "internal",
        ind_circ_dih: list | None = None,
        shift_dih: bool = False,
        shift_dih_params: dict | None = None,
        default_std: dict | None = None,
        env: str = "vacuum",
        filter_chirality_train: bool = True,
        eval_data_path: Path | str | None = None,
        backend: str = "auto",
        **kwargs,
    ):
        if dim != 60:
            raise ValueError("`dim` needs to be 60.")
        super().__init__(dim=dim, **kwargs)
        self.filter_chirality_train = filter_chirality_train
        self.transform = transform
        self.temperature = temperature

        if backend not in ("auto", "openmm", "jax"):
            raise ValueError(f"Unknown AlaDip backend {backend}.")
        if backend == "auto":
            try:
                import openmm  # noqa: F401

                backend = "openmm"
            except ImportError:
                backend = "jax"
        self.backend = backend
        if backend == "jax":
            self._init_jax_backend(
                data_path=data_path,
                energy_cut=energy_cut,
                energy_max=energy_max,
                default_std=default_std,
                env=env,
                eval_data_path=eval_data_path,
            )
            return

        try:
            import boltzgen as bg
            import openmm
            import torch
            from openmmtools import testsystems
            from simtk import unit
        except ImportError as exc:  # pragma: no cover - optional deps
            raise ImportError(
                "AlaDip requires openmm, openmmtools, boltzgen and torch "
                "(reference README.md:180-181). Install them to use this "
                "target; they are not available in this environment."
            ) from exc

        self._torch = torch

        if self.transform == "internal":
            z_matrix, cart_indices = _Z_MATRIX_INTERNAL, _CART_INDICES_INTERNAL
        elif self.transform == "mixed":
            z_matrix, cart_indices = _Z_MATRIX_MIXED, _CART_INDICES_MIXED
        else:
            raise ValueError(f"Unknown transform {self.transform}.")

        if env == "vacuum":
            system = testsystems.AlanineDipeptideVacuum(constraints=None)
        elif env == "implicit":
            system = testsystems.AlanineDipeptideImplicit(constraints=None)
        else:
            raise NotImplementedError("This environment is not implemented.")
        sim = openmm.app.Simulation(
            system.topology,
            system.system,
            openmm.LangevinIntegrator(
                temperature * unit.kelvin,
                1.0 / unit.picosecond,
                1.0 * unit.femtosecond,
            ),
            openmm.Platform.getPlatformByName("Reference"),
        )

        if data_path is None:
            logging.info("Minimizing energy to initialize the transform.")
            sim.context.setPositions(system.positions)
            sim.minimizeEnergy()
            state = sim.context.getState(getPositions=True)
            position = state.getPositions(True).value_in_unit(unit.nanometer)
            transform_data = torch.tensor(
                position.reshape(1, 66).astype(np.float64)
            )
        else:
            data_path = Path(data_path)
            if data_path.suffix == ".npy":
                transform_data = torch.from_numpy(
                    np.load(data_path).astype(np.float64)
                )
            elif data_path.suffix == ".h5":
                import mdtraj as md

                traj = md.load(data_path)
                traj.center_coordinates()
                ind = traj.top.select("backbone")
                traj.superpose(traj, 0, atom_indices=ind, ref_atom_indices=ind)
                transform_data = torch.from_numpy(
                    traj.xyz.reshape(traj.xyz.shape[0], -1).astype("float64")
                )
            else:
                raise NotImplementedError(
                    "Loading data of this format is not implemented."
                )

        self.coordinate_transform = bg.flows.CoordinateTransform(
            transform_data,
            self.dim + 6,
            z_matrix,
            cart_indices,
            mode=self.transform,
            ind_circ_dih=ind_circ_dih or [],
            shift_dih=shift_dih,
            shift_dih_params=shift_dih_params or {"hist_bins": 100},
            default_std=default_std or {"bond": 0.005, "angle": 0.15, "dih": 0.2},
        )

        if n_threads > 1:
            self.distr = bg.distributions.TransformedBoltzmannParallel(
                system,
                temperature,
                energy_cut=energy_cut,
                energy_max=energy_max,
                transform=self.coordinate_transform,
                n_threads=n_threads,
            )
        else:
            self.distr = bg.distributions.TransformedBoltzmann(
                sim.context,
                temperature,
                energy_cut=energy_cut,
                energy_max=energy_max,
                transform=self.coordinate_transform,
            )

        self.eval_data = None
        if eval_data_path is not None and Path(eval_data_path).exists():
            loaded = torch.load(eval_data_path)
            self.eval_data = np.asarray(loaded.float().numpy())

        # jax <-> torch host bridge with custom VJP so scores flow through
        # the jitted rollouts (OpenMM computes forces on host threads).
        self._log_prob_fn, self._score_fn = make_host_log_prob_bridge(
            self.distr, torch
        )

    # -- JAX-native backend ---------------------------------------------------
    def _init_jax_backend(
        self, data_path, energy_cut, energy_max, default_std, env,
        eval_data_path,
    ):
        if env != "vacuum":
            raise ValueError(
                "backend='jax' implements the AMBER vacuum energy only "
                "(aladip_ff.py); env='implicit' (GBSA) needs "
                "backend='openmm'. Use target=aladip_vacuum or override "
                "target.env=vacuum."
            )
        from . import aladip_ff, aladip_transform

        if data_path is None or Path(data_path).suffix != ".npy":
            raise ValueError(
                "backend='jax' anchors the internal-coordinate transform "
                "on a .npy reference structure "
                "(data/position_min_energy.npy)."
            )
        ref = np.load(Path(data_path)).reshape(-1)
        self._tf = aladip_transform.AlaDipTransform(
            ref, default_std=default_std
        )
        # kT in kJ/mol (CODATA R in kJ/mol/K — OpenMM's convention)
        self._beta = 1.0 / (0.00831446261815324 * self.temperature)
        self._energy_cut = float(energy_cut)
        self._energy_max = float(energy_max)
        self._ff = aladip_ff

        self.eval_data = None
        if eval_data_path is not None and Path(eval_data_path).exists():
            self.eval_data = np.load(eval_data_path)
            eval_arr = jnp.asarray(self.eval_data)

            # Reference-set resampler: lets the generic eval pipeline
            # (metrics.compute sample_losses, Sinkhorn vs ground truth)
            # treat AlaDip like any sampleable target. Draws with
            # replacement from the ULA validation set
            # (scripts/gen_aladip_eval.py).
            def sample(key, shape):
                idx = jax.random.randint(
                    key, shape[:1], 0, eval_arr.shape[0]
                )
                return eval_arr[idx]

            self.sample = sample

        # kJ/mol per squared raw-unit domain violation: steep enough that
        # out-of-domain states (negative bonds, angles past pi) are
        # heavily suppressed, smooth enough that the score points back
        # into the domain (no nan/inf anywhere on R^60).
        penalty_k = 1.0e5

        def log_prob_fn(z):
            pos, logdet, violation = self._tf.forward_with_penalty(z)
            e = aladip_ff.regularize_energy(
                aladip_ff.energy_kj(pos), self._energy_cut,
                self._energy_max,
            )
            e = e + penalty_k * violation
            return (-self._beta * e + logdet)[..., None]

        self._log_prob_fn = log_prob_fn
        self._score_fn = None  # exact autodiff via the base-class fallback

    def phi_psi(self, samples: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Backbone (phi, psi) dihedrals in the standard IUPAC/mdtraj
        convention (reference uses mdtraj on host, aladip.py plots
        section).

        aladip_transform.dihedral uses a convention offset by pi from
        IUPAC (its b0 points 0->1; fine for the z-matrix, which only
        needs internal consistency — the committed eval set's z
        coordinates depend on it, so it must NOT change). The +pi wrap
        below maps to the standard convention: the committed minimized
        structure then reads (phi, psi) = (-146 deg, +150 deg) — the C5
        extended conformation, a known ff99-family vacuum minimum —
        making the Ramachandran plots comparable to published maps
        (round-5 fix; found by the basin-structure validation test)."""
        from .aladip_transform import dihedral

        pos, _ = self._tf.forward(jnp.asarray(samples))
        phi = dihedral(pos[..., 4, :], pos[..., 6, :], pos[..., 8, :],
                       pos[..., 14, :])
        psi = dihedral(pos[..., 6, :], pos[..., 8, :], pos[..., 14, :],
                       pos[..., 16, :])
        # (raw + pi) wrapped to [-pi, pi)  ==  mod(raw, 2pi) - pi
        pi = jnp.pi
        return jnp.mod(phi, 2 * pi) - pi, jnp.mod(psi, 2 * pi) - pi

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._log_prob_fn(x)

    def score(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        if self._score_fn is None:
            return super().score(x, **kwargs)
        return self._score_fn(x)

    def filter(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.filter_chirality_train:
            return filter_chirality(x)
        return jnp.ones((x.shape[0], 1), dtype=bool)

    # -- evaluation plots ---------------------------------------------------
    def _to_cartesian(self, z: np.ndarray, batch_size: int = 1000) -> np.ndarray:
        torch = self._torch
        out = []
        for i in range(0, len(z), batch_size):
            chunk = torch.from_numpy(
                np.asarray(z[i: i + batch_size], dtype=np.float64)
            )
            x, _ = self.coordinate_transform(chunk)
            out.append(np.asarray(x.detach()))
        return np.concatenate(out)

    def _plots_jax(self, samples) -> dict:
        """Ramachandran (+ marginals vs eval data when present) without any
        host MD library: dihedrals come from the JAX transform."""
        import matplotlib as mpl
        from matplotlib import pyplot as plt

        samples = np.asarray(samples)
        sets = [("prediction", samples)]
        if self.eval_data is not None:
            sets.append(("groundtruth", np.asarray(self.eval_data)))
        figures = {}
        for name, zs in sets:
            phi, psi = self.phi_psi(jnp.asarray(zs))
            fig, ax = plt.subplots(1, 1)
            ax.hist2d(
                np.asarray(phi), np.asarray(psi), bins=64,
                norm=mpl.colors.LogNorm(),
                range=[[-np.pi, np.pi], [-np.pi, np.pi]],
            )
            ax.set_xlabel(r"$\phi$")
            ax.set_ylabel(r"$\psi$")
            figures[f"plots/ramachandran_{name}"] = fig
        if self.eval_data is not None:
            fig, axes = plt.subplots(6, 10, figsize=(20, 12))
            for d in range(self.dim):
                ax = axes.flat[d]
                ax.hist(self.eval_data[:, d], bins=50, density=True,
                        alpha=0.5)
                ax.hist(samples[:, d], bins=50, density=True, alpha=0.5)
                ax.set_xticks([])
                ax.set_yticks([])
            figures["plots/marginals"] = fig
        return figures

    def plots(self, samples, batch_size: int = 1000) -> dict:
        """Ramachandran and marginal-histogram comparisons vs eval data."""
        if self.backend == "jax":
            return self._plots_jax(samples)
        if self.eval_data is None:
            return {}
        import matplotlib as mpl
        from matplotlib import pyplot as plt

        import mdtraj as md
        from openmmtools import testsystems

        samples = np.asarray(samples)
        x_eval = self._to_cartesian(self.eval_data, batch_size)
        x_samples = self._to_cartesian(samples, batch_size)

        topology = md.Topology.from_openmm(
            testsystems.AlanineDipeptideVacuum().topology
        )
        figures = {}
        for name, xs in [("groundtruth", x_eval), ("prediction", x_samples)]:
            traj = md.Trajectory(xs.reshape(-1, 22, 3), topology)
            phi = md.compute_phi(traj)[1].reshape(-1)
            psi = md.compute_psi(traj)[1].reshape(-1)
            fig, ax = plt.subplots(1, 1)
            ax.hist2d(
                phi, psi, bins=64, norm=mpl.colors.LogNorm(),
                range=[[-np.pi, np.pi], [-np.pi, np.pi]],
            )
            ax.set_xlabel(r"$\phi$")
            ax.set_ylabel(r"$\psi$")
            figures[f"plots/ramachandran_{name}"] = fig

        # marginal comparison over internal coordinates
        fig, axes = plt.subplots(6, 10, figsize=(20, 12))
        for d in range(self.dim):
            ax = axes.flat[d]
            ax.hist(self.eval_data[:, d], bins=50, density=True, alpha=0.5)
            ax.hist(samples[:, d], bins=50, density=True, alpha=0.5)
            ax.set_xticks([])
            ax.set_yticks([])
        figures["plots/marginals"] = fig
        return figures
