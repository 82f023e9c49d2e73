"""JAX-native AMBER vacuum energy for alanine dipeptide (ACE-ALA-NME).

The reference evaluates this target through OpenMM on host threads
(/root/reference/sde_sampler/distr/aladip.py:108-201 — openmmtools
``AlanineDipeptideVacuum`` + boltzgen ``TransformedBoltzmann``). OpenMM is
CPU-only and absent in this environment, so this module implements the
same physics natively in JAX: a fixed 22-atom topology with AMBER
ff99SB-form terms (harmonic bonds/angles, periodic torsions + impropers,
Lennard-Jones and Coulomb with the AMBER 1-4 scalings, no cutoff —
vacuum). Everything is jit/vmap/grad-compatible, so the Boltzmann score
is EXACT autodiff instead of a host force callback, and the energy can
run inside jitted rollouts on the TPU.

Parameter provenance: atom types/charges are the standard AMBER ff94/99
values for the capped alanine residue (identical across ff94→ff99SB);
bonded/LJ constants follow parm99 with the ff99SB backbone-dihedral
corrections (Hornak et al., Proteins 65:712, 2006). OpenMM is not
available here to cross-check numerically; the expected deviation from
an OpenMM AlanineDipeptideVacuum energy is limited to force-field
version details, not functional form. The minimum-energy structure
shipped with the reference (data/position_min_energy.npy) sits in a
local minimum of this energy too (tested in tests/test_aladip.py).

Geometry is in nm at the API boundary (matching OpenMM conventions and
data/position_min_energy.npy); energies are returned in kJ/mol.
Internally the bonded tables are the AMBER kcal/Å conventions, converted
once at import time.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

N_ATOMS = 22

# Atom order of openmmtools' AlanineDipeptideVacuum (and of
# data/position_min_energy.npy): ACE [HH31 CH3 HH32 HH33 C O],
# ALA [N H CA HA CB HB1 HB2 HB3 C O], NME [N H CH3 HH31 HH32 HH33].
ATOM_NAMES = [
    "HH31", "CH3", "HH32", "HH33", "C", "O",
    "N", "H", "CA", "HA", "CB", "HB1", "HB2", "HB3", "C", "O",
    "N", "H", "CH3", "HH31", "HH32", "HH33",
]
ATOM_TYPES = [
    "HC", "CT", "HC", "HC", "C", "O",
    "N", "H", "CT", "H1", "CT", "HC", "HC", "HC", "C", "O",
    "N", "H", "CT", "H1", "H1", "H1",
]
# AMBER ff94/ff99/ff99SB partial charges (e); each residue sums to 0.
CHARGES = [
    0.1123, -0.3662, 0.1123, 0.1123, 0.5972, -0.5679,
    -0.4157, 0.2719, 0.0337, 0.0823, -0.1825,
    0.0603, 0.0603, 0.0603, 0.5973, -0.5679,
    -0.4157, 0.2719, -0.1490, 0.0976, 0.0976, 0.0976,
]

BONDS = [
    (0, 1), (2, 1), (3, 1), (1, 4), (4, 5), (4, 6), (6, 7), (6, 8),
    (8, 9), (8, 10), (8, 14), (10, 11), (10, 12), (10, 13),
    (14, 15), (14, 16), (16, 17), (16, 18), (18, 19), (18, 20), (18, 21),
]

# parm99 bonded constants (kcal/mol/A^2, A) keyed by sorted type pair.
BOND_PARAMS = {
    ("CT", "HC"): (340.0, 1.090),
    ("CT", "H1"): (340.0, 1.090),
    ("CT", "CT"): (310.0, 1.526),
    ("C", "CT"): (317.0, 1.522),
    ("C", "O"): (570.0, 1.229),
    ("C", "N"): (490.0, 1.335),
    ("H", "N"): (434.0, 1.010),
    ("CT", "N"): (337.0, 1.449),
}

# parm99 angles (kcal/mol/rad^2, deg) keyed by (t_i, t_j, t_k) with the
# CENTER type second; stored with endpoints sorted for lookup.
ANGLE_PARAMS = {
    ("HC", "CT", "HC"): (35.0, 109.50),
    ("H1", "CT", "H1"): (35.0, 109.50),
    ("C", "CT", "HC"): (50.0, 109.50),
    ("C", "CT", "H1"): (50.0, 109.50),
    ("CT", "C", "O"): (80.0, 120.40),
    ("CT", "C", "N"): (70.0, 116.60),
    ("N", "C", "O"): (80.0, 122.90),
    ("C", "N", "CT"): (50.0, 121.90),
    ("C", "N", "H"): (50.0, 120.00),
    ("CT", "N", "H"): (38.0, 118.04),
    ("H1", "CT", "N"): (50.0, 109.50),
    ("CT", "CT", "N"): (80.0, 109.70),
    ("C", "CT", "N"): (63.0, 110.10),
    ("C", "CT", "CT"): (63.0, 111.10),
    ("CT", "CT", "HC"): (50.0, 109.50),
    ("CT", "CT", "H1"): (50.0, 109.50),
}

# Proper torsions: list of (k kcal/mol, periodicity, phase deg) PER PATH
# (generic parm99 entries are already divided by IDIVF here).
DIHEDRAL_GENERIC = {  # keyed by the two CENTER types, sorted
    ("C", "N"): [(10.0 / 4.0, 2, 180.0)],
    ("CT", "N"): [],  # X-CT-N-X is 0 in parm99 (ff99SB adds specifics)
    ("C", "CT"): [],  # X-C-CT-X is 0 in parm99
    ("CT", "CT"): [(1.40 / 9.0, 3, 0.0)],
}
# Specific quartets REPLACE the generic match (AMBER rule). ff99SB
# backbone corrections + the parm99 amide H-N-C-O term.
DIHEDRAL_SPECIFIC = {
    ("C", "N", "CT", "C"): [  # phi
        (0.27, 2, 0.0), (0.42, 3, 0.0),
    ],
    ("N", "CT", "C", "N"): [  # psi
        (0.45, 1, 180.0), (1.58, 2, 180.0), (0.55, 3, 180.0),
    ],
    ("CT", "CT", "N", "C"): [  # phi'
        (2.00, 1, 0.0), (2.00, 2, 0.0), (0.40, 3, 0.0),
    ],
    ("CT", "CT", "C", "N"): [  # psi'
        (0.20, 1, 0.0), (0.20, 2, 0.0), (0.40, 3, 0.0),
    ],
    ("H", "N", "C", "O"): [
        (2.00, 1, 0.0), (2.50, 2, 180.0),
    ],
}

# Impropers (k kcal/mol, periodicity, phase deg), centered on the THIRD
# atom (AMBER convention): keep the sp2 centers planar.
IMPROPERS = [
    ((1, 6, 4, 5), (10.5, 2, 180.0)),    # ACE carbonyl: X-X-C-O
    ((8, 16, 14, 15), (10.5, 2, 180.0)),  # ALA carbonyl: X-X-C-O
    ((4, 8, 6, 7), (1.0, 2, 180.0)),      # ALA amide:    X-X-N-H
    ((14, 18, 16, 17), (1.0, 2, 180.0)),  # NME amide:    X-X-N-H
]

# parm99 LJ: (rmin/2 in A, epsilon in kcal/mol) per type.
LJ_PARAMS = {
    "CT": (1.9080, 0.1094),
    "C": (1.9080, 0.0860),
    "N": (1.8240, 0.1700),
    "O": (1.6612, 0.2100),
    "H": (0.6000, 0.0157),
    "HC": (1.4870, 0.0157),
    "H1": (1.3870, 0.0157),
}

KCAL_TO_KJ = 4.184
NM_TO_A = 10.0
COULOMB_KCAL_A = 332.0637  # = ONE_4PI_EPS0 (OpenMM) in kcal*A/(mol*e^2)
SCEE = 1.2  # AMBER 1-4 electrostatic divider
SCNB = 2.0  # AMBER 1-4 LJ divider


def _derive_topology():
    """Angles, proper-dihedral paths, and nonbonded pair lists from BONDS."""
    adj = {i: set() for i in range(N_ATOMS)}
    for a, b in BONDS:
        adj[a].add(b)
        adj[b].add(a)

    angles = []
    for j in range(N_ATOMS):
        nbrs = sorted(adj[j])
        for ai in range(len(nbrs)):
            for ak in range(ai + 1, len(nbrs)):
                angles.append((nbrs[ai], j, nbrs[ak]))

    dihedrals = []
    for j, k in ((a, b) for a, b in BONDS):
        for i in sorted(adj[j] - {k}):
            for l in sorted(adj[k] - {j}):
                if i != l:
                    dihedrals.append((i, j, k, l))

    # exclusion classes: 1-2 and 1-3 fully excluded, 1-4 scaled
    excl = set()
    for a, b in BONDS:
        excl.add(tuple(sorted((a, b))))
    for i, j, k in angles:
        excl.add(tuple(sorted((i, k))))
    pairs14 = set()
    for i, _, _, l in dihedrals:
        p = tuple(sorted((i, l)))
        if p not in excl:
            pairs14.add(p)
    pairs_full = [
        (i, j)
        for i in range(N_ATOMS)
        for j in range(i + 1, N_ATOMS)
        if (i, j) not in excl and (i, j) not in pairs14
    ]
    return angles, dihedrals, sorted(pairs14), pairs_full


def _dihedral_terms(dihedrals):
    """(i,j,k,l, k_kcal, n, phase_rad) rows; specific quartets replace the
    generic wildcard entry, duplicate i-j-k-l paths through the same
    central bond each contribute (AMBER multi-path convention is already
    folded into the per-path generic constants)."""
    rows = []
    for i, j, k, l in dihedrals:
        ti, tj, tk, tl = (ATOM_TYPES[a] for a in (i, j, k, l))
        spec = DIHEDRAL_SPECIFIC.get((ti, tj, tk, tl)) or \
            DIHEDRAL_SPECIFIC.get((tl, tk, tj, ti))
        terms = spec if spec is not None else \
            DIHEDRAL_GENERIC[tuple(sorted((tj, tk)))]
        for kcal, n, phase in terms:
            rows.append((i, j, k, l, kcal, n, math.radians(phase)))
    return rows


def _build_tables():
    angles, dihedrals, pairs14, pairs_full = _derive_topology()

    bond_idx = np.array(BONDS, np.int32)
    bond_k, bond_r0 = [], []
    for a, b in BONDS:
        key = tuple(sorted((ATOM_TYPES[a], ATOM_TYPES[b])))
        k, r0 = BOND_PARAMS[key]
        bond_k.append(k * KCAL_TO_KJ * NM_TO_A**2)  # kJ/mol/nm^2
        bond_r0.append(r0 / NM_TO_A)  # nm

    ang_idx = np.array(angles, np.int32)
    ang_k, ang_t0 = [], []
    for i, j, k in angles:
        ti, tk = sorted((ATOM_TYPES[i], ATOM_TYPES[k]))
        kk, t0 = ANGLE_PARAMS[(ti, ATOM_TYPES[j], tk)]
        ang_k.append(kk * KCAL_TO_KJ)
        ang_t0.append(math.radians(t0))

    dih_rows = _dihedral_terms(dihedrals) + [
        (i, j, k, l, kcal, n, math.radians(phase))
        for (i, j, k, l), (kcal, n, phase) in IMPROPERS
    ]
    dih_idx = np.array([r[:4] for r in dih_rows], np.int32)
    dih_k = np.array([r[4] * KCAL_TO_KJ for r in dih_rows])
    dih_n = np.array([r[5] for r in dih_rows], np.float64)
    dih_phase = np.array([r[6] for r in dih_rows])

    rmin2 = np.array([LJ_PARAMS[t][0] / NM_TO_A for t in ATOM_TYPES])
    eps = np.array([LJ_PARAMS[t][1] * KCAL_TO_KJ for t in ATOM_TYPES])
    q = np.array(CHARGES)

    def _pair_tables(pairs, lj_scale, coul_scale):
        idx = np.array(pairs, np.int32).reshape(-1, 2)
        i, j = idx[:, 0], idx[:, 1]
        # Lorentz-Berthelot as AMBER applies it: rmin = rmin_i/2+rmin_j/2
        rmin = rmin2[i] + rmin2[j]
        e = np.sqrt(eps[i] * eps[j]) * lj_scale
        # rmin -> sigma for the 4*eps((s/r)^12-(s/r)^6) form
        sigma = rmin / 2.0 ** (1.0 / 6.0)
        qq = q[i] * q[j] * (COULOMB_KCAL_A * KCAL_TO_KJ / NM_TO_A) \
            * coul_scale
        return idx, sigma, e, qq

    return {
        "bond_idx": bond_idx,
        "bond_k": np.array(bond_k),
        "bond_r0": np.array(bond_r0),
        "ang_idx": ang_idx,
        "ang_k": np.array(ang_k),
        "ang_t0": np.array(ang_t0),
        "dih_idx": dih_idx,
        "dih_k": dih_k,
        "dih_n": dih_n,
        "dih_phase": dih_phase,
        "pair14": _pair_tables(pairs14, 1.0 / SCNB, 1.0 / SCEE),
        "pair": _pair_tables(pairs_full, 1.0, 1.0),
    }


_TABLES = _build_tables()


def dihedral_angle(p0, p1, p2, p3):
    """Signed dihedral about the p1-p2 axis, (-pi, pi]; batched over
    leading axes. Degenerate (collinear) frames give an arbitrary but
    FINITE angle with finite gradients (epsilon-guarded atan2 inputs)."""
    b0 = p1 - p0
    b1 = p2 - p1
    b2 = p3 - p2
    n1 = jnp.cross(b0, b1)
    n2 = jnp.cross(b1, b2)
    b1n = b1 / jnp.sqrt((b1 * b1).sum(-1, keepdims=True) + 1e-12)
    m1 = jnp.cross(n1, b1n)
    x = (n1 * n2).sum(-1)
    y = (m1 * n2).sum(-1)
    # atan2 grads blow up only at (0, 0); nudge x there (arbitrary angle
    # for a degenerate frame, but finite with finite gradients)
    deg = (x * x + y * y) < 1e-24
    return jnp.arctan2(y, jnp.where(deg, 1e-12, x))


# Gradient-safety epsilon: keeps every sqrt/normalize away from the
# r=0 singularity where autodiff produces nan (sqrt'(0) = inf * 0).
# Training rollouts DO visit near-coincident atoms (untrained controls);
# 1e-12 nm^2 shifts real geometries by < 1e-6 nm.
_EPS_SQ = 1e-12


def _safe_norm(v):
    return jnp.sqrt((v * v).sum(-1) + _EPS_SQ)


def energy_terms(pos: jnp.ndarray) -> dict:
    """Per-term AMBER vacuum energy decomposition in kJ/mol.

    pos: (..., 22, 3) in nm. Returns {"bond", "angle", "dihedral",
    "nb14", "nb"} — `energy_kj` is their sum. Exposed separately for the
    physics-validation tests (per-term magnitude sanity at the minimized
    structure; VERDICT r4: in-env mitigation for the missing OpenMM
    cross-check).

    All distance/angle math is epsilon-guarded so both the energy AND its
    gradient are finite for every input geometry (regularize_energy caps
    the value; this caps the derivative)."""
    t = _TABLES

    def gather(idx):
        return [pos[..., idx[:, c], :] for c in range(idx.shape[1])]

    # bonds
    a, b = gather(t["bond_idx"])
    r = _safe_norm(b - a)
    e_bond = (t["bond_k"] * (r - t["bond_r0"]) ** 2).sum(-1)

    # angles
    pi_, pj, pk = gather(t["ang_idx"])
    v1 = pi_ - pj
    v2 = pk - pj
    cos = (v1 * v2).sum(-1) / (_safe_norm(v1) * _safe_norm(v2))
    theta = jnp.arccos(jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7))
    e_ang = (t["ang_k"] * (theta - t["ang_t0"]) ** 2).sum(-1)

    # torsions + impropers (same functional form)
    p0, p1, p2, p3 = gather(t["dih_idx"])
    phi = dihedral_angle(p0, p1, p2, p3)
    e_dih = (
        t["dih_k"] * (1.0 + jnp.cos(t["dih_n"] * phi - t["dih_phase"]))
    ).sum(-1)

    def nb(tables):
        idx, sigma, eps, qq = tables
        ri, rj = pos[..., idx[:, 0], :], pos[..., idx[:, 1], :]
        diff = rj - ri
        d2 = (diff * diff).sum(-1) + _EPS_SQ
        # LJ straight from the squared distance (no sqrt in the 12-6 term)
        s6 = (sigma * sigma / d2) ** 3
        return (4.0 * eps * (s6 * s6 - s6) + qq / jnp.sqrt(d2)).sum(-1)

    return {
        "bond": e_bond,
        "angle": e_ang,
        "dihedral": e_dih,
        "nb14": nb(t["pair14"]),
        "nb": nb(t["pair"]),
    }


def energy_kj(pos: jnp.ndarray) -> jnp.ndarray:
    """AMBER vacuum energy in kJ/mol. pos: (..., 22, 3) in nm."""
    terms = energy_terms(pos)
    return (
        terms["bond"] + terms["angle"] + terms["dihedral"]
        + terms["nb14"] + terms["nb"]
    )


def regularize_energy(
    e: jnp.ndarray, energy_cut: float, energy_max: float
) -> jnp.ndarray:
    """Boltzgen-style high-energy regularization: linear below
    `energy_cut`, logarithmic damping above, hard cap at `energy_max`
    (reference distr/aladip.py energy_cut/energy_max constructor args;
    keeps untrained-control rollouts from producing inf log-probs)."""
    e = jnp.where(jnp.isfinite(e), e, energy_max)
    soft = energy_cut + jnp.log1p(jnp.maximum(e - energy_cut, 0.0))
    return jnp.minimum(jnp.where(e < energy_cut, e, soft), energy_max)
