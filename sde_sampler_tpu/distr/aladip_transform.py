"""Internal-coordinate (z-matrix) transform for alanine dipeptide in JAX.

Clean-room TPU-native replacement for the boltzgen ``CoordinateTransform``
stack the reference builds in /root/reference/sde_sampler/distr/
aladip.py:173-183: maps the 60-d sampler space to 22x3 Cartesian nm
coordinates (66 dof minus 6 global translation/rotation dof fixed by a
canonical frame) and returns the log-Jacobian so Boltzmann log-probs
transform correctly. Everything is jnp + static Python loops over the
fixed 22-atom topology, so forward/inverse/logdet jit to straight-line
code and differentiate exactly.

Coordinate layout (this repo's convention; boltzgen orders differently,
which only permutes the sampler space):

    z[0]  bond   |x6 - x8|                (N-CA)
    z[1]  bond   |x14 - x8|               (C-CA)
    z[2]  angle  angle(6, 8, 14)
    z[3+3r .. 5+3r]  (bond, angle, dihedral) of Z_MATRIX row r

Canonical frame: atom 8 (CA) at the origin, atom 6 (N) on +x, atom 14
(C) in the xy half-plane with y > 0. NERF places every other atom from
its three references; the placement order is topologically sorted once
at import.

Normalization mirrors boltzgen's single-frame behavior: means come from
the reference structure's internal coordinates; stds are the per-type
``default_std`` {bond, angle, dih} (with one data frame the empirical
std is 0, so boltzgen substitutes these too). Dihedrals are wrapped to
the branch nearest their reference mean on the inverse pass.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# z-matrix rows (atom, [ref0, ref1, ref2]) — same connectivity the
# reference passes to boltzgen (aladip.py:63-88 there).
Z_MATRIX = [
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
FRAME = (8, 6, 14)  # origin, +x, xy-plane
N_ATOMS = 22
DIM = 3 + 3 * len(Z_MATRIX)  # 60


def _placement_order():
    placed = set(FRAME)
    order = []
    remaining = list(range(len(Z_MATRIX)))
    while remaining:
        progress = False
        for ridx in list(remaining):
            atom, refs = Z_MATRIX[ridx]
            if all(r in placed for r in refs):
                order.append(ridx)
                placed.add(atom)
                remaining.remove(ridx)
                progress = True
        if not progress:  # pragma: no cover - static topology
            raise ValueError(f"unplaceable z-matrix rows: {remaining}")
    return order


PLACEMENT_ORDER = _placement_order()


def _norm(v):
    # epsilon-guarded: degenerate frames (coincident/collinear reference
    # atoms, reachable from wild sampler states) must yield finite values
    # AND finite gradients — sqrt'(0) is the nan source otherwise
    return v / jnp.sqrt((v * v).sum(-1, keepdims=True) + 1e-20)


def bond_angle(a, b, c):
    """Angle at b between a and c, batched."""
    v1 = _norm(a - b)
    v2 = _norm(c - b)
    return jnp.arccos(jnp.clip((v1 * v2).sum(-1), -1.0 + 1e-9, 1.0 - 1e-9))


def dihedral(p0, p1, p2, p3):
    """Signed dihedral about p1-p2, (-pi, pi], batched; finite (arbitrary)
    angle with finite gradients on degenerate frames."""
    b0 = p1 - p0
    b1 = _norm(p2 - p1)
    b2 = p3 - p2
    v = b0 - (b0 * b1).sum(-1, keepdims=True) * b1
    w = b2 - (b2 * b1).sum(-1, keepdims=True) * b1
    x = (v * w).sum(-1)
    y = (jnp.cross(b1, v) * w).sum(-1)
    deg = (x * x + y * y) < 1e-24
    return jnp.arctan2(y, jnp.where(deg, 1e-12, x))


def _nerf(a, b, c, r, theta, phi):
    """Place x with |x-a|=r, angle(x,a,b)=theta, dihedral(x,a,b,c)=phi.

    All of a/b/c are (..., 3); r/theta/phi are (...,). Verified against
    `bond_angle`/`dihedral` by the roundtrip test.
    """
    e1 = _norm(b - a)
    p = c - b
    e2 = _norm(p - (p * e1).sum(-1, keepdims=True) * e1)
    e3 = jnp.cross(e1, e2)
    r = r[..., None]
    st = jnp.sin(theta)[..., None]
    # The -cos(phi) e2 component makes `dihedral(x, a, b, c)` measure
    # back exactly phi (phi = 0 puts x anti-periplanar to c, matching the
    # arctan2 sign convention above — verified by the roundtrip test).
    return a + r * (
        jnp.cos(theta)[..., None] * e1
        + st * (-jnp.cos(phi)[..., None]) * e2
        + st * jnp.sin(phi)[..., None] * e3
    )


def cartesian_to_internal(pos: jnp.ndarray) -> jnp.ndarray:
    """(..., 22, 3) nm -> (..., 60) raw internal coordinates."""
    def safe_dist(u, v):
        d = u - v
        return jnp.sqrt((d * d).sum(-1) + 1e-20)

    o, ax, pl = FRAME
    coords = [
        safe_dist(pos[..., ax, :], pos[..., o, :]),
        safe_dist(pos[..., pl, :], pos[..., o, :]),
        bond_angle(pos[..., ax, :], pos[..., o, :], pos[..., pl, :]),
    ]
    for atom, (r0, r1, r2) in Z_MATRIX:
        pa = pos[..., atom, :]
        p0, p1, p2 = pos[..., r0, :], pos[..., r1, :], pos[..., r2, :]
        coords.append(safe_dist(pa, p0))
        coords.append(bond_angle(pa, p0, p1))
        coords.append(dihedral(pa, p0, p1, p2))
    return jnp.stack(coords, axis=-1)


def internal_to_cartesian(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 60) raw internals -> ((..., 22, 3) nm, (...,) logdet).

    logdet = log|det d(cartesian)/d(internal)| on the 60-d quotient:
    log b2 for the in-plane frame atom + sum over z-rows of
    2 log r + log sin(theta) (the spherical volume element of each NERF
    placement).
    """
    batch = z.shape[:-1]
    b1, b2, ang = z[..., 0], z[..., 1], z[..., 2]
    zero = jnp.zeros(batch, z.dtype)
    pos = [None] * N_ATOMS
    o, ax, pl = FRAME
    pos[o] = jnp.stack([zero, zero, zero], axis=-1)
    pos[ax] = jnp.stack([b1, zero, zero], axis=-1)
    pos[pl] = jnp.stack(
        [b2 * jnp.cos(ang), b2 * jnp.sin(ang), zero], axis=-1
    )
    logdet = jnp.log(b2)
    for ridx in PLACEMENT_ORDER:
        atom, (r0, r1, r2) = Z_MATRIX[ridx]
        r = z[..., 3 + 3 * ridx]
        theta = z[..., 4 + 3 * ridx]
        phi = z[..., 5 + 3 * ridx]
        pos[atom] = _nerf(pos[r0], pos[r1], pos[r2], r, theta, phi)
        logdet = logdet + 2.0 * jnp.log(r) + jnp.log(jnp.sin(theta))
    return jnp.stack(pos, axis=-2), logdet


def coordinate_kinds() -> np.ndarray:
    """Per-coordinate kind: 0=bond, 1=angle, 2=dihedral (layout above)."""
    kinds = [0, 0, 1]
    for _ in Z_MATRIX:
        kinds += [0, 1, 2]
    return np.array(kinds, np.int64)


# Domain guards: internal coordinates live on (0, inf) x (0, pi) x circle,
# but the sampler explores all of R^60 (an untrained control's rollout WILL
# produce negative bonds / angles past pi, where log r and log sin(theta)
# are undefined). The geometry is built from clamped values and the
# squared violation is returned so the Boltzmann density can decay
# smoothly outside the domain with a well-defined score pointing back in.
R_MIN = 0.03          # nm; real bonds are ~0.10-0.15 nm
ANG_EPS = 0.05        # rad


def clamp_internals(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 60) raw internals -> (clamped internals, (...,) sq violation)."""
    kinds = jnp.asarray(coordinate_kinds())
    lo = jnp.where(kinds == 0, R_MIN,
                   jnp.where(kinds == 1, ANG_EPS, -jnp.inf))
    hi = jnp.where(kinds == 1, math.pi - ANG_EPS, jnp.inf)
    z_safe = jnp.clip(z, lo, hi)
    violation = ((z - z_safe) ** 2).sum(axis=-1)
    return z_safe, violation


class AlaDipTransform:
    """Normalized sampler space <-> Cartesian nm, anchored on a reference
    structure (data/position_min_energy.npy in practice)."""

    def __init__(
        self,
        ref_cartesian: np.ndarray,
        default_std: dict | None = None,
    ):
        default_std = default_std or {"bond": 0.005, "angle": 0.15,
                                      "dih": 0.2}
        ref = jnp.asarray(
            np.asarray(ref_cartesian, np.float64).reshape(N_ATOMS, 3)
        )
        self.mean = np.asarray(cartesian_to_internal(ref))
        kinds = coordinate_kinds()
        self.std = np.where(
            kinds == 0, default_std["bond"],
            np.where(kinds == 1, default_std["angle"], default_std["dih"]),
        )
        self.kinds = kinds
        self.logdet_norm = float(np.log(self.std).sum())

    def forward(self, z_norm: jnp.ndarray):
        """(..., 60) normalized -> ((..., 22, 3) nm, (...,) logdet incl.
        the denormalization term). Geometry built from domain-clamped
        internals (see clamp_internals); use forward_with_penalty when the
        caller needs the out-of-domain violation (Boltzmann log-probs)."""
        pos, logdet, _ = self.forward_with_penalty(z_norm)
        return pos, logdet

    def forward_with_penalty(self, z_norm: jnp.ndarray):
        """forward + the squared domain violation (raw units)."""
        z = z_norm * jnp.asarray(self.std) + jnp.asarray(self.mean)
        z_safe, violation = clamp_internals(z)
        pos, logdet = internal_to_cartesian(z_safe)
        return pos, logdet + self.logdet_norm, violation

    def inverse(self, pos: jnp.ndarray) -> jnp.ndarray:
        """(..., 22, 3) nm -> (..., 60) normalized; dihedrals wrapped to
        the branch nearest the reference mean."""
        z = cartesian_to_internal(pos)
        mean = jnp.asarray(self.mean)
        is_dih = jnp.asarray(self.kinds == 2)
        delta = z - mean
        wrapped = jnp.where(
            is_dih,
            (delta + math.pi) % (2.0 * math.pi) - math.pi,
            delta,
        )
        return wrapped / jnp.asarray(self.std)
