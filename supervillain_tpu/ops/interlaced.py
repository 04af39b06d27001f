"""Interlaced (2N)^D form representation — a second, independent encoding of the
form calculus used purely as a cross-validation target (the role of
/root/reference/supervillain/lattice/interlaced.py; production code never uses it).

A p-form component with direction set I lives at interlaced coordinates
``ξ_k = 2 x_k + [k ∈ I]``: even coordinates are site directions, odd coordinates are
the directions the cell spans.  All degrees coexist in one (2N)^D array, and the
exterior derivative/codifferential become *degree-independent* parity-masked
nearest-neighbor stencils:

    (dF)[ξ]  =  Σ_k [ξ_k odd]  s_k(ξ) (F[ξ+e_k] − F[ξ−e_k])
    (δF)[ξ]  =  Σ_k [ξ_k even] s_k(ξ) (F[ξ−e_k] − F[ξ+e_k])

with ``s_k(ξ) = (−1)^{#{j<k : ξ_j odd}}``; δ is the exact matrix adjoint of d by
construction.  Agreement of the compact roll-based operators with these via the
embedding is a representation-independent correctness check.
"""

from __future__ import annotations

import numpy as np

from .lattice import Lattice


def to_interlaced(lattice: Lattice, p: int, f) -> np.ndarray:
    """Embed a compact p-form (C(D,p), N, ..., N) into a (2N)^D interlaced array."""
    D, N = lattice.D, lattice.N
    f = np.asarray(f)
    out = np.zeros((2 * N,) * D, dtype=f.dtype)
    for comp, idx in lattice.comp_index[p].items():
        dirs = set(comp)
        slc = tuple(slice(1 if k in dirs else 0, None, 2) for k in range(D))
        out[slc] = f[idx]
    return out


def from_interlaced(lattice: Lattice, p: int, F) -> np.ndarray:
    """Extract the compact p-form from an interlaced (2N)^D array."""
    D = lattice.D
    F = np.asarray(F)
    out = np.zeros(lattice.form_shape(p), dtype=F.dtype)
    for comp, idx in lattice.comp_index[p].items():
        dirs = set(comp)
        slc = tuple(slice(1 if k in dirs else 0, None, 2) for k in range(D))
        out[idx] = F[slc]
    return out


def _parity_sign_masks(D: int, two_n: int):
    """odd_k masks and s_k sign arrays over the (2N)^D interlaced lattice."""
    coords = np.indices((two_n,) * D)
    odd = coords % 2 == 1
    signs = []
    for k in range(D):
        below = odd[:k].sum(axis=0)
        signs.append(np.where(below % 2 == 0, 1, -1))
    return odd, signs


def interlaced_d(D: int, F) -> np.ndarray:
    """Degree-independent exterior derivative on an interlaced array."""
    F = np.asarray(F)
    odd, signs = _parity_sign_masks(D, F.shape[0])
    out = np.zeros_like(F)
    for k in range(D):
        diff = np.roll(F, -1, axis=k) - np.roll(F, +1, axis=k)
        out = out + np.where(odd[k], signs[k] * diff, 0)
    return out


def interlaced_delta(D: int, F) -> np.ndarray:
    """Degree-independent codifferential (adjoint of :func:`interlaced_d`)."""
    F = np.asarray(F)
    odd, signs = _parity_sign_masks(D, F.shape[0])
    out = np.zeros_like(F)
    for k in range(D):
        diff = np.roll(F, +1, axis=k) - np.roll(F, -1, axis=k)
        out = out + np.where(~odd[k], signs[k] * diff, 0)
    return out


def interlaced_push(F, shift) -> np.ndarray:
    """Translate the interlaced array by one physical site per unit shift (two
    interlaced sites)."""
    out = np.asarray(F)
    for k, s in enumerate(shift):
        if s:
            out = np.roll(out, 2 * s, axis=k)
    return out


def interlaced_pull(F, shift) -> np.ndarray:
    """Inverse translation: ``pull(F, Δx) = push(F, -Δx)``."""
    return interlaced_push(F, tuple(-s for s in shift))


def interlaced_star(D: int, F) -> np.ndarray:
    """Degree-independent Hodge star on an interlaced array.

    In interlaced coordinates the compact star's component complement *and* its
    alignment shift collapse into one move: the J-cell at ξ reads the
    complementary I-cell at ξ − (1,...,1), so

        (★F)[ξ] = s(ξ) · F[ξ − 𝟙],   s(ξ) = σ(I ⌢ J) = (−1)^{#{(i,j): i∈I, j∈J, j<i}}

    with J = odd directions of ξ and I its complement.  A second, structurally
    different realization of the reference's star (compact.py:1360-1416).
    """
    F = np.asarray(F)
    coords = np.indices(F.shape)
    odd = coords % 2 == 1
    # inversions between I (even dirs) and J (odd dirs): Σ_{i∈I} #{j∈J : j < i}
    inv = np.zeros(F.shape, dtype=np.int64)
    odd_below = np.zeros(F.shape, dtype=np.int64)
    for k in range(D):
        inv = inv + np.where(~odd[k], odd_below, 0)
        odd_below = odd_below + odd[k].astype(np.int64)
    sign = np.where(inv % 2 == 0, 1, -1)
    shifted = F
    for k in range(D):
        shifted = np.roll(shifted, +1, axis=k)
    return sign * shifted


def interlaced_wedge(D: int, Fa, Fb) -> np.ndarray:
    """Degree-independent wedge product of interlaced arrays.

    For an output cell at ξ with odd set O, every split O = A ⊔ B contributes
    ``σ(A⌢B) Fa[ξ − 𝟙_B] · Fb[ξ + 𝟙_A]`` — the embedded images of a_A[x] and
    b_B[x + e_A].  Because a pure-degree embedding vanishes off its own cells,
    summing over *all* disjoint direction pairs (A, B) with a mask
    [odd(ξ) = A ∪ B] reproduces the compact wedge (compact.py:1423-1495)
    without ever consulting the operands' degrees.
    """
    from itertools import combinations
    Fa = np.asarray(Fa)
    Fb = np.asarray(Fb)
    coords = np.indices(Fa.shape)
    odd = coords % 2 == 1
    out = np.zeros(Fa.shape, dtype=np.promote_types(Fa.dtype, Fb.dtype))
    dirs = tuple(range(D))
    for r in range(D + 1):
        for union in combinations(dirs, r):
            mask = np.ones(Fa.shape, dtype=bool)
            for k in range(D):
                mask &= odd[k] if k in union else ~odd[k]
            for na in range(r + 1):
                for A in combinations(union, na):
                    B = tuple(k for k in union if k not in A)
                    inversions = sum(1 for i in A for j in B if j < i)
                    a_part = Fa
                    for k in B:
                        a_part = np.roll(a_part, +1, axis=k)
                    b_part = Fb
                    for k in A:
                        b_part = np.roll(b_part, -1, axis=k)
                    out = out + np.where(mask, (-1) ** inversions * a_part * b_part, 0)
    return out
