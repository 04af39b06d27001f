"""Independent NumPy oracle for the form calculus, built from sparse incidence
matrices.

This module is the correctness target for :mod:`supervillain_tpu.ops.calculus` (the
role /root/reference/supervillain/lattice/reference.py plays for the reference's numba
kernels), but it is implemented by a *different mechanism*: each operator is realized
as an explicit sparse matrix acting on flattened ``(C(D,p) * N^D,)`` vectors, with the
entries placed by direct coordinate arithmetic.  Matrix adjoints then give the duals
for free — ``delta`` is literally ``Dmat.T`` and ``face_sum`` is ``|coface|.T`` — so
agreement between the roll-based JAX operators and these matrices independently
verifies both the stencils *and* the adjointness structure.

Never optimize this module; it must stay obviously correct.
"""

from __future__ import annotations

from math import comb

import numpy as np
import scipy.sparse as sp

from .lattice import Lattice, _sorting_sign


def _site_index(lattice: Lattice, x: np.ndarray) -> int:
    """Row-major flat index of integer site coordinates (each taken mod N)."""
    idx = 0
    for k in range(lattice.D):
        idx = idx * lattice.N + (int(x[k]) % lattice.N)
    return idx


def _cell_index(lattice: Lattice, p: int, comp: tuple, x: np.ndarray) -> int:
    """Flat index of a p-cell: component-major over sites."""
    return lattice.comp_index[p][comp] * lattice.sites + _site_index(lattice, x)


def _all_sites(lattice: Lattice):
    return (np.array(x) for x in np.ndindex(*lattice.dims))


def d_matrix(lattice: Lattice, p: int) -> sp.csr_matrix:
    """Signed incidence matrix of the exterior derivative Ω^p → Ω^{p+1}.

    For every output (p+1)-cell O at x and every j-th direction o_j of O, the input
    (p-1)-face O\\{o_j} contributes ``(-1)^j`` at ``x + e_{o_j}`` and ``-(-1)^j`` at
    ``x`` (forward difference)."""
    D = lattice.D
    rows, cols, vals = [], [], []
    for O in lattice.components[p + 1]:
        for x in _all_sites(lattice):
            r = _cell_index(lattice, p + 1, O, x)
            for j, k_j in enumerate(O):
                M = tuple(k for k in O if k != k_j)
                sign = (-1) ** j
                x_fwd = x.copy()
                x_fwd[k_j] += 1
                rows += [r, r]
                cols += [_cell_index(lattice, p, M, x_fwd), _cell_index(lattice, p, M, x)]
                vals += [sign, -sign]
    n_out = comb(D, p + 1) * lattice.sites
    n_in = comb(D, p) * lattice.sites
    return sp.csr_matrix((vals, (rows, cols)), shape=(n_out, n_in))


def coface_matrix(lattice: Lattice, p: int) -> sp.csr_matrix:
    """Unsigned incidence matrix of coface_sum Ω^p → Ω^{p+1}: both endpoints +1."""
    D = lattice.D
    rows, cols, vals = [], [], []
    for O in lattice.components[p + 1]:
        for x in _all_sites(lattice):
            r = _cell_index(lattice, p + 1, O, x)
            for k_j in O:
                M = tuple(k for k in O if k != k_j)
                x_fwd = x.copy()
                x_fwd[k_j] += 1
                rows += [r, r]
                cols += [_cell_index(lattice, p, M, x_fwd), _cell_index(lattice, p, M, x)]
                vals += [1, 1]
    n_out = comb(D, p + 1) * lattice.sites
    n_in = comb(D, p) * lattice.sites
    return sp.csr_matrix((vals, (rows, cols)), shape=(n_out, n_in))


def _flat(lattice: Lattice, f) -> np.ndarray:
    return np.asarray(f).reshape(-1)


def _unflat(lattice: Lattice, p: int, v: np.ndarray):
    return v.reshape(lattice.form_shape(p))


def oracle_d(lattice: Lattice, p: int, f):
    if p == lattice.D:
        return np.zeros(())
    out = d_matrix(lattice, p) @ _flat(lattice, f)
    return _unflat(lattice, p + 1, out)


def oracle_delta(lattice: Lattice, p: int, f):
    """Adjoint of d under the componentwise inner product: ``delta = d_matrix.T``."""
    if p == 0:
        return np.zeros(())
    out = d_matrix(lattice, p - 1).T @ _flat(lattice, f)
    return _unflat(lattice, p - 1, out)


def oracle_face_sum(lattice: Lattice, p: int, f):
    """Adjoint of the unsigned coface incidence: ``face_sum = coface_matrix.T``."""
    if p == 0:
        return np.zeros(())
    out = coface_matrix(lattice, p - 1).T @ _flat(lattice, f)
    return _unflat(lattice, p - 1, out)


def oracle_coface_sum(lattice: Lattice, p: int, f):
    if p == lattice.D:
        return np.zeros(())
    out = coface_matrix(lattice, p) @ _flat(lattice, f)
    return _unflat(lattice, p + 1, out)


def oracle_laplacian(lattice: Lattice, p: int, f):
    """dδ + δd composed from the matrices (no shortcut stencil)."""
    D = lattice.D
    v = _flat(lattice, f)
    out = np.zeros_like(v)
    if p < D:
        Dm = d_matrix(lattice, p)
        out = out + Dm.T @ (Dm @ v)
    if p > 0:
        Dm = d_matrix(lattice, p - 1)
        out = out + Dm @ (Dm.T @ v)
    return _unflat(lattice, p, out)


def oracle_star(lattice: Lattice, p: int, f):
    """Hodge star by per-site coordinate arithmetic (no rolls)."""
    D = lattice.D
    f = np.asarray(f)
    out = np.zeros((comb(D, D - p),) + lattice.dims, dtype=f.dtype)
    for J in lattice.components[D - p]:
        I = tuple(k for k in range(D) if k not in set(J))
        sign = _sorting_sign(I + J)
        src = lattice.comp_index[p][I]
        dst = lattice.comp_index[D - p][J]
        for x in _all_sites(lattice):
            x_src = x.copy()
            for k in I:
                x_src[k] -= 1
            out[(dst, *tuple(x))] = sign * f[(src, *tuple(np.mod(x_src, lattice.N)))]
    return out


def oracle_wedge(lattice: Lattice, pa: int, a, pb: int, b):
    """Wedge product by per-site coordinate arithmetic (no rolls)."""
    from itertools import combinations as _comb
    D = lattice.D
    a = np.asarray(a)
    b = np.asarray(b)
    out = np.zeros((comb(D, pa + pb),) + lattice.dims, dtype=np.result_type(a.dtype, b.dtype))
    for O in lattice.components[pa + pb]:
        dst = lattice.comp_index[pa + pb][O]
        for A in _comb(O, pa):
            B = tuple(k for k in O if k not in A)
            sign = (-1) ** sum(1 for k in A for j in B if j < k)
            ia = lattice.comp_index[pa][A]
            ib = lattice.comp_index[pb][B]
            for x in _all_sites(lattice):
                x_b = x.copy()
                for k in A:
                    x_b[k] += 1
                out[(dst, *tuple(x))] += sign * a[(ia, *tuple(x))] * b[(ib, *tuple(np.mod(x_b, lattice.N)))]
    return out
