"""Property-test battery for the form calculus (mirrors the reference's strategy,
/root/reference/test/test_lattice.py): algebraic identities, adjointness, and
agreement with the independent sparse-matrix oracle."""

from itertools import product

import numpy as np
import pytest

import jax.numpy as jnp

from supervillain_tpu.ops import (
    Lattice, d, delta, face_sum, coface_sum, laplacian, star, wedge, push, pull, inner,
)
from supervillain_tpu.ops import oracle as orc

GEOMETRIES = [(2, 3), (2, 4), (2, 5), (3, 3), (3, 4), (4, 3), (5, 3)]


def random_form(rng, L, p, integer=False):
    if integer:
        return jnp.asarray(rng.integers(-5, 6, L.form_shape(p)))
    return jnp.asarray(rng.normal(size=L.form_shape(p)))


def degrees(L):
    return range(L.D + 1)


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_d_squared_zero(D, N, rng):
    L = Lattice(D, N)
    for p in range(D - 1):
        f = random_form(rng, L, p)
        ddf = d(L, p + 1, d(L, p, f))
        assert np.allclose(np.asarray(ddf), 0, atol=1e-12)


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_delta_squared_zero(D, N, rng):
    L = Lattice(D, N)
    for p in range(2, D + 1):
        f = random_form(rng, L, p)
        ddf = delta(L, p - 1, delta(L, p, f))
        assert np.allclose(np.asarray(ddf), 0, atol=1e-12)


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_adjointness(D, N, rng):
    """⟨da, b⟩ = ⟨a, δb⟩ for a p-form a and (p+1)-form b."""
    L = Lattice(D, N)
    for p in range(D):
        a = random_form(rng, L, p)
        b = random_form(rng, L, p + 1)
        lhs = inner(d(L, p, a), b)
        rhs = inner(a, delta(L, p + 1, b))
        assert np.isclose(float(lhs), float(rhs), atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_matches_oracle(D, N, rng):
    """Roll-based JAX operators agree with the sparse-incidence-matrix oracle;
    bit-exact for integer forms."""
    L = Lattice(D, N)
    for p in degrees(L):
        for integer in (False, True):
            f = random_form(rng, L, p, integer=integer)
            fn = np.asarray(f)
            pairs = []
            if p < D:
                pairs.append((d(L, p, f), orc.oracle_d(L, p, fn)))
                pairs.append((coface_sum(L, p, f), orc.oracle_coface_sum(L, p, fn)))
            if p > 0:
                pairs.append((delta(L, p, f), orc.oracle_delta(L, p, fn)))
                pairs.append((face_sum(L, p, f), orc.oracle_face_sum(L, p, fn)))
            pairs.append((laplacian(L, p, f), orc.oracle_laplacian(L, p, fn)))
            for got, want in pairs:
                got = np.asarray(got)
                if integer:
                    assert np.issubdtype(got.dtype, np.integer)
                    assert (got == want).all()
                else:
                    assert np.allclose(got, want, atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_star_matches_oracle(D, N, rng):
    L = Lattice(D, N)
    for p in degrees(L):
        f = random_form(rng, L, p, integer=True)
        got = np.asarray(star(L, p, f))
        want = orc.oracle_star(L, p, np.asarray(f))
        assert (got == want).all()


@pytest.mark.parametrize('D,N', [(2, 3), (2, 4), (3, 3), (4, 3)])
def test_wedge_matches_oracle(D, N, rng):
    L = Lattice(D, N)
    for pa in degrees(L):
        for pb in range(0, D - pa + 1):
            a = random_form(rng, L, pa, integer=True)
            b = random_form(rng, L, pb, integer=True)
            got = np.asarray(wedge(L, pa, a, pb, b))
            want = orc.oracle_wedge(L, pa, np.asarray(a), pb, np.asarray(b))
            assert (got == want).all()


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_laplacian_is_d_delta_plus_delta_d(D, N, rng):
    L = Lattice(D, N)
    for p in degrees(L):
        f = random_form(rng, L, p)
        direct = laplacian(L, p, f)
        composed = jnp.zeros_like(f)
        if p < D:
            composed = composed + delta(L, p + 1, d(L, p, f))
        if p > 0:
            composed = composed + d(L, p - 1, delta(L, p, f))
        assert np.allclose(np.asarray(direct), np.asarray(composed), atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_laplacian_self_adjoint_positive(D, N, rng):
    L = Lattice(D, N)
    for p in degrees(L):
        a = random_form(rng, L, p)
        b = random_form(rng, L, p)
        assert np.isclose(float(inner(laplacian(L, p, a), b)),
                          float(inner(a, laplacian(L, p, b))), atol=1e-10)
        assert float(inner(laplacian(L, p, a), a)) >= -1e-10


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_laplacian_commutes_with_d(D, N, rng):
    L = Lattice(D, N)
    for p in range(D):
        f = random_form(rng, L, p)
        lhs = d(L, p, laplacian(L, p, f))
        rhs = laplacian(L, p + 1, d(L, p, f))
        assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_hodge_inner_product_identity(D, N, rng):
    """sum_x (a ∧ ★b)_top[x] = ⟨a, b⟩ for p-forms a, b."""
    L = Lattice(D, N)
    for p in degrees(L):
        a = random_form(rng, L, p)
        b = random_form(rng, L, p)
        top = wedge(L, p, a, D - p, star(L, p, b))
        assert np.isclose(float(jnp.sum(top)), float(inner(a, b)), atol=1e-8)


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_wedge_bilinear_and_graded_commutative(D, N, rng):
    L = Lattice(D, N)
    for pa in range(D + 1):
        for pb in range(0, D - pa + 1):
            a = random_form(rng, L, pa)
            a2 = random_form(rng, L, pa)
            b = random_form(rng, L, pb)
            lhs = wedge(L, pa, a + 2.0 * a2, pb, b)
            rhs = wedge(L, pa, a, pb, b) + 2.0 * wedge(L, pa, a2, pb, b)
            assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_push_pull_roundtrip(D, N, rng):
    L = Lattice(D, N)
    f = random_form(rng, L, 1)
    shift = tuple(int(s) for s in rng.integers(-N, N, D))
    assert np.allclose(np.asarray(pull(push(f, shift), shift)), np.asarray(f))
    # Periodicity: shifting by N in any direction is the identity.
    assert np.allclose(np.asarray(push(f, (N,) + (0,) * (D - 1))), np.asarray(f))


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_linearize_coordinatize_roundtrip(D, N, rng):
    L = Lattice(D, N)
    f = np.asarray(random_form(rng, L, 1))
    flat = L.linearize(f, dims=(-1,))
    assert flat.shape == (f.shape[0], L.sites)
    back = L.coordinatize(flat, dims=(-1,))
    assert np.allclose(back, f)


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_checkerboard_no_adjacent_same_color(D, N):
    """No two nearest-neighbor sites (periodic) share a color, and the colors
    partition the lattice."""
    L = Lattice(D, N)
    masks = L.checkerboard_masks
    total = np.zeros(L.dims, dtype=int)
    for m in masks:
        total += m.astype(int)
        for k in range(D):
            neighbor = np.roll(m, 1, axis=k)
            assert not (m & neighbor).any(), f'color clash along axis {k}'
    assert (total == 1).all()


@pytest.mark.parametrize('D,N', [(2, 3), (2, 4), (3, 3)])
def test_correlation_convolution_definitions(D, N, rng):
    """Fourier-accelerated correlation/convolution match the direct sums."""
    L = Lattice(D, N)
    f = np.asarray(rng.normal(size=L.dims))
    g = np.asarray(rng.normal(size=L.dims))

    conv = np.zeros(L.dims)
    corr = np.zeros(L.dims)
    for r in np.ndindex(*L.dims):
        cv = 0.0
        cr = 0.0
        for x in np.ndindex(*L.dims):
            xr = tuple((np.array(r) - np.array(x)) % N)
            xm = tuple((np.array(x) - np.array(r)) % N)
            cv += f[x] * g[xr]
            cr += f[x] * g[xm]
        conv[r] = cv
        corr[r] = cr / L.sites

    assert np.allclose(np.asarray(L.convolution(f, g)).real, conv, atol=1e-8)
    assert np.allclose(np.asarray(L.correlation(f, g)).real, corr, atol=1e-8)


def test_symmetrize_projects_and_is_idempotent(rng):
    L = Lattice(2, 4)
    c = np.asarray(rng.normal(size=L.dims))
    s = L.symmetrize(c)
    # Invariant under a 90° rotation-like signed permutation: transposition.
    assert np.allclose(s, s.T, atol=1e-12)
    # Invariant under reflection through the origin.
    refl = s[np.ix_(np.mod(-np.arange(4), 4), np.mod(-np.arange(4), 4))]
    assert np.allclose(s, refl, atol=1e-12)
    assert np.allclose(L.symmetrize(s), s, atol=1e-12)
    # Mean is preserved.
    assert np.isclose(s.mean(), c.mean())


def test_coords_fft_convention():
    L = Lattice(2, 5)
    assert list(L.coord_1d) == [0, 1, 2, -2, -1]
    L = Lattice(2, 4)
    assert list(L.coord_1d) == [0, 1, 2, -1]
    assert L.mod(np.array([5, -5])).tolist() == [1, -1]


def test_lattice_hashable_and_equal():
    assert Lattice(2, 5) == Lattice(2, 5)
    assert hash(Lattice(2, 5)) == hash(Lattice(2, 5))
    assert Lattice(2, 5) != Lattice(3, 5)


@pytest.mark.parametrize('D,N', [(2, 4), (2, 5), (2, 8), (3, 3), (3, 4), (4, 3)])
def test_sparse_operators_match_dense(D, N, rng):
    """delta_sparse/d_sparse/coface_sum_at/face_sum_at equal the dense operators
    applied to the equivalent sparse form (the reference's bit-exact guarantee)."""
    from supervillain_tpu.ops import delta_sparse, d_sparse, coface_sum_at, face_sum_at
    L = Lattice(D, N)
    color = L.checkerboarding[0]
    from math import comb
    # delta_sparse on a 2-form component
    comp = rng.integers(0, comb(D, 2))
    vals = rng.integers(-3, 4, len(color[0]))
    dense_t = np.zeros(L.form_shape(2), dtype=int)
    dense_t[(comp,) + tuple(color)] = vals
    want = np.asarray(delta(L, 2, jnp.asarray(dense_t)))
    got = np.asarray(delta_sparse(L, 2, comp, color, vals))
    assert (got == want).all()
    # accumulate into out
    out = np.ones(L.form_shape(1))
    delta_sparse(L, 2, comp, color, vals, out=out)
    assert np.allclose(out, 1 + want)
    # d_sparse on a 0-form
    vals0 = rng.integers(-3, 4, len(color[0]))
    dense_z = np.zeros(L.form_shape(0), dtype=int)
    dense_z[(0,) + tuple(color)] = vals0
    assert (np.asarray(d_sparse(L, 0, 0, color, vals0))
            == np.asarray(d(L, 0, jnp.asarray(dense_z)))).all()
    # gather variants
    f1 = jnp.asarray(rng.integers(-3, 4, L.form_shape(1)))
    co = np.asarray(coface_sum(L, 1, f1))
    assert (np.asarray(coface_sum_at(L, 1, f1, comp, color))
            == co[(comp,) + tuple(color)]).all()
    fa = np.asarray(face_sum(L, 1, f1))
    assert (np.asarray(face_sum_at(L, 1, f1, 0, color))
            == fa[(0,) + tuple(color)]).all()


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_laplacian_weitzenbock_identity(D, N, rng):
    """⟨Δf, f⟩ = ⟨df, df⟩ + ⟨δf, δf⟩ — the equality (not just positivity) that
    follows from adjointness applied to both halves of Δ = dδ + δd (mirrors
    /root/reference/test/test_lattice.py:397-404)."""
    L = Lattice(D, N)
    for p in degrees(L):
        f = random_form(rng, L, p)
        lhs = float(inner(laplacian(L, p, f), f))
        df = d(L, p, f)
        deltaf = delta(L, p, f)
        rhs = float(jnp.sum(df * df)) + float(jnp.sum(deltaf * deltaf))
        assert np.isclose(lhs, rhs, atol=1e-8 * L.sites)


@pytest.mark.parametrize('D,N', [(2, 3), (2, 4), (3, 3), (4, 3)])
def test_wedge_associative(D, N, rng):
    """(a∧b)∧c == a∧(b∧c) for all degree triples with n+m+q ≤ D (mirrors
    reference test_lattice.py:318-323)."""
    L = Lattice(D, N)
    for n in range(D + 1):
        for m in range(D + 1 - n):
            for q in range(D + 1 - n - m):
                a = random_form(rng, L, n)
                b = random_form(rng, L, m)
                c = random_form(rng, L, q)
                lhs = wedge(L, n + m, wedge(L, n, a, m, b), q, c)
                rhs = wedge(L, n, a, m + q, wedge(L, m, b, q, c))
                assert np.allclose(np.asarray(lhs), np.asarray(rhs))


@pytest.mark.parametrize('D,N', [(2, 3), (2, 4), (3, 3), (4, 3)])
def test_wedge_leibniz_rule(D, N, rng):
    """d(a∧b) = da∧b + (−1)^n a∧db for n+m+1 ≤ D (mirrors reference
    test_lattice.py:325-331)."""
    L = Lattice(D, N)
    for n in range(D):
        for m in range(D - n):
            a = random_form(rng, L, n)
            b = random_form(rng, L, m)
            lhs = d(L, n + m, wedge(L, n, a, m, b))
            rhs = wedge(L, n + 1, d(L, n, a), m, b) \
                + (-1) ** n * wedge(L, n, a, m + 1, d(L, m, b))
            assert np.allclose(np.asarray(lhs), np.asarray(rhs))


@pytest.mark.parametrize('D,N', [(2, 3), (2, 4), (3, 3), (4, 3)])
def test_star_star_is_signed_push(D, N, rng):
    """★★f = (−1)^{p(D−p)} push(f, 𝟙): the staggered star's alignment shifts
    compose to one step in every direction (reference test_lattice.py:257-264)."""
    L = Lattice(D, N)
    for p in degrees(L):
        f = random_form(rng, L, p)
        lhs = np.asarray(star(L, D - p, star(L, p, f)))
        rhs = (-1) ** (p * (D - p)) * np.asarray(push(f, (1,) * D))
        assert np.allclose(lhs, rhs)


@pytest.mark.parametrize('D,N', [(2, 3), (2, 4), (3, 3), (4, 3)])
def test_star_d_star_is_shifted_delta(D, N, rng):
    """★d★f = (−1)^{D(p−1)+1} push(δf, 𝟙) — the continuum δ = ±★d★ with the
    compact lattice's alignment shift (reference test_lattice.py:267-291)."""
    L = Lattice(D, N)
    for p in range(1, D + 1):
        f = random_form(rng, L, p)
        sign = (-1) ** (D * (p - 1) + 1)
        lhs = np.asarray(star(L, D - p + 1, d(L, D - p, star(L, p, f))))
        assert np.allclose(lhs, sign * np.asarray(push(delta(L, p, f), (1,) * D)))
        assert np.allclose(lhs, sign * np.asarray(delta(L, p, push(f, (1,) * D))))
