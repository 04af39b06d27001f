"""Dual-representation cross-validation: the compact roll-based calculus must agree
with the independent interlaced (2N)^D encoding operator by operator (mirrors
/root/reference/test/test_lattice_interlaced.py's strategy)."""

import numpy as np
import pytest
import jax.numpy as jnp

from supervillain_tpu.ops import Lattice, d, delta, push
from supervillain_tpu.ops import calculus
from supervillain_tpu.ops.interlaced import (
    to_interlaced, from_interlaced, interlaced_d, interlaced_delta, interlaced_push,
    interlaced_pull, interlaced_star, interlaced_wedge,
)

GEOMETRIES = [(2, 3), (2, 4), (2, 5), (3, 3), (3, 4), (4, 3), (5, 3)]


def random_form(rng, L, p):
    return rng.integers(-5, 6, L.form_shape(p))


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_embedding_roundtrip(D, N, rng):
    L = Lattice(D, N)
    for p in range(D + 1):
        f = random_form(rng, L, p)
        F = to_interlaced(L, p, f)
        assert F.shape == (2 * N,) * D
        assert (from_interlaced(L, p, F) == f).all()
        # Exactly C(D,p) N^D nonzero slots are used.
        assert np.count_nonzero(F) <= f.size


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_d_matches_interlaced(D, N, rng):
    L = Lattice(D, N)
    for p in range(D):
        f = random_form(rng, L, p)
        compact = np.asarray(d(L, p, jnp.asarray(f)))
        inter = from_interlaced(L, p + 1, interlaced_d(D, to_interlaced(L, p, f)))
        assert (compact == inter).all()


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_delta_matches_interlaced(D, N, rng):
    L = Lattice(D, N)
    for p in range(1, D + 1):
        f = random_form(rng, L, p)
        compact = np.asarray(delta(L, p, jnp.asarray(f)))
        inter = from_interlaced(L, p - 1, interlaced_delta(D, to_interlaced(L, p, f)))
        assert (compact == inter).all()


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_interlaced_d_squared_zero(D, N, rng):
    L = Lattice(D, N)
    f = random_form(rng, L, 0)
    F = to_interlaced(L, 0, f)
    assert (interlaced_d(D, interlaced_d(D, F)) == 0).all()


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_interlaced_adjointness(D, N, rng):
    """⟨dA, B⟩ = ⟨A, δB⟩ on whole interlaced arrays (all degrees at once)."""
    L = Lattice(D, N)
    A = rng.normal(size=(2 * N,) * D)
    B = rng.normal(size=(2 * N,) * D)
    lhs = np.sum(interlaced_d(D, A) * B)
    rhs = np.sum(A * interlaced_delta(D, B))
    assert np.isclose(lhs, rhs, atol=1e-9)


@pytest.mark.parametrize('D,N', [(2, 3), (2, 5), (3, 3), (3, 4), (4, 3)])
def test_push_matches_interlaced(D, N, rng):
    L = Lattice(D, N)
    f = random_form(rng, L, 1)
    shift = tuple(int(s) for s in rng.integers(-N, N, D))
    compact = np.asarray(push(jnp.asarray(f), shift))
    inter = from_interlaced(L, 1, interlaced_push(to_interlaced(L, 1, f), shift))
    assert (compact == inter).all()


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_star_matches_interlaced(D, N, rng):
    """Compact staggered star == the degree-independent all-axes-shift star of
    the interlaced encoding, for every degree (representation-independent
    cross-check, the role of reference interlaced.py:200-380)."""
    L = Lattice(D, N)
    for p in range(D + 1):
        f = random_form(rng, L, p)
        compact = np.asarray(calculus.star(L, p, jnp.asarray(f)))
        inter = interlaced_star(D, to_interlaced(L, p, f))
        assert (to_interlaced(L, D - p, compact) == inter).all()


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_wedge_matches_interlaced(D, N, rng):
    L = Lattice(D, N)
    for pa in range(D + 1):
        for pb in range(D + 1 - pa):
            a = random_form(rng, L, pa)
            b = random_form(rng, L, pb)
            compact = np.asarray(calculus.wedge(L, pa, jnp.asarray(a), pb, jnp.asarray(b)))
            inter = interlaced_wedge(D, to_interlaced(L, pa, a), to_interlaced(L, pb, b))
            assert (to_interlaced(L, pa + pb, compact) == inter).all()


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_pull_matches_interlaced(D, N, rng):
    L = Lattice(D, N)
    for p in (0, 1, D):
        f = random_form(rng, L, p)
        shift = tuple(int(s) for s in rng.integers(-N, N, D))
        compact = np.asarray(calculus.pull(jnp.asarray(f), shift))
        inter = interlaced_pull(to_interlaced(L, p, f), shift)
        assert (to_interlaced(L, p, compact) == inter).all()


@pytest.mark.parametrize('D,N', GEOMETRIES)
def test_interlaced_star_star_is_signed_push(D, N, rng):
    """★★ = (−1)^{p(D−p)} push(·, 𝟙) holds verbatim in the interlaced encoding."""
    L = Lattice(D, N)
    for p in range(D + 1):
        F = to_interlaced(L, p, random_form(rng, L, p))
        twice = interlaced_star(D, interlaced_star(D, F))
        sign = (-1) ** (p * (D - p))
        assert (twice == sign * interlaced_push(F, (1,) * D)).all()
