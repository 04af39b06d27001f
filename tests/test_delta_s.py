"""The algebraic ΔS formulas used inside the generators must equal the full-action
difference S(new) - S(old) on constraint-preserving changes (mirrors
/root/reference/test/test_delta_s.py's strategy)."""

import numpy as np
import pytest
import jax.numpy as jnp

import supervillain_tpu as sv
from supervillain_tpu.ops import calculus as calc

GEOMETRIES = [(2, 4), (2, 5), (2, 8), (3, 3), (3, 4), (4, 3)]
KAPPAS = (0.4, 0.5, 0.6)


def random_fields_villain(rng, L):
    phi = jnp.asarray(rng.normal(size=L.form_shape(0)))
    n = jnp.asarray(rng.integers(-2, 3, L.form_shape(1)))
    return phi, n


def random_fields_worldline(rng, L):
    # Constraint-satisfying m: m = delta(t) for integer 2-form t.
    t = jnp.asarray(rng.integers(-2, 3, L.form_shape(2)))
    m = calc.delta(L, 2, t)
    v = jnp.asarray(rng.integers(-2, 3, L.form_shape(2)))
    return m, v


@pytest.mark.parametrize('D,N', GEOMETRIES)
@pytest.mark.parametrize('kappa', KAPPAS)
def test_site_delta_s(D, N, kappa, rng):
    """Δφ at one site: ΔS = Σ_ℓ (κ/2) dΔφ (2(dφ-2πn) + dΔφ)."""
    L = sv.Lattice(D, N)
    S = sv.Villain(L, kappa)
    phi, n = random_fields_villain(rng, L)
    change = jnp.zeros(L.form_shape(0)).at[(0,) + tuple(rng.integers(0, N, D))].set(rng.normal())
    r = calc.d(L, 0, phi) - 2 * np.pi * n
    cd = calc.d(L, 0, change)
    dS_alg = float(jnp.sum((S.kappa / 2) * cd * (2 * r + cd)))
    dS_full = float(S(phi + change, n) - S(phi, n))
    assert np.isclose(dS_alg, dS_full, atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
@pytest.mark.parametrize('kappa', KAPPAS)
@pytest.mark.parametrize('W', [1, 2])
def test_link_delta_s(D, N, kappa, W, rng):
    """Δn at one link: ΔS = -2πκ Δn (dφ - 2πn - πΔn)."""
    L = sv.Lattice(D, N)
    S = sv.Villain(L, kappa, W=W)
    phi, n = random_fields_villain(rng, L)
    idx = (rng.integers(0, D),) + tuple(rng.integers(0, N, D))
    dn = int(rng.choice([-2, -1, 1, 2]))
    change = jnp.zeros(L.form_shape(1), dtype=n.dtype).at[idx].set(dn)
    dphi = calc.d(L, 0, phi)
    dS_alg = float(jnp.sum(-2 * np.pi * S.kappa * change * (dphi - 2 * np.pi * n - np.pi * change)))
    dS_full = float(S(phi, n + change) - S(phi, n))
    assert np.isclose(dS_alg, dS_full, atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
@pytest.mark.parametrize('kappa', KAPPAS)
def test_exact_delta_s(D, N, kappa, rng):
    """Δn = dz preserves dn and ΔS matches the link formula."""
    L = sv.Lattice(D, N)
    S = sv.Villain(L, kappa, W=2)
    phi, n = random_fields_villain(rng, L)
    z = jnp.zeros(L.form_shape(0), dtype=n.dtype).at[(0,) + tuple(rng.integers(0, N, D))].set(1)
    change = calc.d(L, 0, z)
    assert (np.asarray(calc.d(L, 1, n + change)) == np.asarray(calc.d(L, 1, n))).all()
    dphi = calc.d(L, 0, phi)
    dS_alg = float(jnp.sum(-2 * np.pi * S.kappa * change * ((dphi - 2 * np.pi * n) - np.pi * change)))
    dS_full = float(S(phi, n + change) - S(phi, n))
    assert np.isclose(dS_alg, dS_full, atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
@pytest.mark.parametrize('kappa', KAPPAS)
@pytest.mark.parametrize('W', [1, 2])
def test_coexact_delta_s(D, N, kappa, W, rng):
    """Δm = δt keeps δm = 0 and ΔS = Σ (1/2κ) Δm (2(m - δv/W) + Δm)."""
    L = sv.Lattice(D, N)
    S = sv.Worldline(L, kappa, W=W)
    m, v = random_fields_worldline(rng, L)
    t = jnp.zeros(L.form_shape(2), dtype=m.dtype).at[
        (rng.integers(0, len(L.components[2])),) + tuple(rng.integers(0, N, D))].set(1)
    cm = calc.delta(L, 2, t)
    assert (np.asarray(calc.delta(L, 1, m + cm)) == 0).all()
    links = m - calc.delta(L, 2, v) / S._W
    dS_alg = float(jnp.sum((0.5 / S.kappa) * cm * (2 * links + cm)))
    dS_full = float(S(m + cm, v) - S(m, v))
    assert np.isclose(dS_alg, dS_full, atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
@pytest.mark.parametrize('kappa', KAPPAS)
@pytest.mark.parametrize('W', [1, 2])
def test_vortex_delta_s(D, N, kappa, W, rng):
    """Δv at one plaquette: ΔS = Σ (1/2κ)(-δΔv/W)(2(m - δv/W) - δΔv/W)."""
    L = sv.Lattice(D, N)
    S = sv.Worldline(L, kappa, W=W)
    m, v = random_fields_worldline(rng, L)
    change_v = jnp.zeros(L.form_shape(2), dtype=v.dtype).at[
        (rng.integers(0, len(L.components[2])),) + tuple(rng.integers(0, N, D))].set(1)
    cdv_W = calc.delta(L, 2, change_v) / S._W
    links = m - calc.delta(L, 2, v) / S._W
    dS_alg = float(jnp.sum((0.5 / S.kappa) * (-cdv_W) * (2 * links - cdv_W)))
    dS_full = float(S(m, v + change_v) - S(m, v))
    assert np.isclose(dS_alg, dS_full, atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
@pytest.mark.parametrize('kappa', KAPPAS)
def test_wrapping_delta_s(D, N, kappa, rng):
    """Δm on a whole torus cycle keeps δm = 0; ΔS = Σ_cycle (1/2κ) Δm (2 links + Δm)."""
    L = sv.Lattice(D, N)
    S = sv.Worldline(L, kappa, W=1)
    m, v = random_fields_worldline(rng, L)
    mu = int(rng.integers(0, D))
    change = np.zeros(L.form_shape(1), dtype=int)
    idx = tuple(slice(None) if i == mu else int(rng.integers(0, N)) for i in range(D))
    change[(mu,) + idx] = 1
    change = jnp.asarray(change)
    assert (np.asarray(calc.delta(L, 1, m + change)) == 0).all()
    links = m - calc.delta(L, 2, v) / S._W
    dS_alg = float(jnp.sum((0.5 / S.kappa) * change * (2 * links + change)))
    dS_full = float(S(m + change, v) - S(m, v))
    assert np.isclose(dS_alg, dS_full, atol=1e-10)


@pytest.mark.parametrize('kappa', KAPPAS)
@pytest.mark.parametrize('D,N', [(2, 5), (2, 8), (3, 3)])
def test_cohomology_delta_s(D, N, kappa, rng):
    """Adding h to n_mu on the slice x_mu = 0: d(Δn) = 0 and ΔS matches."""
    L = sv.Lattice(D, N)
    S = sv.Villain(L, kappa, W=2)
    phi, n = random_fields_villain(rng, L)
    h = 1
    change = np.zeros(L.form_shape(1), dtype=int)
    change[(0, 0) + (slice(None),) * (D - 1)] = h
    change = jnp.asarray(change)
    assert (np.asarray(calc.d(L, 1, change)) == 0).all()
    r = calc.d(L, 0, phi) - 2 * np.pi * n
    change_r = -2 * np.pi * change
    dS_alg = float(jnp.sum((S.kappa / 2) * change_r * (2 * r + change_r)))
    dS_full = float(S(phi, n + change) - S(phi, n))
    assert np.isclose(dS_alg, dS_full, atol=1e-10)


@pytest.mark.parametrize('D,N', GEOMETRIES)
@pytest.mark.parametrize('kappa', KAPPAS)
def test_exact_neighborhood_delta_s(D, N, kappa, rng):
    """The compound (Δφ, Δz) change with Δn = d(Δz): d(Δn) = 0 at any W (incl.
    W=∞) and ΔS = Σ_ℓ (κ/2) cr (2r + cr) with cr = d(Δφ − 2πΔz)."""
    L = sv.Lattice(D, N)
    S = sv.Villain(L, kappa, W=float('inf'))
    phi = jnp.asarray(rng.normal(size=L.form_shape(0)))
    z0 = jnp.asarray(rng.integers(-2, 3, L.form_shape(0)))
    n = calc.d(L, 0, z0)  # dn = 0 exactly: valid at W=inf
    assert S.valid({'n': n})

    site = (0,) + tuple(rng.integers(0, N, D))
    change_phi = jnp.zeros(L.form_shape(0)).at[site].set(rng.normal())
    change_z = jnp.zeros(L.form_shape(0), dtype=n.dtype).at[site].set(
        int(rng.choice([-2, -1, 1, 2])))
    change_n = calc.d(L, 0, change_z)
    assert (np.asarray(calc.d(L, 1, n + change_n)) == 0).all()

    r = calc.d(L, 0, phi) - 2 * np.pi * n
    cr = calc.d(L, 0, change_phi) - 2 * np.pi * change_n
    dS_alg = float(jnp.sum((S.kappa / 2) * cr * (2 * r + cr)))
    dS_full = float(S(phi + change_phi, n + change_n) - S(phi, n))
    assert np.isclose(dS_alg, dS_full, atol=1e-10)
