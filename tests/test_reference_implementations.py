"""Fast implementations vs slow oracles: numerical equality for observables
(mirrors /root/reference/test/test_compare-reference-observables.py) and statistical
agreement for generators."""

import numpy as np
import pytest

import supervillain_tpu as sv
from supervillain_tpu.generators import villain as gv, worldline as gw
from supervillain_tpu.generators.reference_implementation import (
    NeighborhoodUpdateSlow, VillainClassicWormSlow, WorldlineClassicWormSlow,
)


@pytest.fixture(scope='module')
def villain_ensemble():
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=2)
    return sv.Ensemble(S).generate(12, gv.Hammer(S), seed=41).cut(4)


@pytest.fixture(scope='module')
def worldline_ensemble():
    S = sv.Worldline(sv.Lattice2D(4), 0.5, W=2)
    return sv.Ensemble(S).generate(12, gw.Hammer(S), seed=42).cut(4)


def fresh(e, drop):
    e2 = sv.Ensemble(e.Action).from_configurations(e.configuration[:])
    for name in drop:
        if name in e2.configuration.fields:
            del e2.configuration.fields[name]
    return e2


def test_spin_spin_fast_equals_slow(worldline_ensemble):
    e = fresh(worldline_ensemble, ('Spin_Spin',))
    fast = np.asarray(e.Spin_Spin)
    slow = np.asarray(e.Spin_SpinSlow)
    assert np.allclose(fast, slow, atol=1e-10)


def test_vortex_vortex_fast_equals_slow(villain_ensemble):
    e = fresh(villain_ensemble, ('Vortex_Vortex',))
    fast = np.asarray(e.Vortex_Vortex)
    slow = np.asarray(e.Vortex_VortexSlow)
    assert np.allclose(fast, slow, atol=1e-8)


def test_neighborhood_slow_runs_and_matches_statistically():
    """The vectorized NeighborhoodUpdate and the full-action single-site oracle
    sample the same distribution: ⟨ActionDensity⟩ agree within combined errors."""
    S = sv.Villain(sv.Lattice2D(4), 0.2, W=1)
    fast = sv.Ensemble(S).generate(1000, gv.NeighborhoodUpdate(S), seed=51).cut(200)
    slow = sv.Ensemble(S).generate(500, NeighborhoodUpdateSlow(
        S, rng=np.random.default_rng(52)), start='cold').cut(100)
    for i in range(0, len(slow), 50):
        assert S.valid({'n': slow.n[i]})
    bf = sv.Bootstrap(fast.every(4), draws=100, seed=1)
    bs = sv.Bootstrap(slow.every(4), draws=100, seed=2)
    mf, ef = bf.estimate('ActionDensity')
    ms, es = bs.estimate('ActionDensity')
    pull = abs(mf - ms) / np.hypot(ef, es)
    assert pull < 5, f'fast {mf}({ef}) vs slow {ms}({es}): pull {pull}'


def test_worldline_worm_slow_matches_statistically():
    S = sv.Worldline(sv.Lattice2D(4), 0.5, W=1)
    fast = sv.Ensemble(S).generate(400, gw.ClassicWorm(S), seed=61).cut(100)
    slow = sv.Ensemble(S).generate(400, WorldlineClassicWormSlow(
        S, rng=np.random.default_rng(62)), start='cold').cut(100)
    for i in range(0, len(slow), 100):
        assert S.valid({'m': slow.m[i]})
    bf = sv.Bootstrap(fast.every(3), draws=100, seed=1)
    bs = sv.Bootstrap(slow.every(3), draws=100, seed=2)
    mf, ef = bf.estimate('ActionDensity')
    ms, es = bs.estimate('ActionDensity')
    pull = abs(mf - ms) / np.hypot(ef, es)
    assert pull < 5, f'fast {mf}({ef}) vs slow {ms}({es}): pull {pull}'
    # Worm lengths agree too.
    wf = np.asarray(fast.configuration.fields['Worm_Length']).mean()
    ws = np.asarray(slow.configuration.fields['Worm_Length']).mean()
    nf = len(fast)
    assert abs(wf - ws) / (0.5 * (wf + ws)) < 0.5, (wf, ws)


def test_villain_worm_slow_matches_statistically():
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=2)
    seq_fast = sv.Ensemble(S).generate(
        400, sv.generators.Sequentially((gv.SiteUpdate(S), gv.ClassicWorm(S))), seed=71).cut(100)
    # Slow chain: alternate slow worm with the fast site update at host level.
    slow_worm = VillainClassicWormSlow(S, rng=np.random.default_rng(72))
    site = gv.SiteUpdate(S).seed(73)
    cfg = {k: np.asarray(v) for k, v in S.initial().items()}
    actions = []
    for i in range(400):
        cfg = site.step_cfg(cfg)
        cfg = slow_worm.step_cfg({k: cfg[k] for k in ('phi', 'n')})
        if i >= 100:
            import jax.numpy as jnp
            actions.append(float(S(jnp.asarray(cfg['phi']), jnp.asarray(cfg['n']))) / S.Lattice.sites)
        assert i % 100 != 0 or S.valid({'n': cfg['n']})
    mf = np.asarray(seq_fast.ActionDensity)
    ms = np.asarray(actions)
    ef = mf.std() / np.sqrt(len(mf) / 8)
    es = ms.std() / np.sqrt(len(ms) / 8)
    pull = abs(mf.mean() - ms.mean()) / np.hypot(ef, es)
    assert pull < 5, f'fast {mf.mean()}({ef}) vs slow {ms.mean()}({es}): pull {pull}'


def test_spin_spin_sloppy_villain_equals_fast(villain_ensemble):
    # The Sloppy Villain branch is the same full correlation as the production one.
    e = fresh(villain_ensemble, ('Spin_Spin',))
    fast = np.asarray(e.Spin_Spin)
    sloppy = np.asarray(e.Spin_SpinSloppy)
    assert np.allclose(fast, sloppy, atol=1e-12)


def test_spin_spin_sloppy_worldline_origin_and_mean(worldline_ensemble):
    e = fresh(worldline_ensemble, ('Spin_Spin',))
    sloppy = np.asarray(e.Spin_SpinSloppy)
    # No defect at zero displacement: exactly 1 on every configuration.
    assert np.allclose(sloppy[:, 0, 0], 1.0, atol=1e-12)
    # Single-overlay estimator has the same expectation as the translation-averaged
    # one; on the *same* configurations the Sloppy value is one of the terms the full
    # estimator averages, so means agree within the (large) Sloppy variance.
    full = np.asarray(e.Spin_Spin)
    assert np.all(sloppy >= 0)
    # all displacements: means within 5 sigma of each other
    diff = sloppy.mean(axis=0) - full.mean(axis=0)
    scale = sloppy.std(axis=0) / np.sqrt(sloppy.shape[0]) + 1e-12
    assert np.all(np.abs(diff) < 5 * scale + 0.5), (diff, scale)


def test_spin_spin_sloppy_zero_links_matches_slow():
    # On the trivial configuration (m = 0, v = 0) every overlay gives the same value,
    # so Sloppy == Slow == exp(-length/2kappa) exactly.
    S = sv.Worldline(sv.Lattice2D(4), 0.7, W=2)
    cfg = {k: np.asarray(v) for k, v in S.initial().items()}
    cfgs = sv.Configurations({k: v[None] for k, v in cfg.items()})
    e = sv.Ensemble(S).from_configurations(cfgs)
    sloppy = np.asarray(e.Spin_SpinSloppy)[0]
    slow = np.asarray(e.Spin_SpinSlow)[0]
    assert np.allclose(sloppy, slow, atol=1e-6)
