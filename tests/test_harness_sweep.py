"""Reference-style harness sweep: cached Hammer-generated ensembles per
(action, N, κ, W) with constraint validity and gauge invariance checked across the
whole parameter sweep (the reference's full grid, /root/reference/test/harness.py:21-30
— W ∈ {1,2}, κ ∈ {0.4, 0.5, 0.6}, N ∈ {3, 4, 7, 8} including the odd-N multi-color
checkerboards — and the invariant batteries of test_validity.py /
test_gauge-invariance.py)."""

from functools import cache

import numpy as np
import pytest

import supervillain_tpu as sv
from supervillain_tpu.generators import villain as gv, worldline as gw

# The reference grid is W ∈ {1, 2}; W=3 extends the battery to an odd
# constraint (different Z_W sector structure) at the same κ/N grid.
WS = (1, 2, 3)
KAPPAS = (0.4, 0.5, 0.6)
NS = (3, 4, 7, 8)
SWEEP = [(N, kappa, W) for W in WS for kappa in KAPPAS for N in NS]
STEPS = 12


@cache
def villain_ensemble(N, kappa, W):
    S = sv.Villain(sv.Lattice2D(N), kappa, W)
    return sv.Ensemble(S).generate(STEPS, gv.Hammer(S), seed=hash((N, W)) % 2**31)


@cache
def worldline_ensemble(N, kappa, W):
    S = sv.Worldline(sv.Lattice2D(N), kappa, W)
    return sv.Ensemble(S).generate(STEPS, gw.Hammer(S), seed=hash((W, N)) % 2**31)


@pytest.mark.parametrize('N,kappa,W', SWEEP)
def test_villain_validity(N, kappa, W):
    e = villain_ensemble(N, kappa, W)
    for i in range(STEPS):
        assert e.Action.valid({'n': e.n[i]})


@pytest.mark.parametrize('N,kappa,W', SWEEP)
def test_worldline_validity(N, kappa, W):
    e = worldline_ensemble(N, kappa, W)
    for i in range(STEPS):
        assert e.Action.valid({'m': e.m[i]})


# Scalar observables cheap enough to evaluate across the whole sweep; the full
# registry invariance battery runs at one geometry in test_observables.py.
SCALARS = ('ActionDensity', 'InternalEnergyDensity', 'WindingSquared', 'WrappingSquared')


@pytest.mark.parametrize('N,kappa,W', SWEEP)
def test_villain_gauge_invariance(N, kappa, W, rng):
    e = villain_ensemble(N, kappa, W)
    S = e.Action
    k = rng.integers(-3, 4, size=(1,) + (N,) * 2)
    transformed = sv.Ensemble(S).from_configurations(
        e.configuration.__class__({
            name: np.stack([S.gauge_transform(e.configuration[i], k)[name]
                            for i in range(STEPS)])
            for name in ('phi', 'n')}))
    for name in SCALARS:
        a = np.asarray(getattr(e, name))
        b = np.asarray(getattr(transformed, name))
        assert np.allclose(a, b, atol=1e-10), f'{name} not gauge invariant at {(N, kappa, W)}'


@pytest.mark.parametrize('N,kappa,W', SWEEP)
def test_worldline_equivalence_invariance(N, kappa, W):
    e = worldline_ensemble(N, kappa, W)
    S = e.Action
    fixed = sv.Ensemble(S).from_configurations(
        e.configuration.__class__({
            name: np.stack([S.equivalence_class_v(e.configuration[i])[name]
                            for i in range(STEPS)])
            for name in ('m', 'v')}))
    for name in SCALARS:
        a = np.asarray(getattr(e, name))
        b = np.asarray(getattr(fixed, name))
        assert np.allclose(a, b, atol=1e-10), f'{name} changed under equivalence fixing at {(N, kappa, W)}'
