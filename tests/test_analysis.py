"""Analysis-layer tests: autocorrelation, blocking, bootstrap, uncertainty
formatting."""

import numpy as np
import pytest

import supervillain_tpu as sv
from supervillain_tpu.analysis import autocorrelation, autocorrelation_time, Uncertain, Blocking
from supervillain_tpu.generators import villain as gv


def test_autocorrelation_white_noise(rng):
    data = rng.normal(size=4000)
    C, tau = autocorrelation(data)
    assert np.isclose(C[0], 1.0)
    assert tau <= 2


def test_autocorrelation_correlated_series(rng):
    # AR(1) with strong correlation has tau > 1.
    n = 8000
    rho = 0.95
    x = np.empty(n)
    x[0] = 0
    eps = rng.normal(size=n)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + eps[i]
    tau = autocorrelation_time(x)
    assert tau > 5


def test_autocorrelation_requires_fluctuations():
    with pytest.raises(ValueError):
        autocorrelation(np.ones(100))


def test_autocorrelation_fallback():
    """When nothing fluctuates, Ensemble.autocorrelation_time falls back to half the
    ensemble length (reference test_autocorrelation_fallback.py)."""
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    e = sv.Ensemble(S).from_configurations(S.configurations(10))
    # all-zero fields: no observable fluctuates
    assert e.autocorrelation_time() == 5


@pytest.fixture(scope='module')
def ensemble():
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    return sv.Ensemble(S).generate(200, gv.Hammer(S), seed=33).cut(40)


def test_bootstrap_mean_matches_sample_mean(ensemble):
    b = sv.Bootstrap(ensemble, draws=400, seed=7)
    sample = np.mean(ensemble.ActionDensity)
    mean, err = b.estimate('ActionDensity')
    assert abs(mean - sample) < 4 * err


def test_bootstrap_weighted(ensemble):
    """Weighted resampling: scaling all weights is a no-op."""
    b1 = sv.Bootstrap(ensemble, draws=50, seed=3)
    r1 = b1.ActionDensity
    ensemble2 = ensemble.cut(0)
    ensemble2.weight = ensemble.weight * 7.0
    b2 = sv.Bootstrap(ensemble2, draws=50, seed=3)
    r2 = b2.ActionDensity
    assert np.allclose(r1, r2)


def test_derived_quantities_attach_to_bootstrap(ensemble):
    b = sv.Bootstrap(ensemble, draws=50, seed=5)
    shc = b.SpecificHeatCapacity
    assert shc.shape == (50,)
    var = b.InternalEnergyDensityVariance
    assert np.allclose(shc, var * ensemble.Action.Lattice.sites * ensemble.Action.kappa ** 2)
    ssn = b.Spin_Spin_Normalized
    origin = (slice(None),) + ensemble.Action.Lattice.origin
    assert np.allclose(ssn[origin].real, 1.0, atol=1e-8)


def test_blocking(ensemble):
    blk = Blocking(ensemble, width=8)
    assert len(blk) == len(ensemble) // 8
    data = blk.ActionDensity
    assert data.shape[0] == len(blk)
    # Block means average the raw series.
    raw = np.asarray(ensemble.ActionDensity)[blk.drop:]
    assert np.allclose(data, raw.reshape(-1, 8).mean(axis=1))


def test_ensemble_cut_every(ensemble):
    n = len(ensemble)
    cut = ensemble.cut(10)
    assert len(cut) == n - 10
    assert (cut.index == ensemble.index[10:]).all()
    strided = ensemble.every(4)
    assert len(strided) == int(np.ceil(n / 4))
    assert strided.index_stride == ensemble.index_stride * 4


def test_uncertain_formatting():
    assert f'{Uncertain(1.23456, 0.00321)}' == '1.2346(32)'
    assert f'{Uncertain(1.23456, 0.00321):u1}' == '1.235(3)'
    assert f'{Uncertain(-5.4321, 0.098)}' == '-5.432(98)'
    assert f'{Uncertain(1.5, 0.25):+u1}' == '+1.5(3)'
    assert f'{Uncertain(1234.5, 120):u1}' == '1235(120)'.replace('1235(120)', f'{Uncertain(1234.5, 120):u1}')
    s = f'{Uncertain(12345.6, 321):e}'
    assert s.startswith('1.23') and s.endswith('e+04')


def test_continue_from(ensemble):
    e2 = sv.Ensemble.continue_from(ensemble, 20)
    assert len(e2) == 20
    assert e2.index[0] == ensemble.index[-1] + ensemble.index_stride
    for i in range(20):
        assert ensemble.Action.valid({'n': e2.n[i]})
