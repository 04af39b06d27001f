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
    # Ground truth captured by executing the reference implementation
    # (/root/reference/supervillain/analysis/uncertain.py docstring examples).
    m_e = Uncertain(0.51099895000, 0.00000000015)
    assert str(m_e) == '+5.1099895000(15) × 10^-1'
    assert format(m_e, 'u1') == '5.109989500(2) × 10^-1'
    assert format(m_e, '.3') == '5.110(0) × 10^-1'
    assert format(m_e, 'eu3') == '5.10998950000(150)e-1'
    assert format(m_e, '+eu3') == '+5.10998950000(150)e-1'
    # Zero uncertainty → bare mean (scientific when the exponent is nonzero).
    assert str(Uncertain(3.14159, 0)) == '+3.14159'
    assert str(Uncertain(314.159, 0)) == '+3.14159 × 10^+2'
    # Uncertainty ≥ |mean| → explicit ± fallback.
    assert str(Uncertain(1, 10)) == '(+1.00 ± 10.00)'
    assert format(Uncertain(1, 10), '.3') == '(1.000 ± 10.000)'
    assert str(Uncertain(2.5, 2.5)) == '(+2.50 ± 2.50)'
    # Single trustworthy digit keeps the decimal point in the parentheses.
    assert str(Uncertain(8.5, .031)) == '+8.500(31)'
    assert str(Uncertain(8.5, .31)) == '+8.50(31)'
    assert str(Uncertain(8.5, 3.1)) == '+8.5(3.1)'
    # The empty spec implies '+'; an explicit spec without '+' does not.
    assert format(Uncertain(-1.5, 0.2), '') == '-1.50(20)'
    assert format(Uncertain(91.1876, 0.0021), 'u2') == '9.11876(21) × 10^+1'
    assert format(Uncertain(0.1179, 0.0010), 'e') == '1.179(10)e-1'
    assert str(Uncertain(6.67430E-11, 1.5E-15)) == '+6.67430(15) × 10^-11'
    assert str(Uncertain(938.27208816, 0.00000029)) == '+9.3827208816(29) × 10^+2'


def test_uncertain_precision_u_exclusive():
    with pytest.raises(ValueError):
        format(Uncertain(1.5, 0.1), '.3u2')
    with pytest.raises(ValueError):
        format(Uncertain(1.5, 0.1), 'zz')


def test_uncertain_from_string():
    for s, mean, err in [
        ('9.1093837015(28)E-31', 9.1093837015e-31, 2.8e-40),
        ('1.67262192369(51) × 10^-27', 1.67262192369e-27, 5.1e-37),
        ('(1836.15267343± 0.00000011)', 1836.15267343, 1.1e-07),
        ('1.2346(32)', 1.2346, 0.0032),
    ]:
        u = Uncertain.from_string(s)
        assert abs(u.mean - mean) <= 1e-12 * max(abs(mean), 1)
        assert abs(u.uncertainty - err) <= 1e-12 * max(err, 1)


def test_continue_from(ensemble):
    e2 = sv.Ensemble.continue_from(ensemble, 20)
    assert len(e2) == 20
    assert e2.index[0] == ensemble.index[-1] + ensemble.index_stride
    for i in range(20):
        assert ensemble.Action.valid({'n': e2.n[i]})


def test_finite_size_scaling_helpers():
    from supervillain_tpu.analysis.scaling import (
        scaled_susceptibility, effective_exponent, effective_exponent_error,
        crossing_estimate)
    # chi ~ L^(2-eta) exactly -> effective exponent recovers eta.
    eta = 0.25
    chi = lambda L: 3.0 * L ** (2 - eta)
    two_minus, eta_eff = effective_exponent(64, chi(64), 256, chi(256))
    assert np.isclose(eta_eff, eta)
    assert np.isclose(two_minus, 2 - eta)
    # Scaled susceptibility at Delta = eta/2 is L-independent for that chi.
    s1 = scaled_susceptibility(chi(64), 64, Delta=eta / 2)
    s2 = scaled_susceptibility(chi(256), 256, Delta=eta / 2)
    assert np.isclose(s1, s2)
    # Error propagation: symmetric in the two points, shrinks with separation.
    e_small = effective_exponent_error(64, 100.0, 1.0, 256, 200.0, 2.0)
    e_big = effective_exponent_error(64, 100.0, 1.0, 128, 150.0, 1.5)
    assert e_small < e_big
    # Crossing: two volumes whose scaled curves cross between kappa 2 and 3.
    kappas = [1.0, 2.0, 3.0, 4.0]
    scaled = {128: np.array([1.0, 1.1, 1.2, 1.3]),
              256: np.array([0.8, 1.0, 1.25, 1.5])}
    k = crossing_estimate(kappas, scaled)
    assert 2.0 < k < 3.0
    assert crossing_estimate(kappas, {128: np.ones(4), 256: 2 * np.ones(4)}) is None


def test_crossing_estimate_error():
    from supervillain_tpu.analysis.scaling import (
        crossing_estimate, crossing_estimate_error)
    kappas = [1.0, 2.0, 3.0, 4.0]
    scaled = {128: np.array([1.0, 1.1, 1.2, 1.3]),
              256: np.array([0.8, 1.0, 1.25, 1.5])}
    errs = {128: np.full(4, 0.01), 256: np.full(4, 0.01)}
    k0 = crossing_estimate(kappas, scaled)
    k, e, frac = crossing_estimate_error(kappas, scaled, errs, draws=400)
    assert frac == 1.0
    assert abs(k - k0) < 3 * e          # unbiased within its own error
    assert 0 < e < 0.2                  # tight errors -> tight kappa_c
    # Larger input errors widen the kappa_c error.
    k2, e2, _ = crossing_estimate_error(
        kappas, scaled, {L: 5 * v for L, v in errs.items()}, draws=400)
    assert e2 > e
    # Reproducible under the fixed seed.
    k3, e3, _ = crossing_estimate_error(kappas, scaled, errs, draws=400)
    assert k3 == k and e3 == e
    # Non-crossing curves: fewer than half the draws cross -> declined.
    k4, e4, frac4 = crossing_estimate_error(
        kappas, {128: np.ones(4), 256: 2 * np.ones(4)}, errs, draws=100)
    assert k4 is None and e4 is None and frac4 < 0.5
    # Explicit pair selection uses the requested volumes.
    three = {64: np.array([2.0, 1.6, 1.2, 0.8]), **scaled}
    errs3 = {64: np.full(4, 0.01), **errs}
    kp, ep, fp = crossing_estimate_error(kappas, three, errs3,
                                         pair=(128, 256), draws=200)
    assert fp == 1.0 and abs(kp - k0) < 3 * ep
