"""The periodized-power exponent fit (tools/w3_eta_fit.py) must recover a
known η from synthetic torus histograms — including the slow-decay regime
(η = 4/9, the W=3 dual-channel prediction) where torus images dominate the
tail and a naive log-log fit is badly biased (measured: 0.16 for a true
0.44)."""

import pathlib
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / 'tools'))


@pytest.mark.parametrize('eta', [4 / 9, 1.0])
def test_periodized_fit_recovers_eta(eta):
    from w3_eta_fit import eta_fit, periodized_power
    N, B = 64, 16
    rng = np.random.default_rng(1)
    G = periodized_power(N, eta)
    hist = rng.poisson(G * 3000.0, size=(B, N, N)).astype(float)
    est, err = eta_fit(hist, draws=40)
    assert abs(est - eta) < 3 * err + 0.02


def test_naive_loglog_would_be_biased():
    """Document the failure mode the periodized model exists to fix: at
    η = 4/9 the image floor flattens the histogram tail, so restricting to
    r <= N/8 and fitting log G ~ -η log r underestimates η badly."""
    from w3_eta_fit import periodized_power
    N, eta = 64, 4 / 9
    G = periodized_power(N, eta)
    d = np.arange(N)
    dm = np.minimum(d, N - d).astype(float)
    rr = np.sqrt(dm[:, None] ** 2 + dm[None, :] ** 2)
    sel = (rr >= 3) & (rr <= N / 8)
    x = np.log(rr[sel])
    y = np.log(G[sel])
    slope = np.polyfit(x, y, 1)[0]
    assert -slope < 0.3 * eta  # the naive estimate collapses toward 0
