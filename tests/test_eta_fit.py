"""The chord-model exponent fit (tools/w3_eta_fit.py) must recover a known η
from synthetic torus histograms.  The fit model is the CFT torus form
G ∝ [c(dx)² + c(dy)²]^{-η/2} with c(d) = (L/π)sin(πd/L) — measured to match
the real W=3 worm histograms to a few % across the whole separation range
(VALIDATION.md §3b round 5), where an image-sum model is ill-defined for
η < 2 (divergent image sum ⇒ arbitrary additive floor)."""

import pathlib
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / 'tools'))


@pytest.mark.parametrize('eta', [4 / 9, 1.0])
def test_chord_fit_recovers_eta(eta):
    from w3_eta_fit import eta_fit, chord_power
    N, B = 64, 16
    rng = np.random.default_rng(1)
    G = chord_power(N, eta)
    G[0, 0] = G[0, 1] * 2          # finite origin bin (excluded by r_min)
    hist = rng.poisson(G * 3000.0, size=(B, N, N)).astype(float)
    est, err = eta_fit(hist, draws=40)
    assert abs(est - eta) < 3 * err + 0.02


def test_fit_is_rmin_stable():
    """A correct model fits the same exponent from any radius window; a
    drifting η(r_min) would signal a shape mismatch."""
    from w3_eta_fit import eta_fit, chord_power
    N, B, eta = 64, 8, 0.6
    rng = np.random.default_rng(3)
    G = chord_power(N, eta)
    G[0, 0] = G[0, 1]
    hist = rng.poisson(G * 5000.0, size=(B, N, N)).astype(float)
    fits = [eta_fit(hist, r_min=r, draws=20)[0] for r in (2, 4, 8)]
    assert max(fits) - min(fits) < 0.03
