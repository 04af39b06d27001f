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


def test_orbit_profile_pools_losslessly():
    """Orbit pooling preserves totals, multiplicities tile the torus, and
    every orbit is constant in the model quantities it claims to share."""
    from w3_eta_fit import orbit_profile
    N, B = 32, 4
    rng = np.random.default_rng(11)
    hist = rng.poisson(10.0, size=(B, N, N)).astype(float)
    r2, mult, rr, prof = orbit_profile(hist)
    assert mult.sum() == N * N - 1                     # origin dropped
    assert np.allclose(prof.sum(axis=1),
                       hist.reshape(B, -1).sum(axis=1) - hist[:, 0, 0])
    # Model constancy per orbit: rebuild cell values and compare extremes.
    d = np.arange(N)
    c = (N / np.pi) * np.sin(np.pi * d / N)
    r2cell = c[:, None] ** 2 + c[None, :] ** 2
    dm = np.minimum(d, N - d)
    a, b = np.meshgrid(dm, dm, indexing='ij')
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    # every (lo,hi) orbit must have one r2: group-by and check spread
    import collections
    seen = collections.defaultdict(list)
    for i in range(N):
        for j in range(N):
            seen[(lo[i, j], hi[i, j])].append(r2cell[i, j])
    for vals in seen.values():
        assert np.ptp(vals) < 1e-9 * max(1.0, abs(vals[0]))


def test_profile_fit_matches_cell_fit():
    """The committable orbit-profile fit and the full-histogram fit are the
    same estimator up to per-orbit weight pooling: on synthetic data they
    must agree well within the statistical error."""
    from w3_eta_fit import eta_fit, eta_fit_profile, orbit_profile, chord_power
    N, B, eta = 64, 12, 4 / 9
    rng = np.random.default_rng(5)
    G = chord_power(N, eta)
    G[0, 0] = G[0, 1]
    hist = rng.poisson(G * 4000.0, size=(B, N, N)).astype(float)
    e_cell, s_cell = eta_fit(hist, draws=60)
    r2, mult, rr, prof = orbit_profile(hist)
    e_prof, s_prof = eta_fit_profile(r2, mult, rr, prof, draws=60)
    assert abs(e_cell - e_prof) < max(s_cell, s_prof)
    assert abs(e_prof - eta) < 3 * s_prof + 0.02


def test_compact_hist_roundtrip(tmp_path):
    """compact_hist rewrites a scan h5: scalars copied through, histograms
    replaced by profiles the fit reads to the same exponent."""
    h5py = pytest.importorskip('h5py')
    from compact_hist import compact
    from w3_eta_fit import chord_power, eta_fit, eta_fit_profile
    N, B, eta = 48, 6, 0.6
    rng = np.random.default_rng(9)
    G = chord_power(N, eta)
    G[0, 0] = G[0, 1]
    hist = rng.poisson(G * 6000.0, size=(B, N, N)).astype(float)
    src, dst = tmp_path / 'raw.h5', tmp_path / 'compact.h5'
    with h5py.File(src, 'w') as f:
        g = f.create_group('kappa_0.08')
        g['Vortex_Vortex_hist'] = hist
        g['chiV_scaled'] = np.array([0.9, 0.05])
        g['acc'] = np.array(0.75)
    compact(src, dst)
    with h5py.File(dst) as f:
        g = f['kappa_0.08']
        assert 'Vortex_Vortex_hist' not in g
        assert np.allclose(g['chiV_scaled'], [0.9, 0.05])
        assert float(np.asarray(g['acc'])) == 0.75
        e_prof, s_prof = eta_fit_profile(
            np.asarray(g['r2']), np.asarray(g['mult']),
            np.asarray(g['rr']), np.asarray(g['profile']), draws=40)
    e_cell, s_cell = eta_fit(hist, draws=40)
    assert abs(e_prof - e_cell) < max(s_cell, s_prof)
    assert dst.stat().st_size < src.stat().st_size / 4
