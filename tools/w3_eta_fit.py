"""Fit the critical vortex-correlator exponent from saved worm histograms.

At κ_c the vortex two-point function falls as a pure power,
G_V(r) ~ r^{-η_V} with η_V(κ_c) = 2Δ_V = 4/W² (reference
publication/generalized-bkt.rst; observable/vortex.py:40-57 defines Δ_V).
The worm-visit histogram from `examples/bkt-scan.py --save-hist` estimates
G_V(Δx) up to one overall constant per chain, so the SHAPE carries η with
far better statistics than the origin-normalized susceptibility ratio (every
bin aggregates visits; the origin bin alone is that estimator's noise floor).

For η < 2 the power law decays slowly enough that **torus images dominate
the tail** (the large-separation histogram sits on an image "floor" of height
~ L^{-η} × number of near images — a naive log-log fit of r^{-η} measures the
floor, not η).  The model must therefore be the PERIODIZED power law

    P_η(Δx) = Σ_{images m ∈ Z²} |Δx + L m|^{-η}

(truncated at |m| ≤ M, M=4 is converged at the 1e-3 level for η ≥ 0.3).  The
fit scans η over a grid, solving the overall amplitude A analytically per η
(the model is linear in A), with relative-error weights, over all
displacement cells with torus distance ≥ r_min (excluding short-distance
lattice artifacts).  Errors: bootstrap over chains (each chain's histogram
is an independent estimate of the same shape).

Usage:
    python tools/w3_eta_fit.py results/bkt-scan-W3-L512-k08-r5.h5 [r_min]
"""

import sys

import numpy as np


def periodized_power(N, eta, images=4):
    """P_η(Δx) on the N×N torus: Σ_m |Δx + N·m|^{-η} (origin masked to 0)."""
    d = np.arange(N, dtype=np.float64)
    out = np.zeros((N, N))
    for mx in range(-images, images + 1):
        for my in range(-images, images + 1):
            rx = d[:, None] + mx * N
            ry = d[None, :] + my * N
            r2 = rx ** 2 + ry ** 2
            r2[r2 == 0] = np.inf
            out += r2 ** (-eta / 2)
    return out


def eta_fit(hist, r_min=3.0, etas=None, draws=200, seed=7, images=4):
    """hist: (B, N, N) per-chain worm-visit tallies.  Returns (eta, err).

    Scans χ²(η) = Σ w (G − A(η) P_η)² with w = 1/max(G,1)² (relative errors,
    Poisson-like) over ``etas`` (default 0.05..1.50 step 0.01), interpolating
    the minimum parabolically.
    """
    B, N, _ = hist.shape
    if etas is None:
        etas = np.arange(0.05, 1.51, 0.01)
    d = np.arange(N)
    dm = np.minimum(d, N - d).astype(np.float64)
    rr = np.sqrt(dm[:, None] ** 2 + dm[None, :] ** 2)
    sel = rr >= r_min

    models = np.stack([periodized_power(N, e, images)[sel] for e in etas])

    def fit(h):
        g = h[sel]
        w = 1.0 / np.maximum(g, 1.0) ** 2
        # Per-η analytic amplitude: A = Σ w g P / Σ w P².
        wgP = models @ (w * g)
        wPP = np.einsum('ij,ij->i', models, models * w)
        A = wgP / wPP
        chi2 = (w * g * g).sum() - A * wgP
        i = int(np.argmin(chi2))
        if 0 < i < len(etas) - 1:
            y0, y1, y2 = chi2[i - 1], chi2[i], chi2[i + 1]
            denom = (y0 - 2 * y1 + y2)
            off = 0.5 * (y0 - y2) / denom if denom > 0 else 0.0
            return etas[i] + off * (etas[1] - etas[0])
        return etas[i]

    rng = np.random.default_rng(seed)
    center = fit(hist.sum(axis=0))
    samples = []
    for _ in range(draws):
        pick = rng.integers(0, B, B)
        samples.append(fit(hist[pick].sum(axis=0)))
    return float(center), float(np.std(samples))


def main():
    import h5py
    path = sys.argv[1]
    r_min = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    with h5py.File(path) as f:
        for key in f:
            g = f[key]
            if 'Vortex_Vortex_hist' not in g:
                print(f'{key}: no histogram saved')
                continue
            hist = np.asarray(g['Vortex_Vortex_hist'])
            eta, err = eta_fit(hist, r_min=r_min)
            print(f'{path} {key}: eta_V = {eta:.4f} +- {err:.4f} '
                  f'(periodized-power fit, r >= {r_min}, '
                  f'{hist.shape[0]} chains)')


if __name__ == '__main__':
    main()
