"""Compact a scan artifact's worm histograms into committable orbit profiles.

``examples/bkt-scan.py --save-hist`` stores the per-chain summed worm-visit
histogram Vortex_Vortex (B, N, N) — 134 MB of float64 per κ at L=512, too
heavy to commit.  The chord-model exponent fit (tools/w3_eta_fit.py) only
sees the histogram through the dihedral orbits of the torus (the model is
orbit-constant), so pooling cells per orbit is a lossless ~8× compression for
the fit: K ≈ N²/8 orbits.  This tool rewrites a scan h5 with every
``Vortex_Vortex_hist`` replaced by the (B, K) ``profile`` plus the per-orbit
``r2`` (chord distance²), ``mult`` (cells per orbit) and ``rr`` (flat-torus
distance, for r_min cuts); every other column is copied through.  gzip-9 on
the integer-valued tallies brings an L=512 κ-point to a few MB.

Usage:
    python tools/compact_hist.py in.h5 out.h5
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from w3_eta_fit import orbit_profile      # noqa: E402


def compact(src, dst):
    import h5py
    with h5py.File(src) as f, h5py.File(dst, 'w') as out:
        for key in f:
            g, og = f[key], out.create_group(key)
            for col in g:
                if col == 'Vortex_Vortex_hist':
                    hist = np.asarray(g[col])
                    r2, mult, rr, prof = orbit_profile(hist)
                    og.create_dataset('r2', data=r2)
                    og.create_dataset('mult', data=mult.astype(np.int64))
                    og.create_dataset('rr', data=rr.astype(np.float32))
                    og.create_dataset('profile', data=prof,
                                      compression='gzip', compression_opts=9)
                else:
                    og[col] = np.asarray(g[col])


if __name__ == '__main__':
    compact(sys.argv[1], sys.argv[2])
