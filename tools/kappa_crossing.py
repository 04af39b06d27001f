"""Pin κ_c from scan artifacts via the finite-size-scaling crossing.

At the generalized-BKT coupling the scaled susceptibility χ/L^{D−2Δ} is
volume-independent (reference publication/generalized-bkt.rst), so curves
measured at two volumes cross at κ_c.  This driver loads the per-κ scan
artifacts written by ``examples/bkt-scan.py --h5``, intersects their κ grids,
and reports κ_c ± σ from
:func:`supervillain_tpu.analysis.scaling.crossing_estimate_error` (Gaussian
resampling of every point within its bootstrap error) for every volume pair —
the largest pair is the quotable number, the smaller pairs show the
finite-size drift.

Usage:
    python tools/kappa_crossing.py --channel chiV_scaled L1=path1.h5 L2=path2.h5 ...

Extra per-volume files may be given repeatedly; grids are merged per volume
(later files override duplicate κ).  Points may also be injected inline for
values that only survive in logs:  --point L=256,kappa=0.075,val=1.491,err=0.068
"""

import argparse
import pathlib
import sys

import numpy as np

for _p in pathlib.Path(__file__).resolve().parents:
    if (_p / 'supervillain_tpu').is_dir():
        sys.path.insert(0, str(_p))
        break

from supervillain_tpu.analysis.scaling import (     # noqa: E402
    crossing_estimate, crossing_estimate_error)


def load(files, channel):
    """files: list of 'L=path' strings → {L: {kappa: (val, err)}}."""
    import h5py
    data = {}
    for spec in files:
        Ls, path = spec.split('=', 1)
        L = int(Ls)
        with h5py.File(path) as f:
            for key in f:
                kappa = float(key.split('_', 1)[1])
                val, err = np.asarray(f[key][channel])
                data.setdefault(L, {})[kappa] = (float(val), float(err))
    return data


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('files', nargs='*', help='L=path.h5 specs')
    ap.add_argument('--channel', default='chiV_scaled',
                    help='artifact column: chiV_scaled (vortex; W>2) or '
                         'chi_scaled (spin; W<2); at W=2 both are critical')
    ap.add_argument('--point', action='append', default=[],
                    help='inline L=..,kappa=..,val=..,err=..')
    ap.add_argument('--draws', type=int, default=4000)
    args = ap.parse_args(argv)

    data = load(args.files, args.channel)
    for spec in args.point:
        kv = dict(item.split('=') for item in spec.split(','))
        data.setdefault(int(kv['L']), {})[float(kv['kappa'])] = (
            float(kv['val']), float(kv['err']))

    Ls = sorted(data)
    if len(Ls) < 2:
        raise SystemExit('need at least two volumes')
    print(f'# channel={args.channel} volumes={Ls}')
    results = []
    for a, b in zip(Ls, Ls[1:]):
        grid = sorted(set(data[a]) & set(data[b]))
        if len(grid) < 2:
            print(f'L={a}/{b}: <2 common kappas, skipped')
            continue
        scaled = {L: np.array([data[L][k][0] for k in grid]) for L in (a, b)}
        errs = {L: np.array([data[L][k][1] for k in grid]) for L in (a, b)}
        kc, err, frac = crossing_estimate_error(
            grid, scaled, errs, draws=args.draws, pair=(a, b))
        center = crossing_estimate(grid, scaled)
        if kc is None:
            print(f'L={a}/{b}: no crossing in {grid} ({frac:.0%} of draws)')
            continue
        print(f'L={a:>4}/{b:<4} grid={grid}: kappa_c = {kc:.4f} +- {err:.4f} '
              f'(center {center if center is None else round(center, 4)}, '
              f'{frac:.0%} of draws cross)')
        results.append((a, b, kc, err))
    return results


if __name__ == '__main__':
    main()
