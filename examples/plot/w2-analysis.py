#!/usr/bin/env python
"""Three-volume finite-size-scaling analysis of the W=2 generalized-BKT scan
(round-4 artifact refresh): reads results/bkt-scan-W2-L{64,128,256}.h5 and
prints the scaled spin/vortex susceptibilities, the effective exponents, and
the crossing estimates that pin κ_c(W=2).  Pure host-side analysis (no TPU)."""

import pathlib
import sys

import h5py
import numpy as np

for _p in pathlib.Path(__file__).resolve().parents:
    if (_p / 'supervillain_tpu').is_dir():
        sys.path.insert(0, str(_p))
        break

from supervillain_tpu.analysis.scaling import (effective_exponent,
                                               effective_exponent_error,
                                               crossing_estimate)

ROOT = pathlib.Path(__file__).resolve().parents[2]
LS = (64, 128, 256)
W = 2
DeltaS = W ** 2 / 8          # 0.5
DeltaV = 2 / W ** 2          # 0.5


def load(L):
    out = {}
    with h5py.File(ROOT / f'results/bkt-scan-W2-L{L}.h5') as f:
        for key in f:
            kappa = float(key.split('_', 1)[1])
            g = f[key]
            row = {'chi': np.asarray(g['chi']),
                   'chi_scaled': np.asarray(g['chi_scaled'])}
            if 'chiV_scaled' in g:
                row['chiV_scaled'] = np.asarray(g['chiV_scaled'])
            if 'nontrivial_sector_frac' in g:
                row['sect'] = float(np.asarray(g['nontrivial_sector_frac']))
            out[round(kappa, 4)] = row
    return out


def main():
    data = {L: load(L) for L in LS}
    kappas = sorted(set.intersection(*(set(d) for d in data.values())))

    print(f'# W=2: Delta_spin = {DeltaS}, Delta_vortex = {DeltaV} '
          f'(the exponent pair is self-dual at W=2: both scale chi/L)')
    print(f'{"κ":>6} ' + ' '.join(f'{f"χS/L (L={L})":>16}' for L in LS)
          + f' {"η_eff(64→128)":>14} {"η_eff(128→256)":>15} {"sect":>5}')
    eta_rows = {}
    for k in kappas:
        cells = []
        for L in LS:
            m, e = data[L][k]['chi_scaled']
            cells.append(f'{m:>11.4g}({e:.2g})')
        m1, e1 = data[64][k]['chi_scaled']
        m2, e2 = data[128][k]['chi_scaled']
        m3, e3 = data[256][k]['chi_scaled']
        _, eta12 = effective_exponent(64, m1 * 64, 128, m2 * 128)
        err12 = effective_exponent_error(64, m1 * 64, e1 * 64, 128, m2 * 128, e2 * 128)
        _, eta23 = effective_exponent(128, m2 * 128, 256, m3 * 256)
        err23 = effective_exponent_error(128, m2 * 128, e2 * 128, 256, m3 * 256, e3 * 256)
        eta_rows[k] = (eta12, err12, eta23, err23)
        sect = data[64][k].get('sect', float('nan'))
        print(f'{k:>6.2f} ' + ' '.join(f'{c:>16}' for c in cells)
              + f' {eta12:>9.3f}({err12:.3f}) {eta23:>10.3f}({err23:.3f})'
              + f' {sect:>5.2f}')

    for (La, Lb) in ((64, 128), (128, 256)):
        ks = np.array(kappas)
        a = np.array([data[La][k]['chi_scaled'][0] for k in kappas])
        b = np.array([data[Lb][k]['chi_scaled'][0] for k in kappas])
        x = crossing_estimate(ks, {La: a, Lb: b})
        print(f'crossing({La},{Lb}) at κ = '
              + (f'{x:.4f}' if x is not None else 'none in window'))

    if all('chiV_scaled' in data[L][kappas[0]] for L in LS):
        print(f'\n{"κ":>6} ' + ' '.join(f'{f"χV/L (L={L})":>16}' for L in LS))
        for k in kappas:
            cells = []
            for L in LS:
                m, e = data[L][k]['chiV_scaled']
                cells.append(f'{m:>11.4g}({e:.2g})')
            print(f'{k:>6.2f} ' + ' '.join(f'{c:>16}' for c in cells))


if __name__ == '__main__':
    main()
