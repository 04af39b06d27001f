"""The κ_c crossing driver (tools/kappa_crossing.py) must recover a planted
critical coupling from synthetic scan artifacts written in the exact
``examples/bkt-scan.py --h5`` layout (per-κ groups holding (value, error)
pairs), merge multiple files per volume, and accept log-only points inline."""

import pathlib
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / 'tools'))

h5py = pytest.importorskip('h5py')


def scan_file(path, kappas, values, errors, channel='chiV_scaled'):
    with h5py.File(path, 'w') as f:
        for k, v, e in zip(kappas, values, errors):
            g = f.create_group(f'kappa_{k}')
            g[channel] = np.array([v, e])
            g['acc'] = np.array(0.75)      # unrelated columns must be ignored


def planted(L, kappas, kc, slope=40.0):
    """Scaled susceptibility linear in κ with an L-dependent slope: curves of
    any two volumes cross exactly at kc."""
    return [1.0 - slope * (k - kc) * np.log(L / 64) for k in kappas]


def test_recovers_planted_crossing(tmp_path):
    from kappa_crossing import main
    kappas = [0.06, 0.07, 0.08, 0.09, 0.10]
    kc = 0.083
    specs = []
    for L in (128, 256):
        p = tmp_path / f'L{L}.h5'
        scan_file(p, kappas, planted(L, kappas, kc), [0.01] * len(kappas))
        specs.append(f'{L}={p}')
    (a, b, est, err), = main(specs + ['--draws', '500'])
    assert (a, b) == (128, 256)
    assert abs(est - kc) < max(3 * err, 1e-3)
    assert err < 0.005


def test_merges_files_and_inline_points(tmp_path):
    from kappa_crossing import main
    kappas = [0.07, 0.08, 0.09]
    kc = 0.082
    base = tmp_path / 'L128.h5'
    scan_file(base, kappas, planted(128, kappas, kc), [0.01] * 3)
    # The L=256 volume arrives split: one file with two κ plus one point that
    # "only survives in a log", injected inline; one κ of the file is also
    # overridden by a later duplicate file (later files win).
    part = tmp_path / 'L256a.h5'
    scan_file(part, [0.07, 0.08], planted(256, [0.07, 0.08], kc), [0.01] * 2)
    override = tmp_path / 'L256b.h5'
    scan_file(override, [0.08], planted(256, [0.08], kc), [0.008])
    v09 = planted(256, [0.09], kc)[0]
    (a, b, est, err), = main([
        f'128={base}', f'256={part}', f'256={override}',
        f'--point', f'L=256,kappa=0.09,val={v09},err=0.01',
        '--draws', '400'])
    assert (a, b) == (128, 256)
    assert abs(est - kc) < max(3 * err, 1e-3)


def test_declines_non_crossing_window(tmp_path, capsys):
    from kappa_crossing import main
    kappas = [0.07, 0.08]
    a = tmp_path / 'L128.h5'
    b = tmp_path / 'L256.h5'
    scan_file(a, kappas, [1.0, 0.9], [0.001, 0.001])
    scan_file(b, kappas, [2.0, 1.9], [0.001, 0.001])   # never crosses
    results = main([f'128={a}', f'256={b}', '--draws', '200'])
    assert results == []
    assert 'no crossing' in capsys.readouterr().out
