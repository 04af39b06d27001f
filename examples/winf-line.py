#!/usr/bin/env python
"""The W=∞ line of fixed points: continuously varying critical exponent.

With vortices forbidden (dn = 0 exactly) the model is a free massless compact
boson at EVERY κ — a line of fixed points with continuously varying spin
exponent.  For the Villain normalization S = (κ/2)Σ(dφ − 2πn)² the Gaussian
correlator gives the exact power law

    ⟨e^{iφ(x)} e^{-iφ(0)}⟩ ~ r^{-η(κ)},   η(κ) = 1/(2πκ)

with no BKT-style logarithmic corrections (there is no marginal operator —
nothing to run).  So the two-volume effective exponent of the spin
susceptibility must land on 1/(2πκ) at every κ — measured here at three
volumes per κ on the fused W=∞ Hammer kernels (z-mode sweeps + worms; worms
keep the winding sectors formally ergodic, cf. docs/physics-results.md §5).

(The reference quotes the scaling dimension in a different R-normalization —
supervillain/observable/spin.py:234 — but the measurable power of the
two-point function is convention-free, which is what this workload checks.)

Runtime: ~6 minutes on one v5e chip at the defaults.
"""

# Allow running this script directly from anywhere.
import pathlib as _pathlib
import sys as _sys
for _p in _pathlib.Path(__file__).resolve().parents:
    if (_p / 'supervillain_tpu').is_dir():
        if str(_p) not in _sys.path:
            _sys.path.insert(0, str(_p))
        break

import time

import numpy as np
import jax
import jax.numpy as jnp

import supervillain_tpu as sv
from supervillain_tpu.analysis import Uncertain
from supervillain_tpu.analysis.scaling import (effective_exponent,
                                               effective_exponent_error)


def main():
    on_tpu = jax.default_backend() not in ('cpu',)
    ap = sv.cli.ArgumentParser(description=__doc__)
    ap.add_argument('--Ls', type=int, nargs='+', default=[64, 128, 256])
    ap.add_argument('--kappas', type=float, nargs='+',
                    default=[0.5 / np.pi, 1.0 / np.pi, 2.0 / np.pi])
    ap.add_argument('--records', type=int, default=24)
    ap.add_argument('--therm-factor', type=int, default=8)
    args = ap.parse_args()

    if not on_tpu:
        print('# CPU backend: this is a TPU workload (fused W=inf kernels).')
        return None

    from supervillain_tpu.ops.pallas_hammer import hammer_sweeps
    rng = np.random.default_rng(20260822)

    def chi_at(N, kappa):
        B = max(16, 4096 // N)
        cpp = max(1, 128 // N)
        if B % cpp:
            B += cpp - B % cpp
        L2 = sv.Lattice2D(N)
        therm = args.therm_factor * N * N
        thin = max(64, N * N // 8)

        def launch(phi, n, sweeps):
            return hammer_sweeps(
                jnp.int32(rng.integers(0, 2 ** 31 - 1)), phi, n, N=N,
                kappa=kappa, W=float('inf'), interval_phi=1.5, interval_n=1,
                sweeps=sweeps, worms=max(1, sweeps // thin),
                chains_per_program=cpp, max_worm_moves=64 * N * N)

        @jax.jit
        def spin_chi(phi):
            spin = jnp.exp(1j * phi[:, 0].astype(jnp.complex64))
            corr = jax.vmap(lambda s: L2.correlation(s, s))(spin).real
            return corr.sum(axis=(1, 2)) / corr[:, 0, 0]

        phi = jnp.zeros((B, 1, N, N), jnp.float32)
        n = jnp.zeros((B, 2, N, N), jnp.int32)
        remaining = therm
        while remaining > 0:
            c = min(remaining, 4096)
            phi, n, _, _ = launch(phi, n, c)
            remaining -= c
        chis = np.empty((args.records, B))
        for r in range(args.records):
            phi, n, _, _ = launch(phi, n, thin)
            chis[r] = np.asarray(spin_chi(phi))
        per_chain = chis.mean(axis=0)
        return per_chain.mean(), per_chain.std(ddof=1) / np.sqrt(B)

    print(f'# W=inf line of fixed points: eta(kappa) = 1/(2 pi kappa) exactly '
          f'(free boson, no vortices, no log corrections)')
    print(f'{"κ":>8} {"η exact":>8} ' +
          ' '.join(f'{f"χ_S(L={L})":>16}' for L in args.Ls) +
          '  η_eff per volume pair')
    for kappa in args.kappas:
        t0 = time.perf_counter()
        vals = {L: chi_at(L, kappa) for L in args.Ls}
        eta_exact = 1.0 / (2 * np.pi * kappa)
        cells = ' '.join(f'{str(Uncertain(*vals[L])):>16}' for L in args.Ls)
        etas = []
        for La, Lb in zip(args.Ls[:-1], args.Ls[1:]):
            (ma, ea), (mb, eb) = vals[La], vals[Lb]
            _, eta = effective_exponent(La, ma, Lb, mb)
            err = effective_exponent_error(La, ma, ea, Lb, mb, eb)
            etas.append(f'{eta:.3f}({err:.3f})')
        print(f'{kappa:>8.4f} {eta_exact:>8.3f} {cells}  ' + ' '.join(etas)
              + f'   [{time.perf_counter() - t0:.0f} s]', flush=True)


if __name__ == '__main__':
    main()
