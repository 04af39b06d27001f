#!/usr/bin/env python
"""BKT scan at L=256 (BASELINE config #4): a fleet κ-scan across the W=1
critical coupling κ_c ≈ 0.74 (reference publication/generalized-bkt.rst:13)
driven by the Pallas-fused neighborhood kernel, with

* inline ActionDensity / WindingSquared measured *in-kernel* every sweep, and
* periodic spin-correlator measurements: Spin_Spin = correlation(e^{iφ}, e^{iφ})
  evaluated on-device between fused launches (same math as
  observables/spin.py:Spin_Spin.Villain), bootstrapped into
  SpinSusceptibility / SpinSusceptibilityScaled (Δ = W²/8 at finite W).

Across the scan the scaled susceptibility χ_S/L^{D−2Δ} rises steeply through
κ_c as the spin correlator turns from exponential decay to the critical
power law — the generalized-BKT signature this framework exists to measure.

Runtime: a few minutes on one v5e chip at the default settings (most of it
first-launch compilation); scale --chains/--records up for physics-grade error
bars.  On CPU backends the script automatically shrinks to L=64 so it stays
runnable end-to-end anywhere.
"""

# Allow running this script directly from anywhere: put the repo root (the
# directory containing the supervillain_tpu package) on sys.path.
import pathlib as _pathlib
import sys as _sys
for _p in _pathlib.Path(__file__).resolve().parents:
    if (_p / 'supervillain_tpu').is_dir():
        if str(_p) not in _sys.path:
            _sys.path.insert(0, str(_p))
        break

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

import supervillain_tpu as sv
from supervillain_tpu.analysis import Bootstrap, Uncertain
from supervillain_tpu.ensemble import Ensemble
from supervillain_tpu.configurations import Configurations


def main():
    on_tpu = jax.default_backend() not in ('cpu',)
    ap = sv.cli.ArgumentParser(description=__doc__)
    ap.add_argument('--L', type=int, default=256 if on_tpu else 64)
    ap.add_argument('--chains', type=int, default=32 if on_tpu else 8)
    ap.add_argument('--therm-sweeps', type=int, default=400)
    ap.add_argument('--records', type=int, default=24)
    ap.add_argument('--thin', type=int, default=25, help='fused sweeps per record')
    ap.add_argument('--kappas', type=float, nargs='+',
                    default=[0.55, 0.65, 0.74, 0.85, 1.00])
    ap.add_argument('--p_n', type=float, default=0.05,
                    help='zero-inflated Δn proposal probability (mixing at scale)')
    ap.add_argument('--bootstraps', type=int, default=100)
    ap.add_argument('--h5', type=str, default=None, help='write per-κ results here')
    ap.add_argument('--save-hist', action='store_true',
                    help='also store the per-chain summed worm histogram '
                         '(Vortex_Vortex, (chains, L, L)) in the h5 — enables '
                         'offline shape fits G_V(r) ~ r^{-η} at criticality, '
                         'which beat the origin-normalized susceptibility '
                         'ratio on η precision')
    ap.add_argument('--W', type=int, default=1,
                    help='finite vortex constraint; Δ = W²/8 scales the '
                         'susceptibility, Δn proposals come in multiples of W')
    ap.add_argument('--worms', type=int, default=None,
                    help='in-kernel classic worms per `thin` sweeps (fused '
                         'Hammer kernel).  Default: 1 at W>1, 0 at W=1.  At '
                         'W>1 the bare neighborhood kernel only changes n in '
                         'multiples of W, freezing the Z_W winding sectors at '
                         'their cold-start value — worms restore ergodicity '
                         'there AND supply the inline vortex correlator.')
    args = ap.parse_args()

    N, B = args.L, args.chains
    L = sv.Lattice2D(N)
    W = args.W
    worms = args.worms if args.worms is not None else (0 if W == 1 else 1)
    Delta = W ** 2 / 8
    scale = N ** (L.D - 2 * Delta)
    # Dual (vortex-sector) exponent: Δ_V = 2/W² — the generalized-BKT pair
    # (reference publication/generalized-bkt.rst: the W² / 4-over-W² duality).
    DeltaV = 2 / W ** 2
    scaleV = N ** (L.D - 2 * DeltaV)

    if on_tpu and worms > 0 and B % max(1, 128 // N) != 0:
        print(f'# chains={B} not divisible by the N={N} packing factor '
              f'{max(1, 128 // N)}; falling back to worms=0 (sweeps only)')
        worms = 0
    if on_tpu and worms > 0:
        # Fused Hammer: sweeps + in-kernel worms in one launch, at EVERY
        # geometry — monolithic sweep body through N=256, strip-chunked body
        # above (the round-4 composed strip-sweeps + standalone-worm fallback
        # is gone).  At N < 128 chains are packed 128/N per program so the
        # worm section fills the lanes.
        from supervillain_tpu.ops.pallas_hammer import hammer_sweeps
        cpp = 1 if N >= 128 else max(1, 128 // N)

        def neighborhood_sweeps(seed, phi, n, *, N, kappa, W, interval_phi,
                                interval_n, sweeps, p_n=None):
            # Scale the worm count with the launch length so thermalization
            # chunks keep the same worms-per-sweep density as measurements.
            # Worms are capped at 64·N² moves (exact truncation-rollback):
            # the worm-length distribution's tail in the vortex-plasma phase
            # can realize single excursions long enough to trip the TPU
            # runtime watchdog; the recorded truncation fraction bounds the
            # (χ_V-estimator-only) bias.
            w = max(1, (worms * sweeps) // max(args.thin, 1))
            return hammer_sweeps(seed, phi, n, N=N, kappa=kappa, W=W,
                                 interval_phi=interval_phi,
                                 interval_n=interval_n, sweeps=sweeps,
                                 worms=w, p_n=p_n, chains_per_program=cpp,
                                 max_worm_moves=64 * N * N)
    elif on_tpu:
        from supervillain_tpu.ops.pallas_sweep import neighborhood_sweeps
    else:
        # CPU fallback with the same signature: vmapped XLA NeighborhoodUpdate
        # (the Pallas kernel is TPU-only).  Keeps the example runnable anywhere.
        from functools import partial
        from supervillain_tpu.generators.villain import NeighborhoodUpdate

        @partial(jax.jit, static_argnames=('N', 'kappa', 'W', 'interval_phi',
                                           'interval_n', 'sweeps', 'p_n'))
        def neighborhood_sweeps(seed, phi, n, *, N, kappa, W, interval_phi,
                                interval_n, sweeps, p_n=None):
            S = sv.Villain(sv.Lattice2D(N), kappa, W)
            G = NeighborhoodUpdate(S, interval_phi=interval_phi,
                                   interval_n=interval_n, p_n=p_n)
            BB = phi.shape[0]

            def chain(key, phi1, n1):
                def body(carry, k):
                    cfg, st = carry
                    cfg, st, _ = G.step(k, cfg, st)
                    return (cfg, st), None
                (cfg, st), _ = jax.lax.scan(
                    body, ({'phi': phi1, 'n': n1}, G.init_stats()),
                    jax.random.split(key, sweeps))
                inline = {
                    'ActionDensity': S(cfg['phi'], cfg['n']) / (N * N),
                    'WindingSquared': jnp.mean(
                        sv.ops.calculus.d(S.Lattice, 1, cfg['n']).astype(float) ** 2),
                }
                return cfg['phi'], cfg['n'], st[G.name]['accepted'], inline
            keys = jax.vmap(lambda i: jax.random.fold_in(
                jax.random.key(seed.astype(jnp.uint32)), i))(jnp.arange(BB))
            return jax.vmap(chain)(keys, phi, n)

    @jax.jit
    def winding_sectors(n):
        """Per-chain Z_W holonomy bits (w_t, w_x) mod W — the homological
        sectors only torus-wrapping worms can change.  Recorded so the scan
        artifact carries *measured* sector populations per κ (mobility is
        physical: free in the vortex-plasma phase, exponentially slow past
        the transition — for the reference's local stack identically)."""
        wt = jnp.sum(n[:, 0, :, 0], axis=1) % W
        wx = jnp.sum(n[:, 1, 0, :], axis=1) % W
        return wt, wx

    @jax.jit
    def spin_correlator(phi):
        """Per-chain Spin_Spin (N, N) real part, from the current φ."""
        cdtype = jnp.complex64
        spin = jnp.exp(1j * phi[:, 0].astype(cdtype))
        corr = jax.vmap(lambda s: L.correlation(s, s))(spin)
        return corr.real  # complex arrays cannot cross the device boundary here

    expect = '  (κ_c ≈ 0.74 expected)' if W == 1 else ''
    print(f'# L={N} chains={B} W={W} Δ={Delta} Δ_V={DeltaV} worms/record={worms}{expect}')
    head = (f'{"κ":>6} {"acc":>6} {"ActionDensity":>16} {"WindingSq":>14} '
            f'{"χ_S":>14} {"χ_S/L^(D-2Δ)":>14}')
    if worms > 0:
        head += f' {"χ_V/L^(D-2Δ_V)":>15}'
    print(head)

    results = {}
    for kappa in args.kappas:
        t0 = time.perf_counter()
        rng = np.random.default_rng(20260820)
        phi = jnp.zeros((B, 1, N, N), jnp.float32)
        n = jnp.zeros((B, 2, N, N), jnp.int32)

        def launch(phi, n, sweeps):
            return neighborhood_sweeps(
                jnp.int32(rng.integers(0, 2 ** 31 - 1)), phi, n, N=N,
                kappa=kappa, W=W, interval_phi=0.7, interval_n=1,
                p_n=args.p_n, sweeps=sweeps)

        # Chunk thermalization into bounded launches (a single launch of ~1e5
        # sweeps would run for minutes; chunks keep each launch O(10s)).
        remaining = args.therm_sweeps
        while remaining > 0:
            chunk = min(remaining, 4096)
            phi, n, acc, _ = launch(phi, n, chunk)
            remaining -= chunk

        S_rows, W2_rows = [], []
        chi_col = np.empty((args.records, B))
        histV = np.zeros((B, N, N))
        accepted = 0.0
        truncated = 0.0
        for r in range(args.records):
            phi, n, acc, inline = launch(phi, n, args.thin)
            accepted += float(acc.sum())
            if 'Worm_Truncated' in inline:
                truncated += float(np.asarray(inline['Worm_Truncated']).sum())
            # ActionDensity/WindingSquared come back per *program* (chains may
            # be packed several per program at small L) — still independent
            # samples, just fewer of them.
            S_rows.append(np.asarray(inline['ActionDensity']))
            W2_rows.append(np.asarray(inline['WindingSquared']))
            if 'Vortex_Vortex' in inline:
                histV += np.asarray(inline['Vortex_Vortex'])
            corr = np.asarray(spin_correlator(phi))        # (B, N, N)
            chi_col[r] = corr.sum(axis=(1, 2)) / corr[:, 0, 0]
        S_col = np.stack(S_rows)
        W2_col = np.stack(W2_rows)
        wt, wx = winding_sectors(n)
        nontrivial_sectors = float((np.asarray(wt) != 0).mean()
                                   + (np.asarray(wx) != 0).mean()) / 2
        acc_frac = accepted / (B * N * N * args.thin * args.records)

        # Bootstrap over per-chain (or per-program) means: chains are
        # independent by construction, while records within one chain stay
        # correlated whenever thin < τ — pooling them would understate errors.
        # Truncation budget (VERDICT r4 #8): record the truncated fraction of
        # measurement worms per scan point, and warn loudly past ~1e-3 — the
        # worm-inclusive inline correlator carries a documented
        # short-separation bias whenever truncation fires, so a silently
        # truncation-heavy point must not be used quantitatively.
        from supervillain_tpu.parallel.fused_fleet import check_truncation_budget
        trunc_frac = check_truncation_budget(
            truncated, worms * args.records * B, context=f'kappa={kappa}: ') \
            if worms > 0 else 0.0

        S_action = sv.Villain(L, kappa, W)
        cols = {'SpinSusceptibility': chi_col.mean(axis=0)}
        if worms > 0:
            origin = np.maximum(histV[:, 0, 0], 1e-30)
            cols['VortexSusceptibility'] = histV.sum(axis=(1, 2)) / origin
        e = Ensemble(S_action).from_configurations(Configurations(cols))
        b = Bootstrap(e, draws=args.bootstraps)
        ep = Ensemble(S_action).from_configurations(Configurations({
            'ActionDensity': S_col.mean(axis=0),
            'WindingSquared': W2_col.mean(axis=0),
        }))
        bp = Bootstrap(ep, draws=args.bootstraps)
        mS, eS = bp.estimate('ActionDensity')
        mW, eW = bp.estimate('WindingSquared')
        mX, eX = b.estimate('SpinSusceptibility')
        results[kappa] = dict(acc=acc_frac, S=(mS, eS), W2=(mW, eW),
                              chi=(mX, eX), chi_scaled=(mX / scale, eX / scale),
                              nontrivial_sector_frac=nontrivial_sectors,
                              worms_truncated=truncated,
                              trunc_frac=trunc_frac,
                              seconds=time.perf_counter() - t0)
        line = (f'{kappa:>6.2f} {acc_frac:>6.1%} {str(Uncertain(mS, eS)):>16} '
                f'{str(Uncertain(mW, eW)):>14} {str(Uncertain(mX, eX)):>14} '
                f'{str(Uncertain(mX / scale, eX / scale)):>14}')
        if worms > 0:
            mV, eV = b.estimate('VortexSusceptibility')
            results[kappa]['chiV'] = (mV, eV)
            results[kappa]['chiV_scaled'] = (mV / scaleV, eV / scaleV)
            if args.save_hist:
                results[kappa]['Vortex_Vortex_hist'] = histV
            line += f' {str(Uncertain(mV / scaleV, eV / scaleV)):>15}'
            line += f'  sect={nontrivial_sectors:.2f}'
        print(line, flush=True)

        if args.h5:
            # Write incrementally (one group per finished κ): a fleet scan is
            # hours of chip time, and a crash at κ_i must not lose κ_{<i}.
            import h5py
            with h5py.File(args.h5, 'a') as f:
                name = f'kappa_{kappa}'
                if name in f:
                    del f[name]
                g = f.create_group(name)
                for k, v in results[kappa].items():
                    g[k] = np.asarray(v)
    return results


if __name__ == '__main__':
    main()
