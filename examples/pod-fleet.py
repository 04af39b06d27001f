#!/usr/bin/env python
"""The BASELINE pod-scale workload: 10k+ chains as one SPMD program, with
autocorrelation + bootstrap analysis and HDF5 output.

On one v5e chip the 10,240-chain L=64 fleet runs the fused neighborhood kernel
with 16 chains packed per program (640 programs — deep enough to overlap DMA
with compute); on a pod the same program shards the chain axis over the mesh
with zero cross-device collectives (pass ``--mesh`` to shard over
`jax.devices()`; see MULTICHIP.md for the audit).  In-kernel inline
observables keep the host traffic to two scalars per program per record.

Runtime: ~2 minutes on one chip at the defaults (most of it the κ_c-adjacent
autocorrelation, not the sampler).
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

import supervillain_tpu as sv
from supervillain_tpu.analysis import Bootstrap, Uncertain, autocorrelation_time
from supervillain_tpu.parallel import sample_fused_fleet, chain_mesh
from supervillain_tpu.ensemble import Ensemble
from supervillain_tpu.configurations import Configurations


def main():
    on_tpu = jax.default_backend() not in ('cpu',)
    ap = sv.cli.ArgumentParser(description=__doc__)
    ap.add_argument('--L', type=int, default=64)
    ap.add_argument('--chains', type=int, default=10240 if on_tpu else 16)
    ap.add_argument('--cpp', type=int, default=16,
                    help='chains packed per Pallas program')
    ap.add_argument('--kappa', type=float, default=0.74)
    ap.add_argument('--therm', type=int, default=2048)
    ap.add_argument('--steps', type=int, default=128)
    ap.add_argument('--thin', type=int, default=16)
    ap.add_argument('--mesh', action='store_true',
                    help='shard the chain batch over all jax.devices()')
    ap.add_argument('--h5', type=str, default='pod-fleet.h5')
    args = ap.parse_args()

    if not on_tpu:
        print('# CPU backend: shrunken smoke run through the mock-free XLA path '
              'is not available (Pallas kernels are TPU-only); this script is '
              'a TPU workload.')
        return None

    S = sv.Villain(sv.Lattice2D(args.L), args.kappa, W=1)
    mesh = chain_mesh() if args.mesh and len(jax.devices()) > 1 else None

    t0 = time.perf_counter()
    # Thermalize inside the first records: run therm as extra leading records
    # and cut them in the analysis (keeps the driver a single loop).
    lead = max(1, args.therm // args.thin)
    fleet = sample_fused_fleet(
        S, chains=args.chains, steps=lead + args.steps, thin=args.thin,
        seed=20260821, interval_phi=0.7, p_n=0.05,
        chains_per_program=args.cpp, keep_fields=False, mesh=mesh)
    seconds = time.perf_counter() - t0
    su = args.chains * S.Lattice.sites * args.thin * (lead + args.steps)

    # Autocorrelation of the per-program ActionDensity series (the records are
    # `thin` sweeps apart; τ is reported in kept-record units).
    cols = fleet.columns['ActionDensity'][lead:]           # (steps, programs)
    taus = [float(autocorrelation_time(cols[:, g])) for g in range(0, cols.shape[1],
                                                                   max(1, cols.shape[1] // 32))]
    tau = float(np.mean(taus))

    # Bootstrap over independent programs of their time-means.
    e = Ensemble(S).from_configurations(Configurations({
        'ActionDensity': cols.mean(axis=0),
        'WindingSquared': fleet.columns['WindingSquared'][lead:].mean(axis=0),
    }))
    b = Bootstrap(e, draws=200)
    mS, eS = b.estimate('ActionDensity')
    mW, eW = b.estimate('WindingSquared')

    with_mesh = f'{mesh.devices.size}-device mesh' if mesh else 'single chip'
    print(f'# pod-fleet: {args.chains} chains, L={args.L}, κ={args.kappa}, '
          f'{with_mesh}, cpp={args.cpp}')
    print(f'records {args.steps}×thin={args.thin} after {lead} lead records; '
          f'{seconds:.1f} s total = {su / seconds:.3g} site-updates/s')
    print(f'ActionDensity  = {Uncertain(mS, eS)}')
    print(f'WindingSquared = {Uncertain(mW, eW)}')
    print(f'autocorrelation time ≈ {tau:.2f} kept records '
          f'({tau * args.thin:.0f} sweeps)')

    if args.h5:
        import h5py
        with h5py.File(args.h5, 'w') as f:
            fleet.to_h5(f.create_group('fleet'))
        print(f'wrote {args.h5}')
    return fleet


if __name__ == '__main__':
    main()
