"""Pod-scale sampling with the Pallas-fused kernels.

``sample_fused_fleet`` drives the fused Villain neighborhood kernel over a large
chain batch: each kernel launch advances every chain ``thin`` sweeps entirely in
VMEM and returns blocked inline observables (ActionDensity, WindingSquared)
measured in-kernel; kept configurations stream to the host.  This is the
BASELINE-shape workload — thousands of chains, inline observables at scale, HDF5
output via :class:`~.fleet.Fleet`.

With more than one device, shard the chain batch before calling (the kernel grid
parallelizes across the sharded batch under SPMD).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .fleet import Fleet


def sample_fused_fleet(action, *, chains, steps, thin=10, seed=0,
                       interval_phi=np.pi, interval_n=1, p_n=None,
                       chains_per_program=None, keep_fields=False, progress=None):
    """Sample ``chains`` Villain chains for ``steps`` kept records, each separated
    by ``thin`` fused sweeps.

    Returns a :class:`Fleet` whose columns are the inline observables (and the
    fields, if ``keep_fields``).
    """
    from ..ops.pallas_sweep import neighborhood_sweeps
    L = action.Lattice
    N = L.N
    if chains_per_program is None:
        chains_per_program = 1

    phi = jnp.zeros((chains, 1, N, N), jnp.float32)
    n = jnp.zeros((chains, 2, N, N), jnp.int32)

    rng = np.random.default_rng(seed)
    columns = None
    total_accepted = 0.0
    iterator = range(steps) if progress is None else progress(range(steps))
    for i in iterator:
        phi, n, acc, inline = neighborhood_sweeps(
            jnp.int32(rng.integers(0, 2 ** 31 - 1)), phi, n,
            N=N, kappa=action.kappa, W=int(action.W),
            interval_phi=float(interval_phi), interval_n=int(interval_n),
            p_n=None if p_n is None else float(p_n),
            sweeps=thin, chains_per_program=chains_per_program)
        record = {k: np.asarray(v) for k, v in inline.items()}
        if keep_fields:
            record['phi'] = np.asarray(phi)
            record['n'] = np.asarray(n)
        total_accepted += float(jnp.sum(acc))
        if columns is None:
            columns = {k: np.empty((steps,) + v.shape, dtype=v.dtype)
                       for k, v in record.items()}
        for k, v in record.items():
            columns[k][i] = v

    stats = {'NeighborhoodUpdate': {
        'accepted': np.float64(total_accepted),
        'proposed': np.float64(chains * L.sites * thin * steps),
        'acceptance': np.float64(total_accepted / (chains * L.sites * thin * steps)),
        'sweeps': np.float64(thin * steps),
    }}
    final = {'phi': np.asarray(phi), 'n': np.asarray(n)}
    index = thin * (1 + np.arange(steps))
    return Fleet(action, columns, stats, final, index)
