"""Pod-scale sampling with the Pallas-fused kernels.

``sample_fused_fleet`` drives the fused kernels over a large chain batch: each
kernel launch advances every chain ``thin`` sweeps entirely in VMEM and returns
blocked inline observables measured in-kernel; kept configurations stream to
the host.  This is the BASELINE-shape workload — thousands of chains, inline
observables at scale, HDF5 output via :class:`~.fleet.Fleet`.

Both formulations are first-class (the reference treats them symmetrically,
/root/reference/supervillain/generator/worldline/__init__.py:9-40): pass a
:class:`~supervillain_tpu.models.Villain` action to drive the neighborhood /
Hammer kernels over (φ, n), or a :class:`~supervillain_tpu.models.Worldline`
action to drive the vortex+coexact+wrapping / worldline-Hammer kernels over
(m, v).

With a ``mesh`` the chain batch is sharded over the mesh's ``chains`` axis and
every device runs the kernel on its local shard under ``jax.shard_map`` (grid
parallelism under SPMD); per-device PRNG seeds are decorrelated by folding in
the device's mesh position.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .fleet import Fleet
from ..models import Worldline


#: Truncated-worm fraction above which inline worm histograms should not be
#: used quantitatively (the short-separation bias scales with this fraction).
TRUNCATION_BUDGET = 1e-3


def check_truncation_budget(truncated, total_worms, *, budget=TRUNCATION_BUDGET,
                            context=''):
    """Warn loudly when the truncated fraction of worms exceeds ``budget``.

    Capped in-kernel worms roll back exactly (the sampled distribution is
    unbiased) but their *histogram tallies are kept*, so the inline
    Vortex_Vortex / Spin_Spin correlators carry a short-separation bias
    proportional to the truncated fraction.  Production guidance
    (generators/villain.py ClassicWorm docstring): keep it ≲ 1e-3 or raise
    ``max_worm_moves``.  Returns the fraction.
    """
    total_worms = max(1, int(total_worms))
    frac = float(truncated) / total_worms
    if frac > budget:
        import warnings
        warnings.warn(
            f'{context}{float(truncated):.0f}/{total_worms} worms truncated '
            f'(fraction {frac:.2e} > {budget:g}) — inline worm histograms '
            f'carry short-separation bias at this point; raise '
            f'max_worm_moves or exclude the inline correlator from fits.',
            stacklevel=2)
    return frac


def _fused_launch(action, *, N, thin, interval_phi, interval_n, p_n,
                  chains_per_program, mesh=None, interpret=False, kernel_fn=None,
                  worms=0, max_worm_moves=None):
    """(seed, phi, n) -> (phi, n, accepted, inline), optionally shard_mapped over
    the mesh's ``chains`` axis.  ``kernel_fn`` substitutes the Pallas kernel
    (same signature) — used to exercise the SPMD plumbing on CPU meshes where
    the TPU kernel cannot run.  ``worms > 0`` selects the fused Hammer kernel
    (sweeps + in-kernel worms in one launch) and adds the worm's
    Vortex_Vortex/Worm_Length to the inline outputs."""
    W = action.W if action.W == float('inf') else int(action.W)
    if isinstance(action, Worldline):
        winf = W == float('inf')
        inv2k = np.float32(0.5 / float(action.kappa))
        if worms > 0:
            from ..ops.pallas_worldline_hammer import worldline_hammer_sweeps
            kernel = partial(worldline_hammer_sweeps,
                             N=N, kappa=action.kappa, W=W, sweeps=thin,
                             worms=int(worms), max_worm_moves=max_worm_moves,
                             interpret=interpret)
            inline_keys = ('ActionDensity', 'Spin_Spin', 'Worm_Length',
                           'Worm_Truncated')
        else:
            from ..ops.pallas_worldline import worldline_sweeps

            def kernel(seed, m, v):
                m, v, acc = worldline_sweeps(
                    seed, m, v, N=N, kappa=action.kappa, W=W, sweeps=thin,
                    interpret=interpret)
                # The sweep kernel returns no inline columns; measure the
                # action density from the kept state (one cheap XLA op).
                fW = np.float32(2 * np.pi) if winf else np.float32(W)
                vv = v[:, 0].astype(jnp.float32)
                dv0 = vv - jnp.roll(vv, 1, axis=2)
                dv1 = -(vv - jnp.roll(vv, 1, axis=1))
                l0 = m[:, 0].astype(jnp.float32) - dv0 / fW
                l1 = m[:, 1].astype(jnp.float32) - dv1 / fW
                ad = inv2k * (jnp.sum(l0 * l0, axis=(1, 2))
                              + jnp.sum(l1 * l1, axis=(1, 2))) / np.float32(N * N)
                return m, v, acc, {'ActionDensity': ad}
            inline_keys = ('ActionDensity',)
        if mesh is None:
            return kernel

        def local(seed, m, v):
            seed = seed + jax.lax.axis_index('chains') * jnp.int32(7919 * 2053)
            return kernel(seed, m, v)

        inline_spec = {k: P('chains') for k in inline_keys}
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P('chains'), P('chains')),
            out_specs=(P('chains'), P('chains'), P('chains'), inline_spec),
            check_vma=False)
    if worms > 0 and kernel_fn is None:
        # At W=∞ the hammer kernel runs z-mode sweeps with the worm section
        # kept (closed worms preserve dn = 0 exactly; wrapping worms sample the
        # integer winding sectors pure z-mode sweeps freeze).
        from ..ops.pallas_hammer import hammer_sweeps
        kernel = partial(hammer_sweeps,
                         N=N, kappa=action.kappa, W=W,
                         interval_phi=float(interval_phi), interval_n=int(interval_n),
                         p_n=None if p_n is None else float(p_n),
                         sweeps=thin, worms=int(worms),
                         chains_per_program=chains_per_program,
                         max_worm_moves=max_worm_moves,
                         interpret=interpret)
        inline_keys = ('ActionDensity', 'WindingSquared', 'Vortex_Vortex',
                       'Worm_Length', 'Worm_Truncated')
    else:
        from ..ops.pallas_sweep import neighborhood_sweeps
        kernel = partial(kernel_fn or neighborhood_sweeps,
                         N=N, kappa=action.kappa, W=W,
                         interval_phi=float(interval_phi), interval_n=int(interval_n),
                         p_n=None if p_n is None else float(p_n),
                         sweeps=thin, chains_per_program=chains_per_program,
                         interpret=interpret)
        inline_keys = ('ActionDensity', 'WindingSquared')
    if mesh is None:
        return kernel

    def local(seed, phi, n):
        # Decorrelate the per-program hardware-PRNG seeds across devices.
        seed = seed + jax.lax.axis_index('chains') * jnp.int32(7919 * 2053)
        return kernel(seed, phi, n)

    inline_spec = {k: P('chains') for k in inline_keys}
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P('chains'), P('chains')),
        out_specs=(P('chains'), P('chains'), P('chains'), inline_spec),
        check_vma=False)


def sample_fused_fleet(action, *, chains, steps, thin=10, seed=0,
                       interval_phi=np.pi, interval_n=1, p_n=None,
                       chains_per_program=None, keep_fields=False, progress=None,
                       mesh=None, interpret=False, kernel_fn=None, worms=0,
                       max_worm_moves='auto'):
    """Sample ``chains`` Villain chains for ``steps`` kept records, each separated
    by ``thin`` fused sweeps.

    Returns a :class:`Fleet` whose columns are the inline observables (and the
    fields, if ``keep_fields``).  With a ``mesh`` (1-D, axis ``chains``) the chain
    batch is sharded across its devices.

    ``worms > 0`` runs the fused Hammer kernel instead: every record's ``thin``
    sweeps are followed by that many in-kernel classic worms per chain, whose
    inline worm histogram (``Vortex_Vortex`` for Villain, ``Spin_Spin`` for
    Worldline) and ``Worm_Length`` become additional fleet columns.  Requires
    N a multiple of 128; both hammers run at any W including ∞ (the Villain
    hammer's sweep section switches to z-mode at W = ∞ with the worm kept),
    and both dispatch to the strip-regime bodies above N = 256, so the Hammer
    path is geometry-unconditional across the production envelope.
    """
    L = action.Lattice
    N = L.N
    if chains_per_program is None:
        chains_per_program = 1
    if mesh is not None and chains % mesh.devices.size != 0:
        raise ValueError(f'{chains} chains not divisible by '
                         f'{mesh.devices.size} mesh devices')

    worldline = isinstance(action, Worldline)
    if worldline:
        vdt = jnp.float32 if action.W == float('inf') else jnp.int32
        phi = jnp.zeros((chains, 2, N, N), jnp.int32)   # m
        n = jnp.zeros((chains, 1, N, N), vdt)           # v
    else:
        phi = jnp.zeros((chains, 1, N, N), jnp.float32)
        n = jnp.zeros((chains, 2, N, N), jnp.int32)
    if mesh is not None:
        sharding = NamedSharding(mesh, P('chains'))
        phi = jax.device_put(phi, sharding)
        n = jax.device_put(n, sharding)

    # Fleet launches bound each worm's move count by default (64·N² — an
    # exact truncation-rollback, generous enough that truncation is rare; the
    # UNBOUNDED tail of the worm-length distribution can realize a single
    # excursion long enough to trip the TPU runtime watchdog).  Pass
    # max_worm_moves=None for strictly unbounded worms.
    if max_worm_moves == 'auto':
        max_worm_moves = 64 * N * N if worms > 0 else None
    launch = _fused_launch(action, N=N, thin=thin, interval_phi=interval_phi,
                           interval_n=interval_n, p_n=p_n,
                           chains_per_program=chains_per_program, mesh=mesh,
                           interpret=interpret, kernel_fn=kernel_fn, worms=worms,
                           max_worm_moves=max_worm_moves)

    rng = np.random.default_rng(seed)
    columns = None
    total_accepted = 0.0
    iterator = range(steps) if progress is None else progress(range(steps))
    f0, f1 = ('m', 'v') if worldline else ('phi', 'n')
    for i in iterator:
        phi, n, acc, inline = launch(jnp.int32(rng.integers(0, 2 ** 31 - 1)), phi, n)
        record = {k: np.asarray(v) for k, v in inline.items()}
        if keep_fields:
            record[f0] = np.asarray(phi)
            record[f1] = np.asarray(n)
        total_accepted += float(jnp.sum(acc))
        if columns is None:
            columns = {k: np.empty((steps,) + v.shape, dtype=v.dtype)
                       for k, v in record.items()}
        for k, v in record.items():
            columns[k][i] = v

    if columns is not None and 'Worm_Truncated' in columns:
        check_truncation_budget(columns['Worm_Truncated'].sum(),
                                worms * steps * chains,
                                context='sample_fused_fleet: ')

    proposals = chains * ((2 * L.sites + 2 * N) if worldline else L.sites) \
        * thin * steps
    stats = {('WorldlineLocalUpdates' if worldline else 'NeighborhoodUpdate'): {
        'accepted': np.float64(total_accepted),
        'proposed': np.float64(proposals),
        'acceptance': np.float64(total_accepted / proposals),
        'sweeps': np.float64(thin * steps),
    }}
    final = {f0: np.asarray(phi), f1: np.asarray(n)}
    index = thin * (1 + np.arange(steps))
    return Fleet(action, columns, stats, final, index)
