"""Headline benchmark: site-updates/s/chip on the Villain NeighborhoodUpdate sweep
(the reference's default end-to-end generator) at L=256, chain-batched.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

``vs_baseline`` compares against a single-chain vectorized-NumPy implementation of
the same checkerboarded sweep — the reference's execution model (NumPy array ops per
color; see /root/reference/supervillain/generator/villain/neighborhood.py:59-137) —
measured in the same process on this host's CPU.
"""

from __future__ import annotations

import json
import time

import numpy as np


def numpy_baseline_sweep(N, kappa, W, steps, rng):
    """Single-chain checkerboarded neighborhood sweep in vectorized NumPy (the
    reference's execution model).  Returns elapsed seconds."""
    D = 2
    dims = (N, N)
    phi = np.zeros((1,) + dims)
    n = np.zeros((D,) + dims, dtype=np.int64)

    coords = np.indices(dims)
    parity = coords.sum(axis=0) % 2
    masks = [parity == c for c in (0, 1)]

    def d0(f):
        return np.stack([np.roll(f[0], -1, axis=k) - f[0] for k in range(D)])

    def face_sum1(f):
        return sum(f[k] + np.roll(f[k], +1, axis=k) for k in range(D))

    start = time.perf_counter()
    r = d0(phi) - 2 * np.pi * n
    for _ in range(steps):
        for mask in masks:
            change_phi = np.where(mask, rng.uniform(-np.pi, np.pi, dims), 0)[None]
            fwd = W * rng.integers(-1, 2, (D,) + dims)
            bwd = W * rng.integers(-1, 2, (D,) + dims)
            change_n = np.empty_like(n)
            for mu in range(D):
                bwd_mask = np.roll(mask, -1, axis=mu)
                change_n[mu] = np.where(mask, fwd[mu], 0) + np.where(bwd_mask, bwd[mu], 0)
            change_r = d0(change_phi) - 2 * np.pi * change_n
            dS = face_sum1((kappa / 2) * change_r * (2 * r + change_r))
            accept = (rng.uniform(0, 1, dims) < np.exp(-np.clip(dS, -50, 50))) & mask
            applied_phi = np.where(accept, change_phi[0], 0)[None]
            applied_n = np.empty_like(n)
            for mu in range(D):
                acc_bwd = np.roll(accept, -1, axis=mu)
                applied_n[mu] = np.where(accept, change_n[mu] * mask, 0) \
                    + np.where(acc_bwd, change_n[mu] * np.roll(mask, -1, axis=mu), 0)
            phi = phi + applied_phi
            n = n + applied_n
            r = r + d0(applied_phi) - 2 * np.pi * applied_n
    return time.perf_counter() - start


def main():
    import jax
    # Counter-based RBG keys are substantially cheaper than threefry on TPU.
    jax.config.update('jax_default_prng_impl', 'rbg')
    import jax.numpy as jnp
    import supervillain_tpu as sv
    from supervillain_tpu.generators import villain as gv

    import os
    N = 256
    kappa = 0.5
    chains = 128
    timed_steps = 20
    on_tpu = jax.default_backend() not in ('cpu',)
    full = os.environ.get('BENCH_FULL') == '1'

    if on_tpu:
        # Headline path: the Pallas-fused sweep kernel (state stays in VMEM across
        # all sweeps of a launch).
        from supervillain_tpu.ops.pallas_sweep import neighborhood_sweeps
        sweeps = 50
        phi = jnp.zeros((chains, 1, N, N), jnp.float32)
        n = jnp.zeros((chains, 2, N, N), jnp.int32)
        phi, n, acc, _ = neighborhood_sweeps(jnp.int32(1), phi, n, N=N, kappa=kappa,
                                             W=1, interval_phi=float(np.pi),
                                             interval_n=1, sweeps=sweeps)
        float(acc.sum())  # warmup + thermalization
        start = time.perf_counter()
        phi, n, acc, _ = neighborhood_sweeps(jnp.int32(2), phi, n, N=N, kappa=kappa,
                                             W=1, interval_phi=float(np.pi),
                                             interval_n=1, sweeps=sweeps)
        float(acc.sum())
        elapsed = time.perf_counter() - start
        rate = chains * N * N * sweeps / elapsed

        extra = {}
        if full:
            # Optional L sweep for the L=64..1024 scaling table (each size pays a
            # fresh kernel compile through the remote tunnel).
            for (Nx, Bx) in ((64, 512), (512, 32), (1024, 8)):
                px = jnp.zeros((Bx, 1, Nx, Nx), jnp.float32)
                nx = jnp.zeros((Bx, 2, Nx, Nx), jnp.int32)
                px, nx, ax, _ = neighborhood_sweeps(jnp.int32(1), px, nx, N=Nx,
                                                    kappa=kappa, W=1,
                                                    interval_phi=float(np.pi),
                                                    interval_n=1, sweeps=20)
                float(ax.sum())
                t0 = time.perf_counter()
                px, nx, ax, _ = neighborhood_sweeps(jnp.int32(2), px, nx, N=Nx,
                                                    kappa=kappa, W=1,
                                                    interval_phi=float(np.pi),
                                                    interval_n=1, sweeps=20)
                float(ax.sum())
                dt = time.perf_counter() - t0
                extra[f'L={Nx}'] = Bx * Nx * Nx * 20 / dt

        base_steps = 5
        base_elapsed = numpy_baseline_sweep(N, kappa, 1, base_steps, np.random.default_rng(0))
        base_rate = (N * N * base_steps) / base_elapsed
        print(json.dumps({
            'metric': 'site-updates/s/chip (Villain NeighborhoodUpdate, pallas-fused, L=256, 128 chains)',
            'value': rate,
            'unit': 'site-updates/s',
            'vs_baseline': rate / base_rate,
            'detail': {
                'elapsed_s': elapsed,
                'sweeps': sweeps,
                'chains': chains,
                'L': N,
                'baseline_rate_numpy_1chain': base_rate,
                'device': str(jax.devices()[0]),
                'kernel': 'pallas_fused_vmem_resident',
                'L_sweep_su_per_s': extra,
            },
        }))
        return

    L = sv.Lattice2D(N)
    S = sv.Villain(L, kappa, W=1)
    G = gv.NeighborhoodUpdate(S)

    cfg0 = S.initial(float_dtype=jnp.float32, int_dtype=jnp.int32)
    cfgs = jax.tree.map(lambda x: jnp.broadcast_to(x, (chains,) + x.shape), cfg0)
    stats = jax.tree.map(lambda x: jnp.broadcast_to(x, (chains,) + x.shape).astype(jnp.float32),
                         G.init_stats())

    def one(k, c, s):
        c, s, _ = G.step(k, c, s)
        return c, s

    @jax.jit
    def fleet_steps(key, cfgs, stats):
        def body(carry, k):
            cfgs, stats = carry
            keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.arange(chains))
            cfgs, stats = jax.vmap(one)(keys, cfgs, stats)
            return (cfgs, stats), None
        keys = jax.random.split(key, timed_steps)
        (cfgs, stats), _ = jax.lax.scan(body, (cfgs, stats), keys)
        # Reduce to scalars: fetching these forces the whole chain to complete
        # (on some TPU runtimes block_until_ready returns at dispatch, not
        # completion, so timing must gate on a host transfer).
        return jax.tree.map(lambda x: x.sum(), cfgs), stats

    # Warm up (compile) and then time, gating on a host fetch.
    out, stats = fleet_steps(jax.random.key(0), cfgs, stats)
    float(out['phi'])
    start = time.perf_counter()
    out, stats = fleet_steps(jax.random.key(1), cfgs, stats)
    float(out['phi'])
    elapsed = time.perf_counter() - start

    site_updates = chains * L.sites * timed_steps
    rate = site_updates / elapsed

    # NumPy single-chain baseline (the reference's execution model), short run.
    base_steps = 5
    base_elapsed = numpy_baseline_sweep(N, kappa, 1, base_steps, np.random.default_rng(0))
    base_rate = (L.sites * base_steps) / base_elapsed

    print(json.dumps({
        'metric': 'site-updates/s/chip (Villain NeighborhoodUpdate, L=256, 128 chains)',
        'value': rate,
        'unit': 'site-updates/s',
        'vs_baseline': rate / base_rate,
        'detail': {
            'elapsed_s': elapsed,
            'steps': timed_steps,
            'chains': chains,
            'L': N,
            'baseline_rate_numpy_1chain': base_rate,
            'device': str(jax.devices()[0]),
        },
    }))


if __name__ == '__main__':
    main()
