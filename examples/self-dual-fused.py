#!/usr/bin/env python
"""The W=∞ self-dual duality check at production scale on the fused kernels.

`examples/no-vortices.py` reproduces the reference workload at N=21 on the XLA
path; this script runs the same physics at L=256 — 150× the volume — using the
round-3 fused W=∞ kernels: the Villain side on the z-mode neighborhood kernel
(compound (Δφ, Δz), dn = 0 exact) and the Worldline side on the float-v fused
local-update kernel.  At the self-dual coupling κ = 1/2π the two formulations'
action densities must agree within Monte-Carlo error.

Both sides are critical (massless spin waves) so thermalization is τ ~ L²
sweeps of local updates; defaults thermalize 8·L² sweeps and record samples
L²/8 sweeps apart — affordable only because the fused kernels run at ~1e10
site-updates/s.
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


def main():
    on_tpu = jax.default_backend() not in ('cpu',)
    ap = sv.cli.ArgumentParser(description=__doc__)
    ap.add_argument('--L', type=int, default=256 if on_tpu else 16)
    ap.add_argument('--chains', type=int, default=16 if on_tpu else 4)
    ap.add_argument('--kappa', type=float, default=0.5 / np.pi)
    ap.add_argument('--therm-factor', type=int, default=8,
                    help='thermalization sweeps = factor * L^2')
    ap.add_argument('--records', type=int, default=24)
    ap.add_argument('--worms', type=int, default=1,
                    help='in-kernel worms per thin interval (both sides run '
                         'their W=∞ Hammer kernels: closed worms preserve the '
                         'constraints exactly while sampling the integer '
                         'winding sectors the bare sweep kernels freeze).  '
                         '0 = sweeps only (the round-3 methodology).')
    args = ap.parse_args()

    N, B, kappa = args.L, args.chains, args.kappa
    therm = args.therm_factor * N * N
    thin = max(64, N * N // 8)
    launch_cap = 4096
    worms = args.worms
    if worms > 0 and (N % 128 != 0 or N > 256):
        print(f'# L={N} outside the hammer envelope (N%128==0, N<=256); '
              f'falling back to worms=0')
        worms = 0

    if not on_tpu:
        print('# CPU backend: the fused kernels cannot run; this script is a '
              'TPU workload (shrunken shapes only smoke-test the plumbing).')
        therm, thin, launch_cap = 64, 16, 64

    rng = np.random.default_rng(20260821)

    def chunked(launch, state, sweeps):
        while sweeps > 0:
            c = min(sweeps, launch_cap)
            state = launch(state, c)
            sweeps -= c
        return state

    # ---- Villain side: z-mode fused sweeps (+ worms: the W=∞ Hammer) ------
    from supervillain_tpu.ops.pallas_sweep import neighborhood_sweeps
    from supervillain_tpu.ops.pallas_hammer import hammer_sweeps

    def v_launch(state, sweeps):
        phi, n = state
        if worms > 0:
            phi, n, acc, inline = hammer_sweeps(
                jnp.int32(rng.integers(0, 2 ** 31 - 1)), phi, n, N=N,
                kappa=kappa, W=float('inf'), interval_phi=1.5, interval_n=1,
                sweeps=sweeps, worms=max(1, (worms * sweeps) // thin),
                max_worm_moves=64 * N * N, interpret=not on_tpu)
        else:
            phi, n, acc, inline = neighborhood_sweeps(
                jnp.int32(rng.integers(0, 2 ** 31 - 1)), phi, n, N=N, kappa=kappa,
                W=float('inf'), interval_phi=1.5, interval_n=1, sweeps=sweeps,
                interpret=not on_tpu)
        return (phi, n), inline

    t0 = time.perf_counter()
    state = (jnp.zeros((B, 1, N, N), jnp.float32), jnp.zeros((B, 2, N, N), jnp.int32))
    state = chunked(lambda s, c: v_launch(s, c)[0], state, therm)
    v_ad = np.empty((args.records, B))
    for r in range(args.records):
        state = chunked(lambda s, c: v_launch(s, c)[0], state, max(0, thin - launch_cap))
        state, inline = v_launch(state, min(thin, launch_cap))
        v_ad[r] = np.asarray(inline['ActionDensity'])
    # The in-kernel WindingSquared doubles as an exact constraint check: dn = 0.
    assert float(np.abs(np.asarray(inline['WindingSquared'])).max()) == 0.0
    v_secs = time.perf_counter() - t0

    # ---- Worldline side: float-v fused local updates (+ worms: Hammer) ----
    from supervillain_tpu.ops.pallas_worldline import worldline_sweeps
    from supervillain_tpu.ops.pallas_worldline_hammer import worldline_hammer_sweeps
    from supervillain_tpu.ops import calculus as calc

    L2d = sv.Lattice2D(N)

    @jax.jit
    def w_action_density(m, v):
        """ActionDensity = κ∂_κS/Λ = 1 − (1/2κ)Σ(m − δv/2π)²/Λ  (W=∞: _W=2π)."""
        def one(m1, v1):
            f = m1.astype(jnp.float32) - calc.delta(L2d, 2, v1) / np.float32(2 * np.pi)
            return 1.0 - (0.5 / kappa) * jnp.sum(f * f) / (N * N)
        return jax.vmap(one)(m, v)

    def w_launch(state, sweeps):
        m, v = state
        if worms > 0:
            m, v, acc, _ = worldline_hammer_sweeps(
                jnp.int32(rng.integers(0, 2 ** 31 - 1)), m, v, N=N, kappa=kappa,
                W=float('inf'), interval_v=1, interval_t=1, interval_w=1,
                sweeps=sweeps, worms=max(1, (worms * sweeps) // thin),
                max_worm_moves=64 * N * N, interpret=not on_tpu)
        else:
            m, v, acc = worldline_sweeps(
                jnp.int32(rng.integers(0, 2 ** 31 - 1)), m, v, N=N, kappa=kappa,
                W=float('inf'), interval_v=1, interval_t=1, interval_w=1,
                sweeps=sweeps, interpret=not on_tpu)
        return (m, v)

    t0 = time.perf_counter()
    state = (jnp.zeros((B, 2, N, N), jnp.int32), jnp.zeros((B, 1, N, N), jnp.float32))
    state = chunked(w_launch, state, therm)
    w_ad = np.empty((args.records, B))
    for r in range(args.records):
        state = chunked(w_launch, state, thin)
        w_ad[r] = np.asarray(w_action_density(*state))
    # δm = 0 exactly on every chain.
    dm = jax.jit(jax.vmap(lambda x: calc.delta(L2d, 1, x)))(state[0])
    assert int(jnp.abs(dm).max()) == 0
    w_secs = time.perf_counter() - t0

    # ---- Duality comparison (per-chain means; chains independent) ---------
    def estimate(cols):
        per_chain = cols.mean(axis=0)
        return per_chain.mean(), per_chain.std(ddof=1) / np.sqrt(len(per_chain))

    mv, ev = estimate(v_ad)
    mw, ew = estimate(w_ad)
    pull = (mv - mw) / np.hypot(ev, ew)
    kappa_str = '1/2π' if abs(kappa - 0.5 / np.pi) < 1e-12 else f'{kappa}'
    print(f'# self-dual W=∞ κ={kappa_str} L={N} chains={B} therm={therm} '
          f'records={args.records}×thin={thin}')
    print(f'Villain   (z-mode fused)  ActionDensity = {Uncertain(mv, ev)}   [{v_secs:.0f} s]')
    print(f'Worldline (fused W=∞)     ActionDensity = {Uncertain(mw, ew)}   [{w_secs:.0f} s]')
    print(f'duality pull: {pull:+.2f}σ')
    return pull


if __name__ == '__main__':
    main()
