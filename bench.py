"""Headline benchmark: site-updates/s/chip on the Villain NeighborhoodUpdate sweep
(the reference's default end-to-end generator), chain-batched, at L=64..1024.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Timing methodology: because some TPU runtimes return from ``block_until_ready``
at dispatch rather than completion, every timed region chains several launches
through a data dependency (the previous launch's state feeds the next) and is
gated on an actual host readback.  The first (untimed) launch absorbs
compilation and thermalizes the state.

``vs_baseline`` compares against a single-chain vectorized-NumPy implementation
of the same checkerboarded sweep — the reference's execution model (NumPy array
ops per color; /root/reference/supervillain/generator/villain/neighborhood.py:59-137)
— measured in the same process on this host's CPU.

Roofline context (see VALIDATION.md §roofline for the stage-by-stage
derivation): the fused Villain kernel executes 224 source-level VPU vector ops
per site-update (convention: every elementwise op/convert/select/compare/roll
= 1, a PRNG draw = 4, e^x via exp2 = 2, reductions = 1/element; no FMA credit
— Mosaic fuses some multiply-add pairs into single slots, so the derived
"fraction of ALU peak" is an upper bound on true slot occupancy).  At 50
sweeps/launch HBM traffic is ~0.5 B/su — per-chip throughput is VPU-bound,
not HBM-bound, by design.  The Worldline local-update stack (2 vortex + 2
coexact color passes + wrapping per sweep) executes ~268 ops per site-sweep
under the same convention.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OPS_PER_SITE_UPDATE = 224          # Villain kernel: source-level vector ops/su
OPS_PER_WL_SITE_UPDATE = 268       # Worldline stack: ops per site per sweep
V5E_VPU_PEAK = 8 * 128 * 4 * 0.94e9  # lanes × sublanes × ALUs × clock [op/s]
V5E_HBM_BW = 8.1e11                # B/s


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


def _fused_rate(jnp, fn, L, B, sweeps, reps, kappa, cpp=1):
    """Honest su/s: warmup launch (compile + thermalize), then ``reps`` chained
    launches gated on a host readback.  ``cpp`` packs chains per program so
    small lattices still fill the 128 vector lanes."""
    phi = jnp.zeros((B, 1, L, L), jnp.float32)
    n = jnp.zeros((B, 2, L, L), jnp.int32)
    phi, n, acc, _ = fn(jnp.int32(1), phi, n, N=L, kappa=kappa, W=1,
                        interval_phi=float(np.pi), interval_n=1, sweeps=sweeps,
                        chains_per_program=cpp)
    float(acc.sum())
    start = time.perf_counter()
    for k in range(reps):
        phi, n, acc, _ = fn(jnp.int32(2 + k), phi, n, N=L, kappa=kappa, W=1,
                            interval_phi=float(np.pi), interval_n=1, sweeps=sweeps,
                            chains_per_program=cpp)
    float(acc.sum())
    elapsed = time.perf_counter() - start
    return reps * B * L * L * sweeps / elapsed, elapsed


def _worldline_rate(jnp, L, B, sweeps, reps, kappa, W=2, cpp=1):
    """Worldline fused-stack su/s: one su = one site through the full
    vortex+coexact+wrapping sweep stack.  Same timing discipline as
    :func:`_fused_rate` (warmup launch, chained launches, host-readback gate).
    ``cpp`` packs chains per program (interleaved layout) at small L."""
    from supervillain_tpu.ops.pallas_worldline import worldline_sweeps
    m = jnp.zeros((B, 2, L, L), jnp.int32)
    v = jnp.zeros((B, 1, L, L), jnp.int32)
    m, v, acc = worldline_sweeps(jnp.int32(1), m, v, N=L, kappa=kappa, W=W,
                                 sweeps=sweeps, chains_per_program=cpp)
    float(acc.sum())
    start = time.perf_counter()
    for k in range(reps):
        m, v, acc = worldline_sweeps(jnp.int32(2 + k), m, v, N=L, kappa=kappa,
                                     W=W, sweeps=sweeps, chains_per_program=cpp)
    float(acc.sum())
    elapsed = time.perf_counter() - start
    return reps * B * L * L * sweeps / elapsed, elapsed


def _worldline_hammer_rate(jnp, L, B, sweeps, worms, reps, kappa, W=2):
    """Worldline fused-Hammer throughput (sweeps + in-kernel worms per launch).

    At equilibrium the worm length is set by physics (≈ the spin
    susceptibility — tens of thousands of moves per worm at κ=0.5), and every
    worm move is sampling work, so the headline counts sweep site-updates AND
    worm moves as update operations.  The per-rep inline arrays are
    accumulated ON DEVICE and converted to floats only after the final
    host-readback gate — a float() inside the timed loop would force a device
    sync per rep and deflate the rate (round-4 advisor finding).  Returns
    (updates/s, sweep-su/s, worm-moves/s, elapsed)."""
    from supervillain_tpu.ops.pallas_worldline_hammer import worldline_hammer_sweeps
    kw = dict(N=L, kappa=kappa, W=W, sweeps=sweeps, worms=worms,
              max_worm_moves=64 * L * L)
    m = jnp.zeros((B, 2, L, L), jnp.int32)
    v = jnp.zeros((B, 1, L, L), jnp.int32)
    m, v, acc, inline = worldline_hammer_sweeps(jnp.int32(1), m, v, **kw)
    float(acc.sum())
    per_rep_moves = []
    start = time.perf_counter()
    for k in range(reps):
        m, v, acc, inline = worldline_hammer_sweeps(jnp.int32(2 + k), m, v, **kw)
        per_rep_moves.append(inline['Worm_Length'].sum())
    float(acc.sum())
    elapsed = time.perf_counter() - start
    moves = float(sum(float(x) for x in per_rep_moves))
    su = reps * B * L * L * sweeps
    return (su + moves) / elapsed, su / elapsed, moves / elapsed, elapsed


def _villain_hammer_rate(jnp, L, B, sweeps, worms, reps, kappa, W=2, p_n=0.05):
    """Villain fused-Hammer throughput (sweeps + in-kernel worms, one launch;
    strip-regime kernel above L=256).  Same single-end-gate timing discipline
    as :func:`_worldline_hammer_rate`."""
    from supervillain_tpu.ops.pallas_hammer import hammer_sweeps
    kw = dict(N=L, kappa=kappa, W=W, interval_phi=0.7, interval_n=1, p_n=p_n,
              sweeps=sweeps, worms=worms, max_worm_moves=64 * L * L)
    phi = jnp.zeros((B, 1, L, L), jnp.float32)
    n = jnp.zeros((B, 2, L, L), jnp.int32)
    phi, n, acc, inline = hammer_sweeps(jnp.int32(1), phi, n, **kw)
    float(acc.sum())
    per_rep_moves = []
    start = time.perf_counter()
    for k in range(reps):
        phi, n, acc, inline = hammer_sweeps(jnp.int32(2 + k), phi, n, **kw)
        per_rep_moves.append(inline['Worm_Length'].sum())
    float(acc.sum())
    elapsed = time.perf_counter() - start
    moves = float(sum(float(x) for x in per_rep_moves))
    su = reps * B * L * L * sweeps
    return (su + moves) / elapsed, su / elapsed, moves / elapsed, elapsed


def _scaling_with_chip_curve(scaling, chip_curve):
    """Attach the real-chip saturation curve to the (possibly None) virtual
    weak-scaling summary."""
    if not chip_curve:
        return scaling
    scaling = dict(scaling or {})
    scaling['real_chip_chains_sweep_L128_su_per_s'] = chip_curve
    scaling['real_chip_note'] = (
        'Measured on the real chip: su/s vs chains at L=128 (median of 3). '
        'A flat curve past saturation is the per-chip roofline the zero-'
        'collective weak-scaling argument composes: N chips = N saturated '
        'batches, no cross-device communication in the compiled step.')
    return scaling


def _scaling_summary(fast):
    """Weak-scaling evidence for the bench record.

    Runs the virtual-8-device CPU harness in a subprocess (the TPU-owning
    process cannot re-init a CPU mesh) and reports its table plus the
    collective audit; falls back to the committed SCALING_r03.json artifact
    if the subprocess cannot run (or BENCH_FAST is set)."""
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    # Write to an untracked output path by default so a bench run on any machine
    # cannot silently change the committed round artifact; set
    # BENCH_SCALING_ARTIFACT=SCALING_rNN.json to refresh a tracked artifact
    # deliberately.  Reading falls back to the latest committed artifact.
    out_path = os.path.join(here, os.environ.get('BENCH_SCALING_ARTIFACT',
                                                 'SCALING_out.json'))
    if not fast:
        env = dict(os.environ, JAX_PLATFORMS='cpu')
        env.pop('XLA_FLAGS', None)
        try:
            subprocess.run(
                [sys.executable, '-m', 'supervillain_tpu.benchmark.scaling',
                 '--virtual-cpu', '8', '--N', '32', '--chains-per-device', '16',
                 '--steps', '20', '--json', out_path],
                cwd=here, env=env, timeout=420, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except Exception as e:
            print(f'# scaling subprocess unavailable ({e}); using committed artifact',
                  flush=True)
    import glob
    committed = sorted(glob.glob(os.path.join(here, 'SCALING_r*.json')),
                       reverse=True)
    data = None
    for candidate in [out_path] + committed:
        try:
            with open(candidate) as f:
                data = json.load(f)
            break
        except FileNotFoundError:
            continue
    if data is None:
        return None
    return {
        'weak_scaling_virtual_cpu': data.get('weak_scaling'),
        'collectives_in_compiled_step': data.get('collectives_in_compiled_step'),
        'collectives_in_space_sharded_step':
            data.get('collectives_in_space_sharded_step'),
        'host_physical_cores': data.get('config', {}).get('host_physical_cores'),
        'note': data.get('note'),
    }


def main():
    import jax
    # Counter-based RBG keys are substantially cheaper than threefry on TPU.
    jax.config.update('jax_default_prng_impl', 'rbg')
    import jax.numpy as jnp
    import supervillain_tpu as sv
    from supervillain_tpu.generators import villain as gv

    N = 256
    kappa = 0.5
    # 512 chains: the grid needs enough programs in flight to overlap the
    # launch-boundary DMA with compute; the round-5 chain sweep showed the
    # knee is much higher than round 4 assumed (256→512 chains at L=256 is
    # worth +10%, 16→128 at L=1024 is worth +40%).
    chains = 512
    on_tpu = jax.default_backend() not in ('cpu',)
    fast = os.environ.get('BENCH_FAST') == '1'

    if on_tpu:
        from supervillain_tpu.ops.pallas_sweep import neighborhood_sweeps

        def median_of(k, *args, **kwargs):
            # The tunnel-attached runtime shows occasional ~20-30% transient
            # slowdowns.  The headline is the MEDIAN of k samples (robust to
            # transients without skewing optimistic); the best is recorded
            # alongside for the capability number.
            samples = sorted(_fused_rate(jnp, neighborhood_sweeps, *args, **kwargs)
                             for _ in range(k))
            med = samples[len(samples) // 2]
            return med[0], med[1], samples[-1][0]

        k_samples = 1 if fast else 3
        rate, elapsed, rate_best = median_of(k_samples, N, chains, sweeps=50,
                                             reps=3, kappa=kappa)

        if os.environ.get('BENCH_PROFILE') == '1':
            # Capture one profiler trace of a timed launch as an artifact
            # (profiles/ is untracked; inspect with tensorboard or xprof).
            try:
                with jax.profiler.trace('profiles/bench'):
                    _fused_rate(jnp, neighborhood_sweeps, N, chains,
                                sweeps=50, reps=1, kappa=kappa)
            except Exception as e:  # the relay backend may not support tracing
                print(f'# profiler trace unavailable: {e}', flush=True)

        sweep_table = {}
        if not fast:
            for (Lx, Bx, cpp) in ((64, 2048, 16), (128, 1024, 4), (512, 256, 1),
                                  (1024, 128, 1)):
                rx, _, _ = median_of(3, Lx, Bx, sweeps=50, reps=3, kappa=kappa, cpp=cpp)
                sweep_table[f'L={Lx}'] = rx
        sweep_table[f'L={N}'] = rate

        # Villain fused Hammer (sweeps + in-kernel worms, one launch) across
        # the whole envelope — the strip-regime kernel serves L >= 512.
        vh_table = {}
        if not fast:
            for (Lx, Bx) in ((256, 256), (512, 128), (1024, 64)):
                samples = sorted(_villain_hammer_rate(
                    jnp, Lx, Bx, sweeps=50, worms=1, reps=3, kappa=kappa)
                    for _ in range(3))
                vh_table[f'L={Lx}'] = samples[1][1]  # sweep su/s

        # Worldline formulation: the dual half of the framework, same timing
        # discipline (median of k).  su = site through one full
        # vortex+coexact+wrapping stack iteration.
        def wl_median(k, *a, **kw):
            samples = sorted(_worldline_rate(jnp, *a, **kw) for _ in range(k))
            return samples[len(samples) // 2][0]

        wl_table = {}
        if not fast:
            for (Lx, Bx, cppx) in ((64, 2048, 16), (128, 1024, 4), (512, 256, 1),
                                   (1024, 128, 1)):
                wl_table[f'L={Lx}'] = wl_median(3, Lx, Bx, sweeps=50, reps=3,
                                                kappa=kappa, cpp=cppx)
        wl_rate = wl_median(k_samples, N, chains, sweeps=50, reps=3, kappa=kappa)
        wl_table[f'L={N}'] = wl_rate

        def wlh_median(k, *a, **kw):
            samples = sorted(_worldline_hammer_rate(jnp, *a, **kw)
                             for _ in range(k))
            return samples[len(samples) // 2]

        wl_hammer_rate, wl_h_su, wl_h_moves, _ = wlh_median(
            k_samples, N, chains, sweeps=50, worms=1, reps=3, kappa=kappa)
        wlh_table = {}
        if not fast:
            for (Lx, Bx) in ((512, 64), (1024, 32)):
                s = wlh_median(3, Lx, Bx, sweeps=50, worms=1, reps=3, kappa=kappa)
                wlh_table[f'L={Lx}'] = s[1]  # sweep su/s

        # Real-chip per-device saturation curve (the missing link in the
        # multi-chip ≥90% structural argument): su/s vs chains at fixed L.
        # Once the curve is flat the chip is saturated; adding chips adds
        # saturated batches with zero collectives, so weak scaling is
        # communication-free by construction.  Round 4 stopped at 512 chains
        # while still rising (VERDICT r4 #3); the curve now extends until the
        # last octave gains <= 5% or 4096 chains.
        chip_curve = {}
        if not fast:
            prev = None
            for Bx in (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192):
                rx, _, _ = median_of(3, 128, Bx, sweeps=50, reps=3,
                                     kappa=kappa, cpp=4)
                chip_curve[f'chains={Bx}'] = rx
                if prev is not None and rx < prev * 1.05 and Bx >= 1024:
                    break
                prev = rx

        # D>2 production path (Pallas is D=2-only by design; the XLA stencil
        # path serves D>=3): compile-excluded steady state at the measured
        # saturating chain count (DIMENSION_r05.json knee), as a first-class
        # bench row (VERDICT r4 #6).
        d4_rate = None
        if not fast:
            # One call (each call re-traces the jitted fleet): reps=6 chained
            # launches inside the timed region already average the transients.
            from supervillain_tpu.benchmark.dimension import steady_state_rate
            d4_rate, _ = steady_state_rate(D=4, N=8, chains=512, thin=16,
                                           reps=6, kappa=0.4)

        base_steps = 5
        base_elapsed = numpy_baseline_sweep(N, kappa, 1, base_steps, np.random.default_rng(0))
        base_rate = (N * N * base_steps) / base_elapsed
        full = {
            'metric': f'site-updates/s/chip (Villain NeighborhoodUpdate, pallas-fused, L=256, {chains} chains)',
            'value': rate,
            'unit': 'site-updates/s',
            'vs_baseline': rate / base_rate,
            'detail': {
                'elapsed_s': elapsed,
                'timing': f'median of {k_samples} samples (best sample recorded '
                          'as value_best)',
                'value_best': rate_best,
                'sweeps_per_launch': 50,
                'timed_launches': 3,
                'chains': chains,
                'L': N,
                'baseline_rate_numpy_1chain': base_rate,
                'device': str(jax.devices()[0]),
                'kernel': 'pallas_fused_vmem_resident (strip-chunked for L>=512)',
                'L_sweep_su_per_s': sweep_table,
                'worldline': {
                    'metric': 'site-updates/s/chip (Worldline '
                              'vortex+coexact+wrapping fused stack, W=2)',
                    'value': wl_rate,
                    'L_sweep_su_per_s': wl_table,
                    'hammer_updates_per_s': wl_hammer_rate,
                    'hammer_sweep_su_per_s': wl_h_su,
                    'hammer_worm_moves_per_s': wl_h_moves,
                    'hammer_note': 'sweeps + 1 in-kernel worm per 50-sweep '
                                   'launch (the full reference worldline '
                                   'Hammer in one launch).  At κ=0.5 the '
                                   'equilibrium worm length is O(10^4) moves '
                                   'per worm (≈ the susceptibility), so worm '
                                   'time dominates the launch; the in-kernel '
                                   'worm costs ~0.2 µs/move vs the XLA '
                                   'vmapped worm\'s ~20 µs/move batch '
                                   'lock-step (benchmark/worm_cost.py)',
                    'roofline': {
                        'ops_per_su': OPS_PER_WL_SITE_UPDATE,
                        'achieved_op_per_s': wl_rate * OPS_PER_WL_SITE_UPDATE,
                        'vpu_fraction': wl_rate * OPS_PER_WL_SITE_UPDATE / V5E_VPU_PEAK,
                        'note': 'no-FMA source-op convention; a fraction '
                                'above 1.0 is direct evidence that Mosaic '
                                'fuses multiply-add pairs into single-slot '
                                'FMAs (~24 fusible pairs per stack → ~0.91 '
                                'with full FMA credit)',
                    },
                },
                'roofline': {
                    'ops_per_su': OPS_PER_SITE_UPDATE,
                    'ops_convention': 'source-level vector ops, no FMA credit '
                                      '(upper bound on slot occupancy); see '
                                      'VALIDATION.md',
                    'achieved_op_per_s': rate * OPS_PER_SITE_UPDATE,
                    'vpu_peak_op_per_s': V5E_VPU_PEAK,
                    'vpu_fraction': rate * OPS_PER_SITE_UPDATE / V5E_VPU_PEAK,
                    'hbm_bytes_per_su': 24.0 / 50,
                    'hbm_fraction': rate * 24.0 / 50 / V5E_HBM_BW,
                },
                'scaling': _scaling_with_chip_curve(_scaling_summary(fast),
                                                    chip_curve),
            },
        }
        full['detail']['villain_hammer_sweep_su_per_s'] = vh_table
        if d4_rate is not None:
            full['detail']['d4_xla_steady_state'] = {
                'su_per_s': d4_rate,
                'config': 'D=4 N=8 chains=512 thin=16 (median of 3; '
                          'compile-excluded, donated buffers)',
                'note': 'HBM-bound at ~60% of the 348 B/su fusion-writes '
                        'roof — see VALIDATION.md D=4 analysis and '
                        'DIMENSION_r05.json for the chain-count curve',
            }
        full['detail']['worldline']['hammer_sweep_su_per_s_by_L'] = wlh_table

        # The driver captures a bounded stdout tail, so the LAST line must be
        # one compact machine-parseable JSON record (VERDICT r4 #7); the full
        # nested blob goes to a committed artifact file instead.
        here = os.path.dirname(os.path.abspath(__file__))
        # A BENCH_FAST run skips most tables; route its sparse detail blob to
        # an untracked path so it cannot clobber the committed full artifact.
        default_detail = 'BENCH_DETAIL.json.tmp' if fast else 'BENCH_DETAIL.json'
        detail_path = os.environ.get('BENCH_DETAIL_PATH',
                                     os.path.join(here, default_detail))
        with open(detail_path, 'w') as f:
            json.dump(full, f, indent=1)
        scaling = full['detail']['scaling'] or {}
        eff = {str(r['devices']): round(r['efficiency'], 3)
               for r in (scaling.get('weak_scaling_virtual_cpu') or [])}
        compact = {
            'metric': full['metric'],
            'value': rate,
            'unit': 'site-updates/s',
            'vs_baseline': rate / base_rate,
            'L_sweep': {k: round(v / 1e9, 2) for k, v in sweep_table.items()},
            'villain_hammer': {k: round(v / 1e9, 2) for k, v in vh_table.items()},
            'worldline': {k: round(v / 1e9, 2) for k, v in wl_table.items()},
            'worldline_hammer_updates_per_s': round(wl_hammer_rate / 1e6, 1),
            'chip_curve_L128': {k: round(v / 1e9, 2)
                                for k, v in chip_curve.items()},
            'd4_8p4_steady_state_Msu_per_s': (
                round(d4_rate / 1e6, 1) if d4_rate is not None else None),
            'weak_scaling_eff_virtual_cpu': eff,
            'vpu_fraction_no_fma': round(
                rate * OPS_PER_SITE_UPDATE / V5E_VPU_PEAK, 3),
            'detail_file': os.path.basename(detail_path),
        }
        print(json.dumps(compact))
        return

    L = sv.Lattice2D(N)
    S = sv.Villain(L, kappa, W=1)
    G = gv.NeighborhoodUpdate(S)

    timed_steps = 20
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
        # Reduce to scalars: fetching these forces the whole chain to complete.
        return jax.tree.map(lambda x: x.sum(), cfgs), stats

    out, stats = fleet_steps(jax.random.key(0), cfgs, stats)
    float(out['phi'])
    start = time.perf_counter()
    out, stats = fleet_steps(jax.random.key(1), cfgs, stats)
    float(out['phi'])
    elapsed = time.perf_counter() - start

    site_updates = chains * L.sites * timed_steps
    rate = site_updates / elapsed

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
