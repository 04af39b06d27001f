"""Pallas TPU kernels: the in-kernel Worldline worm, and the fused Worldline
Hammer — local-update sweeps *and* worms in one launch.

The reference treats the Worldline (dual) formulation as a first-class
production stack whose preferred ergodic composite is
Sequentially(Vortex, Coexact, Wrapping, Worm)
(/root/reference/supervillain/generator/worldline/__init__.py:9-40, worm at
worm.py:16-215).  The XLA :class:`~supervillain_tpu.generators.worldline
.ClassicWorm` vmapped over a fleet pays (max worm length over chains) × (batch
scatter latency) per step — the same pathology the Villain kernels solved in
:mod:`.pallas_worm` / :mod:`.pallas_hammer`.  These kernels give the Worldline
half the same treatment:

* :func:`worldline_worms` — each chain's worm runs *sequentially inside one
  program*: the link residuals u = m − δv/_W live in VMEM, each move is a
  handful of scalar ops plus (1,1) dynamic loads/stores, and ``worms`` whole
  worms run per launch with no cross-chain synchronization.
* :func:`worldline_hammer_sweeps` — ``sweeps`` full local-update stacks
  (checkerboarded Vortex + Coexact passes and a Wrapping pass, the
  :func:`..pallas_worldline._monolithic_passes` bodies) followed by ``worms``
  classic worms consuming the *same* VMEM-resident residuals: the complete
  reference Hammer composition in one launch.

Move semantics match the XLA worm (reference worm.py:121-174): the head moves
to one of the 4 neighboring *sites*; a forward move +e_k crosses the link at
the head with Δm = +orientation, a backward move −e_k crosses the link at the
arrival site with Δm = −orientation; Metropolis on
ΔS = (1/2κ) Δm (2u + Δm) of the crossed link; when head == tail a
1/(2D+1)-conditional close move ends the worm; every non-close move tallies
the head−tail displacement into the inline ``Spin_Spin`` histogram.  Worms run
unbounded *by default* (there is no cross-chain lock-step to protect, so no
cap is structurally required) — but an unbounded worm's step time is also
unbounded, and production fleets should pass ``max_worm_moves`` (e.g. 64·N²,
the :func:`~supervillain_tpu.parallel.fused_fleet.sample_fused_fleet`
default): see :func:`_worm_section` for the truncation-rollback semantics and
the documented short-separation histogram bias when truncation fires.  The
PRNG stream is the on-core hardware PRNG, so agreement with the XLA path is
statistical, not bitwise.

Works at any W **including W = ∞**: the worm only changes m (v and δv are
frozen), and δm = 0 is restored at close for every W — at W = ∞ the residual
uses _W = 2π and float v, exactly as the sweep kernels do.

D=2 only (like the reference's 2D workloads; the XLA worm stays
dimension-general).  Grid: one program per chain.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _exp_neg, _roll
from .pallas_worldline import (_monolithic_passes, _delta2,
                               _strip_sweep_section, _strip_rows,
                               STRIP_THRESHOLD)

_GOLD = np.int32(2654435761 & 0x7FFFFFFF)


def _worm_section(N, NP, kappa, worms, m_out, hist_ref, l0_s, l1_s,
                  snap=None, cap=None):
    """Trace ``worms`` sequential site-worms on the VMEM-resident residuals.

    ``m_out``: (1, 2, N, NP) int32 output ref (updated in place);
    ``hist_ref``: (1, N, NP) float32 Spin_Spin tally ref (pre-zeroed);
    ``l0_s``/``l1_s``: (N, NP) float32 link-residual scratch u_mu = m_mu − (δv)_mu/_W.

    ``cap``/``snap``: optional move bound with exact truncation-rollback — an
    open worldline worm violates δm = 0, so a worm that has not closed after
    ``cap`` moves restores (m0, m1, l0, l1) from the 4 ``snap`` scratch
    buffers taken at its start (histogram tallies are kept, as in the XLA
    worm; the cap bounds the launch time against the monster-excursion tail
    of the worm-length distribution, which can otherwise outlive the TPU
    runtime watchdog).

    Returns the truncation count (0 when uncapped); tallies live in
    ``hist_ref`` (total length = its sum).
    """
    inv2k = np.float32(0.5 / float(kappa))

    # Per-choice tables: head moves +e0, +e1, −e0, −e1 (reference worm.py:126).
    MOVE_T = (1, 0, -1, 0)
    MOVE_X = (0, 1, 0, -1)
    AXIS = (0, 1, 0, 1)
    SGN = (1, 1, -1, -1)        # Δm = orientation · SGN on the crossed link
    OFFL_T = (0, 0, -1, 0)      # crossed-link position − head (backward moves
    OFFL_X = (0, 0, 0, -1)      # cross the link at the arrival site)

    def pick(choice, table):
        out = jnp.int32(table[0])
        for c in (1, 2, 3):
            out = jnp.where(choice == c, jnp.int32(table[c]), out)
        return out

    def draws():
        bits = pltpu.bitcast(pltpu.prng_random_bits((8, 128)), jnp.int32)
        return bits[0, 0], bits[0, 1], bits[0, 2], bits[0, 3]

    def unif(w):
        low24 = jax.lax.bitwise_and(w, jnp.int32(0x00FFFFFF))
        return low24.astype(jnp.float32) * np.float32(2 ** -24)

    def rand_site(w):
        return jnp.floor(unif(w) * np.float32(N)).astype(jnp.int32)

    # Mosaic allows dynamic single-row slices but lane-dim indices must be
    # 128-aligned, so element access = row slice + lane mask.
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)

    def load1(ref, i, j):
        row = ref[pl.ds(i, 1), :]
        return jnp.sum(jnp.where(lane1 == j, row, jnp.zeros_like(row)))

    def add1(ref, i, j, val):
        row = ref[pl.ds(i, 1), :]
        ref[pl.ds(i, 1), :] = row + jnp.where(lane1 == j, val, jnp.zeros_like(row))

    def worm_body(w, carry):
        w0, w1, w2, _ = draws()
        orientation = jnp.where(w0 > 0, jnp.float32(1), jnp.float32(-1))
        tail_t = rand_site(w1)
        tail_x = rand_site(w2)
        # The worldline worm always starts closed at its tail (an open worm
        # violates δm = 0 at head/tail for every W — reference worm.py:104).

        if cap is not None:
            ms0, ms1, ls0, ls1 = snap
            ms0[:] = m_out[0, 0]
            ms1[:] = m_out[0, 1]
            ls0[:] = l0_s[:]
            ls1[:] = l1_s[:]

        def cond(state):
            open_ = state[0] == 0
            if cap is not None:
                open_ = open_ & (state[3] < cap)
            return open_

        def body(state):
            _, head_t, head_x, moves = state
            c0, c1, c2, _ = draws()
            u_close = unif(c0)
            choice = jax.lax.bitwise_and(c1, jnp.int32(3))
            u_acc = unif(c2)

            closed = (head_t == tail_t) & (head_x == tail_x)
            close_now = closed & (u_close < np.float32(0.2))  # 1/(2D+1), D=2

            next_t = jax.lax.rem(head_t + pick(choice, MOVE_T) + N, jnp.int32(N))
            next_x = jax.lax.rem(head_x + pick(choice, MOVE_X) + N, jnp.int32(N))
            ax = pick(choice, AXIS)
            lt = jax.lax.rem(head_t + pick(choice, OFFL_T) + N, jnp.int32(N))
            lx = jax.lax.rem(head_x + pick(choice, OFFL_X) + N, jnp.int32(N))
            dm = orientation * pick(choice, SGN).astype(jnp.float32)

            link_val = jnp.where(ax == 0, load1(l0_s, lt, lx), load1(l1_s, lt, lx))
            dS = inv2k * dm * (2.0 * link_val + dm)
            accept = (u_acc < _exp_neg(dS)) & ~close_now
            dmi = dm.astype(jnp.int32)

            @pl.when(accept & (ax == 0))
            def _():
                add1(m_out.at[0, 0], lt, lx, dmi)
                add1(l0_s, lt, lx, dm)

            @pl.when(accept & (ax == 1))
            def _():
                add1(m_out.at[0, 1], lt, lx, dmi)
                add1(l1_s, lt, lx, dm)

            head_t = jnp.where(accept, next_t, head_t)
            head_x = jnp.where(accept, next_x, head_x)

            @pl.when(~close_now)
            def _():
                dt = jax.lax.rem(head_t - tail_t + N, jnp.int32(N))
                dx = jax.lax.rem(head_x - tail_x + N, jnp.int32(N))
                add1(hist_ref.at[0], dt, dx, np.float32(1.0))

            return (jnp.where(close_now, jnp.int32(1), jnp.int32(0)),
                    head_t, head_x, moves + 1)

        done, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tail_t, tail_x, jnp.int32(0)))

        if cap is not None:
            truncated = done == 0

            @pl.when(truncated)
            def _():
                ms0, ms1, ls0, ls1 = snap
                m_out[0, 0] = ms0[:]
                m_out[0, 1] = ms1[:]
                l0_s[:] = ls0[:]
                l1_s[:] = ls1[:]

            carry = carry + jnp.where(truncated, jnp.int32(1), jnp.int32(0))
        return carry

    return jax.lax.fori_loop(0, worms, worm_body, jnp.int32(0))


def _make_worm_kernel(N, NP, kappa, worms, worm_cap=None):
    """Standalone worldline-worm kernel: inputs m and the host-computed link
    residual u = m − δv/_W (so the kernel is W-agnostic)."""

    def kernel(seed_ref, m_ref, u_ref, m_out, hist_ref, stat_ref, l0_s, l1_s,
               *snap):
        chain = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + chain * _GOLD)

        m_out[0, 0] = m_ref[0, 0]
        m_out[0, 1] = m_ref[0, 1]
        hist_ref[0] = jnp.zeros((N, NP), jnp.float32)
        l0_s[:] = u_ref[0, 0]
        l1_s[:] = u_ref[0, 1]

        truncations = _worm_section(N, NP, kappa, worms, m_out, hist_ref,
                                    l0_s, l1_s, snap=snap or None,
                                    cap=worm_cap)

        length = jnp.sum(hist_ref[0])
        stat_ref[0] = jnp.concatenate([
            jnp.full((1, 128), length, jnp.float32),
            jnp.full((1, 128), np.float32(worms), jnp.float32),
            jnp.full((1, 128), truncations.astype(jnp.float32), jnp.float32),
            jnp.zeros((5, 128), jnp.float32),
        ], axis=0)

    return kernel


@partial(jax.jit, static_argnames=('N', 'kappa', 'W', 'worms', 'max_worm_moves',
                                   'interpret'))
def worldline_worms(seed, m, v, *, N, kappa, W, worms=1, max_worm_moves=None,
                    interpret=False):
    """Run ``worms`` whole worldline classic worms per chain in one launch.

    Parameters
    ----------
    seed: int32 ()
    m: (B, 2, N, N) int32
    v: (B, 1, N, N) int32 (finite W) or float32 (W = inf) — read-only (δv/_W
       enters the link residual; the worm never changes v)

    Returns
    -------
    (m, hist, length): updated links (B, 2, N, N) with δm = 0 restored, the
    summed inline ``Spin_Spin`` histogram (B, N, N) f32, and total worm length
    (B,).
    """
    B = m.shape[0]
    fW = np.float32(2 * np.pi) if W == float('inf') else np.float32(W)
    vv = v[:, 0].astype(jnp.float32)
    # δ of the 2-form component (host-side, XLA): (δv)_0 = v − roll(v, +1, x);
    # (δv)_1 = −(v − roll(v, +1, t)) — the same stencil as the kernels'.
    dv0 = vv - jnp.roll(vv, 1, axis=2)
    dv1 = -(vv - jnp.roll(vv, 1, axis=1))
    u = jnp.stack([m[:, 0].astype(jnp.float32) - dv0 / fW,
                   m[:, 1].astype(jnp.float32) - dv1 / fW], axis=1)

    NP = max(N, 128)
    m_in = m.astype(jnp.int32)
    if NP != N:
        padding = [(0, 0)] * 3 + [(0, NP - N)]
        m_in = jnp.pad(m_in, padding)
        u = jnp.pad(u, padding)

    cap = None if max_worm_moves is None else int(max_worm_moves)
    kernel = _make_worm_kernel(N, NP, kappa, worms, worm_cap=cap)
    scratch = [pltpu.VMEM((N, NP), jnp.float32),
               pltpu.VMEM((N, NP), jnp.float32)]
    if cap is not None:
        scratch += [pltpu.VMEM((N, NP), jnp.int32),
                    pltpu.VMEM((N, NP), jnp.int32),
                    pltpu.VMEM((N, NP), jnp.float32),
                    pltpu.VMEM((N, NP), jnp.float32)]
    f_spec = pl.BlockSpec((1, 2, N, NP), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    m_out, hist, stat = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), f_spec, f_spec],
        out_specs=(f_spec,
                   pl.BlockSpec((1, N, NP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, 2, N, NP), jnp.int32),
                   jax.ShapeDtypeStruct((B, N, NP), jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), m_in, u)
    return m_out[..., :N], hist[..., :N], stat[:, 0, 0]


def _make_hammer_kernel(N, kappa, W, interval_v, interval_t, interval_w,
                        sweeps, worms, worm_cap=None):
    winf = (W == float('inf'))
    inv2k = np.float32(0.5 / float(kappa))
    fW = np.float32(2 * np.pi) if winf else np.float32(W)

    def kernel(seed_ref, m_ref, v_ref, m_out, v_out, hist_ref, stat_ref,
               l0_s, l1_s, *snap):
        chain = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + chain * _GOLD)

        sweep = _monolithic_passes(N, kappa, W, interval_v, interval_t, interval_w)

        m0 = m_ref[0, 0]
        m1 = m_ref[0, 1]
        v = v_ref[0, 0]
        dv0, dv1 = _delta2(v)
        dv0 = dv0.astype(jnp.float32)
        dv1 = dv1.astype(jnp.float32)

        # ---- section 1: vortex/coexact/wrapping sweeps ---------------------
        def sweep2(s, st):
            m0, m1, v, dv0, dv1, acc, sS = st
            m0, m1, v, dv0, dv1, acc = sweep(s, (m0, m1, v, dv0, dv1, acc))
            # Inline ActionDensity (1/2κ)Σ(m − δv/_W)²/Λ once per sweep while
            # the state is hot in VMEM.
            l0 = m0.astype(jnp.float32) - dv0 / fW
            l1 = m1.astype(jnp.float32) - dv1 / fW
            sS = sS + inv2k * (jnp.sum(l0 * l0) + jnp.sum(l1 * l1)) \
                * np.float32(1.0 / (N * N))
            return m0, m1, v, dv0, dv1, acc, sS

        m0, m1, v, dv0, dv1, acc, sS = jax.lax.fori_loop(
            0, sweeps, sweep2,
            (m0, m1, v, dv0, dv1, jnp.float32(0.0), jnp.float32(0.0)))

        m_out[0, 0] = m0
        m_out[0, 1] = m1
        v_out[0, 0] = v
        hist_ref[0] = jnp.zeros((N, N), jnp.float32)
        l0_s[:] = m0.astype(jnp.float32) - dv0 / fW
        l1_s[:] = m1.astype(jnp.float32) - dv1 / fW

        # ---- section 2: classic worms on the resident residuals ------------
        truncations = _worm_section(N, N, kappa, worms, m_out, hist_ref,
                                    l0_s, l1_s, snap=snap or None,
                                    cap=worm_cap)

        length = jnp.sum(hist_ref[0])
        stat_ref[0] = jnp.concatenate([
            jnp.full((1, 128), acc, jnp.float32),
            jnp.full((1, 128), sS, jnp.float32),
            jnp.full((1, 128), length, jnp.float32),
            jnp.full((1, 128), truncations.astype(jnp.float32), jnp.float32),
            jnp.zeros((4, 128), jnp.float32),
        ], axis=0)

    return kernel


def _make_strip_hammer_kernel(N, Rb, kappa, W, interval_v, interval_t,
                              interval_w, sweeps, worms, worm_cap=None):
    """Strip-regime fused Worldline Hammer (N ≥ 512): the strip-chunked
    local-update stack (:func:`..pallas_worldline._strip_sweep_section`)
    followed by the same in-kernel worm section on link residuals computed
    from the strip state — the geometry-unconditional Hammer composition
    (reference /root/reference/supervillain/generator/worldline/__init__.py:9-40)
    at the volumes the monolithic body cannot compile."""
    winf = (W == float('inf'))
    inv2k = np.float32(0.5 / float(kappa))
    fW = np.float32(2 * np.pi) if winf else np.float32(W)

    def kernel(seed_ref, m_ref, v_ref, m_out, v_out, hist_ref, stat_ref,
               dv0_s, dv1_s, l0_s, l1_s, *snap):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * _GOLD)
        m_out[0, 0] = m_ref[0, 0]
        m_out[0, 1] = m_ref[0, 1]
        v_out[0, 0] = v_ref[0, 0]
        v0 = v_ref[0, 0]
        dv0_s[:] = (v0 - _roll(v0, 1, 1)).astype(jnp.float32)
        dv1_s[:] = (-(v0 - _roll(v0, 1, 0))).astype(jnp.float32)

        # ---- section 1: strip-chunked vortex/coexact/wrapping sweeps -------
        acc, sS = _strip_sweep_section(N, Rb, kappa, W, interval_v, interval_t,
                                       interval_w, sweeps, m_out, v_out,
                                       dv0_s, dv1_s, with_action=True)

        # ---- section 2: classic worms on the resident residuals ------------
        hist_ref[0] = jnp.zeros((N, N), jnp.float32)
        l0_s[:] = m_out[0, 0].astype(jnp.float32) - dv0_s[:] / fW
        l1_s[:] = m_out[0, 1].astype(jnp.float32) - dv1_s[:] / fW
        truncations = _worm_section(N, N, kappa, worms, m_out, hist_ref,
                                    l0_s, l1_s, snap=snap or None,
                                    cap=worm_cap)

        length = jnp.sum(hist_ref[0])
        stat_ref[0] = jnp.concatenate([
            jnp.full((1, 128), acc, jnp.float32),
            jnp.full((1, 128), sS, jnp.float32),
            jnp.full((1, 128), length, jnp.float32),
            jnp.full((1, 128), truncations.astype(jnp.float32), jnp.float32),
            jnp.zeros((4, 128), jnp.float32),
        ], axis=0)

    return kernel


@partial(jax.jit, static_argnames=('N', 'kappa', 'W', 'interval_v', 'interval_t',
                                   'interval_w', 'sweeps', 'worms',
                                   'max_worm_moves', 'interpret', 'force_strips',
                                   'strip_rows'))
def worldline_hammer_sweeps(seed, m, v, *, N, kappa, W, interval_v=1,
                            interval_t=1, interval_w=1, sweeps=1, worms=1,
                            max_worm_moves=None, interpret=False,
                            force_strips=False, strip_rows=None):
    """Run ``sweeps`` fused worldline local-update stacks followed by ``worms``
    classic worms per chain, in one Pallas launch — the complete reference
    worldline Hammer (vortex + coexact + wrapping + worm) as one program.

    Parameters
    ----------
    seed: int32 ()
    m: (B, 2, N, N) int32
    v: (B, 1, N, N) int32 (finite W) or float32 (W = inf)

    ``max_worm_moves`` bounds each worm's move count with exact
    truncation-rollback (see :func:`_worm_section`); production launches
    should pass a generous cap (e.g. 64·N²) to bound the launch time against
    the monster-excursion tail.

    Returns
    -------
    (m, v, accepted, inline): updated fields, per-chain accepted sweep-move
    counts (B,), and inline observables: per-sweep-averaged ``ActionDensity``,
    the worm ``Spin_Spin`` histogram (B, N, N), ``Worm_Length`` (B,), and the
    ``Worm_Truncated`` count (B,).
    """
    if N % 128 != 0 and not interpret:
        raise ValueError('worldline_hammer_sweeps needs N to be a multiple of '
                         '128 (the worm section addresses whole 128-lane '
                         'tiles); compose worldline_sweeps + worldline_worms '
                         'for other sizes.')
    B = m.shape[0]
    vdt = jnp.float32 if W == float('inf') else jnp.int32
    v = v.astype(vdt)
    cap = None if max_worm_moves is None else int(max_worm_moves)
    if N >= STRIP_THRESHOLD or force_strips:
        # Strip regime: the monolithic sweep body cannot compile above N=256;
        # dispatch to the strip-chunked sweep section + worm composition.
        Rb = _strip_rows(N) if strip_rows is None else int(strip_rows)
        if N % Rb != 0 or Rb % 2 != 0:
            raise ValueError(f'strip_rows must be an even divisor of N (got '
                             f'Rb={Rb}, N={N})')
        if strip_rows is None and N >= 1024:
            Rb = min(Rb, 128)
        kernel = _make_strip_hammer_kernel(N, Rb, kappa, W, interval_v,
                                           interval_t, interval_w, sweeps,
                                           worms, worm_cap=cap)
        scratch = [pltpu.VMEM((N, N), jnp.float32),   # dv0
                   pltpu.VMEM((N, N), jnp.float32),   # dv1
                   pltpu.VMEM((N, N), jnp.float32),   # l0
                   pltpu.VMEM((N, N), jnp.float32)]   # l1
        if cap is not None:
            scratch += [pltpu.VMEM((N, N), jnp.int32),
                        pltpu.VMEM((N, N), jnp.int32),
                        pltpu.VMEM((N, N), jnp.float32),
                        pltpu.VMEM((N, N), jnp.float32)]
        m_spec = pl.BlockSpec((1, 2, N, N), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        v_spec = pl.BlockSpec((1, 1, N, N), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        out_m, out_v, hist, stat = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), m_spec, v_spec],
            out_specs=(m_spec, v_spec,
                       pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct(m.shape, jnp.int32),
                       jax.ShapeDtypeStruct(v.shape, vdt),
                       jax.ShapeDtypeStruct((B, N, N), jnp.float32),
                       jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32).reshape(1), m.astype(jnp.int32), v)
        inline = {'ActionDensity': stat[:, 1, 0] / sweeps,
                  'Spin_Spin': hist,
                  'Worm_Length': stat[:, 2, 0],
                  'Worm_Truncated': stat[:, 3, 0]}
        return out_m, out_v, stat[:, 0, 0], inline
    kernel = _make_hammer_kernel(N, kappa, W, interval_v, interval_t,
                                 interval_w, sweeps, worms, worm_cap=cap)
    scratch = [pltpu.VMEM((N, N), jnp.float32),
               pltpu.VMEM((N, N), jnp.float32)]
    if cap is not None:
        scratch += [pltpu.VMEM((N, N), jnp.int32),
                    pltpu.VMEM((N, N), jnp.int32),
                    pltpu.VMEM((N, N), jnp.float32),
                    pltpu.VMEM((N, N), jnp.float32)]
    m_spec = pl.BlockSpec((1, 2, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out_m, out_v, hist, stat = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), m_spec, v_spec],
        out_specs=(m_spec, v_spec,
                   pl.BlockSpec((1, N, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(m.shape, jnp.int32),
                   jax.ShapeDtypeStruct(v.shape, vdt),
                   jax.ShapeDtypeStruct((B, N, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), m.astype(jnp.int32), v)
    inline = {'ActionDensity': stat[:, 1, 0] / sweeps,
              'Spin_Spin': hist,
              'Worm_Length': stat[:, 2, 0],
              'Worm_Truncated': stat[:, 3, 0]}
    return out_m, out_v, stat[:, 0, 0], inline
