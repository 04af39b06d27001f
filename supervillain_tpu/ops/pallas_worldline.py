"""Pallas TPU kernel: fused Worldline local-update sweeps.

One launch runs ``sweeps`` iterations of the worldline local-update stack —
checkerboarded VortexUpdate and CoexactUpdate passes plus a WrappingUpdate — with
the chain state (m, v, and the incrementally-maintained δv) resident in VMEM, the
on-core PRNG, and in-register rolls, exactly as
:mod:`supervillain_tpu.ops.pallas_sweep` does for the Villain action.

Update semantics match the XLA generators
(:class:`~supervillain_tpu.generators.worldline.VortexUpdate` /
:class:`CoexactUpdate` / :class:`WrappingUpdate`; reference
/root/reference/supervillain/generator/worldline/{vortex,coexact,wrapping}.py).
D=2, even N, finite W, i32 fields.  Grid: one program per chain.

D=2 operator components (verified against :mod:`..ops.calculus`):
    (δv)_0 =  v − roll(v, +1, axis=1)          (v the single 2-form component)
    (δv)_1 = −(v − roll(v, +1, axis=0))
    (coface f)_plaq = f_0 + roll(f_0, −1, 1) + f_1 + roll(f_1, −1, 0)
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _uniform, _int_in, _roll, _exp_neg


def _int_nonzero(shape, interval):
    """Uniform over ±{1..interval} (zero excluded).  Float-scale draw instead of
    integer modulo (see :func:`..pallas_sweep._int_in`)."""
    r = jnp.floor(_uniform(shape) * np.float32(2 * interval)).astype(jnp.int32) - interval
    return jnp.where(r < 0, r, r + 1)


def _delta2(v):
    """δ of the single 2-form component: the two 1-form components."""
    d0 = v - _roll(v, 1, 1)
    d1 = -(v - _roll(v, 1, 0))
    return d0, d1


def _coface(f0, f1):
    """Sum of a 1-form onto the plaquette."""
    return f0 + _roll(f0, -1, 1) + f1 + _roll(f1, -1, 0)


def _monolithic_passes(N, kappa, W, interval_v, interval_t, interval_w,
                       C0=1, C1=1):
    """Build the (vortex, coexact, wrapping) pass closures over whole-lattice
    state ``(m0, m1, v, dv0, dv1, acc)``.  Must be called *inside* a kernel
    body (the closures trace iotas/PRNG ops).  Shared by the worldline sweep
    kernel below and the worldline hammer kernel
    (:mod:`.pallas_worldline_hammer`).

    ``C0``/``C1`` > 1 select the *interleaved* chain packing of
    :func:`..pallas_sweep._make_kernel` (row = t·C0 + chain_row, lane =
    x·C1 + chain_col) so small lattices fill the 128 vector lanes: all δ /
    coface stencils become strided rolls, and the wrapping pass's per-cycle ΔS
    sums become C0 (resp. C1) row-offset-masked reductions (cycles of
    different chains interleave along the summed axis).

    W = inf selects the W=∞ action: v is a float field, the vortex proposal
    is continuous U(-interval_v, +interval_v), and the action's internal
    normalization _W = 2π (models/worldline.py; reference
    /root/reference/supervillain/action/worldline.py:46-50)."""
    winf = (W == float('inf'))
    kappa = np.float32(kappa)
    inv2k = np.float32(0.5 / kappa)
    fW = np.float32(2 * np.pi) if winf else np.float32(W)
    shape = (C0 * N, C1 * N)

    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    parity = (row // C0 + lane // C1) % 2

    def delta2(v):
        d0 = v - _roll(v, C1, 1)
        d1 = -(v - _roll(v, C0, 0))
        return d0, d1

    def coface(f0, f1):
        return f0 + _roll(f0, -C1, 1) + f1 + _roll(f1, -C0, 0)

    def links(m0, m1, dv0, dv1):
        return (m0.astype(jnp.float32) - dv0 / fW,
                m1.astype(jnp.float32) - dv1 / fW)

    def vortex_pass(color, state):
        m0, m1, v, dv0, dv1, acc = state
        imask = jnp.where(parity == color, 1, 0)
        if winf:
            dvv = (2.0 * _uniform(shape) - 1.0) * np.float32(interval_v) \
                * imask.astype(jnp.float32)
        else:
            dvv = _int_nonzero(shape, interval_v) * imask
        c0, c1 = delta2(dvv)
        c0f = c0.astype(jnp.float32) / fW
        c1f = c1.astype(jnp.float32) / fW
        l0, l1 = links(m0, m1, dv0, dv1)
        t0 = inv2k * (-c0f) * (2.0 * l0 - c0f)
        t1 = inv2k * (-c1f) * (2.0 * l1 - c1f)
        dS = coface(t0, t1)
        accept = jnp.where(_uniform(shape) < _exp_neg(dS), 1, 0) * imask
        applied = dvv * accept
        a0, a1 = delta2(applied)
        v = v + applied
        dv0 = dv0 + a0.astype(jnp.float32)
        dv1 = dv1 + a1.astype(jnp.float32)
        acc = acc + jnp.sum(accept.astype(jnp.float32))
        return m0, m1, v, dv0, dv1, acc

    def coexact_pass(color, state):
        m0, m1, v, dv0, dv1, acc = state
        imask = jnp.where(parity == color, 1, 0)
        t = _int_nonzero(shape, interval_t) * imask
        c0, c1 = delta2(t)
        l0, l1 = links(m0, m1, dv0, dv1)
        t0 = inv2k * c0.astype(jnp.float32) * (2.0 * l0 + c0.astype(jnp.float32))
        t1 = inv2k * c1.astype(jnp.float32) * (2.0 * l1 + c1.astype(jnp.float32))
        dS = coface(t0, t1)
        accept = jnp.where(_uniform(shape) < _exp_neg(dS), 1, 0) * imask
        applied = t * accept
        a0, a1 = delta2(applied)
        m0 = m0 + a0
        m1 = m1 + a1
        acc = acc + jnp.sum(accept.astype(jnp.float32))
        return m0, m1, v, dv0, dv1, acc

    def wrapping_pass(state):
        m0, m1, v, dv0, dv1, acc = state
        l0, l1 = links(m0, m1, dv0, dv1)
        # mu = 0: one ± proposal per (column cycle, chain-row offset).  Cycles
        # of different chain rows interleave along axis 0, so each offset's ΔS
        # is a row-masked reduction (C0 static unrolled; C0 = 1 reduces to the
        # plain keepdims sum).
        for c0_off in range(C0):
            c0p = jnp.broadcast_to(_int_nonzero((1, C1 * N), interval_w), shape)
            c0f = c0p.astype(jnp.float32)
            rmask = jnp.where(row % C0 == c0_off, 1, 0) if C0 > 1 else None
            t0 = inv2k * c0f * (2.0 * l0 + c0f)
            if rmask is not None:
                t0 = t0 * rmask.astype(jnp.float32)
            dS0 = jnp.sum(t0, axis=0, keepdims=True)
            acc0 = jnp.where(_uniform((1, C1 * N)) < _exp_neg(dS0), 1, 0)
            shift0 = c0p * jnp.broadcast_to(acc0, shape)
            if rmask is not None:
                shift0 = shift0 * rmask
            # (No l0 update needed: different row offsets propose on disjoint
            # rows, and the masked ΔS sums only read their own rows.)
            m0 = m0 + shift0
            acc = acc + jnp.sum(acc0.astype(jnp.float32))
        # mu = 1: one ± proposal per (row cycle, chain-col offset).
        for c1_off in range(C1):
            c1p = jnp.broadcast_to(_int_nonzero((C0 * N, 1), interval_w), shape)
            c1f = c1p.astype(jnp.float32)
            lmask = jnp.where(lane % C1 == c1_off, 1, 0) if C1 > 1 else None
            t1 = inv2k * c1f * (2.0 * l1 + c1f)
            if lmask is not None:
                t1 = t1 * lmask.astype(jnp.float32)
            dS1 = jnp.sum(t1, axis=1, keepdims=True)
            acc1 = jnp.where(_uniform((C0 * N, 1)) < _exp_neg(dS1), 1, 0)
            shift1 = c1p * jnp.broadcast_to(acc1, shape)
            if lmask is not None:
                shift1 = shift1 * lmask
            m1 = m1 + shift1
            acc = acc + jnp.sum(acc1.astype(jnp.float32))
        return m0, m1, v, dv0, dv1, acc

    def sweep(s, state):
        state = vortex_pass(0, state)
        state = vortex_pass(1, state)
        state = coexact_pass(0, state)
        state = coexact_pass(1, state)
        state = wrapping_pass(state)
        return state

    return sweep


def _make_kernel(N, kappa, W, interval_v, interval_t, interval_w, sweeps,
                 C0=1, C1=1):
    """Monolithic whole-lattice kernel (N ≤ 256): ``sweeps`` iterations of the
    full local-update stack built by :func:`_monolithic_passes`, optionally
    over a (C0, C1) interleaved chain pack."""

    def kernel(seed_ref, m_ref, v_ref, m_out, v_out, acc_out):
        chain = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + chain * np.int32(2654435761 & 0x7FFFFFFF))

        sweep = _monolithic_passes(N, kappa, W, interval_v, interval_t,
                                   interval_w, C0=C0, C1=C1)

        m0 = m_ref[0, 0]
        m1 = m_ref[0, 1]
        v = v_ref[0, 0]
        # δv on the packed layout: per-chain periodic shifts are strided rolls.
        dv0 = (v - _roll(v, C1, 1)).astype(jnp.float32)
        dv1 = (-(v - _roll(v, C0, 0))).astype(jnp.float32)

        m0, m1, v, dv0, dv1, acc = jax.lax.fori_loop(
            0, sweeps, sweep, (m0, m1, v, dv0, dv1, jnp.float32(0.0)))

        m_out[0, 0] = m0
        m_out[0, 1] = m1
        v_out[0, 0] = v
        acc_out[0] = jnp.full((8, 128), acc, jnp.float32)

    return kernel


def _strip_sweep_section(N, Rb, kappa, W, interval_v, interval_t, interval_w,
                         sweeps, m_out, v_out, dv0_s, dv1_s,
                         with_action=False):
    """Trace ``sweeps`` strip-chunked worldline local-update stacks in place
    over the VMEM-resident refs; returns the traced accepted-count total (or
    ``(acc, sS)`` with ``with_action=True``, where sS accumulates the per-sweep
    action density (1/2κ)Σ(m − δv/_W)²/Λ for the fused Hammer's inline
    blocked measurement).

    Same rationale and structure as
    :func:`..pallas_sweep._strip_sweep_section`: the monolithic body's
    full-lattice temporaries overflow Mosaic's VMEM scheduling above N=256, so
    each checkerboard pass walks the lattice in ``Rb``-row strips.  Strips are
    Python-unrolled (S = N/Rb ≤ 4 in production) so every load/store is a
    static contiguous slice; plaquette-indexed arrays are (Rb, N) body slabs
    and direction-1 link arrays (m₁, δv₁, their changes) are (Rb+1, N) slabs
    over link rows row0 .. row0+Rb — the extra row is the downward δ(·)₁
    "spill" row, read-modify-written in place.  Rb is even, so the
    checkerboard masks are strip-independent and hoisted out of the walk.

    Exactness of in-place ascending strips: during a color-c vortex/coexact
    pass each plaquette's ΔS reads only own-parity proposals (the checkerboard
    is bipartite on plaquettes), and the spill row shared between strip s's
    writes and strip s+1's reads is touched at column-parity-disjoint columns
    (even N), with read-modify-write ordering making the sequential
    composition exact.  The wrapping pass needs whole-cycle ΔS sums, so it
    runs as two strip walks: accumulate per-cycle ΔS, then apply the accepted
    shifts.

    ``W = inf``: float v, continuous vortex proposal, _W = 2π (see
    :func:`_make_kernel`); the spill pattern is unchanged.
    """
    winf = (W == float('inf'))
    kappa = np.float32(kappa)
    inv2k = np.float32(0.5 / kappa)
    fW = np.float32(2 * np.pi) if winf else np.float32(W)
    S = N // Rb
    body = (Rb, N)

    _rx = lambda x, s: _roll(x, s, 1)
    zrow = lambda dt: jnp.zeros((1, N), dt)
    # Link-1 extensions of a (Rb, N) plaquette slab b: link row ℓ ↔ lattice
    # row row0+ℓ; δ(b)₁[ℓ] = b[ℓ−1] − b[ℓ] = ext_lo − ext_hi.
    ext_hi = lambda b: jnp.concatenate([b, zrow(b.dtype)], axis=0)
    ext_lo = lambda b: jnp.concatenate([zrow(b.dtype), b], axis=0)

    # Checkerboard masks: Rb even ⇒ plaquette row row0+y has parity (y+x) % 2
    # for every strip — hoisted out of the strip walk.
    rowb = jax.lax.broadcasted_iota(jnp.int32, body, 0)
    laneb = jax.lax.broadcasted_iota(jnp.int32, body, 1)
    _masks = []
    for color in (0, 1):
        im = jnp.where((rowb + laneb) % 2 == color, 1, 0)
        _masks.append((im, im.astype(jnp.float32)))

    def load1(ref, row0):
        # Link-1 rows row0 .. row0+Rb: contiguous except the last strip, whose
        # spill row wraps to the top of the lattice.
        if row0 + Rb == N:
            return jnp.concatenate([ref[row0:N], ref[0:1]], axis=0)
        return ref[row0:row0 + Rb + 1]

    def plaquette_pass(color, s, acc, *, which):
        """Shared body of the vortex (which=0: Δv) and coexact (which=1: Δm)
        strip passes — identical ΔS stencil, different applied field."""
        row0 = s * Rb
        imask, fmask = _masks[color]
        dv0b = dv0_s[row0:row0 + Rb]
        dv1_l = load1(dv1_s, row0)
        m0 = m_out[0, 0, row0:row0 + Rb]
        m1 = load1(m_out.at[0, 1], row0)
        l0 = m0.astype(jnp.float32) - dv0b / fW
        l1 = m1.astype(jnp.float32) - dv1_l / fW

        if which == 0 and winf:
            prop = (2.0 * _uniform(body) - 1.0) * np.float32(interval_v) * fmask
        else:
            prop = _int_nonzero(body, interval_v if which == 0 else interval_t) \
                * imask
        # δ(prop): c0 lateral (body rows); c1 on link-1 rows ℓ = 0..Rb.
        c0 = prop - _rx(prop, 1)
        c1 = ext_lo(prop) - ext_hi(prop)
        c0f = c0.astype(jnp.float32)
        c1f = c1.astype(jnp.float32)
        if which == 0:   # vortex: links change by -δ(Δv)/W
            t0 = inv2k * (-c0f / fW) * (2.0 * l0 - c0f / fW)
            t1 = inv2k * (-c1f / fW) * (2.0 * l1 - c1f / fW)
        else:            # coexact: m changes by +δ(t)
            t0 = inv2k * c0f * (2.0 * l0 + c0f)
            t1 = inv2k * c1f * (2.0 * l1 + c1f)
        # Plaquette y's ΔS: lateral links at x and x+1, vertical links at
        # ℓ = y and ℓ = y+1.
        dS = t0 + _rx(t0, -1) + t1[:-1] + t1[1:]
        accept = jnp.where(_uniform(body) < _exp_neg(dS), 1, 0) * imask
        applied = prop * accept
        a0 = applied - _rx(applied, 1)
        a1 = ext_lo(applied) - ext_hi(applied)

        def store1(ref, base, delta):
            # base: pre-loaded link-1 slab; delta: the (Rb+1, N) change.  The
            # last strip stores its body rows, then read-modify-writes the
            # wrapped spill row fresh (at S == 1 the rows alias).
            if row0 + Rb == N:
                ref[row0:N] = (base + delta)[:Rb]
                ref[0:1] = ref[0:1] + delta[Rb:]
            else:
                ref[row0:row0 + Rb + 1] = base + delta

        if which == 0:
            v_out[0, 0, row0:row0 + Rb] = v_out[0, 0, row0:row0 + Rb] + applied
            dv0_s[row0:row0 + Rb] = dv0b + a0.astype(jnp.float32)
            store1(dv1_s, dv1_l, a1.astype(jnp.float32))
        else:
            m_out[0, 0, row0:row0 + Rb] = m0 + a0
            store1(m_out.at[0, 1], m1, a1)
        return acc + jnp.sum(accept.astype(jnp.float32))

    def wrapping_pass(acc):
        # μ=0: one ±shift per column cycle.  Accumulate ΔS over strips.
        c0 = _int_nonzero((1, N), interval_w)
        c0f = c0.astype(jnp.float32)
        dS0 = jnp.zeros((1, N), jnp.float32)
        for s in range(S):
            row0 = s * Rb
            l0 = m_out[0, 0, row0:row0 + Rb].astype(jnp.float32) \
                - dv0_s[row0:row0 + Rb] / fW
            dS0 = dS0 + jnp.sum(inv2k * c0f * (2.0 * l0 + c0f), axis=0,
                                keepdims=True)
        a0 = jnp.where(_uniform((1, N)) < _exp_neg(dS0), 1, 0)
        shift0 = jnp.broadcast_to(c0 * a0, body)
        for s in range(S):
            row0 = s * Rb
            m_out[0, 0, row0:row0 + Rb] = m_out[0, 0, row0:row0 + Rb] + shift0
        acc = acc + jnp.sum(a0.astype(jnp.float32))

        # μ=1: one ±shift per row cycle; per-strip proposals and row sums.
        for s in range(S):
            row0 = s * Rb
            c1 = _int_nonzero((Rb, 1), interval_w)
            c1b = jnp.broadcast_to(c1, body)
            c1f = c1b.astype(jnp.float32)
            l1 = m_out[0, 1, row0:row0 + Rb].astype(jnp.float32) \
                - dv1_s[row0:row0 + Rb] / fW
            dS1 = jnp.sum(inv2k * c1f * (2.0 * l1 + c1f), axis=1, keepdims=True)
            a1 = jnp.where(_uniform((Rb, 1)) < _exp_neg(dS1), 1, 0)
            m_out[0, 1, row0:row0 + Rb] = m_out[0, 1, row0:row0 + Rb] \
                + c1b * jnp.broadcast_to(a1, body)
            acc = acc + jnp.sum(a1.astype(jnp.float32))
        return acc

    def sweep(t, state):
        if with_action:
            acc, sS = state
        else:
            acc = state
        for which in (0, 1):
            for color in (0, 1):
                for s in range(S):
                    acc = plaquette_pass(color, s, acc, which=which)
        acc = wrapping_pass(acc)
        if not with_action:
            return acc
        l0 = m_out[0, 0].astype(jnp.float32) - dv0_s[:] / fW
        l1 = m_out[0, 1].astype(jnp.float32) - dv1_s[:] / fW
        sS = sS + inv2k * (jnp.sum(l0 * l0) + jnp.sum(l1 * l1)) \
            * np.float32(1.0 / (N * N))
        return acc, sS

    init = (jnp.float32(0.0), jnp.float32(0.0)) if with_action else jnp.float32(0.0)
    return jax.lax.fori_loop(0, sweeps, sweep, init)


def _make_strip_kernel(N, Rb, kappa, W, interval_v, interval_t, interval_w, sweeps):
    """Strip-chunked worldline kernel for N ≥ 512: initialize the
    VMEM-resident state, then run :func:`_strip_sweep_section`."""

    def kernel(seed_ref, m_ref, v_ref, m_out, v_out, acc_out, dv0_s, dv1_s):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * np.int32(2654435761 & 0x7FFFFFFF))
        m_out[0, 0] = m_ref[0, 0]
        m_out[0, 1] = m_ref[0, 1]
        v_out[0, 0] = v_ref[0, 0]
        v0 = v_ref[0, 0]
        dv0_s[:] = (v0 - _roll(v0, 1, 1)).astype(jnp.float32)
        dv1_s[:] = (-(v0 - _roll(v0, 1, 0))).astype(jnp.float32)

        acc = _strip_sweep_section(N, Rb, kappa, W, interval_v, interval_t,
                                   interval_w, sweeps, m_out, v_out, dv0_s, dv1_s)
        acc_out[0] = jnp.full((8, 128), acc, jnp.float32)

    return kernel


# The worldline strip body (concat-shift stencils, RMW refs) measures FASTER
# than the monolithic body from N=256 up (16.9 vs 15.4e9 su/s at L=256,
# B=512, r5); the monolithic + chain-packing path still wins at N <= 128.
STRIP_THRESHOLD = 256


def _strip_rows(N):
    budget = 24 * 1024 * 1024 // (16 * N * 4)
    Rb = 8
    while Rb * 2 <= min(budget, 256) and N % (Rb * 2) == 0:
        Rb *= 2
    return Rb


@partial(jax.jit, static_argnames=('N', 'kappa', 'W', 'interval_v', 'interval_t',
                                   'interval_w', 'sweeps', 'chains_per_program',
                                   'interpret', 'force_strips',
                                   'strip_rows'))
def worldline_sweeps(seed, m, v, *, N, kappa, W, interval_v=1, interval_t=1,
                     interval_w=1, sweeps=1, chains_per_program=1,
                     interpret=False, force_strips=False,
                     strip_rows=None):
    """Run ``sweeps`` fused worldline local-update sweeps on a chain batch.

    Parameters
    ----------
    seed: int32 ()
    m: (B, 2, N, N) int32
    v: (B, 1, N, N) int32 (finite W) or float32 (W = inf)

    ``chains_per_program`` > 1 packs chains per program in the interleaved
    layout (monolithic kernel only) so small lattices fill the vector lanes —
    same packing as :func:`..pallas_sweep.neighborhood_sweeps`.

    Returns
    -------
    (m, v, accepted): updated fields and per-program accepted counts
    (B / chains_per_program,).
    """
    B = m.shape[0]
    vdt = jnp.float32 if W == float('inf') else jnp.int32
    v = v.astype(vdt)
    a_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if N >= STRIP_THRESHOLD or force_strips:
        m_spec = pl.BlockSpec((1, 2, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        v_spec = pl.BlockSpec((1, 1, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        Rb = _strip_rows(N) if strip_rows is None else int(strip_rows)
        if N % Rb != 0 or Rb % 2 != 0:
            raise ValueError(f'strip_rows must be an even divisor of N (got '
                             f'Rb={Rb}, N={N})')
        kernel = _make_strip_kernel(N, Rb, kappa, W, interval_v,
                                    interval_t, interval_w, sweeps)
        out_m, out_v, acc = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), m_spec, v_spec],
            out_specs=(m_spec, v_spec, a_spec),
            out_shape=(jax.ShapeDtypeStruct(m.shape, jnp.int32),
                       jax.ShapeDtypeStruct(v.shape, vdt),
                       jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((N, N), jnp.float32),
                            pltpu.VMEM((N, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32).reshape(1), m, v)
        return out_m, out_v, acc[:, 0, 0]

    C = chains_per_program
    if B % C != 0:
        raise ValueError(f'{B} chains not divisible by chains_per_program={C}')
    G = B // C
    C1 = min(C, max(1, 128 // N))
    while C % C1 != 0:
        C1 -= 1
    C0 = C // C1
    R, CN = C0 * N, C1 * N

    def pack(x):
        k = x.shape[1]
        return (x.reshape(G, C0, C1, k, N, N).transpose(0, 3, 4, 1, 5, 2)
                .reshape(G, k, R, CN))

    def unpack(x):
        k = x.shape[1]
        return (x.reshape(G, k, N, C0, N, C1).transpose(0, 3, 5, 1, 2, 4)
                .reshape(B, k, N, N))

    m_p = pack(m) if C > 1 else m
    v_p = pack(v) if C > 1 else v

    kernel = _make_kernel(N, kappa, W, interval_v, interval_t, interval_w,
                          sweeps, C0=C0, C1=C1)
    m_spec = pl.BlockSpec((1, 2, R, CN), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, R, CN), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out_m, out_v, acc = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), m_spec, v_spec],
        out_specs=(m_spec, v_spec, a_spec),
        out_shape=(jax.ShapeDtypeStruct(m_p.shape, jnp.int32),
                   jax.ShapeDtypeStruct(v_p.shape, vdt),
                   jax.ShapeDtypeStruct((G, 8, 128), jnp.float32)),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), m_p, v_p)
    if C > 1:
        out_m = unpack(out_m)
        out_v = unpack(out_v)
    return out_m, out_v, acc[:, 0, 0]
