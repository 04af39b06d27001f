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

from .pallas_sweep import _uniform, _int_in, _roll


def _int_nonzero(shape, interval):
    """Uniform over ±{1..interval} (zero excluded)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    r = pltpu.bitcast(bits % np.uint32(2 * interval), jnp.int32) - interval
    return jnp.where(r < 0, r, r + 1)


def _delta2(v):
    """δ of the single 2-form component: the two 1-form components."""
    d0 = v - _roll(v, 1, 1)
    d1 = -(v - _roll(v, 1, 0))
    return d0, d1


def _coface(f0, f1):
    """Sum of a 1-form onto the plaquette."""
    return f0 + _roll(f0, -1, 1) + f1 + _roll(f1, -1, 0)


def _make_kernel(N, kappa, W, interval_v, interval_t, interval_w, sweeps):
    kappa = np.float32(kappa)
    inv2k = np.float32(0.5 / kappa)
    fW = np.float32(W)

    def kernel(seed_ref, m_ref, v_ref, m_out, v_out, acc_out):
        chain = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + chain * np.int32(2654435761 & 0x7FFFFFFF))

        it = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        parity = (it + ix) % 2

        m0 = m_ref[0, 0]
        m1 = m_ref[0, 1]
        v = v_ref[0, 0]
        dv0, dv1 = _delta2(v)
        dv0 = dv0.astype(jnp.float32)
        dv1 = dv1.astype(jnp.float32)

        def links(m0, m1, dv0, dv1):
            return (m0.astype(jnp.float32) - dv0 / fW,
                    m1.astype(jnp.float32) - dv1 / fW)

        def vortex_pass(color, state):
            m0, m1, v, dv0, dv1, acc = state
            imask = jnp.where(parity == color, 1, 0)
            dvv = _int_nonzero((N, N), interval_v) * imask
            c0, c1 = _delta2(dvv)
            c0f = c0.astype(jnp.float32) / fW
            c1f = c1.astype(jnp.float32) / fW
            l0, l1 = links(m0, m1, dv0, dv1)
            t0 = inv2k * (-c0f) * (2.0 * l0 - c0f)
            t1 = inv2k * (-c1f) * (2.0 * l1 - c1f)
            dS = _coface(t0, t1)
            accept = jnp.where(_uniform((N, N)) < jnp.exp(-dS), 1, 0) * imask
            applied = dvv * accept
            a0, a1 = _delta2(applied)
            v = v + applied
            dv0 = dv0 + a0.astype(jnp.float32)
            dv1 = dv1 + a1.astype(jnp.float32)
            acc = acc + jnp.sum(accept.astype(jnp.float32))
            return m0, m1, v, dv0, dv1, acc

        def coexact_pass(color, state):
            m0, m1, v, dv0, dv1, acc = state
            imask = jnp.where(parity == color, 1, 0)
            t = _int_nonzero((N, N), interval_t) * imask
            c0, c1 = _delta2(t)
            l0, l1 = links(m0, m1, dv0, dv1)
            t0 = inv2k * c0.astype(jnp.float32) * (2.0 * l0 + c0.astype(jnp.float32))
            t1 = inv2k * c1.astype(jnp.float32) * (2.0 * l1 + c1.astype(jnp.float32))
            dS = _coface(t0, t1)
            accept = jnp.where(_uniform((N, N)) < jnp.exp(-dS), 1, 0) * imask
            applied = t * accept
            a0, a1 = _delta2(applied)
            m0 = m0 + a0
            m1 = m1 + a1
            acc = acc + jnp.sum(accept.astype(jnp.float32))
            return m0, m1, v, dv0, dv1, acc

        def wrapping_pass(state):
            m0, m1, v, dv0, dv1, acc = state
            l0, l1 = links(m0, m1, dv0, dv1)
            # mu = 0: one proposal per column (constant along axis 0).
            c0 = jnp.broadcast_to(_int_nonzero((1, N), interval_w), (N, N))
            dS0 = jnp.sum(inv2k * c0.astype(jnp.float32) * (2.0 * l0 + c0.astype(jnp.float32)),
                          axis=0, keepdims=True)
            acc0 = jnp.where(_uniform((1, N)) < jnp.exp(-dS0), 1, 0)
            m0 = m0 + c0 * jnp.broadcast_to(acc0, (N, N))
            # mu = 1: one proposal per row (constant along axis 1).
            c1 = jnp.broadcast_to(_int_nonzero((N, 1), interval_w), (N, N))
            dS1 = jnp.sum(inv2k * c1.astype(jnp.float32) * (2.0 * l1 + c1.astype(jnp.float32)),
                          axis=1, keepdims=True)
            acc1 = jnp.where(_uniform((N, 1)) < jnp.exp(-dS1), 1, 0)
            m1 = m1 + c1 * jnp.broadcast_to(acc1, (N, N))
            acc = acc + jnp.sum(acc0.astype(jnp.float32)) + jnp.sum(acc1.astype(jnp.float32))
            return m0, m1, v, dv0, dv1, acc

        def sweep(s, state):
            state = vortex_pass(0, state)
            state = vortex_pass(1, state)
            state = coexact_pass(0, state)
            state = coexact_pass(1, state)
            state = wrapping_pass(state)
            return state

        m0, m1, v, dv0, dv1, acc = jax.lax.fori_loop(
            0, sweeps, sweep, (m0, m1, v, dv0, dv1, jnp.float32(0.0)))

        m_out[0, 0] = m0
        m_out[0, 1] = m1
        v_out[0, 0] = v
        acc_out[0] = jnp.full((8, 128), acc, jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=('N', 'kappa', 'W', 'interval_v', 'interval_t',
                                   'interval_w', 'sweeps', 'interpret'))
def worldline_sweeps(seed, m, v, *, N, kappa, W, interval_v=1, interval_t=1,
                     interval_w=1, sweeps=1, interpret=False):
    """Run ``sweeps`` fused worldline local-update sweeps on a chain batch.

    Parameters
    ----------
    seed: int32 ()
    m: (B, 2, N, N) int32
    v: (B, 1, N, N) int32

    Returns
    -------
    (m, v, accepted): updated fields and per-chain accepted counts (B,).
    """
    B = m.shape[0]
    kernel = _make_kernel(N, kappa, W, interval_v, interval_t, interval_w, sweeps)
    m_spec = pl.BlockSpec((1, 2, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out_m, out_v, acc = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), m_spec, v_spec],
        out_specs=(m_spec, v_spec,
                   pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(m.shape, jnp.int32),
                   jax.ShapeDtypeStruct(v.shape, jnp.int32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), m, v)
    return out_m, out_v, acc[:, 0, 0]
