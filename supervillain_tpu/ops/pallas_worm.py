"""Pallas TPU kernel: fused Villain classic worms.

The XLA :class:`~supervillain_tpu.generators.villain.ClassicWorm` runs the worm
as a ``lax.while_loop`` whose per-move updates are batched scatters; vmapped
over a fleet, every iteration advances *all* chains and each iteration costs a
scatter over the whole batch, so a fleet step pays
(max worm length over chains) x (batch scatter latency) — measured at ~57% of
the full Villain Hammer step even at W=1 (mean worm length ~4; see
``benchmark/worm_cost.py``).  This kernel instead runs each chain's worm
*sequentially inside one program*: the link residuals live in VMEM, each move
is a handful of scalar ops plus two (1,1) dynamic loads/stores, and ``worms``
whole worms run per launch with no cross-chain synchronization.

Move semantics are identical to the XLA ClassicWorm (and the reference
/root/reference/supervillain/generator/villain/worm.py:136-196): the head moves
to one of the 4 neighboring plaquettes (east/north/west/south), Metropolis on
ΔS = (κ/2)(−2πΔn)(2(dφ−2πn) − 2πΔn) of the crossed link; when closed (head ==
tail, or always at W=1) a 20%-conditional close move ends the worm; every
non-close move tallies the head−tail displacement into the inline
``Vortex_Vortex`` histogram.  The PRNG stream differs (on-core hardware PRNG;
uniform integers via the floor(u·k) draw whose non-divisibility bias is
≤ k/2²⁴), so agreement with the XLA path is statistical, not bitwise.

D=2 only (like the reference's villain worm).  Grid: one program per chain.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _exp_neg

TWO_PI = np.float32(2 * np.pi)
_GOLD = np.int32(2654435761 & 0x7FFFFFFF)


def _make_worm_kernel(N, NP, kappa, W, worms, worm_cap=None):
    """NP >= N is the lane-padded row length (Mosaic tiles the minor dimension
    to 128; all row slices must have that physical width).  Lattice data lives
    in lanes [0, N); the pad lanes hold zeros and are never addressed.

    ``worm_cap``: optional per-worm move bound with exact truncation-rollback
    (snapshot scratch; see :mod:`.pallas_hammer` — unbounded worm-length tails
    can outlive the TPU runtime watchdog).  At W=1 the open configuration is
    valid and kept."""
    kappa = np.float32(kappa)
    closed_always = (W == 1)

    # Neighboring-plaquette moves (east, north, west, south) in (t, x) offsets,
    # the link each move crosses, and the constraint-restoring Δn sign — the
    # same tables as generators.villain.ClassicWorm.
    MOVE_T = (0, 1, 0, -1)
    MOVE_X = (-1, 0, 1, 0)
    LINK_DIR = (0, 1, 0, 1)
    OFF_T = (0, 1, 0, 0)
    OFF_X = (0, 0, 1, 0)
    PLAQ = (1, 1, -1, -1)

    def pick(choice, table):
        out = jnp.int32(table[0])
        for c in (1, 2, 3):
            out = jnp.where(choice == c, jnp.int32(table[c]), out)
        return out

    def kernel(seed_ref, dphi_ref, n_ref, n_out, hist_ref, stat_ref, r0_s, r1_s,
               *snap):
        chain = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + chain * _GOLD)

        n_out[0, 0] = n_ref[0, 0]
        n_out[0, 1] = n_ref[0, 1]
        hist_ref[0] = jnp.zeros((N, NP), jnp.float32)
        # Link residuals r_mu = dφ_mu − 2π n_mu, maintained across all worms.
        r0_s[:] = dphi_ref[0, 0] - TWO_PI * n_ref[0, 0].astype(jnp.float32)
        r1_s[:] = dphi_ref[0, 1] - TWO_PI * n_ref[0, 1].astype(jnp.float32)

        def draws():
            """Four fresh 32-bit words as scalars."""
            bits = pltpu.bitcast(pltpu.prng_random_bits((8, 128)), jnp.int32)
            return bits[0, 0], bits[0, 1], bits[0, 2], bits[0, 3]

        def unif(w):
            """Uniform [0,1) f32 from the low 24 bits of a word (scalar-safe:
            no bitcast, which Mosaic only implements for >=2D)."""
            low24 = jax.lax.bitwise_and(w, jnp.int32(0x00FFFFFF))
            return low24.astype(jnp.float32) * np.float32(2 ** -24)

        def rand_site(w):
            return jnp.floor(unif(w) * np.float32(N)).astype(jnp.int32)

        # Mosaic allows dynamic single-row slices but lane-dim indices must be
        # 128-aligned, so element access = row slice + lane mask (N/128 vector
        # ops — negligible next to the move's scalar work).
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)

        def load1(ref, i, j):
            row = ref[pl.ds(i, 1), :]
            return jnp.sum(jnp.where(lane1 == j, row, jnp.zeros_like(row)))

        def add1(ref, i, j, val):
            row = ref[pl.ds(i, 1), :]
            ref[pl.ds(i, 1), :] = row + jnp.where(lane1 == j, val, jnp.zeros_like(row))

        def worm_body(w, carry):
            if worm_cap is not None and not closed_always:
                ns0, ns1, rs0, rs1 = snap
                ns0[:] = n_out[0, 0]
                ns1[:] = n_out[0, 1]
                rs0[:] = r0_s[:]
                rs1[:] = r1_s[:]
            w0, w1, w2, w3 = draws()
            orientation = jnp.where(w0 > 0, jnp.int32(1), jnp.int32(-1))
            tail_t = rand_site(w1)
            tail_x = rand_site(w2)
            if closed_always:
                # At W=1 an open worm satisfies the (mod 1) constraint from the
                # start: insert the head anywhere.
                w4, w5, _, _ = draws()
                head0_t = rand_site(w4)
                head0_x = rand_site(w5)
            else:
                head0_t, head0_x = tail_t, tail_x

            def cond(state):
                open_ = state[0] == 0
                if worm_cap is not None:
                    open_ = open_ & (state[3] < worm_cap)
                return open_

            def body(state):
                _, head_t, head_x, moves = state
                c0, c1, c2, _ = draws()
                u_close = unif(c0)
                choice = jax.lax.bitwise_and(c1, jnp.int32(3))
                u_acc = unif(c2)

                if closed_always:
                    closed = jnp.bool_(True)
                else:
                    closed = (head_t == tail_t) & (head_x == tail_x)
                close_now = closed & (u_close >= np.float32(0.8))

                next_t = jax.lax.rem(head_t + pick(choice, MOVE_T) + N, jnp.int32(N))
                next_x = jax.lax.rem(head_x + pick(choice, MOVE_X) + N, jnp.int32(N))
                ld = pick(choice, LINK_DIR)
                lt = jax.lax.rem(head_t + pick(choice, OFF_T), jnp.int32(N))
                lx = jax.lax.rem(head_x + pick(choice, OFF_X), jnp.int32(N))
                dn = orientation * pick(choice, PLAQ)

                link_val = jnp.where(ld == 0, load1(r0_s, lt, lx), load1(r1_s, lt, lx))
                dnf = dn.astype(jnp.float32)
                dS = (kappa / 2) * (-TWO_PI * dnf) * (2.0 * link_val - TWO_PI * dnf)
                accept = (u_acc < _exp_neg(dS)) & ~close_now

                @pl.when(accept & (ld == 0))
                def _():
                    add1(n_out.at[0, 0], lt, lx, dn)
                    add1(r0_s, lt, lx, -TWO_PI * dnf)

                @pl.when(accept & (ld == 1))
                def _():
                    add1(n_out.at[0, 1], lt, lx, dn)
                    add1(r1_s, lt, lx, -TWO_PI * dnf)

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
                cond, body, (jnp.int32(0), head0_t, head0_x, jnp.int32(0)))

            if worm_cap is not None and not closed_always:
                truncated = done == 0

                @pl.when(truncated)
                def _():
                    ns0, ns1, rs0, rs1 = snap
                    n_out[0, 0] = ns0[:]
                    n_out[0, 1] = ns1[:]
                    r0_s[:] = rs0[:]
                    r1_s[:] = rs1[:]

                carry = carry + jnp.where(truncated, jnp.int32(1), jnp.int32(0))
            return carry

        truncations = jax.lax.fori_loop(0, worms, worm_body, jnp.int32(0))

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
def classic_worms(seed, phi, n, *, N, kappa, W, worms=1, max_worm_moves=None,
                  interpret=False):
    """Run ``worms`` whole classic worms per chain inside one Pallas launch.

    Parameters
    ----------
    seed: int32 ()
    phi: (B, 1, N, N) float32 — unchanged by the worm (read for dφ only)
    n: (B, 2, N, N) int32

    Returns
    -------
    (n, hist, length): updated links (B, 2, N, N), the summed inline
    ``Vortex_Vortex`` histogram (B, N, N) f32, and total worm length (B,).
    """
    B = phi.shape[0]
    p = phi[:, 0]
    dphi = jnp.stack([jnp.roll(p, -1, axis=1 + mu) - p for mu in range(2)],
                     axis=1).astype(jnp.float32)

    # Mosaic tiles the minor dimension to 128: pad lanes with zeros for N < 128.
    NP = max(N, 128)
    if NP != N:
        padding = [(0, 0)] * 3 + [(0, NP - N)]
        dphi = jnp.pad(dphi, padding)
        n_in = jnp.pad(n.astype(jnp.int32), padding)
    else:
        n_in = n.astype(jnp.int32)

    cap = None if max_worm_moves is None else int(max_worm_moves)
    kernel = _make_worm_kernel(N, NP, kappa, W, worms, worm_cap=cap)
    scratch = [pltpu.VMEM((N, NP), jnp.float32),
               pltpu.VMEM((N, NP), jnp.float32)]
    if cap is not None and W != 1:
        scratch += [pltpu.VMEM((N, NP), jnp.int32),
                    pltpu.VMEM((N, NP), jnp.int32),
                    pltpu.VMEM((N, NP), jnp.float32),
                    pltpu.VMEM((N, NP), jnp.float32)]
    f_spec = pl.BlockSpec((1, 2, N, NP), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    n_out, hist, stat = pl.pallas_call(
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
    )(jnp.asarray(seed, jnp.int32).reshape(1), dphi, n_in)
    return n_out[..., :N], hist[..., :N], stat[:, 0, 0]
