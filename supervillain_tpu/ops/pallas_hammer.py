"""Pallas TPU kernel: the fused Villain Hammer — sweeps *and* worms in one launch.

Composes the two validated kernel bodies into a single program per chain:

1. ``sweeps`` whole checkerboarded neighborhood sweeps (proposal + ΔS + accept +
   apply, the :mod:`.pallas_sweep` body) with the link residuals
   r_mu = dφ_mu − 2πn_mu maintained in VMEM, then
2. ``worms`` sequential classic worms (the :mod:`.pallas_worm` body) consuming
   the *same* VMEM-resident residuals — no HBM round-trip or separate launch
   between the local updates and the worm, and no cross-chain lock-step for the
   data-dependent worm lengths (a fleet pays mean, not max, worm work).

This is the in-kernel Hammer composition: sampling-wise it equals
``Sequentially(NeighborhoodUpdate(sweeps), KeepEvery(worms, ClassicWorm))``
(reference Hammer composition, /root/reference/supervillain/generator/villain/
__init__.py:10-63, with the Site/Link pair fused as the neighborhood update) up
to PRNG streams; each section's move semantics match its standalone kernel,
which are validated against the XLA generators on hardware.

Envelope (D=2, even N):

* ``N ≥ 128`` with N a multiple of 128 runs one chain per program.
* ``N ≥ 512`` swaps the monolithic sweep body for the strip-chunked body
  (:func:`..pallas_sweep._strip_sweep_section`) in the same one-launch
  composition — the worm section is unchanged and consumes the residual
  scratch the strips maintain, so the Hammer is geometry-unconditional
  across the whole production envelope (L = 64 .. 1024+), like the
  reference's composition.
* ``N < 128`` (the L=64 BKT finite-size-scaling workload) packs
  ``chains_per_program`` chains per program in the *interleaved* layout of
  :func:`..pallas_sweep._make_kernel` (row = t·C0 + chain_row, lane =
  x·C1 + chain_col) so the 128 vector lanes stay full; the worm section then
  runs the program's C chains' worms sequentially with strided element access
  (worm work is tiny next to the sweeps, so the serialization is immaterial).
  Requires C1·N a multiple of 128 (e.g. ``chains_per_program=2`` at N=64).
* ``W = ∞`` runs the sweep section in z-mode (Δn = d(Δz), preserving dn = 0
  exactly — see :func:`..pallas_sweep._make_kernel`) and keeps the worm
  section: an in-kernel worm always *closes* before the state is emitted, and
  a closed worm's Δn telescopes to a closed dual loop, so dn = 0 survives
  exactly while torus-wrapping worms sample the integer winding sectors that
  pure z-mode sweeps freeze (d(Δz) cannot change a holonomy).

Grid: one program per chain-group.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import (_uniform, _int_in, _int_sparse, _roll, _exp_neg,
                           _strip_sweep_section, _strip_rows, STRIP_THRESHOLD)

TWO_PI = np.float32(2 * np.pi)
_GOLD = np.int32(2654435761 & 0x7FFFFFFF)


def _worm_section(N, C0, C1, kappa, W, worms, n_out, hist_ref, r0_s, r1_s,
                  snap=None, cap=None):
    """Trace ``worms * C0*C1`` sequential classic worms on the VMEM-resident
    residuals; returns the traced truncation count (0 when uncapped).

    ``n_out``: (1, 2, C0·N, C1·N) int32 output ref (updated in place);
    ``hist_ref``: (1, C0·N, C1·N) f32 Vortex_Vortex tally ref (pre-zeroed);
    ``r0_s``/``r1_s``: (C0·N, C1·N) f32 residual scratch.  With packing
    (C0·C1 > 1) the program's chains interleave; worm w belongs to chain
    w mod C and addresses its sites with strided element access.

    ``cap``/``snap``: optional move bound with exact truncation-rollback at
    W ≠ 1 (an unclosed worm's field changes are undone from the 4 snapshot
    scratch buffers taken at its start; at W = 1 the open configuration is
    valid and kept, so no snapshots are taken or needed).  Shared by the
    monolithic and strip hammer kernels.
    """
    closed_always = (W == 1)
    kappa = np.float32(kappa)
    C = C0 * C1

    # Worm move tables (generators.villain.ClassicWorm / pallas_worm).
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

    def draws():
        bits = pltpu.bitcast(pltpu.prng_random_bits((8, 128)), jnp.int32)
        return bits[0, 0], bits[0, 1], bits[0, 2], bits[0, 3]

    def unif(w):
        low24 = jax.lax.bitwise_and(w, jnp.int32(0x00FFFFFF))
        return low24.astype(jnp.float32) * np.float32(2 ** -24)

    def rand_site(w):
        return jnp.floor(unif(w) * np.float32(N)).astype(jnp.int32)

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C1 * N), 1)

    def load1(ref, i, j):
        row = ref[pl.ds(i, 1), :]
        return jnp.sum(jnp.where(lane1 == j, row, jnp.zeros_like(row)))

    def add1(ref, i, j, val):
        row = ref[pl.ds(i, 1), :]
        ref[pl.ds(i, 1), :] = row + jnp.where(lane1 == j, val, jnp.zeros_like(row))

    def worm_body(w, carry):
        # Interleave chains: worm w belongs to chain c = w mod C of this
        # program's pack (row offset c // C1, lane offset c mod C1).
        c = jax.lax.rem(w, jnp.int32(C))
        c0 = c // jnp.int32(C1)
        c1 = jax.lax.rem(c, jnp.int32(C1))

        if cap is not None and not closed_always:
            ns0, ns1, rs0, rs1 = snap
            ns0[:] = n_out[0, 0]
            ns1[:] = n_out[0, 1]
            rs0[:] = r0_s[:]
            rs1[:] = r1_s[:]

        def ridx(t):
            return t * C0 + c0

        def lidx(x):
            return x * C1 + c1

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
            if cap is not None:
                open_ = open_ & (state[3] < cap)
            return open_

        def body(state):
            _, head_t, head_x, moves = state
            c0w, c1w, c2w, _ = draws()
            u_close = unif(c0w)
            choice = jax.lax.bitwise_and(c1w, jnp.int32(3))
            u_acc = unif(c2w)

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

            link_val = jnp.where(ld == 0, load1(r0_s, ridx(lt), lidx(lx)),
                                 load1(r1_s, ridx(lt), lidx(lx)))
            dnf = dn.astype(jnp.float32)
            dS = (kappa / 2) * (-TWO_PI * dnf) * (2.0 * link_val - TWO_PI * dnf)
            accept = (u_acc < _exp_neg(dS)) & ~close_now

            @pl.when(accept & (ld == 0))
            def _():
                add1(n_out.at[0, 0], ridx(lt), lidx(lx), dn)
                add1(r0_s, ridx(lt), lidx(lx), -TWO_PI * dnf)

            @pl.when(accept & (ld == 1))
            def _():
                add1(n_out.at[0, 1], ridx(lt), lidx(lx), dn)
                add1(r1_s, ridx(lt), lidx(lx), -TWO_PI * dnf)

            head_t = jnp.where(accept, next_t, head_t)
            head_x = jnp.where(accept, next_x, head_x)

            @pl.when(~close_now)
            def _():
                dt = jax.lax.rem(head_t - tail_t + N, jnp.int32(N))
                dx = jax.lax.rem(head_x - tail_x + N, jnp.int32(N))
                add1(hist_ref.at[0], ridx(dt), lidx(dx), np.float32(1.0))

            return (jnp.where(close_now, jnp.int32(1), jnp.int32(0)),
                    head_t, head_x, moves + 1)

        done, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), head0_t, head0_x, jnp.int32(0)))

        if cap is not None and not closed_always:
            # Truncated (still-open) worm at W != 1: the open configuration
            # violates dn ≡ 0 (mod W) — roll the fields back (exact; the
            # worm's Metropolis chain pairs trajectories with their
            # reversals).  Histogram tallies are kept, as in the XLA worm
            # (documented short-separation bias when truncation fires).
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

    return jax.lax.fori_loop(0, worms * C, worm_body, jnp.int32(0))


def _make_hammer_kernel(N, kappa, W, interval_phi, interval_n, sweeps, worms,
                        C0=1, C1=1, p_n=None, worm_cap=None):
    winf = (W == float('inf'))
    kappa = np.float32(kappa)
    interval_phi = np.float32(interval_phi)
    C = C0 * C1
    shape = (C0 * N, C1 * N)

    def kernel(seed_ref, phi_ref, n_ref, phi_out, n_out, hist_ref, stat_ref,
               r0_s, r1_s, *snap):
        # With a worm cap, four extra scratch buffers snapshot (n0, n1, r0, r1)
        # at each worm's start so a truncated (still-open) worm can roll the
        # fields back exactly — the XLA ClassicWorm's truncation-rollback
        # semantics (an unbounded in-kernel worm is exact but its step time is
        # unbounded too: a single monster excursion in the vortex-plasma phase
        # can outlive the TPU runtime watchdog and kill the worker).
        group = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + group * _GOLD)

        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        parity = (row // C0 + lane // C1) % 2

        _rt = lambda x, s: _roll(x, s * C0, 0)
        _rx = lambda x, s: _roll(x, s * C1, 1)

        phi = phi_ref[0, 0]
        n0 = n_ref[0, 0]
        n1 = n_ref[0, 1]
        r0 = (_rt(phi, -1) - phi) - TWO_PI * n0.astype(jnp.float32)
        r1 = (_rx(phi, -1) - phi) - TWO_PI * n1.astype(jnp.float32)

        _masks = []
        for color in (0, 1):
            im = jnp.where(parity == color, 1, 0)
            _masks.append((im, im.astype(jnp.float32), _rt(im, -1), _rx(im, -1)))

        if p_n is None:
            draw = lambda: _int_in(shape, interval_n)
        else:
            draw = lambda: _int_sparse(shape, interval_n, p_n)

        # ---- section 1: neighborhood sweeps (pallas_sweep color passes) ----

        def color_pass(color, state):
            phi, n0, n1, r0, r1, acc = state
            imask, fmask, imask_t, imask_x = _masks[color]

            dphi = (2.0 * _uniform(shape) - 1.0) * interval_phi * fmask
            if winf:
                dz = draw() * imask
                dz_t = _rt(dz, -1)
                dz_x = _rx(dz, -1)
                cn0 = dz_t - dz
                cn1 = dz_x - dz
            else:
                fwd0 = (W * draw()) * imask
                fwd1 = (W * draw()) * imask
                bwd0 = (W * draw()) * imask_t
                bwd1 = (W * draw()) * imask_x
                cn0 = fwd0 + bwd0
                cn1 = fwd1 + bwd1

            dphi_t = _rt(dphi, -1)
            dphi_x = _rx(dphi, -1)
            cr0 = (dphi_t - dphi) - TWO_PI * cn0.astype(jnp.float32)
            cr1 = (dphi_x - dphi) - TWO_PI * cn1.astype(jnp.float32)
            t0 = (kappa / 2) * cr0 * (2.0 * r0 + cr0)
            t1 = (kappa / 2) * cr1 * (2.0 * r1 + cr1)
            dS = t0 + t1 + _rt(t0, 1) + _rx(t1, 1)

            accept = jnp.where(_uniform(shape) < _exp_neg(dS), 1, 0) * imask
            facc = accept.astype(jnp.float32)
            acc_t = _rt(accept, -1)
            acc_x = _rx(accept, -1)

            a_phi = dphi * facc
            if winf:
                az = dz * accept
                a_n0 = dz_t * acc_t - az
                a_n1 = dz_x * acc_x - az
            else:
                a_n0 = fwd0 * accept + bwd0 * acc_t
                a_n1 = fwd1 * accept + bwd1 * acc_x

            phi = phi + a_phi
            n0 = n0 + a_n0
            n1 = n1 + a_n1
            r0 = r0 + (dphi_t * acc_t.astype(jnp.float32) - a_phi) \
                - TWO_PI * a_n0.astype(jnp.float32)
            r1 = r1 + (dphi_x * acc_x.astype(jnp.float32) - a_phi) \
                - TWO_PI * a_n1.astype(jnp.float32)
            acc = acc + jnp.sum(facc)
            return phi, n0, n1, r0, r1, acc

        def sweep(s, state):
            phi, n0, n1, r0, r1, acc, sS, sw2 = state
            phi, n0, n1, r0, r1, acc = color_pass(
                1, color_pass(0, (phi, n0, n1, r0, r1, acc)))
            sS = sS + (kappa / 2) * (jnp.sum(r0 * r0) + jnp.sum(r1 * r1)) \
                * np.float32(1.0 / (C * N * N))
            dn = (_rt(n1, -1) - n1) - (_rx(n0, -1) - n0)
            dnf = dn.astype(jnp.float32)
            sw2 = sw2 + jnp.sum(dnf * dnf) * np.float32(1.0 / (C * N * N))
            return phi, n0, n1, r0, r1, acc, sS, sw2

        phi, n0, n1, r0, r1, acc, sS, sw2 = jax.lax.fori_loop(
            0, sweeps, sweep,
            (phi, n0, n1, r0, r1, jnp.float32(0.0), jnp.float32(0.0),
             jnp.float32(0.0)))

        phi_out[0, 0] = phi
        n_out[0, 0] = n0
        n_out[0, 1] = n1
        hist_ref[0] = jnp.zeros(shape, jnp.float32)
        r0_s[:] = r0
        r1_s[:] = r1

        # ---- section 2: classic worms on the resident residuals ------------
        # With packing the program runs worms for each of its C chains in turn
        # (strided element access picks out one chain's interleaved sites).
        truncations = _worm_section(N, C0, C1, kappa, W, worms, n_out, hist_ref,
                                    r0_s, r1_s, snap=snap or None, cap=worm_cap)

        length = jnp.sum(hist_ref[0])
        stat_ref[0] = jnp.concatenate([
            jnp.full((1, 128), acc, jnp.float32),
            jnp.full((1, 128), sS, jnp.float32),
            jnp.full((1, 128), sw2, jnp.float32),
            jnp.full((1, 128), length, jnp.float32),
            jnp.full((1, 128), truncations.astype(jnp.float32), jnp.float32),
            jnp.zeros((3, 128), jnp.float32),
        ], axis=0)

    return kernel


def _make_strip_hammer_kernel(N, Rb, kappa, W, interval_phi, interval_n,
                              sweeps, worms, p_n=None, worm_cap=None):
    """Strip-regime fused Hammer (N ≥ 512): the strip-chunked sweep body
    (:func:`..pallas_sweep._strip_sweep_section`) followed by the same
    in-kernel worm section, all on one program's VMEM-resident (φ, n, r).

    This removes the round-4 envelope edge where the Hammer composition was
    geometry-conditional (reference Hammer is unconditional,
    /root/reference/supervillain/generator/villain/__init__.py:10-63): the
    worm consumes the residuals the strip sweeps maintain in scratch, with no
    HBM round-trip between the sections.  No chain packing (one N ≥ 512 chain
    fills the vector unit on its own)."""

    def kernel(seed_ref, phi_in, n_in, phi_out, n_out, hist_ref, stat_ref,
               r0_s, r1_s, *snap):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * _GOLD)
        phi_out[0, 0] = phi_in[0, 0]
        n_out[0, 0] = n_in[0, 0]
        n_out[0, 1] = n_in[0, 1]
        phi0 = phi_in[0, 0]
        r0_s[:] = (pltpu.roll(phi0, N - 1, axis=0) - phi0) \
            - TWO_PI * n_in[0, 0].astype(jnp.float32)
        r1_s[:] = (_roll(phi0, -1, 1) - phi0) \
            - TWO_PI * n_in[0, 1].astype(jnp.float32)

        # ---- section 1: strip-chunked neighborhood sweeps ------------------
        acc, sS, sw2 = _strip_sweep_section(N, Rb, kappa, W, interval_phi,
                                            interval_n, sweeps, p_n,
                                            phi_out, n_out, r0_s, r1_s)

        # ---- section 2: classic worms on the resident residuals ------------
        hist_ref[0] = jnp.zeros((N, N), jnp.float32)
        truncations = _worm_section(N, 1, 1, kappa, W, worms, n_out, hist_ref,
                                    r0_s, r1_s, snap=snap or None, cap=worm_cap)

        length = jnp.sum(hist_ref[0])
        stat_ref[0] = jnp.concatenate([
            jnp.full((1, 128), acc, jnp.float32),
            jnp.full((1, 128), sS, jnp.float32),
            jnp.full((1, 128), sw2, jnp.float32),
            jnp.full((1, 128), length, jnp.float32),
            jnp.full((1, 128), truncations.astype(jnp.float32), jnp.float32),
            jnp.zeros((3, 128), jnp.float32),
        ], axis=0)

    return kernel


@partial(jax.jit, static_argnames=('N', 'kappa', 'W', 'interval_phi', 'interval_n',
                                   'sweeps', 'worms', 'p_n', 'chains_per_program',
                                   'max_worm_moves', 'interpret', 'force_strips',
                                   'strip_rows'))
def hammer_sweeps(seed, phi, n, *, N, kappa, W, interval_phi, interval_n,
                  sweeps, worms=1, p_n=None, chains_per_program=1,
                  max_worm_moves=None, interpret=False, force_strips=False,
                  strip_rows=None):
    """Run ``sweeps`` fused neighborhood sweeps followed by ``worms`` classic
    worms per chain, in one Pallas launch.

    Parameters
    ----------
    seed: int32 ()
    phi: (B, 1, N, N) float32
    n: (B, 2, N, N) int32

    ``W = inf`` runs z-mode sweeps (dn = 0 preserved exactly) with the worm
    section kept: closed worms preserve dn = 0 exactly, and wrapping worms
    sample the integer winding sectors pure z-mode sweeps cannot reach.

    ``chains_per_program`` > 1 packs chains in the interleaved layout so small
    lattices (N < 128) fill the vector lanes; needs ``C1·N % 128 == 0`` where
    C1 = min(cpp, 128 // N) — e.g. ``chains_per_program=2`` at N=64.

    ``N ≥ 512`` (or ``force_strips``) dispatches to the strip-regime kernel:
    the strip-chunked sweep body followed by the same worm section, one chain
    per program (``strip_rows`` overrides the strip height for testing).

    ``max_worm_moves`` bounds each worm's move count (exact truncation-rollback
    at W ≠ 1: an unclosed worm's field changes are undone from an in-kernel
    snapshot; at W = 1 the open configuration is valid and kept, as in the XLA
    ClassicWorm).  Unbounded worms are exact but their step time is not: in
    the vortex-plasma phase the worm-length distribution's tail can realize a
    single excursion long enough to trip the TPU runtime watchdog, so
    production launches should pass a generous cap (e.g. 64·N²).  The
    per-program truncation count comes back as inline ``Worm_Truncated``.

    Returns
    -------
    (phi, n, accepted, inline): updated fields, per-program accepted sweep-move
    counts (G,), and inline observables: per-sweep-averaged ``ActionDensity``
    and ``WindingSquared`` (G,), the per-chain worm ``Vortex_Vortex`` histogram
    (B, N, N), per-chain ``Worm_Length`` (B,), and per-program
    ``Worm_Truncated`` (G,).
    """
    B = phi.shape[0]
    cap = None if max_worm_moves is None else int(max_worm_moves)
    if N >= STRIP_THRESHOLD or force_strips:
        # Strip regime: one chain per program, strip sweep body + worm section.
        if chains_per_program != 1:
            raise ValueError('the strip-regime hammer runs one chain per '
                             'program (chains_per_program=1)')
        if N % 128 != 0 and not interpret:
            raise ValueError('hammer_sweeps needs N to be a multiple of 128 '
                             '(the worm section addresses whole 128-lane tiles)')
        Rb = _strip_rows(N) if strip_rows is None else int(strip_rows)
        if N % Rb != 0 or Rb % 2 != 0:
            raise ValueError(f'strip_rows must be an even divisor of N (got '
                             f'Rb={Rb}, N={N})')
        # At N=1024 with rollback snapshots the resident state (φ 4 + n 8 +
        # hist 4 + r 8 + snap 16 MB) plus pipelined block buffers and strip
        # temporaries exceeds the conservative 100 MB scoped-vmem budget the
        # plain strip kernels use; grant the full v5e VMEM minus runtime
        # margin, and shrink the strips to cut the temporary footprint.
        vmem_limit = 127 * 1024 * 1024
        if strip_rows is None and N >= 1024:
            Rb = min(Rb, 128)
        kernel = _make_strip_hammer_kernel(N, Rb, kappa, W, interval_phi,
                                           interval_n, sweeps, worms, p_n=p_n,
                                           worm_cap=cap)
        scratch = [pltpu.VMEM((N, N), jnp.float32),
                   pltpu.VMEM((N, N), jnp.float32)]
        if cap is not None and W != 1:
            scratch += [pltpu.VMEM((N, N), jnp.int32),
                        pltpu.VMEM((N, N), jnp.int32),
                        pltpu.VMEM((N, N), jnp.float32),
                        pltpu.VMEM((N, N), jnp.float32)]
        phi_spec = pl.BlockSpec((1, 1, N, N), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        n_spec = pl.BlockSpec((1, 2, N, N), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        out_phi, out_n, hist, stat = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), phi_spec, n_spec],
            out_specs=(phi_spec, n_spec,
                       pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct(phi.shape, jnp.float32),
                       jax.ShapeDtypeStruct(n.shape, jnp.int32),
                       jax.ShapeDtypeStruct((B, N, N), jnp.float32),
                       jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32).reshape(1), phi, n)
        inline = {'ActionDensity': stat[:, 1, 0] / sweeps,
                  'WindingSquared': stat[:, 2, 0] / sweeps,
                  'Vortex_Vortex': hist,
                  'Worm_Length': jnp.sum(hist, axis=(1, 2)),
                  'Worm_Truncated': stat[:, 4, 0]}
        return out_phi, out_n, stat[:, 0, 0], inline

    C = chains_per_program
    if B % C != 0:
        raise ValueError(f'{B} chains not divisible by chains_per_program={C}')
    G = B // C
    C1 = min(C, max(1, 128 // N))
    while C % C1 != 0:
        C1 -= 1
    C0 = C // C1
    if (C1 * N) % 128 != 0:
        raise ValueError(f'hammer_sweeps needs C1*N to be a multiple of 128 '
                         f'(got C1={C1}, N={N}): the worm section addresses '
                         f'whole 128-lane tiles.  At N<128 pass '
                         f'chains_per_program >= {128 // N}.')
    R, CN = C0 * N, C1 * N

    def pack(x):
        k = x.shape[1]
        return (x.reshape(G, C0, C1, k, N, N).transpose(0, 3, 4, 1, 5, 2)
                .reshape(G, k, R, CN))

    def unpack(x):
        k = x.shape[1]
        return (x.reshape(G, k, N, C0, N, C1).transpose(0, 3, 5, 1, 2, 4)
                .reshape(B, k, N, N))

    phi_p = pack(phi) if C > 1 else phi
    n_p = pack(n) if C > 1 else n

    kernel = _make_hammer_kernel(N, kappa, W, interval_phi, interval_n,
                                 sweeps, worms, C0=C0, C1=C1, p_n=p_n,
                                 worm_cap=cap)
    scratch = [pltpu.VMEM((R, CN), jnp.float32),
               pltpu.VMEM((R, CN), jnp.float32)]
    # At W = 1 an open (truncated) worm is a valid configuration — no rollback,
    # so no snapshot scratch (mirrors classic_worms' W != 1 guard).
    if cap is not None and W != 1:
        scratch += [pltpu.VMEM((R, CN), jnp.int32),
                    pltpu.VMEM((R, CN), jnp.int32),
                    pltpu.VMEM((R, CN), jnp.float32),
                    pltpu.VMEM((R, CN), jnp.float32)]
    phi_spec = pl.BlockSpec((1, 1, R, CN), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((1, 2, R, CN), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out_phi, out_n, hist, stat = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), phi_spec, n_spec],
        out_specs=(phi_spec, n_spec,
                   pl.BlockSpec((1, R, CN), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(phi_p.shape, jnp.float32),
                   jax.ShapeDtypeStruct(n_p.shape, jnp.int32),
                   jax.ShapeDtypeStruct((G, R, CN), jnp.float32),
                   jax.ShapeDtypeStruct((G, 8, 128), jnp.float32)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), phi_p, n_p)
    if C > 1:
        out_phi = unpack(out_phi)
        out_n = unpack(out_n)
        hist = unpack(hist[:, None])[:, 0]
    wl = jnp.sum(hist, axis=(1, 2))
    inline = {'ActionDensity': stat[:, 1, 0] / sweeps,
              'WindingSquared': stat[:, 2, 0] / sweeps,
              'Vortex_Vortex': hist,
              'Worm_Length': wl,
              'Worm_Truncated': stat[:, 4, 0]}
    return out_phi, out_n, stat[:, 0, 0], inline
