"""Pallas TPU kernel: fused Villain neighborhood sweeps.

The XLA path materializes intermediate arrays in HBM between the proposal, ΔS,
accept, and apply stages of every checkerboard color.  This kernel runs *many whole
sweeps per launch entirely in VMEM*: one chain's (φ, n) state is loaded once,
``sweeps`` full two-color neighborhood updates run on the VPU with in-register
rolls and the on-core PRNG, and the state is written back once — HBM traffic is
amortized over the whole launch instead of paid ~20× per sweep.

Update semantics identical to
:class:`supervillain_tpu.generators.villain.NeighborhoodUpdate` (same ΔS algebra,
reference /root/reference/supervillain/generator/villain/neighborhood.py:59-137);
the PRNG stream differs (pltpu hardware PRNG instead of jax.random), so agreement
with the XLA path is statistical, not bitwise.

D=2, even N (two-color checkerboard), f32 φ / i32 n.  Grid: one program per chain.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = np.float32(2 * np.pi)


def _uniform(shape):
    """Uniform [0,1) f32 from the on-core PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> np.uint32(8), jnp.int32)  # in [0, 2^24)
    return top24.astype(jnp.float32) * np.float32(2 ** -24)


def _int_in(shape, interval):
    """Uniform integers in {-interval, ..., +interval} (zero included)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast(bits % np.uint32(2 * interval + 1), jnp.int32) - interval


def _roll(x, shift, axis):
    # pltpu.roll requires a non-negative shift; normalize mod the axis length.
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _make_kernel(N, kappa, W, interval_phi, interval_n, sweeps):
    kappa = np.float32(kappa)
    interval_phi = np.float32(interval_phi)

    def kernel(seed_ref, phi_ref, n_ref, phi_out, n_out, acc_out):
        chain = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + chain * np.int32(2654435761 & 0x7FFFFFFF))

        it = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        parity = (it + ix) % 2

        phi = phi_ref[0, 0]
        n0 = n_ref[0, 0]
        n1 = n_ref[0, 1]
        # Residual r_mu = (dφ)_mu − 2π n_mu, maintained in VMEM across all sweeps.
        r0 = (_roll(phi, -1, 0) - phi) - TWO_PI * n0.astype(jnp.float32)
        r1 = (_roll(phi, -1, 1) - phi) - TWO_PI * n1.astype(jnp.float32)

        def color_pass(color, state):
            # Boolean vectors cannot be rotated by Mosaic; keep masks as i32/f32.
            phi, n0, n1, r0, r1, acc = state
            imask = jnp.where(parity == color, 1, 0)
            fmask = imask.astype(jnp.float32)

            dphi = (2.0 * _uniform((N, N)) - 1.0) * interval_phi * fmask
            fwd0 = (W * _int_in((N, N), interval_n)) * imask
            fwd1 = (W * _int_in((N, N), interval_n)) * imask
            bwd0 = (W * _int_in((N, N), interval_n)) * _roll(imask, -1, 0)
            bwd1 = (W * _int_in((N, N), interval_n)) * _roll(imask, -1, 1)
            cn0 = fwd0 + bwd0
            cn1 = fwd1 + bwd1

            cr0 = (_roll(dphi, -1, 0) - dphi) - TWO_PI * cn0.astype(jnp.float32)
            cr1 = (_roll(dphi, -1, 1) - dphi) - TWO_PI * cn1.astype(jnp.float32)
            t0 = (kappa / 2) * cr0 * (2.0 * r0 + cr0)
            t1 = (kappa / 2) * cr1 * (2.0 * r1 + cr1)
            dS = t0 + t1 + _roll(t0, 1, 0) + _roll(t1, 1, 1)

            accept = jnp.where(_uniform((N, N)) < jnp.exp(-dS), 1, 0) * imask
            facc = accept.astype(jnp.float32)

            a_phi = dphi * facc
            a_n0 = fwd0 * accept + bwd0 * _roll(accept, -1, 0)
            a_n1 = fwd1 * accept + bwd1 * _roll(accept, -1, 1)

            phi = phi + a_phi
            n0 = n0 + a_n0
            n1 = n1 + a_n1
            r0 = r0 + (_roll(a_phi, -1, 0) - a_phi) - TWO_PI * a_n0.astype(jnp.float32)
            r1 = r1 + (_roll(a_phi, -1, 1) - a_phi) - TWO_PI * a_n1.astype(jnp.float32)
            acc = acc + jnp.sum(facc)
            return phi, n0, n1, r0, r1, acc

        def sweep(s, state):
            phi, n0, n1, r0, r1, acc, sS, sw2 = state
            phi, n0, n1, r0, r1, acc = color_pass(
                1, color_pass(0, (phi, n0, n1, r0, r1, acc)))
            # Inline observables, measured once per sweep while the residuals are
            # hot in VMEM: action density (κ/2)Σr²/Λ and the mean squared
            # plaquette winding (dn)² with dn = Δ_0 n_1 − Δ_1 n_0.
            sS = sS + (kappa / 2) * (jnp.sum(r0 * r0) + jnp.sum(r1 * r1)) * np.float32(1.0 / (N * N))
            dn = (_roll(n1, -1, 0) - n1) - (_roll(n0, -1, 1) - n0)
            dnf = dn.astype(jnp.float32)
            sw2 = sw2 + jnp.sum(dnf * dnf) * np.float32(1.0 / (N * N))
            return phi, n0, n1, r0, r1, acc, sS, sw2

        phi, n0, n1, r0, r1, acc, sS, sw2 = jax.lax.fori_loop(
            0, sweeps, sweep,
            (phi, n0, n1, r0, r1, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)))

        phi_out[0, 0] = phi
        n_out[0, 0] = n0
        n_out[0, 1] = n1
        acc_out[0] = jnp.concatenate([
            jnp.full((1, 128), acc, jnp.float32),
            jnp.full((1, 128), sS, jnp.float32),
            jnp.full((1, 128), sw2, jnp.float32),
            jnp.zeros((5, 128), jnp.float32),
        ], axis=0)

    return kernel


@partial(jax.jit, static_argnames=('N', 'kappa', 'W', 'interval_phi', 'interval_n',
                                   'sweeps', 'interpret'))
def neighborhood_sweeps(seed, phi, n, *, N, kappa, W, interval_phi, interval_n,
                        sweeps, interpret=False):
    """Run ``sweeps`` fused neighborhood sweeps on a chain batch.

    Parameters
    ----------
    seed: int32 array ()
    phi: (B, 1, N, N) float32
    n: (B, 2, N, N) int32

    Returns
    -------
    (phi, n, accepted, inline): updated fields, per-chain accepted counts (B,),
    and per-chain inline observables averaged over the launch's sweeps:
    ``{'ActionDensity': (B,), 'WindingSquared': (B,)}``.
    """
    B = phi.shape[0]
    kernel = _make_kernel(N, kappa, W, interval_phi, interval_n, sweeps)
    grid = (B,)
    phi_spec = pl.BlockSpec((1, 1, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((1, 2, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out_phi, out_n, acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), phi_spec, n_spec],
        out_specs=(phi_spec, n_spec,
                   pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(phi.shape, jnp.float32),
                   jax.ShapeDtypeStruct(n.shape, jnp.int32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), phi, n)
    inline = {'ActionDensity': acc[:, 1, 0] / sweeps,
              'WindingSquared': acc[:, 2, 0] / sweeps}
    return out_phi, out_n, acc[:, 0, 0], inline
