"""Vortex-correlator observables (reference observable/vortex.py:6-274)."""

import numpy as np
import jax
import jax.numpy as jnp

from .core import Observable, DerivedQuantity, Constrained
from ._taxicab import vortex_tables


class Vortex_Vortex(Constrained, Observable):
    r"""``V_Δx = (1/Λ) Σ_x ⟨e^{2πi(v_x - v_{x-Δx})/W}⟩``.

    Worldline: direct correlation of ``e^{2πiv/W}``, orientation-averaged — any D.
    Villain: dual-lattice taxicab reweighting — D=2 only (the inline worm histogram is
    the dimension-general route)."""

    sequential = True

    @staticmethod
    def Worldline(S, v):
        L = S.Lattice
        if L.D < 2:
            raise NotImplementedError('Vortex observables require D >= 2.')
        cdtype = jnp.complex128 if jnp.result_type(0.0) == jnp.float64 else jnp.complex64
        vortex = jnp.exp(2j * np.pi * v.astype(cdtype) / S._W)
        return L.correlation(vortex, vortex).mean(axis=0)

    @staticmethod
    def Villain(S, Links):
        if S.Lattice.D != 2:
            raise NotImplementedError(
                'The Villain Vortex_Vortex taxicab measurement is only implemented for D=2.')
        L = S.Lattice
        N = L.N
        dirs, offs, signs, lengths = (jnp.asarray(t) for t in vortex_tables(L.D, N))
        starts = jnp.stack(jnp.meshgrid(jnp.arange(N), jnp.arange(N), indexing='ij'),
                           axis=-1).reshape(-1, 2)

        def row(args):
            dirs_r, offs_r, signs_r = args
            pos = jnp.mod(starts[None, :, None, :] + offs_r[:, None, :, :], N)
            vals = Links[dirs_r[:, None, :], pos[..., 0], pos[..., 1]]
            return (signs_r[:, None, :] * vals).sum(axis=-1)  # (N, sites)

        Pn = jax.lax.map(row, (dirs, offs, signs))
        length = lengths.astype(Pn.dtype)[..., None]
        dS = -2 * np.pi * S.kappa * (Pn - np.pi * length)
        return jnp.exp(-dS).mean(axis=-1)

    @staticmethod
    def CriticalScalingDimension(S):
        r"""``Δ = 2/W²`` (finite W); ``4πκ`` (W=∞)."""
        if S.W < float('inf'):
            return 2 / S.W ** 2
        return 4 * np.pi * S.kappa


class Vortex_Vortex_Normalized(DerivedQuantity):
    r"""``Vortex_Vortex / Vortex_Vortex[origin]``."""

    @staticmethod
    def default(S, Vortex_Vortex):
        return Vortex_Vortex / Vortex_Vortex[S.Lattice.origin]


class VortexSusceptibility(DerivedQuantity):
    r"""``χ_V = Σ_r Re Vortex_Vortex_Normalized(r)``."""

    @staticmethod
    def default(S, Vortex_Vortex_Normalized):
        return jnp.sum(Vortex_Vortex_Normalized.real)


class VortexSusceptibilityScaled(VortexSusceptibility):
    r"""``χ_V / L^{D - 2Δ(κ_c, W)}``."""

    @staticmethod
    def default(S, VortexSusceptibility):
        L = S.Lattice
        return VortexSusceptibility / L.N ** (L.D - 2 * Vortex_Vortex.CriticalScalingDimension(S))


class VortexCriticalMoment(DerivedQuantity):
    r"""``C_V = (1/L^D) Σ_r r^{2Δ} V(r)``."""

    @staticmethod
    def default(S, Vortex_Vortex_Normalized):
        L = S.Lattice
        weight = jnp.asarray(L.R_squared) ** Vortex_Vortex.CriticalScalingDimension(S)
        return jnp.sum(weight * Vortex_Vortex_Normalized.real) / L.sites
