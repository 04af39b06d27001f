"""Spin-correlator observables (reference observable/spin.py:5-326)."""

import numpy as np
import jax
import jax.numpy as jnp

from .core import Observable, DerivedQuantity
from ._taxicab import spin_tables


class Spin_Spin(Observable):
    r"""The boson two-point function reduced to a single relative coordinate,
    ``Spin_Spin_Δx = (1/Λ) Σ_x S_{x, x-Δx}``.

    Villain: ``L.correlation(e^{iφ}, e^{iφ})`` — any D, automatically normalized to 1
    at the origin.  Worldline: taxicab defect-reweighting
    ``exp(-(1/2κ) Σ_{ℓ∈P} (2 P m + P²))`` averaged over translations — D=2 only (the
    inline worm histogram is the dimension-general route)."""

    sequential = True  # gather-heavy; lax.map over draws bounds memory

    @staticmethod
    def Villain(S, phi):
        L = S.Lattice
        cdtype = jnp.complex128 if jnp.result_type(0.0) == jnp.float64 else jnp.complex64
        spin = jnp.exp(1j * phi[0].astype(cdtype))
        return L.correlation(spin, spin)

    @staticmethod
    def Worldline(S, Links):
        if S.Lattice.D != 2:
            raise NotImplementedError(
                'The Worldline Spin_Spin taxicab measurement is only implemented for D=2.')
        L = S.Lattice
        N = L.N
        dirs, offs, signs, lengths = (jnp.asarray(t) for t in spin_tables(L.D, N))
        # All starting sites, as array coordinates.
        starts = jnp.stack(jnp.meshgrid(jnp.arange(N), jnp.arange(N), indexing='ij'),
                           axis=-1).reshape(-1, 2)

        def row(args):
            dirs_r, offs_r, signs_r = args  # (N, Lmax[, 2])
            pos = jnp.mod(starts[None, :, None, :] + offs_r[:, None, :, :], N)
            vals = Links[dirs_r[:, None, :], pos[..., 0], pos[..., 1]]
            return (signs_r[:, None, :] * vals).sum(axis=-1)  # (N, sites)

        Pm = jax.lax.map(row, (dirs, offs, signs))            # (N, N, sites)
        Psq = lengths.astype(Pm.dtype)[..., None]
        return jnp.exp(-1 / (2 * S.kappa) * (2 * Pm + Psq)).mean(axis=-1)

    @staticmethod
    def CriticalScalingDimension(S):
        r"""``Δ = W²/8`` (finite W); ``1/πκ`` (W=∞)."""
        if S.W < float('inf'):
            return S.W ** 2 / 8
        return 1 / S.kappa / np.pi


class Spin_Spin_Normalized(DerivedQuantity):
    r"""``Spin_Spin / Spin_Spin[origin]`` — needed to normalize inline worm
    histograms, which can only be normalized after the bootstrap."""

    @staticmethod
    def default(S, Spin_Spin):
        return Spin_Spin / Spin_Spin[S.Lattice.origin]


class SpinSusceptibility(DerivedQuantity):
    r"""``χ_S = Σ_r Re Spin_Spin_Normalized(r)``."""

    @staticmethod
    def default(S, Spin_Spin_Normalized):
        return jnp.sum(Spin_Spin_Normalized.real)


class SpinSusceptibilityScaled(SpinSusceptibility):
    r"""``χ_S / L^{D - 2Δ(κ_c)}`` — constant at criticality in the large-L limit."""

    @staticmethod
    def default(S, SpinSusceptibility):
        L = S.Lattice
        return SpinSusceptibility / L.N ** (L.D - 2 * Spin_Spin.CriticalScalingDimension(S))


class SpinCriticalMoment(DerivedQuantity):
    r"""``C_S = (1/L^D) Σ_r r^{2Δ} S(r)``."""

    @staticmethod
    def default(S, Spin_Spin_Normalized):
        L = S.Lattice
        weight = jnp.asarray(L.R_squared) ** Spin_Spin.CriticalScalingDimension(S)
        return jnp.sum(weight * Spin_Spin_Normalized.real) / L.sites
