"""Action-density observables (reference observable/action.py:4-215)."""

import jax.numpy as jnp

from .core import Observable, DerivedQuantity, Scalar


class ActionDensity(Scalar, Observable):
    r"""``⟨κ ∂_κ S⟩/Λ``; in the Villain case this is the action itself per site."""

    @staticmethod
    def Villain(S, phi, n):
        return S(phi, n) / S.Lattice.sites

    @staticmethod
    def Worldline(S, Links):
        L = S.Lattice
        return (L.links / 2 - 0.5 / S.kappa * jnp.sum(Links ** 2)) / L.sites


class ActionTwoPoint(Observable):
    r"""Translation-averaged ``S²_{x, x-Δx}`` via the Fourier-accelerated correlation,
    with the contact term subtracted at the origin."""

    @staticmethod
    def Villain(S, Links):
        L = S.Lattice
        density = 0.5 * S.kappa * jnp.sum(Links ** 2, axis=0)
        result = L.correlation(density, density).real
        return result.at[L.origin].add(-density.mean())

    @staticmethod
    def Worldline(S, Links):
        L = S.Lattice
        m_squared = jnp.sum(Links ** 2, axis=0)
        derivative = 1 - 0.5 / S.kappa * m_squared
        result = L.correlation(derivative, derivative).real
        # Contact adjustment: what remains after cancelling the local one-derivative
        # term against the two-derivative term.
        return result.at[L.origin].add(-(m_squared / 2 / S.kappa).mean())


class Action_Action(DerivedQuantity):
    r"""Connected action-density correlator:
    ``ActionTwoPoint_Δx - ⟨ActionDensity⟩²``."""

    @staticmethod
    def default(S, ActionTwoPoint, ActionDensity):
        return ActionTwoPoint - ActionDensity ** 2
