"""Topological-charge observables for the D=4 Villain model
(reference observable/topological.py:11-208)."""

import jax.numpy as jnp

from ..ops import calculus as calc
from .core import Observable, Scalar, DerivedQuantity


def _charge_density(S, n):
    """Local topological-charge density q = (dn ∧ dn), a 4-form (D=4 only)."""
    L = S.Lattice
    if L.D != 4:
        raise NotImplementedError('Topological-charge observables require D = 4.')
    field_strength = calc.d(L, 1, n)
    return calc.wedge(L, 2, field_strength, 2, field_strength)


class TopologicalChargeDensity(Observable):
    r"""``q_x = (dn ∧ dn)_x``: one value per 4-cell.  Exact, so its lattice sum (the
    total charge) vanishes configuration by configuration on the torus."""

    @staticmethod
    def Villain(S, n):
        return _charge_density(S, n).sum(axis=0)


class TopologicalCharge(Scalar, Observable):
    r"""``Q = Σ_x q_x``, identically zero on the periodic lattice."""

    @classmethod
    def autocorrelation(cls, ensemble):
        # Identically zero: no fluctuations to autocorrelate.
        return False

    @staticmethod
    def Villain(S, TopologicalChargeDensity):
        return TopologicalChargeDensity.sum()


class TopologicalChargeDensitySquared(Scalar, Observable):
    r"""``(1/Λ) Σ_x q_x²``: the local topological fluctuation."""

    @classmethod
    def autocorrelation(cls, ensemble):
        from ..models import Villain
        S = ensemble.Action
        return (isinstance(S, Villain) and S.Lattice.D == 4 and S.W < float('inf')
                and super().autocorrelation(ensemble))

    @staticmethod
    def Villain(S, TopologicalChargeDensity):
        q = TopologicalChargeDensity.astype(
            jnp.promote_types(TopologicalChargeDensity.dtype, jnp.float32))
        return jnp.mean(q ** 2)


class TopologicalTwoPoint(Observable):
    r"""``(1/Λ) Σ_x q_x q_{x-Δx}`` via the Fourier-accelerated correlation."""

    @staticmethod
    def Villain(S, TopologicalChargeDensity):
        q = TopologicalChargeDensity.astype(
            jnp.promote_types(TopologicalChargeDensity.dtype, jnp.float32))
        return S.Lattice.correlation(q, q).real


class Topological_Topological(DerivedQuantity):
    r"""Connected charge correlator:
    ``TopologicalTwoPoint - correlation(⟨q⟩, ⟨q⟩)``."""

    @staticmethod
    def default(S, TopologicalTwoPoint, TopologicalChargeDensity):
        L = S.Lattice
        q = TopologicalChargeDensity
        return TopologicalTwoPoint - L.correlation(q, q).real
