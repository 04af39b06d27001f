"""Torus-wrapping observables (reference observable/wrapping.py:4-59)."""

import jax.numpy as jnp

from .core import Observable, Scalar


class TorusWrapping(Observable):
    r"""Global winding per direction: Villain ``Σ n_μ``; Worldline ``Σ m_μ / N``.
    Does not match across formulations (different physical content)."""

    @staticmethod
    def Villain(S, phi, n):
        return n.sum(axis=tuple(range(1, n.ndim)))

    @staticmethod
    def Worldline(S, m):
        return m.sum(axis=tuple(range(1, m.ndim))) / S.Lattice.N


class WrappingSquared(Scalar, Observable):
    r"""``Σ_μ TorusWrapping_μ²``: positive semi-definite topological fluctuation."""

    @staticmethod
    def default(S, TorusWrapping):
        w = TorusWrapping.astype(jnp.promote_types(TorusWrapping.dtype, jnp.float32))
        return jnp.sum(w ** 2)
