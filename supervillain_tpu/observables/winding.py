"""Plaquette-winding observables (reference observable/winding.py:8-203)."""

import numpy as np
import jax.numpy as jnp

from ..ops import calculus as calc
from .core import Observable, Scalar


def _require_plaquettes(S):
    if S.Lattice.D < 2:
        raise NotImplementedError('Winding observables require D >= 2.')


class WindingSquared(Scalar, Observable):
    r"""Lattice-averaged squared plaquette winding:
    Villain ``mean(dn²)``; Worldline ``1/(π²κ) - mean(d Links²)/(2πκ)²``."""

    @staticmethod
    def Villain(S, n):
        _require_plaquettes(S)
        return jnp.mean(calc.d(S.Lattice, 1, n).astype(jnp.promote_types(n.dtype, jnp.float32)) ** 2)

    @staticmethod
    def Worldline(S, Links):
        _require_plaquettes(S)
        dm = calc.d(S.Lattice, 1, Links)
        return 1 / (np.pi ** 2 * S.kappa) - jnp.mean(dm ** 2) / (2 * np.pi * S.kappa) ** 2


class Winding_Winding(Observable):
    r"""Translation-averaged plaquette-winding correlator, orientation-averaged over
    the C(D,2) components.  The Worldline measurement needs the J-independent dδ
    contact stencil (orientation-averaged diagonal; minus the 5-point Laplacian in
    2D), cached per (D, N)."""

    _stencil = {}

    @staticmethod
    def Villain(S, n):
        _require_plaquettes(S)
        L = S.Lattice
        dn = calc.d(L, 1, n).astype(jnp.promote_types(n.dtype, jnp.float32))
        return L.correlation(dn, dn).real.mean(axis=0)

    @staticmethod
    def Worldline(S, Links):
        _require_plaquettes(S)
        L = S.Lattice
        kappa = S.kappa
        dm = calc.d(L, 1, Links)

        key = (L.D, L.N)
        contact = Winding_Winding._stencil.get(key)
        if contact is None:
            # Orientation-averaged diagonal of dδ: unit source on component c at the
            # origin, apply dδ, read back component c, average over c.
            orientations = len(L.components[2])
            contact = np.zeros(L.dims)
            for c in range(orientations):
                source = np.zeros(L.form_shape(2))
                source[c][L.origin] = 1.0
                contact += np.asarray(calc.d(L, 1, calc.delta(L, 2, jnp.asarray(source))))[c]
            contact /= orientations
            Winding_Winding._stencil[key] = contact

        return (kappa * jnp.asarray(contact) - L.correlation(dm, dm).real.mean(axis=0)) \
            / (2 * np.pi * kappa) ** 2
