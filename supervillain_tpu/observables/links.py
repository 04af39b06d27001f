"""Gauge-invariant link variables (reference observable/links.py:5-45)."""

import numpy as np

from ..ops import calculus as calc
from .core import Observable


class Links(Observable):
    r"""The gauge-invariant link combination each formulation's observables consume.
    Villain: ``dφ - 2πn``; Worldline: ``m - δv/W``.  (Not expected to match across
    formulations; both average to zero by lattice symmetry.)"""

    @staticmethod
    def Villain(S, phi, n):
        return calc.d(S.Lattice, 0, phi) - 2 * np.pi * n

    @staticmethod
    def Worldline(S, m, v):
        return m - calc.delta(S.Lattice, 2, v) / S._W
