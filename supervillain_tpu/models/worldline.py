"""The dual (worldline) action for the compact boson.

Semantics parity with /root/reference/supervillain/action/worldline.py:12-155.  Field
configuration pytree: ``{'m': (D, N, ..., N) int, 'v': (C(D,2), N, ..., N) int}``
(v is float when W=∞), subject to the constraint ``δm = 0`` on every site.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import Lattice
from ..ops import calculus as calc


class Worldline:
    r"""The worldline action

    .. math::
        S[m, v] = \frac{1}{2\kappa} \sum_\ell \left(m - \frac{\delta v}{W}\right)_\ell^2
                  + \frac{|\ell|}{2}\ln(2\pi\kappa) - |x|\ln 2\pi

    summed over configurations with ``δm = 0`` everywhere.

    Parameters
    ----------
    lattice: Lattice
    kappa: float
    W: int or float('inf')
        The winding symmetry is Z_W.  Internally ``_W = W`` (finite) or ``2π`` (W=∞),
        as in the reference (worldline.py:46-50).
    """

    fields = ('m', 'v')

    def __init__(self, lattice: Lattice, kappa: float, W=1):
        if not isinstance(lattice, Lattice):
            raise TypeError(f'Worldline requires a Lattice, got {type(lattice).__name__}')
        self.Lattice = lattice
        self.kappa = float(kappa)
        self.W = (float('inf') if W == float('inf') else int(W))
        self._W = (self.W if self.W < float('inf') else 2 * np.pi)
        self._constant_offset = (
            lattice.links / 2 * np.log(2 * np.pi * kappa) - lattice.sites * np.log(2 * np.pi)
        )

    def __str__(self):
        return f'Worldline({self.Lattice}, κ={self.kappa}, W={self.W})'

    __repr__ = __str__

    def __eq__(self, other):
        return (isinstance(other, Worldline)
                and (self.Lattice, self.kappa, self.W) == (other.Lattice, other.kappa, other.W))

    def __hash__(self):
        return hash(('Worldline', self.Lattice, self.kappa, self.W))

    # -- action evaluation (jittable) -------------------------------------

    def links(self, m, v):
        r"""Gauge-invariant link variables ``m - δv/W`` as a 1-form."""
        return m - calc.delta(self.Lattice, 2, v) / self._W

    def energy(self, m, v):
        r"""The field-dependent part of S (no constraint check; jittable)."""
        return 0.5 / self.kappa * jnp.sum(self.links(m, v) ** 2) + self._constant_offset

    def __call__(self, m, v, **kwargs):
        r"""S[m, v]; raises ValueError if ``δm ≠ 0`` anywhere (host-side check,
        matching reference worldline.py:72-94)."""
        if not self.valid({'m': m}):
            raise ValueError('The one-form m does not satisfy δm = 0 everywhere.')
        return self.energy(m, v)

    # -- configurations ---------------------------------------------------

    def initial(self, float_dtype=None, int_dtype=None):
        """The cold (all-zero) field configuration pytree."""
        L = self.Lattice
        idt = int_dtype or jnp.zeros(0, dtype=int).dtype
        vdt = idt if self.W < float('inf') else (float_dtype or jnp.zeros(0).dtype)
        return {
            'm': jnp.zeros(L.form_shape(1), dtype=idt),
            'v': jnp.zeros(L.form_shape(2), dtype=vdt),
        }

    def field_degrees(self):
        return {'m': 1, 'v': 2}

    def configurations(self, count):
        from ..configurations import Configurations
        L = self.Lattice
        v_dtype = int if self.W < float('inf') else float
        return Configurations({
            'm': np.zeros((count,) + L.form_shape(1), dtype=int),
            'v': np.zeros((count,) + L.form_shape(2), dtype=v_dtype),
        })

    # -- symmetries and constraints ---------------------------------------

    def valid(self, configuration):
        r"""Is ``δm = 0`` satisfied on every site?"""
        dm = calc.delta(self.Lattice, 1, configuration['m'])
        return bool((np.asarray(dm) == 0).all())

    def equivalence_class_v(self, configuration):
        r"""Gauge-fix v into [0, W): v → v + λW, m → m - δλ with λ = -floor(v/W)
        (reference worldline.py:116-155).  No-op when W=∞."""
        if self.W == float('inf'):
            return configuration
        v = configuration['v']
        lam = jnp.floor_divide(v, self.W)
        return dict(configuration) | {
            'm': configuration['m'] - calc.delta(self.Lattice, 2, lam),
            'v': jnp.mod(v, self.W),
        }

    # -- persistence ------------------------------------------------------

    def to_h5(self, group):
        group.attrs['type'] = 'Worldline'
        self.Lattice.to_h5(group.create_group('lattice'))
        group['kappa'] = self.kappa
        group['W'] = self.W

    @classmethod
    def from_h5(cls, group):
        W = float(np.asarray(group['W']))
        return cls(Lattice.from_h5(group['lattice']), float(np.asarray(group['kappa'])),
                   W if W == float('inf') else int(W))
