"""Reference-compatible namespace: ``supervillain_tpu.lattice`` mirrors the
reference's ``supervillain.lattice`` import surface
(/root/reference/supervillain/lattice/__init__.py:13-14).

The device-tier operators in :mod:`.ops.calculus` take explicit ``(lattice, p, f)``
arguments because degree must be static under ``jit``.  Reference code instead calls
``d(form)`` with the degree riding on the :class:`Form`.  The wrappers here accept
*both* conventions, so code written against the reference's calling style runs
unchanged on the host tier::

    from supervillain_tpu.lattice import Lattice, Form, d, delta
    L = Lattice(2, 5)
    f = L.form(1)          # host Form, degree metadata attached
    df = d(f)              # degree inferred from the Form
    df2 = d(L, 1, f)       # explicit device-tier convention also accepted
"""

from __future__ import annotations

import numpy as np

from .ops.lattice import Lattice, Lattice2D
from .ops.form import Form
from .ops import calculus as _calculus
from .ops.sparse import delta_sparse, d_sparse, coface_sum_at, face_sum_at
from .ops.calculus import push, pull

__all__ = [
    'Lattice', 'Lattice2D', 'Form', 'd', 'delta', 'delta_sparse', 'd_sparse',
    'coface_sum_at', 'face_sum_at', 'laplacian', 'star', 'wedge', 'push', 'pull',
]


def _unary(name, out_degree):
    base = getattr(_calculus, name)

    def op(*args):
        if len(args) == 1:
            f = args[0]
            if not isinstance(f, Form):
                raise TypeError(
                    f'{name}(f) requires a Form (degree metadata); '
                    f'for plain arrays call {name}(lattice, p, f)')
            # At the degree boundaries the reference returns scalar 0 rather
            # than raising (d of a top form, δ of a 0-form;
            # /root/reference/supervillain/lattice/compact.py:996-1000,1035-1039).
            if name == 'd' and f.degree == f.lattice.D:
                return 0
            if name == 'delta' and f.degree == 0:
                return 0
            out = np.asarray(base(f.lattice, f.degree, np.asarray(f)))
            return Form(out, degree=out_degree(f.lattice, f.degree), lattice=f.lattice)
        return base(*args)

    op.__name__ = name
    op.__doc__ = (f'``{name}``: accepts ``{name}(form)`` (reference convention, '
                  f'returns Form) or ``{name}(lattice, p, f)`` (device tier). '
                  f'See :func:`supervillain_tpu.ops.calculus.{name}`.')
    return op


d = _unary('d', lambda L, p: p + 1)
delta = _unary('delta', lambda L, p: p - 1)
laplacian = _unary('laplacian', lambda L, p: p)
star = _unary('star', lambda L, p: L.D - p)


def wedge(*args):
    """``wedge(a, b)`` on Forms (returns a Form of degree pa+pb), or the device-tier
    ``wedge(lattice, pa, a, pb, b)``."""
    if len(args) == 2:
        a, b = args
        if not (isinstance(a, Form) and isinstance(b, Form)):
            raise TypeError('wedge(a, b) requires Forms; '
                            'for plain arrays call wedge(lattice, pa, a, pb, b)')
        if a.lattice != b.lattice:
            raise ValueError(f'wedge requires Forms on the same lattice; '
                             f'got {a.lattice} and {b.lattice}')
        out = np.asarray(_calculus.wedge(a.lattice, a.degree, np.asarray(a),
                                         b.degree, np.asarray(b)))
        return Form(out, degree=a.degree + b.degree, lattice=a.lattice)
    return _calculus.wedge(*args)
