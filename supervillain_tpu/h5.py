"""Reference-compatible namespace: ``supervillain_tpu.h5`` mirrors the reference's
``supervillain.h5`` entry point (/root/reference/supervillain/h5/__init__.py).

The reference persists objects through a strategy registry (`h5.Data`) plus
``ReadWriteable``/``Extendable`` mixins.  This framework instead uses an explicit
typed schema (:mod:`.io.h5`) — every persistable class carries its own
``to_h5``/``from_h5`` (Lattice, actions, Ensemble, Bootstrap, Fleet), and ensemble
columns are resizable HDF5 datasets supporting ``extend``.  This module re-exports
that surface under the reference's import path so ``import supervillain_tpu.h5``
works where reference code said ``import supervillain.h5``.
"""

from .io.h5 import (
    action_from_h5,
    check_version,
    generator_spec,
    generator_from_spec,
    ensemble_to_h5,
    ensemble_from_h5,
    ensemble_extend_h5,
)
from .io.data import write, read, register, ReadWriteable, readwriteable_registry

__all__ = [
    'action_from_h5', 'check_version', 'generator_spec', 'generator_from_spec',
    'ensemble_to_h5', 'ensemble_from_h5', 'ensemble_extend_h5',
    'write', 'read', 'register', 'ReadWriteable', 'readwriteable_registry',
]
