"""Reference-compatible namespace alias: ``supervillain_tpu.observable`` mirrors the
reference's ``supervillain.observable`` package layout on top of :mod:`..observables`."""

from ..observables import *  # noqa: F401,F403
from ..observables import registry, derived_registry, progress
