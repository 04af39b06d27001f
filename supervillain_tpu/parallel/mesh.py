"""Device-mesh helpers.

The parallelism axes of a lattice-MCMC fleet:

* ``chains`` — independent Markov chains, embarrassingly data-parallel; the only
  cross-device communication is psum-style aggregation of acceptance statistics and
  pooled estimators, which XLA inserts for the stats reductions automatically.
* ``space`` — lattice-domain sharding of the spatial axes for volumes too large for
  one chip.  All operators are ``jnp.roll`` stencils, so XLA's SPMD partitioner
  inserts the halo-exchange collective-permutes itself; we only annotate shardings.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh; meshes
here span ``jax.devices()`` (all processes).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chain_mesh(devices=None):
    """1-D mesh over all devices with axis ``chains``."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), ('chains',))


def chain_space_mesh(chains, space, devices=None):
    """2-D mesh ``(chains, space)``: data-parallel chains × lattice-domain sharding."""
    devices = list(devices) if devices is not None else jax.devices()
    if chains * space != len(devices):
        raise ValueError(f'chains*space = {chains * space} != {len(devices)} devices')
    return Mesh(np.array(devices).reshape(chains, space), ('chains', 'space'))


def fleet_sharding(mesh, n_spatial_axes, spatial=False):
    """NamedSharding for a chain-batched form array (chains, C, N, ..., N):
    chains over the ``chains`` axis and, if ``spatial`` and the mesh has a ``space``
    axis, the last spatial axis over ``space``."""
    spec = ['chains', None] + [None] * n_spatial_axes
    if spatial and 'space' in mesh.axis_names:
        spec[-1] = 'space'
    return NamedSharding(mesh, P(*spec))
