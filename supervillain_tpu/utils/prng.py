"""PRNG-key discipline helpers.

All randomness in the framework flows through JAX's splittable counter-based keys so
that chains are reproducible and independent of device layout: each chain folds its
chain index into the root key, each Monte-Carlo step folds the step index, and each
sub-generator/color folds a static tag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_key(key, *tags):
    """Fold one or more integer tags into a key, in order."""
    for t in tags:
        key = jax.random.fold_in(key, t)
    return key


def split_tree(key, treedef):
    """Split a key into one key per leaf of a pytree structure."""
    leaves = jax.random.split(key, treedef.num_leaves)
    return jax.tree.unflatten(treedef, list(leaves))
