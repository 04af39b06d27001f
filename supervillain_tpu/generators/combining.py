"""Generator combinators (capability of
/root/reference/supervillain/generator/combining.py:9-116), expressed as function
composition of the pure ``step`` kernels so that composites stay scan/vmap-able."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Generator


class Sequentially(Generator):
    """Compose generators into one step applied in order; stats pytrees merge (tags
    are de-duplicated), inline observables union (later generators win on clashes)."""

    def __init__(self, generators):
        self.generators = tuple(generators)
        for g in self.generators:
            if g.name not in g.init_stats():
                raise ValueError(
                    f'{type(g).__name__} keeps stats under tags '
                    f'{sorted(g.init_stats())}, not under its own name — it is '
                    'a self-contained composite; compose around it with '
                    'successive Ensemble.generate segments instead of '
                    'Sequentially.')
        # De-duplicate stats tags while keeping report order stable.
        seen = {}
        self._tags = []
        for g in self.generators:
            base = g.name
            if base in seen:
                seen[base] += 1
                tag = f'{base}#{seen[base]}'
            else:
                seen[base] = 0
                tag = base
            self._tags.append(tag)
        self.name = 'Sequentially(' + ', '.join(self._tags) + ')'

    def __str__(self):
        return self.name

    def init_stats(self):
        stats = {}
        for g, tag in zip(self.generators, self._tags):
            sub = g.init_stats()[g.name]
            stats[tag] = sub
        return stats

    def inline_shapes(self):
        shapes = {}
        for g in self.generators:
            shapes.update(g.inline_shapes())
        return shapes

    def prepare(self, cfg):
        for g in self.generators:
            cfg = g.prepare(cfg)
        return cfg

    def step(self, key, cfg, stats):
        inline = {}
        for i, (g, tag) in enumerate(zip(self.generators, self._tags)):
            sub_key = jax.random.fold_in(key, i)
            # Present the sub-generator its stats under its own name.
            sub_stats = {g.name: stats[tag]}
            cfg, sub_stats, sub_inline = g.step(sub_key, cfg, sub_stats)
            stats = stats | {tag: sub_stats[g.name]}
            inline.update(sub_inline)
        return cfg, stats, inline


class KeepEvery(Generator):
    """Apply a generator ``n`` times per emitted configuration.

    ``blocked_inline=True`` averages the inline observables over the n sub-steps
    (catching rare worm measurements); otherwise the last sub-step's inline values are
    kept (reference combining.py:58-116)."""

    def __init__(self, n, generator, blocked_inline=True):
        self.n = int(n)
        self.generator = generator
        self.blocked_inline = bool(blocked_inline)
        self.name = generator.name

    def __str__(self):
        return f'KeepEvery({self.n}, {self.generator})'

    def init_stats(self):
        return self.generator.init_stats()

    def inline_shapes(self):
        return self.generator.inline_shapes()

    def prepare(self, cfg):
        return self.generator.prepare(cfg)

    def step(self, key, cfg, stats):
        shapes = self.generator.inline_shapes()

        def body(carry, sub_key):
            cfg, stats = carry
            cfg, stats, inline = self.generator.step(sub_key, cfg, stats)
            return (cfg, stats), inline

        keys = jax.random.split(key, self.n)
        (cfg, stats), inlines = jax.lax.scan(body, (cfg, stats), keys)
        if self.blocked_inline:
            inline = {k: jnp.mean(v.astype(jnp.promote_types(v.dtype, jnp.float32)), axis=0)
                      for k, v in inlines.items()}
        else:
            inline = {k: v[-1] for k, v in inlines.items()}
        # Respect declared dtypes where possible.
        inline = {k: v.astype(shapes[k][1]) if k in shapes and not self.blocked_inline else v
                  for k, v in inline.items()}
        return cfg, stats, inline
