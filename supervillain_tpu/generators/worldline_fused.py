"""Pallas-fused Worldline generator.

:class:`FusedWorldlineUpdate` runs ``sweeps_per_step`` iterations of the worldline
local-update stack (checkerboarded Vortex + Coexact passes and a Wrapping pass) per
call inside one Pallas TPU kernel (:mod:`supervillain_tpu.ops.pallas_worldline`),
keeping (m, v, δv) resident in VMEM.  Same transition kernels as the XLA
VortexUpdate/CoexactUpdate/WrappingUpdate; the worm is not included (compose with
:class:`~.worldline.ClassicWorm` for ergodic tails and inline correlators).

TPU-only (D=2, even N, finite W): falls back to the XLA Sequentially stack on other
backends.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models import Worldline
from .base import Generator
from .combining import Sequentially
from .worldline import VortexUpdate, CoexactUpdate, WrappingUpdate


def _pallas_supported(action):
    return (action.Lattice.D == 2 and action.Lattice.N % 2 == 0
            and jax.default_backend() not in ('cpu',))


class FusedWorldlineUpdate(Generator):
    name = 'WorldlineLocalUpdates'
    fields = ('m', 'v')

    def __init__(self, action, interval_v=1, interval_t=1, interval_w=1,
                 sweeps_per_step=1):
        if not isinstance(action, Worldline):
            raise ValueError('Need a Worldline action')
        self.Action = action
        self.Lattice = action.Lattice
        # At W=inf the vortex proposal is continuous U(-interval_v, +interval_v).
        self.interval_v = float(interval_v) if action.W == float('inf') else int(interval_v)
        self.interval_t = int(interval_t)
        self.interval_w = int(interval_w)
        self.sweeps_per_step = int(sweeps_per_step)
        self._fallback = None
        if not _pallas_supported(action):
            self._fallback = Sequentially((
                VortexUpdate(action, interval_v),
                CoexactUpdate(action, interval_t),
                WrappingUpdate(action, interval_w),
            ))

    def init_stats(self):
        if self._fallback is not None:
            return self._fallback.init_stats()
        return super().init_stats()

    def step(self, key, cfg, stats):
        if self._fallback is not None:
            for _ in range(self.sweeps_per_step):
                key, sub = jax.random.split(key)
                cfg, stats, _ = self._fallback.step(sub, cfg, stats)
            return cfg, stats, {}

        from ..ops.pallas_worldline import worldline_sweeps
        S, L = self.Action, self.Lattice
        winf = S.W == float('inf')
        seed = jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1), dtype=jnp.int32)
        m = cfg['m'].astype(jnp.int32)[None]
        v = cfg['v'].astype(jnp.float32 if winf else jnp.int32)[None]
        m, v, accepted = worldline_sweeps(
            seed, m, v, N=L.N, kappa=S.kappa, W=S.W if winf else int(S.W),
            interval_v=self.interval_v, interval_t=self.interval_t,
            interval_w=self.interval_w, sweeps=self.sweeps_per_step)
        proposals = float((2 * L.sites + 2 * L.N) * self.sweeps_per_step)
        stats = self._tally(stats, accepted[0], proposals,
                            accepted[0] / proposals,
                            sweeps=float(self.sweeps_per_step))
        out = dict(cfg)
        out['m'] = m[0].astype(cfg['m'].dtype)
        out['v'] = v[0].astype(cfg['v'].dtype)
        return out, stats, {}
