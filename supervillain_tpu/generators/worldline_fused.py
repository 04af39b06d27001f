"""Pallas-fused Worldline generator.

:class:`FusedWorldlineUpdate` runs ``sweeps_per_step`` iterations of the worldline
local-update stack (checkerboarded Vortex + Coexact passes and a Wrapping pass) per
call inside one Pallas TPU kernel (:mod:`supervillain_tpu.ops.pallas_worldline`),
keeping (m, v, δv) resident in VMEM.  Same transition kernels as the XLA
VortexUpdate/CoexactUpdate/WrappingUpdate.  :class:`FusedWorldlineWorm` runs the
in-kernel worm alone, and :class:`FusedWorldlineHammer` composes the full
reference worldline Hammer (vortex + coexact + wrapping + worm) in one launch.

TPU-only (D=2, even N; finite W *and* W=∞ — at W=∞ the kernel runs float v with a
continuous vortex proposal and _W = 2π): falls back to the XLA Sequentially stack
on other backends.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models import Worldline
from .base import Generator
from .combining import Sequentially, KeepEvery
from .worldline import VortexUpdate, CoexactUpdate, WrappingUpdate, ClassicWorm


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


class FusedWorldlineWorm(Generator):
    """In-kernel worldline classic worm (:func:`supervillain_tpu.ops
    .pallas_worldline_hammer.worldline_worms`): each chain's worm loop runs
    sequentially inside one Pallas program with the link residuals
    u = m − δv/_W VMEM-resident — no cross-chain lock-step, so a fleet step
    costs mean (not max) worm work and worms can run unbounded (truncation-
    bias-free histograms; for long production launches in worm-heavy phases
    pass ``max_worm_moves`` to :class:`FusedWorldlineHammer` — see
    :mod:`..ops.pallas_worldline_hammer` on the watchdog hazard).  Same move
    semantics as
    :class:`~.worldline.ClassicWorm` (statistical PRNG-stream difference
    only); works at any W including ∞.  TPU-only D=2; elsewhere falls back to
    the XLA worm."""

    name = 'ClassicWorm'
    fields = ('m', 'v')

    def __init__(self, action, worms=1, max_worm_moves=None):
        if not isinstance(action, Worldline):
            raise ValueError('Need a Worldline action')
        if action.Lattice.D != 2:
            raise NotImplementedError('FusedWorldlineWorm is only implemented for D=2')
        self.Action = action
        self.Lattice = action.Lattice
        self.worms = int(worms)
        self.max_worm_moves = None if max_worm_moves is None else int(max_worm_moves)
        self._fallback = None
        if jax.default_backend() in ('cpu',):
            worm = ClassicWorm(action)
            self._fallback = KeepEvery(worms, worm) if worms > 1 else worm

    def inline_shapes(self):
        L = self.Lattice
        return {'Spin_Spin': ((L.N, L.N), jnp.zeros(()).dtype),
                'Worm_Length': ((), jnp.zeros(()).dtype)}

    def step(self, key, cfg, stats):
        if self._fallback is not None:
            return self._fallback.step(key, cfg, stats)
        from ..ops.pallas_worldline_hammer import worldline_worms
        S, L = self.Action, self.Lattice
        winf = S.W == float('inf')
        seed = jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1), dtype=jnp.int32)
        m = cfg['m'].astype(jnp.int32)[None]
        v = cfg['v'].astype(jnp.float32 if winf else jnp.int32)[None]
        m_out, hist, wl = worldline_worms(seed, m, v, N=L.N, kappa=S.kappa,
                                          W=S.W if winf else int(S.W),
                                          worms=self.worms,
                                          max_worm_moves=self.max_worm_moves)
        stats = self._tally(stats, wl[0], wl[0], jnp.ones((), jnp.float32),
                            sweeps=float(self.worms))
        out = dict(cfg)
        out['m'] = m_out[0].astype(cfg['m'].dtype)
        fdt = jnp.promote_types(jnp.asarray(cfg['v']).dtype, jnp.float32)
        return out, stats, {'Spin_Spin': hist[0].astype(fdt),
                            'Worm_Length': wl[0].astype(fdt)}


class FusedWorldlineHammer(Generator):
    """In-kernel worldline Hammer (:func:`supervillain_tpu.ops
    .pallas_worldline_hammer.worldline_hammer_sweeps`): one Pallas launch runs
    ``sweeps_per_step`` full local-update stacks (checkerboarded Vortex +
    Coexact passes and a Wrapping pass) *and* ``worms`` classic worms per
    chain on the same VMEM-resident residuals — the complete reference
    worldline Hammer composition
    (/root/reference/supervillain/generator/worldline/__init__.py:9-40) with
    zero extra launches and no cross-chain worm lock-step.  Inline
    ``ActionDensity`` (per-sweep average) and the worm's
    ``Spin_Spin``/``Worm_Length`` come back from the kernel.

    Works at any W including ∞ (the worm only moves m; at W = ∞ the kernel
    runs float v, a continuous vortex proposal, and _W = 2π).  TPU-only, D=2,
    N a multiple of 128 — monolithic sweep body through N=256, the
    strip-chunked body above (geometry-unconditional across the production
    envelope, like the reference composition); elsewhere falls back to the
    XLA ``Sequentially(KeepEvery(sweeps_per_step, local stack),
    KeepEvery(worms, ClassicWorm))`` with the same stats tags and the same
    per-step sweep/worm densities as the kernel."""

    name = 'FusedWorldlineHammer'
    fields = ('m', 'v')

    def __init__(self, action, interval_v=1, interval_t=1, interval_w=1,
                 sweeps_per_step=1, worms=1, max_worm_moves=None):
        if not isinstance(action, Worldline):
            raise ValueError('Need a Worldline action')
        self.Action = action
        self.Lattice = action.Lattice
        self.interval_v = float(interval_v) if action.W == float('inf') else int(interval_v)
        self.interval_t = int(interval_t)
        self.interval_w = int(interval_w)
        self.sweeps_per_step = int(sweeps_per_step)
        self.worms = int(worms)
        self.max_worm_moves = None if max_worm_moves is None else int(max_worm_moves)
        self._fallback = None
        N = action.Lattice.N
        if not (_pallas_supported(action) and N % 128 == 0):
            # Same per-step sweep and worm densities as the fused kernel —
            # sweeps_per_step of each local pass, then `worms` worms, in ONE
            # step (the round-4 fallback looped the whole composite
            # sweeps_per_step times, oversampling worms by that factor and
            # discarding all but the last iteration's inline Spin_Spin).
            # Sequentially cannot nest, so each local updater gets its own
            # KeepEvery — a reordering of commuting-in-distribution kernels.
            sw = self.sweeps_per_step
            wrap = lambda g: KeepEvery(sw, g) if sw > 1 else g
            worm = ClassicWorm(action)
            self._fallback = Sequentially((
                wrap(VortexUpdate(action, interval_v)),
                wrap(CoexactUpdate(action, interval_t)),
                wrap(WrappingUpdate(action, interval_w)),
                KeepEvery(worms, worm) if worms > 1 else worm,
            ))

    def init_stats(self):
        if self._fallback is not None:
            return self._fallback.init_stats()
        zero = lambda: {'accepted': jnp.zeros(()), 'proposed': jnp.zeros(()),
                        'acceptance': jnp.zeros(()), 'sweeps': jnp.zeros(())}
        return {'WorldlineLocalUpdates': zero(), 'ClassicWorm': zero()}

    def inline_shapes(self):
        L = self.Lattice
        if self._fallback is not None:
            return self._fallback.inline_shapes()
        return {'ActionDensity': ((), jnp.float32),
                'Spin_Spin': ((L.N, L.N), jnp.float32),
                'Worm_Length': ((), jnp.float32),
                'Worm_Truncated': ((), jnp.float32)}

    def step(self, key, cfg, stats):
        if self._fallback is not None:
            return self._fallback.step(key, cfg, stats)

        from ..ops.pallas_worldline_hammer import worldline_hammer_sweeps
        S, L = self.Action, self.Lattice
        winf = S.W == float('inf')
        seed = jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1), dtype=jnp.int32)
        m = cfg['m'].astype(jnp.int32)[None]
        v = cfg['v'].astype(jnp.float32 if winf else jnp.int32)[None]
        m, v, accepted, inline = worldline_hammer_sweeps(
            seed, m, v, N=L.N, kappa=S.kappa, W=S.W if winf else int(S.W),
            interval_v=self.interval_v, interval_t=self.interval_t,
            interval_w=self.interval_w, sweeps=self.sweeps_per_step,
            worms=self.worms, max_worm_moves=self.max_worm_moves)
        wl = inline['Worm_Length'][0]
        proposals = float((2 * L.sites + 2 * L.N) * self.sweeps_per_step)
        sL = stats['WorldlineLocalUpdates']
        sW = stats['ClassicWorm']
        stats = stats | {
            'WorldlineLocalUpdates': {
                'accepted': sL['accepted'] + accepted[0],
                'proposed': sL['proposed'] + proposals,
                'acceptance': sL['acceptance'] + accepted[0] / proposals,
                'sweeps': sL['sweeps'] + float(self.sweeps_per_step)},
            'ClassicWorm': {
                'accepted': sW['accepted'] + wl,
                'proposed': sW['proposed'] + wl,
                'acceptance': sW['acceptance'] + 1.0,
                'sweeps': sW['sweeps'] + float(self.worms)},
        }
        out = dict(cfg)
        out['m'] = m[0].astype(cfg['m'].dtype)
        out['v'] = v[0].astype(cfg['v'].dtype)
        return out, stats, {k: v[0] for k, v in inline.items()}
