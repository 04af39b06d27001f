"""Pallas-fused Villain generator.

:class:`FusedNeighborhoodUpdate` samples exactly the same transition kernel as
:class:`~.villain.NeighborhoodUpdate` (same proposals, same ΔS algebra, same
Metropolis test) but executes ``sweeps_per_step`` whole sweeps per call inside one
Pallas TPU kernel, keeping the chain state in VMEM throughout
(:mod:`supervillain_tpu.ops.pallas_sweep`).  ~10× the XLA path's throughput on a
v5e chip; the fused envelope covers L = 128..1024+ (strip-chunked kernel above
L=256).

TPU-only (D=2, even N, W<∞): on other backends it falls back to the XLA
NeighborhoodUpdate transparently.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models import Villain
from .base import Generator
from .villain import NeighborhoodUpdate


def _pallas_supported(action, allow_winf=False):
    if action.Lattice.D != 2 or action.Lattice.N % 2 != 0:
        return False
    if action.W == float('inf') and not allow_winf:
        return False
    # Below ~128 sites per side the per-program loop overhead dominates and the
    # XLA path is at least as fast (see docs/design.md).
    if action.Lattice.N < 128:
        return False
    return jax.default_backend() not in ('cpu',)


class FusedNeighborhoodUpdate(Generator):
    name = 'NeighborhoodUpdate'  # same transition kernel; same stats tag
    fields = ('phi', 'n')

    def __init__(self, action, interval_phi=np.pi, interval_n=1, sweeps_per_step=1,
                 p_n=None):
        if not isinstance(action, Villain):
            raise ValueError('Need a Villain action')
        if action.W == float('inf') and type(self) is FusedNeighborhoodUpdate:
            raise ValueError('NeighborhoodUpdate offers Δn in multiples of W; '
                             'undefined at W=inf — use FusedExactNeighborhoodUpdate.')
        self.Action = action
        self.Lattice = action.Lattice
        self.interval_phi = float(interval_phi)
        self.interval_n = int(interval_n)
        self.sweeps_per_step = int(sweeps_per_step)
        self.p_n = None if p_n is None else float(p_n)
        self._kernel_W = int(action.W) if action.W != float('inf') else action.W
        self._fallback = None
        if not _pallas_supported(action):
            self._fallback = NeighborhoodUpdate(action, interval_phi, interval_n, p_n=p_n)

    def inline_shapes(self):
        import jax.numpy as jnp
        if self._fallback is not None:
            return {}
        return {'ActionDensity': ((), jnp.float32),
                'WindingSquared': ((), jnp.float32)}

    def step(self, key, cfg, stats):
        if self._fallback is not None:
            for _ in range(self.sweeps_per_step):
                key, sub = jax.random.split(key)
                cfg, stats, _ = self._fallback.step(sub, cfg, stats)
            # The fallback tallies under the same 'NeighborhoodUpdate' tag.
            return cfg, stats, {}

        from ..ops.pallas_sweep import neighborhood_sweeps
        S, L = self.Action, self.Lattice
        seed = jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1), dtype=jnp.int32)
        phi = cfg['phi'].astype(jnp.float32)[None]
        n = cfg['n'].astype(jnp.int32)[None]
        phi, n, accepted, inline = neighborhood_sweeps(
            seed, phi, n, N=L.N, kappa=S.kappa, W=self._kernel_W,
            interval_phi=self.interval_phi, interval_n=self.interval_n,
            sweeps=self.sweeps_per_step, p_n=self.p_n)
        stats = self._tally(
            stats,
            accepted[0],
            float(L.sites * self.sweeps_per_step),
            # The kernel does not tally the Metropolis probability; report the
            # realized acceptance fraction instead.
            accepted[0] / (L.sites * self.sweeps_per_step),
            sweeps=float(self.sweeps_per_step),
        )
        out = dict(cfg)
        out['phi'] = phi[0].astype(cfg['phi'].dtype)
        out['n'] = n[0].astype(cfg['n'].dtype)
        # Inline observables measured in-kernel, averaged over the launch's sweeps
        # (a blocked inline measurement, like KeepEvery(blocked_inline=True)).
        return out, stats, {k: v[0] for k, v in inline.items()}


class FusedExactNeighborhoodUpdate(FusedNeighborhoodUpdate):
    """Pallas-fused compound (Δφ, Δz) sweeps — the **W=∞ fused path**.

    Same launch structure as :class:`FusedNeighborhoodUpdate`, but the kernel
    runs in z-mode (``W=inf`` in :mod:`supervillain_tpu.ops.pallas_sweep`):
    each color-c site proposes Δφ and an integer Δz with Δn = d(Δz), preserving
    the W=∞ constraint dn = 0 exactly.  Samples the same transition kernel as
    the XLA :class:`~.villain.ExactNeighborhoodUpdate` (hardware-PRNG stream
    difference only), which is also the fallback off-TPU / at unsupported
    geometries.  This closes the "W=∞ runs on the 12× slower XLA path" gap for
    the self-dual workloads."""

    name = 'ExactNeighborhoodUpdate'
    fields = ('phi', 'n')

    def __init__(self, action, interval_phi=np.pi, interval_z=1, sweeps_per_step=1,
                 p_z=None):
        if not isinstance(action, Villain):
            raise ValueError('Need a Villain action')
        self.Action = action
        self.Lattice = action.Lattice
        self.interval_phi = float(interval_phi)
        # The kernel reuses the interval_n/p_n slots for the Δz draw.
        self.interval_n = int(interval_z)
        self.sweeps_per_step = int(sweeps_per_step)
        self.p_n = None if p_z is None else float(p_z)
        self._kernel_W = float('inf')
        self._fallback = None
        if not _pallas_supported(action, allow_winf=True):
            from .villain import ExactNeighborhoodUpdate
            self._fallback = ExactNeighborhoodUpdate(
                action, interval_phi, interval_z, p_z=p_z)

    @property
    def interval_z(self):
        return self.interval_n

    @property
    def p_z(self):
        return self.p_n


class FusedHammer(Generator):
    """In-kernel Hammer composition (:mod:`supervillain_tpu.ops.pallas_hammer`):
    one Pallas launch runs ``sweeps_per_step`` neighborhood sweeps *and*
    ``worms`` classic worms per chain on the same VMEM-resident residuals — the
    ergodic fleet composite with zero extra launches and no cross-chain
    worm lock-step.  Inline ``ActionDensity``/``WindingSquared`` (per-sweep
    averages) and the worm's ``Vortex_Vortex``/``Worm_Length`` come back from
    the kernel.

    ``W = ∞`` runs the sweep section in z-mode (Δn = d(Δz), dn = 0 exact) with
    the worm kept: an in-kernel worm always closes before the state is
    emitted, and closed worms preserve dn = 0 exactly while wrapping worms
    sample the integer winding sectors z-mode sweeps freeze.

    TPU-only, D=2, N a multiple of 128 (at N=64 use
    :func:`~supervillain_tpu.ops.pallas_hammer.hammer_sweeps` with
    ``chains_per_program=2`` — this single-chain wrapper cannot pack).
    Monolithic sweep body through N=256, strip-chunked body above — the
    Hammer composition is geometry-unconditional across the production
    envelope, like the reference's
    (/root/reference/supervillain/generator/villain/__init__.py:10-63);
    elsewhere falls back to the XLA
    ``Sequentially(NeighborhoodUpdate-or-Exact, KeepEvery(worms, ClassicWorm))``
    with the same stats tags."""

    name = 'FusedHammer'
    fields = ('phi', 'n')

    def __init__(self, action, interval_phi=np.pi, interval_n=1, sweeps_per_step=1,
                 worms=1, p_n=None, max_worm_moves=None):
        if not isinstance(action, Villain):
            raise ValueError('Need a Villain action')
        self.Action = action
        self.Lattice = action.Lattice
        self.interval_phi = float(interval_phi)
        self.interval_n = int(interval_n)
        self.sweeps_per_step = int(sweeps_per_step)
        self.worms = int(worms)
        self.p_n = None if p_n is None else float(p_n)
        # Exact truncation-rollback bound on each in-kernel worm (None =
        # unbounded; fleets should cap — see ops.pallas_hammer.hammer_sweeps).
        self.max_worm_moves = None if max_worm_moves is None else int(max_worm_moves)
        winf = action.W == float('inf')
        self._kernel_W = action.W if winf else int(action.W)
        self._fallback = None
        if not (_pallas_supported(action, allow_winf=True)
                and action.Lattice.N % 128 == 0):
            from .villain import NeighborhoodUpdate, ExactNeighborhoodUpdate, ClassicWorm
            from .combining import Sequentially, KeepEvery
            if winf:
                nu = ExactNeighborhoodUpdate(action, interval_phi, interval_n,
                                             p_z=p_n)
            else:
                nu = NeighborhoodUpdate(action, interval_phi, interval_n, p_n=p_n)
            worm = ClassicWorm(action)
            parts = [KeepEvery(self.sweeps_per_step, nu) if self.sweeps_per_step > 1 else nu,
                     KeepEvery(worms, worm) if worms > 1 else worm]
            self._fallback = Sequentially(parts)

    @property
    def _sweep_tag(self):
        return ('ExactNeighborhoodUpdate' if self._kernel_W == float('inf')
                else 'NeighborhoodUpdate')

    def init_stats(self):
        if self._fallback is not None:
            return self._fallback.init_stats()
        zero = lambda: {'accepted': jnp.zeros(()), 'proposed': jnp.zeros(()),
                        'acceptance': jnp.zeros(()), 'sweeps': jnp.zeros(())}
        return {self._sweep_tag: zero(), 'ClassicWorm': zero()}

    def inline_shapes(self):
        L = self.Lattice
        if self._fallback is not None:
            return self._fallback.inline_shapes()
        return {'ActionDensity': ((), jnp.float32),
                'WindingSquared': ((), jnp.float32),
                'Vortex_Vortex': ((L.N, L.N), jnp.float32),
                'Worm_Length': ((), jnp.float32),
                'Worm_Truncated': ((), jnp.float32)}

    def step(self, key, cfg, stats):
        if self._fallback is not None:
            return self._fallback.step(key, cfg, stats)

        from ..ops.pallas_hammer import hammer_sweeps
        S, L = self.Action, self.Lattice
        seed = jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1), dtype=jnp.int32)
        phi = cfg['phi'].astype(jnp.float32)[None]
        n = cfg['n'].astype(jnp.int32)[None]
        phi, n, accepted, inline = hammer_sweeps(
            seed, phi, n, N=L.N, kappa=S.kappa, W=self._kernel_W,
            interval_phi=self.interval_phi, interval_n=self.interval_n,
            sweeps=self.sweeps_per_step, worms=self.worms, p_n=self.p_n,
            max_worm_moves=self.max_worm_moves)
        wl = inline['Worm_Length'][0]
        su = float(L.sites * self.sweeps_per_step)
        sN = stats[self._sweep_tag]
        sW = stats['ClassicWorm']
        stats = stats | {
            self._sweep_tag: {
                'accepted': sN['accepted'] + accepted[0],
                'proposed': sN['proposed'] + su,
                'acceptance': sN['acceptance'] + accepted[0] / su,
                'sweeps': sN['sweeps'] + float(self.sweeps_per_step)},
            'ClassicWorm': {
                'accepted': sW['accepted'] + wl,
                'proposed': sW['proposed'] + wl,
                'acceptance': sW['acceptance'] + 1.0,
                'sweeps': sW['sweeps'] + float(self.worms)},
        }
        out = dict(cfg)
        out['phi'] = phi[0].astype(cfg['phi'].dtype)
        out['n'] = n[0].astype(cfg['n'].dtype)
        return out, stats, {k: v[0] for k, v in inline.items()}


class FusedClassicWorm(Generator):
    """In-kernel classic worm (:mod:`supervillain_tpu.ops.pallas_worm`): each
    chain's worm loop runs sequentially inside one Pallas program with the link
    residuals VMEM-resident — no cross-chain lock-step, so a fleet step costs
    mean (not max) worm work.  Same move semantics as
    :class:`~.villain.ClassicWorm` (statistical PRNG-stream difference only);
    measured ~5 μs per move on a v5e at small N, amortizing with ``worms`` per
    launch.  TPU-only D=2; on other backends falls back to the XLA worm."""

    name = 'ClassicWorm'
    fields = ('phi', 'n')

    def __init__(self, action, worms=1, max_worm_moves=None):
        if not isinstance(action, Villain):
            raise ValueError('Need a Villain action')
        if action.Lattice.D != 2:
            raise NotImplementedError('ClassicWorm is only implemented for D=2')
        self.Action = action
        self.Lattice = action.Lattice
        self.worms = int(worms)
        self.max_worm_moves = None if max_worm_moves is None else int(max_worm_moves)
        self._fallback = None
        if jax.default_backend() in ('cpu',):
            from .villain import ClassicWorm
            from .combining import KeepEvery
            worm = ClassicWorm(action)
            self._fallback = KeepEvery(worms, worm) if worms > 1 else worm

    def inline_shapes(self):
        L = self.Lattice
        return {'Vortex_Vortex': ((L.N, L.N), jnp.zeros(()).dtype),
                'Worm_Length': ((), jnp.zeros(()).dtype)}

    def step(self, key, cfg, stats):
        if self._fallback is not None:
            return self._fallback.step(key, cfg, stats)
        from ..ops.pallas_worm import classic_worms
        S, L = self.Action, self.Lattice
        seed = jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1), dtype=jnp.int32)
        phi = cfg['phi'].astype(jnp.float32)[None]
        n = cfg['n'].astype(jnp.int32)[None]
        n_out, hist, wl = classic_worms(seed, phi, n, N=L.N, kappa=S.kappa,
                                        W=1 if S.W == 1 else int(S.W),
                                        worms=self.worms,
                                        max_worm_moves=self.max_worm_moves)
        stats = self._tally(stats, wl[0], wl[0], jnp.ones((), jnp.float32),
                            sweeps=float(self.worms))
        out = dict(cfg)
        out['n'] = n_out[0].astype(cfg['n'].dtype)
        return out, stats, {'Vortex_Vortex': hist[0].astype(cfg['phi'].dtype),
                            'Worm_Length': wl[0].astype(cfg['phi'].dtype)}
