"""Slow, obviously-correct pure-NumPy generators.

These are the statistical oracles for the vectorized kernels (the role of
/root/reference/supervillain/generator/reference_implementation/): single-proposal
Metropolis with the *full* action difference, python loops, host RNG.  Production
never uses them; tests compare ensemble averages against the fast generators.
"""

from __future__ import annotations

import numpy as np

from ..models import Villain, Worldline
from ..ops import calculus as calc
from .base import Generator


def _np_d0(phi, D):
    return np.stack([np.roll(phi[0], -1, axis=k) - phi[0] for k in range(D)])


class NeighborhoodUpdateSlow(Generator):
    r"""Single-site Metropolis with full-action ΔS: per site propose
    ``Δφ ~ U(-interval_phi, interval_phi)`` and ``Δn ∈ W·{-interval_n..interval_n}``
    on the 2D adjacent links, accept on ``S(new) - S(old)`` recomputed from scratch
    (the role of reference villain.py:15-181)."""

    name = 'NeighborhoodUpdateSlow'
    fields = ('phi', 'n')
    host_only = True

    def __init__(self, action, interval_phi=np.pi, interval_n=1, rng=None):
        if not isinstance(action, Villain):
            raise ValueError('Need a Villain action')
        self.Action = action
        self.Lattice = action.Lattice
        self.interval_phi = float(interval_phi)
        self.interval_n = int(interval_n)
        self.rng = rng or np.random.default_rng()
        self._stats = self.init_stats()

    def _full_action(self, phi, n):
        D = self.Lattice.D
        r = _np_d0(phi, D) - 2 * np.pi * n
        return (self.Action.kappa / 2) * np.sum(r ** 2)

    def step_cfg(self, cfg):
        S, L = self.Action, self.Lattice
        D, N = L.D, L.N
        phi = np.array(cfg['phi'], dtype=float)
        n = np.array(cfg['n'], dtype=int)
        W = int(S.W) if S.W < float('inf') else None

        accepted = 0
        acceptance = 0.0
        current = self._full_action(phi, n)
        for x in np.ndindex(*L.dims):
            new_phi = phi.copy()
            new_phi[(0,) + x] += self.rng.uniform(-self.interval_phi, self.interval_phi)
            new_n = n.copy()
            if W is not None:
                for mu in range(D):
                    fwd = (mu,) + x
                    bwd = (mu,) + tuple((x[i] - (1 if i == mu else 0)) % N for i in range(D))
                    new_n[fwd] += W * self.rng.integers(-self.interval_n, self.interval_n + 1)
                    new_n[bwd] += W * self.rng.integers(-self.interval_n, self.interval_n + 1)
            proposal = self._full_action(new_phi, new_n)
            A = min(1.0, np.exp(-(proposal - current)))
            acceptance += A
            if self.rng.uniform(0, 1) < A:
                phi, n, current = new_phi, new_n, proposal
                accepted += 1

        s = self._stats[self.name]
        s['accepted'] = s['accepted'] + accepted
        s['proposed'] = s['proposed'] + L.sites
        s['acceptance'] = s['acceptance'] + acceptance / L.sites
        s['sweeps'] = s['sweeps'] + 1
        return dict(cfg) | {'phi': phi, 'n': n}

    def inline_shapes(self):
        return {}


class VillainClassicWormSlow(Generator):
    r"""Pure-python D=2 Villain plaquette worm (statistical oracle for the jitted
    :class:`~..generators.villain.ClassicWorm`)."""

    name = 'ClassicWormSlow'
    fields = ('phi', 'n')
    host_only = True

    _moves = np.array([[0, -1], [1, 0], [0, 1], [-1, 0]])
    _link_dir = np.array([0, 1, 0, 1])
    _link_off = np.array([[0, 0], [1, 0], [0, 1], [0, 0]])
    _plaquette = np.array([+1, +1, -1, -1])

    def __init__(self, action, rng=None):
        if not isinstance(action, Villain):
            raise ValueError('Need a Villain action')
        if action.Lattice.D != 2:
            raise NotImplementedError('D=2 only')
        self.Action = action
        self.Lattice = action.Lattice
        self.rng = rng or np.random.default_rng()
        self._stats = self.init_stats()

    def inline_shapes(self):
        L = self.Lattice
        return {'Vortex_Vortex': ((L.N, L.N), float), 'Worm_Length': ((), float)}

    def step_cfg(self, cfg):
        S, L = self.Action, self.Lattice
        N = L.N
        phi = np.asarray(cfg['phi'], dtype=float)
        n = np.array(cfg['n'], dtype=int)
        dphi = np.asarray(calc.d(L, 0, phi))

        orientation = self.rng.choice([-1, +1])
        change_n = orientation * self._plaquette
        tail = self.rng.integers(0, N, 2)
        head = (self.rng.integers(0, N, 2) if S.W == 1 else tail.copy())

        hist = np.zeros((N, N))
        while True:
            if ((head == tail).all() or S.W == 1) and self.rng.uniform(0, 1) >= 0.8:
                break
            choice = self.rng.integers(0, 4)
            nxt = (head + self._moves[choice]) % N
            ld = self._link_dir[choice]
            lp = (head + self._link_off[choice]) % N
            link_val = dphi[ld, lp[0], lp[1]] - 2 * np.pi * n[ld, lp[0], lp[1]]
            dn = change_n[choice]
            dS = (S.kappa / 2) * (-2 * np.pi * dn) * (2 * link_val - 2 * np.pi * dn)
            if self.rng.uniform(0, 1) < min(1.0, np.exp(-dS)):
                n[ld, lp[0], lp[1]] += dn
                head = nxt
            disp = (head - tail) % N
            hist[disp[0], disp[1]] += 1

        wl = hist.sum()
        s = self._stats[self.name]
        s['accepted'] = s['accepted'] + wl
        s['proposed'] = s['proposed'] + wl
        s['sweeps'] = s['sweeps'] + 1
        return dict(cfg) | {'n': n, 'Vortex_Vortex': hist, 'Worm_Length': wl}


class WorldlineClassicWormSlow(Generator):
    r"""Pure-python dimension-general worldline worm (statistical oracle for the
    jitted :class:`~..generators.worldline.ClassicWorm`)."""

    name = 'ClassicWormSlow'
    fields = ('m', 'v')
    host_only = True

    def __init__(self, action, rng=None):
        if not isinstance(action, Worldline):
            raise ValueError('Need a Worldline action')
        self.Action = action
        self.Lattice = action.Lattice
        self.rng = rng or np.random.default_rng()
        self._stats = self.init_stats()

    def inline_shapes(self):
        L = self.Lattice
        return {'Spin_Spin': (L.dims, float), 'Worm_Length': ((), float)}

    def step_cfg(self, cfg):
        S, L = self.Action, self.Lattice
        D, N = L.D, L.N
        m = np.array(cfg['m'], dtype=int)
        v = np.asarray(cfg['v'])
        dvW = np.asarray(calc.delta(L, 2, v)) / S._W

        orientation = self.rng.choice([-1, +1])
        divergence = np.concatenate([np.ones(D, int), -np.ones(D, int)])
        change_m = orientation * divergence
        moves = np.concatenate([np.eye(D, dtype=int), -np.eye(D, dtype=int)])

        tail = self.rng.integers(0, N, D)
        head = tail.copy()
        hist = np.zeros(L.dims)
        while True:
            if (head == tail).all() and self.rng.uniform(0, 1) < 1.0 / (2 * D + 1):
                break
            choice = self.rng.integers(0, 2 * D)
            axis = choice % D
            nxt = (head + moves[choice]) % N
            lp = head if choice < D else nxt
            lidx = (axis,) + tuple(lp)
            dm = change_m[choice]
            dS = (0.5 / S.kappa) * dm * (2 * (m[lidx] - dvW[lidx]) + dm)
            if self.rng.uniform(0, 1) < min(1.0, np.exp(-dS)):
                m[lidx] += dm
                head = nxt
            hist[tuple((head - tail) % N)] += 1

        wl = hist.sum()
        s = self._stats[self.name]
        s['accepted'] = s['accepted'] + wl
        s['proposed'] = s['proposed'] + wl
        s['sweeps'] = s['sweeps'] + 1
        return dict(cfg) | {'m': m, 'Spin_Spin': hist, 'Worm_Length': wl}
