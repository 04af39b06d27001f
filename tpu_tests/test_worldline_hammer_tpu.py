"""TPU-hardware tests of the in-kernel Worldline worm and the fused Worldline
Hammer (ops/pallas_worldline_hammer.py) — statistical agreement with the XLA
worldline generator stack, exact constraint preservation, and the fused-fleet
plumbing.  Mirrors tpu_tests/test_fused_tpu.py::test_fused_hammer_kernel_statistics
for the dual formulation (reference
/root/reference/supervillain/generator/worldline/__init__.py:9-40).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() in ('cpu',):  # pragma: no cover
    pytest.skip('TPU-hardware test module', allow_module_level=True)

import supervillain_tpu as sv
from supervillain_tpu.ops import calculus as calc
from supervillain_tpu.ops.pallas_worldline_hammer import (worldline_worms,
                                                          worldline_hammer_sweeps)


def _worldline_density(S):
    return jax.jit(jax.vmap(lambda m, v: jnp.sum(S.links(m, v) ** 2) / S.Lattice.links))


def _deltam(L, m):
    return jax.jit(jax.vmap(lambda x: calc.delta(L, 1, x)))(m)


def test_worldline_worm_preserves_deltam():
    """Closed worms restore δm = 0 exactly at W=2 (and the inline histogram's
    total equals the tallied move count)."""
    N, B = 16, 16
    L = sv.Lattice2D(N)
    m0 = jnp.zeros((B, 2, N, N), jnp.int32)
    v = jax.random.randint(jax.random.key(2), (B, 1, N, N), -2, 3, jnp.int32)

    m1, hist, wl = worldline_worms(jnp.int32(5), m0, v, N=N, kappa=0.8, W=2,
                                   worms=5)
    assert int(jnp.abs(_deltam(L, m1)).max()) == 0
    assert np.allclose(np.asarray(hist.sum(axis=(1, 2))), np.asarray(wl))
    assert np.asarray(wl).sum() > 0
    # Some worms actually moved m (κ=0.8 is permissive).
    assert int(jnp.abs(m1).max()) > 0


def test_worldline_worm_statistics_vs_xla():
    """Worm-only chains (v frozen at 0): the kernel worm and the vmapped XLA
    ClassicWorm sample the same constrained distribution of m — compared via
    the link-squared density over independent chains."""
    from supervillain_tpu.generators import worldline as gw

    N, B = 16, 64
    kappa = 0.8
    L = sv.Lattice2D(N)
    S = sv.Worldline(L, kappa, W=1)
    dens = _worldline_density(S)
    v = jnp.zeros((B, 1, N, N), jnp.int32)

    m = jnp.zeros((B, 2, N, N), jnp.int32)
    for k in range(30):
        m, hist, wl = worldline_worms(jnp.int32(100 + k), m, v, N=N,
                                      kappa=kappa, W=1, worms=200)
    assert int(jnp.abs(_deltam(L, m)).max()) == 0
    pallas_d = np.asarray(dens(m, v))

    G = gw.ClassicWorm(S)
    def one(k, c, s):
        c, s, _ = G.step(k, c, s)
        return c, s
    cfgs = {'m': jnp.zeros((B, 2, N, N), jnp.int32),
            'v': jnp.zeros((B, 1, N, N), jnp.int32)}
    stats = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).astype(jnp.float32),
                         G.init_stats())
    @jax.jit
    def steps(key, cfgs, stats, n=600):
        def body(carry, k):
            cfgs, stats = carry
            keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.arange(B))
            return jax.vmap(one)(keys, cfgs, stats), None
        (cfgs, stats), _ = jax.lax.scan(body, (cfgs, stats), jax.random.split(key, n))
        return cfgs, stats
    cfgs, stats = steps(jax.random.key(0), cfgs, stats)
    xla_d = np.asarray(dens(cfgs['m'], cfgs['v']))

    ma, ea = pallas_d.mean(), pallas_d.std() / np.sqrt(B)
    mb, eb = xla_d.mean(), xla_d.std() / np.sqrt(B)
    pull = abs(ma - mb) / np.hypot(ea, eb)
    assert pull < 5, f'pallas {ma}({ea}) vs xla {mb}({eb}): pull {pull}'


def test_worldline_hammer_kernel_statistics():
    """The in-kernel worldline Hammer (vortex+coexact+wrapping sweeps + worms
    in one launch) agrees statistically with the XLA
    Sequentially(Vortex, Coexact, Wrapping, ClassicWorm) composition, keeps
    δm = 0, and produces a normalizable Spin_Spin histogram."""
    from supervillain_tpu.generators import worldline as gw
    from supervillain_tpu.generators import Sequentially

    N, B = 128, 32
    kappa = 0.5
    L = sv.Lattice2D(N)
    S = sv.Worldline(L, kappa, W=2)
    dens = _worldline_density(S)

    m = jnp.zeros((B, 2, N, N), jnp.int32)
    v = jnp.zeros((B, 1, N, N), jnp.int32)
    m, v, _, _ = worldline_hammer_sweeps(jnp.int32(11), m, v, N=N, kappa=kappa,
                                         W=2, sweeps=100, worms=1)
    m, v, acc, inline = worldline_hammer_sweeps(jnp.int32(12), m, v, N=N,
                                                kappa=kappa, W=2, sweeps=50,
                                                worms=1)
    assert int(jnp.abs(_deltam(L, m)).max()) == 0
    assert float(inline['Worm_Length'].mean()) > 0
    assert np.isclose(float(inline['Spin_Spin'].sum()),
                      float(inline['Worm_Length'].sum()))
    pallas_d = np.asarray(dens(m, v))

    # XLA reference stack: the worm must be max_moves-capped — an UNBOUNDED
    # vmapped worm at this (N, κ) is the max-over-chains pathology itself (a
    # single huge excursion stalls every chain past the TPU watchdog).  The
    # cap is an exact kernel (truncated worms roll back), so the equilibrium
    # comparison is unaffected.
    worm = gw.ClassicWorm(S, max_moves=2048)
    G = Sequentially((gw.VortexUpdate(S), gw.CoexactUpdate(S),
                      gw.WrappingUpdate(S), worm))
    def one(k, c, s):
        c, s, _ = G.step(k, c, s)
        return c, s
    cfgs = {'m': jnp.zeros((B, 2, N, N), jnp.int32),
            'v': jnp.zeros((B, 1, N, N), jnp.int32)}
    stats = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).astype(jnp.float32),
                         G.init_stats())
    @jax.jit
    def steps(key, cfgs, stats):
        def body(carry, k):
            cfgs, stats = carry
            keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.arange(B))
            return jax.vmap(one)(keys, cfgs, stats), None
        (cfgs, stats), _ = jax.lax.scan(body, (cfgs, stats), jax.random.split(key, 150))
        return cfgs, stats
    cfgs, stats = steps(jax.random.key(3), cfgs, stats)
    xla_d = np.asarray(dens(cfgs['m'], cfgs['v']))

    ma, ea = pallas_d.mean(), pallas_d.std() / np.sqrt(B)
    mb, eb = xla_d.mean(), xla_d.std() / np.sqrt(B)
    pull = abs(ma - mb) / np.hypot(ea, eb)
    assert pull < 5, f'pallas {ma}({ea}) vs xla {mb}({eb}): pull {pull}'
    # The inline per-sweep ActionDensity agrees with the end-state density
    # (both are equilibrium estimators of the same quantity; S/Λ = links/(2κΛ)
    # -density · links/(2κ·sites) rescaling: compare in the same units).
    inline_ad = float(inline['ActionDensity'].mean())
    end_ad = float((pallas_d * L.links / (2 * kappa * L.sites)).mean())
    assert abs(inline_ad - end_ad) < 0.05 * abs(end_ad) + 1e-3


def test_worldline_hammer_winf_statistics():
    """W=∞ fused worldline Hammer: float v, continuous vortex proposal,
    _W = 2π, worm included — δm = 0 exact, agreement with the XLA stack at the
    self-dual coupling.  This makes the dual half of the self-dual workload
    fully ergodic in one launch."""
    from supervillain_tpu.generators import worldline as gw
    from supervillain_tpu.generators import Sequentially

    N, B = 128, 32
    kappa = float(0.5 / np.pi)
    L = sv.Lattice2D(N)
    S = sv.Worldline(L, kappa, W=float('inf'))
    dens = _worldline_density(S)

    m = jnp.zeros((B, 2, N, N), jnp.int32)
    v = jnp.zeros((B, 1, N, N), jnp.float32)
    m, v, _, _ = worldline_hammer_sweeps(jnp.int32(13), m, v, N=N, kappa=kappa,
                                         W=float('inf'), interval_v=0.7,
                                         sweeps=100, worms=1)
    m, v, acc, inline = worldline_hammer_sweeps(jnp.int32(14), m, v, N=N,
                                                kappa=kappa, W=float('inf'),
                                                interval_v=0.7, sweeps=50,
                                                worms=1)
    assert v.dtype == jnp.float32
    assert float(jnp.abs(v).max()) > 0
    assert int(jnp.abs(_deltam(L, m)).max()) == 0
    assert float(inline['Worm_Length'].mean()) > 0
    pallas_d = np.asarray(dens(m, v))

    # Capped XLA worm (exact; see the W=2 test for why unbounded is unusable).
    worm = gw.ClassicWorm(S, max_moves=2048)
    G = Sequentially((gw.VortexUpdate(S, interval_v=0.7), gw.CoexactUpdate(S),
                      gw.WrappingUpdate(S), worm))
    def one(k, c, s):
        c, s, _ = G.step(k, c, s)
        return c, s
    cfgs = {'m': jnp.zeros((B, 2, N, N), jnp.int32),
            'v': jnp.zeros((B, 1, N, N), jnp.float32)}
    stats = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).astype(jnp.float32),
                         G.init_stats())
    @jax.jit
    def steps(key, cfgs, stats):
        def body(carry, k):
            cfgs, stats = carry
            keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.arange(B))
            return jax.vmap(one)(keys, cfgs, stats), None
        (cfgs, stats), _ = jax.lax.scan(body, (cfgs, stats), jax.random.split(key, 150))
        return cfgs, stats
    cfgs, stats = steps(jax.random.key(5), cfgs, stats)
    xla_d = np.asarray(dens(cfgs['m'], cfgs['v']))

    ma, ea = pallas_d.mean(), pallas_d.std() / np.sqrt(B)
    mb, eb = xla_d.mean(), xla_d.std() / np.sqrt(B)
    pull = abs(ma - mb) / np.hypot(ea, eb)
    assert pull < 5, f'pallas {ma}({ea}) vs xla {mb}({eb}): pull {pull}'


def test_sample_fused_fleet_worldline():
    """sample_fused_fleet dispatches on the action type: a Worldline action
    drives the worldline kernels, with worm columns when worms > 0."""
    from supervillain_tpu.parallel import sample_fused_fleet
    S = sv.Worldline(sv.Lattice2D(128), 0.5, W=2)
    fleet = sample_fused_fleet(S, chains=16, steps=3, thin=20, seed=5, worms=2,
                               keep_fields=True)
    assert fleet.columns['Spin_Spin'].shape == (3, 16, 128, 128)
    assert fleet.columns['Worm_Length'].shape == (3, 16)
    assert fleet.columns['ActionDensity'].shape == (3, 16)
    assert (fleet.columns['Worm_Length'] >= 0).all()
    for c in range(0, 16, 5):
        assert S.valid({'m': fleet.columns['m'][-1, c]})
    assert 'WorldlineLocalUpdates' in fleet.stats

    # worms=0 path: sweep kernel + host-side inline ActionDensity.
    fleet0 = sample_fused_fleet(S, chains=8, steps=2, thin=10, seed=6, worms=0,
                                keep_fields=False)
    assert fleet0.columns['ActionDensity'].shape == (2, 8)
    assert np.isfinite(fleet0.columns['ActionDensity']).all()


def test_worldline_packed_kernel_matches_unpacked():
    """Interleaved chain packing in the worldline sweep kernel (round 4, for
    L<128): the packed and unpacked kernels must sample the same distribution,
    keep δm = 0, and agree on acceptance rates."""
    from supervillain_tpu.ops.pallas_worldline import worldline_sweeps
    N, B = 64, 64
    kappa = 0.5
    L = sv.Lattice2D(N)
    S = sv.Worldline(L, kappa, W=2)
    dens = _worldline_density(S)

    out = {}
    for tag, cpp in (('unpacked', 1), ('packed', 4)):
        m = jnp.zeros((B, 2, N, N), jnp.int32)
        v = jnp.zeros((B, 1, N, N), jnp.int32)
        m, v, _ = worldline_sweeps(jnp.int32(15), m, v, N=N, kappa=kappa, W=2,
                                   sweeps=100, chains_per_program=cpp)
        m, v, acc = worldline_sweeps(jnp.int32(16), m, v, N=N, kappa=kappa,
                                     W=2, sweeps=50, chains_per_program=cpp)
        assert int(jnp.abs(_deltam(L, m)).max()) == 0, tag
        # acc is per *program*: normalize to a per-proposal rate.
        proposals = (2 * N * N + 2 * N) * 50 * B
        out[tag] = (np.asarray(dens(m, v)), float(acc.sum()) / proposals)

    (da, ra), (db, rb) = out['unpacked'], out['packed']
    assert abs(ra - rb) < 0.01, f'acceptance {ra} vs {rb}'
    pull = abs(da.mean() - db.mean()) / np.hypot(da.std() / np.sqrt(B),
                                                 db.std() / np.sqrt(B))
    assert pull < 5, f'unpacked {da.mean()} vs packed {db.mean()}: pull {pull}'


def test_worldline_packed_kernel_winf():
    """Packed z-mode: float v, δm = 0 exact, matches unpacked at the self-dual
    coupling."""
    from supervillain_tpu.ops.pallas_worldline import worldline_sweeps
    N, B = 64, 64
    kappa = float(0.5 / np.pi)
    L = sv.Lattice2D(N)
    S = sv.Worldline(L, kappa, W=float('inf'))
    dens = _worldline_density(S)

    out = {}
    for tag, cpp in (('unpacked', 1), ('packed', 4)):
        m = jnp.zeros((B, 2, N, N), jnp.int32)
        v = jnp.zeros((B, 1, N, N), jnp.float32)
        m, v, _ = worldline_sweeps(jnp.int32(17), m, v, N=N, kappa=kappa,
                                   W=float('inf'), interval_v=0.7, sweeps=100,
                                   chains_per_program=cpp)
        m, v, acc = worldline_sweeps(jnp.int32(18), m, v, N=N, kappa=kappa,
                                     W=float('inf'), interval_v=0.7, sweeps=50,
                                     chains_per_program=cpp)
        assert int(jnp.abs(_deltam(L, m)).max()) == 0, tag
        assert float(jnp.abs(v).max()) > 0, tag
        out[tag] = np.asarray(dens(m, v))

    da, db = out['unpacked'], out['packed']
    pull = abs(da.mean() - db.mean()) / np.hypot(da.std() / np.sqrt(B),
                                                 db.std() / np.sqrt(B))
    assert pull < 5, f'unpacked {da.mean()} vs packed {db.mean()}: pull {pull}'
