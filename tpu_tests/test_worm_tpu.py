"""TPU-hardware tests of the fused in-kernel worm (ops/pallas_worm.py).

With φ frozen at 0 and W=1 the Villain action factorizes over links:
S = (κ/2) Σ_ℓ (2π n_ℓ)², so each link's equilibrium marginal is the exact
discrete Gaussian P(n) ∝ e^{-2π²κ n²} — a sharp statistical target without
any enumeration.  At W=2 the worm must preserve dn exactly (closed worms
telescope their plaquette defects away).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() in ('cpu',):  # pragma: no cover
    pytest.skip('TPU-hardware test module', allow_module_level=True)

from supervillain_tpu.ops.pallas_worm import classic_worms

KAPPA = 0.06  # 2π²κ ≈ 1.18


def _exact_moment(kappa, cutoff=8):
    n = np.arange(-cutoff, cutoff + 1)
    w = np.exp(-2 * np.pi ** 2 * kappa * n ** 2)
    return (n ** 2 * w).sum() / w.sum()


def test_fused_worm_single_link_marginal():
    N, B = 16, 64
    phi = jnp.zeros((B, 1, N, N), jnp.float32)
    n = jnp.zeros((B, 2, N, N), jnp.int32)
    # Thermalize + sample: worms touch ~5 random links each, so the 2N² links
    # need ~1e3 worms per chain before every link has equilibrated.
    records = []
    for k in range(40):
        n, hist, wl = classic_worms(jnp.int32(1000 + k), phi, n,
                                    N=N, kappa=KAPPA, W=1, worms=200)
        if k >= 10:
            records.append(np.asarray(n))
    ns = np.stack(records)            # (30, B, 2, N, N)
    m2 = (ns.astype(float) ** 2).mean()
    exact = _exact_moment(KAPPA)
    # Chains are independent; records within a chain are correlated, so take
    # the error from the spread over chains of their own time-means.
    per_chain = (ns.astype(float) ** 2).mean(axis=(0, 2, 3, 4))
    err = per_chain.std(ddof=1) / np.sqrt(per_chain.size)
    assert abs(m2 - exact) < 5 * max(err, 1e-4), (m2, exact, err)


def test_fused_worm_preserves_dn_at_w2():
    # φ stays modest (cold-ish): with wild unthermalized links the worm's
    # just-crossed links become repulsive and the head's return to the tail —
    # required for closure at W>1 — can take unboundedly long (true of the
    # reference's worm too; see worldline/worm.py:16-96 semantics).
    N, B = 16, 16
    key = jax.random.key(3)
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (B, 1, N, N),
                             jnp.float32, -0.3, 0.3)
    n0 = jnp.zeros((B, 2, N, N), jnp.int32)

    def dn(n):
        return ((jnp.roll(n[:, 1], -1, axis=1) - n[:, 1])
                - (jnp.roll(n[:, 0], -1, axis=2) - n[:, 0]))

    n1, hist, wl = classic_worms(jnp.int32(7), phi, n0, N=N, kappa=0.5, W=2,
                                 worms=5)
    assert bool(jnp.all(dn(n1) == dn(n0)))
    # Histogram totals are the tallied move counts (tallies include rejected
    # moves, as in the reference — at κ=0.5 near-cold almost everything is
    # rejected and the mass sits at the origin displacement).
    assert np.allclose(np.asarray(hist.sum(axis=(1, 2))), np.asarray(wl))
    assert np.asarray(wl).sum() > 0
    origin_frac = float(hist[:, 0, 0].sum() / hist.sum())
    assert origin_frac > 0.5, origin_frac


def test_fused_worm_generator_statistics():
    """FusedClassicWorm (generator wrapper) equilibrates a single chain to the
    same per-link marginal as the kernel-level test."""
    import supervillain_tpu as sv
    from supervillain_tpu.generators.villain_fused import FusedClassicWorm

    N = 16
    S = sv.Villain(sv.Lattice2D(N), KAPPA, W=1)
    G = FusedClassicWorm(S, worms=200)
    e = sv.Ensemble(S).generate(40, G, seed=5)
    ns = e.n[10:].astype(float)
    m2 = (ns ** 2).mean()
    exact = _exact_moment(KAPPA)
    per_rec = (ns ** 2).mean(axis=(1, 2, 3))
    err = per_rec.std(ddof=1) / np.sqrt(per_rec.size)
    assert abs(m2 - exact) < 5 * max(err, 3e-4), (m2, exact, err)
    assert {'Vortex_Vortex', 'Worm_Length'} <= set(e.configuration.keys())


def test_fused_worm_correlator_shape_matches_xla():
    """Beyond field-distribution agreement: the inline Vortex_Vortex
    ESTIMATOR itself (the worm's extended-ensemble visit histogram) must have
    the same normalized shape as the XLA ClassicWorm's — compared at several
    displacements via per-chain spreads."""
    import supervillain_tpu as sv
    from supervillain_tpu.generators import villain as gv

    N, B = 16, 32
    kappa = KAPPA
    phi = jnp.zeros((B, 1, N, N), jnp.float32)

    # Kernel worms: thermalize, then accumulate the histogram over launches.
    n = jnp.zeros((B, 2, N, N), jnp.int32)
    for k in range(10):
        n, _, _ = classic_worms(jnp.int32(500 + k), phi, n, N=N, kappa=kappa,
                                W=1, worms=200)
    hist_k = np.zeros((B, N, N))
    for k in range(20):
        n, hist, _ = classic_worms(jnp.int32(900 + k), phi, n, N=N,
                                   kappa=kappa, W=1, worms=200)
        hist_k += np.asarray(hist)

    # XLA worms: same workload, inline histograms accumulated in the scan.
    S = sv.Villain(sv.Lattice2D(N), kappa, W=1)
    G = gv.ClassicWorm(S)

    def one(k, c, s, h):
        c, s, inline = G.step(k, c, s)
        return c, s, h + inline['Vortex_Vortex']

    cfgs = {'phi': jnp.zeros((B, 1, N, N), jnp.float64),
            'n': jnp.zeros((B, 2, N, N), jnp.int64)}
    stats = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                         G.init_stats())
    hist0 = jnp.zeros((B, N, N))

    @jax.jit
    def steps(key, cfgs, stats, hist, n_steps=4000, burn=2000):
        def body(carry, kt):
            k, t = kt
            cfgs, stats, hist = carry
            keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.arange(B))
            cfgs, stats, h = jax.vmap(one, in_axes=(0, 0, 0, 0))(
                keys, cfgs, stats, jnp.zeros((B, N, N)))
            hist = hist + jnp.where(t >= burn, 1.0, 0.0)[None, None] * h
            return (cfgs, stats, hist), None
        ks = jax.random.split(key, n_steps)
        ts = jnp.arange(n_steps)
        (cfgs, stats, hist), _ = jax.lax.scan(body, (cfgs, stats, hist), (ks, ts))
        return hist

    hist_x = np.asarray(steps(jax.random.key(4), cfgs, stats, hist0))

    # Normalized shapes per chain; compare means at probe displacements.
    def profile(h):
        return h / np.maximum(h[:, :1, :1], 1e-30)
    pk, px = profile(hist_k), profile(hist_x)
    for (dt, dx) in ((0, 1), (1, 1), (2, 0), (3, 3), (8, 8)):
        a, b = pk[:, dt, dx], px[:, dt, dx]
        ea = a.std(ddof=1) / np.sqrt(B)
        eb = b.std(ddof=1) / np.sqrt(B)
        pull = abs(a.mean() - b.mean()) / np.hypot(ea, eb)
        assert pull < 5, f'G({dt},{dx}): kernel {a.mean()}({ea}) vs xla {b.mean()}({eb}) pull {pull}'
