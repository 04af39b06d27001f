"""Multi-chain fleet tests on the 8-virtual-device CPU mesh: sharded sampling,
layout-independent results, pooled analysis."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import supervillain_tpu as sv
from supervillain_tpu.generators import villain as gv, worldline as gw
from supervillain_tpu.parallel import chain_mesh, chain_space_mesh, sample_fleet, Fleet


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_fleet_shapes_and_validity():
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    fleet = sample_fleet(S, gv.Hammer(S), chains=16, steps=5, thin=2, seed=3,
                         mesh=chain_mesh())
    assert fleet.columns['phi'].shape == (5, 16, 1, 4, 4)
    assert fleet.chains == 16
    for c in range(0, 16, 5):
        for i in range(5):
            assert S.valid({'n': fleet.columns['n'][i, c]})


def test_fleet_results_independent_of_mesh():
    """Chain results depend only on (seed, chain index), not on the device layout."""
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    G = gv.SiteUpdate(S)
    a = sample_fleet(S, G, chains=8, steps=4, seed=5, mesh=chain_mesh())
    b = sample_fleet(S, gv.SiteUpdate(S), chains=8, steps=4, seed=5, mesh=None)
    assert np.allclose(a.columns['phi'], b.columns['phi'])


def test_fleet_stats_aggregate_over_chains():
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    G = gv.SiteUpdate(S)
    fleet = sample_fleet(S, G, chains=8, steps=3, seed=1, mesh=chain_mesh())
    assert float(fleet.stats['SiteUpdate']['proposed']) == 8 * 3 * 16


def test_fleet_ensemble_views_and_pooling():
    S = sv.Worldline(sv.Lattice2D(4), 0.5, W=2)
    fleet = sample_fleet(S, gw.Hammer(S), chains=8, steps=6, seed=9, mesh=chain_mesh())
    e0 = fleet.ensemble(0)
    assert len(e0) == 6
    assert np.isfinite(np.asarray(e0.ActionDensity)).all()
    pooled = fleet.pooled_ensemble(cut=2)
    assert len(pooled) == 4 * 8
    b = sv.Bootstrap(pooled, draws=20, seed=2)
    mean, err = b.estimate('ActionDensity')
    assert np.isfinite(mean) and err > 0


def test_fleet_h5_roundtrip(tmp_path):
    import h5py
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    fleet = sample_fleet(S, gv.SiteUpdate(S), chains=4, steps=3, seed=2)
    with h5py.File(tmp_path / 'fleet.h5', 'w') as f:
        fleet.to_h5(f.create_group('fleet'))
        back = Fleet.from_h5(f['fleet'])
    assert np.allclose(back.columns['phi'], fleet.columns['phi'])
    assert back.Action == S


def test_chain_space_mesh_spmd_step():
    """2-D (chains × space) sharding: XLA partitions the roll stencils with
    collective permutes; one full Hammer step compiles and runs."""
    mesh = chain_space_mesh(2, 4)
    S = sv.Villain(sv.Lattice2D(8), 0.5, W=1)
    G = gv.Hammer(S)
    from jax.sharding import NamedSharding, PartitionSpec as P

    chains = 4
    cfg0 = S.initial()
    cfgs = jax.tree.map(lambda x: jnp.broadcast_to(x, (chains,) + x.shape), cfg0)
    cfgs = {k: jax.device_put(v, NamedSharding(mesh, P('chains', None, None, 'space')))
            for k, v in cfgs.items()}
    stats = jax.tree.map(lambda x: jnp.broadcast_to(x, (chains,) + x.shape), G.init_stats())

    @jax.jit
    def step(key, cfgs, stats):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(chains))
        def one(k, c, s):
            c, s, _ = G.step(k, c, s)
            return c, s
        return jax.vmap(one)(keys, cfgs, stats)

    cfgs, stats = step(jax.random.key(0), cfgs, stats)
    for c in range(chains):
        assert S.valid({'n': np.asarray(cfgs['n'][c])})
