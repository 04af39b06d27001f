"""Trace-time guard rails of the Pallas kernel wrappers — these errors must
fire before any device dispatch (so they are testable on the CPU backend) and
must say exactly what to pass instead."""

import numpy as np
import pytest
import jax.numpy as jnp

import supervillain_tpu as sv


def _villain_state(B, N):
    return (jnp.zeros((B, 1, N, N), jnp.float32),
            jnp.zeros((B, 2, N, N), jnp.int32))


def _worldline_state(B, N):
    return (jnp.zeros((B, 2, N, N), jnp.int32),
            jnp.zeros((B, 1, N, N), jnp.int32))


def test_hammer_rejects_unpackable_lane_width():
    from supervillain_tpu.ops.pallas_hammer import hammer_sweeps
    phi, n = _villain_state(4, 64)
    with pytest.raises(ValueError, match='chains_per_program'):
        hammer_sweeps(jnp.int32(1), phi, n, N=64, kappa=0.5, W=1,
                      interval_phi=0.7, interval_n=1, sweeps=1)


def test_hammer_rejects_indivisible_batch():
    from supervillain_tpu.ops.pallas_hammer import hammer_sweeps
    phi, n = _villain_state(3, 64)
    with pytest.raises(ValueError, match='not divisible'):
        hammer_sweeps(jnp.int32(1), phi, n, N=64, kappa=0.5, W=1,
                      interval_phi=0.7, interval_n=1, sweeps=1,
                      chains_per_program=2)


def test_worldline_hammer_rejects_odd_geometry():
    from supervillain_tpu.ops.pallas_worldline_hammer import worldline_hammer_sweeps
    m, v = _worldline_state(2, 64)
    with pytest.raises(ValueError, match='multiple of[^.]*128'):
        worldline_hammer_sweeps(jnp.int32(1), m, v, N=64, kappa=0.5, W=2)


def test_worldline_hammer_strip_dispatch_guards():
    """N >= 512 dispatches to the strip-regime hammer (no more 'monolithic
    only' rejection — VERDICT r4 #1); its strip_rows validation still guards
    bad overrides before any kernel is built."""
    from supervillain_tpu.ops.pallas_worldline_hammer import worldline_hammer_sweeps
    m, v = _worldline_state(1, 512)
    with pytest.raises(ValueError, match='even divisor'):
        worldline_hammer_sweeps(jnp.int32(1), m, v, N=512, kappa=0.5, W=2,
                                strip_rows=3)


def test_villain_hammer_strip_dispatch_guards():
    from supervillain_tpu.ops.pallas_hammer import hammer_sweeps
    phi = jnp.zeros((1, 1, 512, 512), jnp.float32)
    n = jnp.zeros((1, 2, 512, 512), jnp.int32)
    with pytest.raises(ValueError, match='even divisor'):
        hammer_sweeps(jnp.int32(1), phi, n, N=512, kappa=0.5, W=2,
                      interval_phi=0.7, interval_n=1, sweeps=1, strip_rows=3)
    with pytest.raises(ValueError, match='one chain per program'):
        hammer_sweeps(jnp.int32(1), phi, n, N=512, kappa=0.5, W=2,
                      interval_phi=0.7, interval_n=1, sweeps=1,
                      chains_per_program=2)


def test_fused_fleet_rejects_indivisible_mesh():
    from supervillain_tpu.parallel import sample_fused_fleet, chain_mesh
    S = sv.Villain(sv.Lattice2D(8), 0.5, W=1)
    with pytest.raises(ValueError, match='divisible'):
        sample_fused_fleet(S, chains=9, steps=1, mesh=chain_mesh())


def test_bound_worms_rejects_unknown_policy():
    from supervillain_tpu.parallel.fleet import _bounded_worms
    from supervillain_tpu.generators import villain as gv
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=2)
    with pytest.raises(ValueError, match="'raise', 'auto', or 'off'"):
        _bounded_worms(gv.Hammer(S), S, 16, 'maybe')


@pytest.mark.parametrize('gen', ['FusedHammer', 'FusedWorldlineHammer',
                                 'FusedWorldlineWorm'])
def test_fused_generators_reject_wrong_action(gen):
    import supervillain_tpu.generators as G
    cls = getattr(G, gen)
    right = sv.Worldline if 'Worldline' in gen else sv.Villain
    wrong = sv.Villain if right is sv.Worldline else sv.Worldline
    with pytest.raises(ValueError, match='action'):
        cls(wrong(sv.Lattice2D(4), 0.5, W=1))
    cls(right(sv.Lattice2D(4), 0.5, W=1))  # and the right action constructs


@pytest.mark.parametrize('D', (2, 3, 4, 5))
def test_linearize_coordinatize_roundtrip(D):
    """linearize flattens the D spatial axes into one sites axis;
    coordinatize inverts it — round-trip exact for any D."""
    L = sv.Lattice(D, 3)
    rng = np.random.default_rng(D)
    x = rng.normal(size=(2,) + L.dims)
    flat = L.linearize(x)
    assert flat.shape == (2, L.sites)
    back = L.coordinatize(flat)
    assert back.shape == x.shape
    assert np.allclose(np.asarray(back), x)


def test_max_worm_moves_plumbed_through_generators():
    from supervillain_tpu.generators import (FusedHammer, FusedWorldlineHammer,
                                             FusedWorldlineWorm)
    SV = sv.Villain(sv.Lattice2D(128), 0.5, W=2)
    SW = sv.Worldline(sv.Lattice2D(128), 0.5, W=2)
    assert FusedHammer(SV, max_worm_moves=1000).max_worm_moves == 1000
    assert FusedHammer(SV).max_worm_moves is None
    assert FusedWorldlineHammer(SW, max_worm_moves=2e3).max_worm_moves == 2000
    assert FusedWorldlineWorm(SW, max_worm_moves=5).max_worm_moves == 5
