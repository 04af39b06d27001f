"""Persistence tests: generate → write → read → continue → extend round-trips with
measurement equality (mirrors /root/reference/test/test_ensemble-extension.py and
test_batch_h5.py strategies)."""

import numpy as np
import pytest
import h5py

import supervillain_tpu as sv
from supervillain_tpu.generators import villain as gv, worldline as gw
from supervillain_tpu.io import generator_spec, generator_from_spec


@pytest.fixture
def tmp_h5(tmp_path):
    with h5py.File(tmp_path / 'test.h5', 'w') as f:
        yield f


def test_lattice_roundtrip(tmp_h5):
    L = sv.Lattice(3, 5)
    L.to_h5(tmp_h5.create_group('lattice'))
    L2 = sv.Lattice.from_h5(tmp_h5['lattice'])
    assert L == L2


@pytest.mark.parametrize('W', [1, 3, float('inf')])
def test_action_roundtrip(tmp_h5, W):
    for i, S in enumerate((sv.Villain(sv.Lattice2D(4), 0.5, W),
                           sv.Worldline(sv.Lattice2D(4), 0.7, W))):
        g = tmp_h5.create_group(f'action{i}')
        S.to_h5(g)
        from supervillain_tpu.io import action_from_h5
        S2 = action_from_h5(g)
        assert S == S2


def test_generator_spec_roundtrip():
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    G = gv.Hammer(S, worms=3)
    spec = generator_spec(G)
    G2 = generator_from_spec(spec, S)
    assert G2.name == G.name
    assert generator_spec(G2) == spec


def test_ensemble_roundtrip_with_measurements(tmp_h5):
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    e = sv.Ensemble(S).generate(20, gv.Hammer(S), seed=17)
    before = np.asarray(e.ActionDensity)
    spin_before = np.asarray(e.Spin_Spin)

    e.to_h5(tmp_h5.create_group('ensemble'))
    e2 = sv.Ensemble.from_h5(tmp_h5['ensemble'])

    assert len(e2) == len(e)
    assert (np.asarray(e2.phi) == np.asarray(e.phi)).all()
    assert (np.asarray(e2.n) == np.asarray(e.n)).all()
    assert (e2.index == e.index).all()
    assert np.allclose(np.asarray(e2.ActionDensity), before)
    assert np.allclose(np.asarray(e2.Spin_Spin), spin_before)  # complex round-trip
    assert e2.generator.name == e.generator.name


def test_continue_from_h5_and_extend(tmp_h5):
    S = sv.Worldline(sv.Lattice2D(4), 0.5, W=2)
    e = sv.Ensemble(S).generate(15, gw.Hammer(S), seed=23)
    g = tmp_h5.create_group('ensemble')
    e.to_h5(g)

    e2 = sv.Ensemble.continue_from(g, 10)
    assert len(e2) == 10
    assert e2.index[0] == e.index[-1] + e.index_stride
    for i in range(10):
        assert S.valid({'m': e2.m[i]})
    # The continuation starts from the stored final configuration.
    assert (np.asarray(e2.generator.init_stats()['VortexUpdate']['accepted']) == 0).all()

    e2.extend_h5(g)
    merged = sv.Ensemble.from_h5(g)
    assert len(merged) == 25
    assert (np.asarray(merged.m)[:15] == np.asarray(e.m)).all()
    assert (np.asarray(merged.m)[15:] == np.asarray(e2.m)).all()
    assert (merged.index == np.concatenate([e.index, e2.index])).all()
    # Measurements agree whether measured before or after the round-trip.
    direct = np.asarray(merged.ActionDensity)
    expect = np.concatenate([np.asarray(e.ActionDensity), np.asarray(e2.ActionDensity)])
    assert np.allclose(direct, expect)


def test_dtype_loss_rejected():
    from supervillain_tpu.configurations import Configurations
    c = Configurations({'n': np.zeros((3, 2, 4, 4), dtype=int)})
    with pytest.raises(ValueError):
        c[0] = {'n': np.ones((2, 4, 4)) * 0.5}


def test_bootstrap_h5_roundtrip(tmp_h5):
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    e = sv.Ensemble(S).generate(20, gv.Hammer(S), seed=29)
    b = sv.Bootstrap(e, draws=10, seed=4)
    vals = b.ActionDensity
    b.to_h5(tmp_h5.create_group('boot'))
    b2 = sv.Bootstrap.from_h5(tmp_h5['boot'], e)
    assert (b2.indices == b.indices).all()
    assert np.allclose(b2.__dict__['ActionDensity'], vals)
