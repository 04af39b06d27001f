"""Pallas-fused sweep kernel tests.

On the CPU test backend the kernel cannot run (no hardware PRNG), so here we cover
the transparent XLA fallback; the TPU statistical-agreement check lives in
tests/tpu/test_fused_tpu.py and runs on real hardware (driven by /verify and bench).
"""

import numpy as np

import supervillain_tpu as sv
from supervillain_tpu.generators import FusedNeighborhoodUpdate
from supervillain_tpu.generators import villain as gv


def test_fused_falls_back_on_cpu():
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    G = FusedNeighborhoodUpdate(S, sweeps_per_step=2)
    assert G._fallback is not None
    e = sv.Ensemble(S).generate(10, G, seed=3)
    for i in range(10):
        assert S.valid({'n': e.n[i]})
    assert float(G._stats['NeighborhoodUpdate']['proposed']) == 10 * 2 * 16


def test_fused_matches_xla_distribution_cpu():
    """Fallback path samples the same distribution as NeighborhoodUpdate by
    construction (identical kernel); spot-check the chain statistics."""
    S = sv.Villain(sv.Lattice2D(4), 0.2, W=1)
    a = sv.Ensemble(S).generate(400, FusedNeighborhoodUpdate(S), seed=7).cut(100)
    b = sv.Ensemble(S).generate(400, gv.NeighborhoodUpdate(S), seed=8).cut(100)
    ba = sv.Bootstrap(a.every(3), draws=100, seed=1)
    bb = sv.Bootstrap(b.every(3), draws=100, seed=2)
    ma, ea = ba.estimate('ActionDensity')
    mb, eb = bb.estimate('ActionDensity')
    assert abs(ma - mb) / np.hypot(ea, eb) < 5


def test_worldline_fused_falls_back_on_cpu():
    from supervillain_tpu.generators import FusedWorldlineUpdate
    S = sv.Worldline(sv.Lattice2D(4), 0.5, W=2)
    G = FusedWorldlineUpdate(S, sweeps_per_step=2)
    assert G._fallback is not None
    e = sv.Ensemble(S).generate(8, G, seed=9)
    for i in range(8):
        assert S.valid({'m': e.m[i]})
