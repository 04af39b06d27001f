"""Timer, benchmark-smoke, plotting-smoke, and lattice-geometry helper tests
(reference coverage: test_benchmark_smoke.py, performance/timer.py usage, the
matplotlib surfaces of two_dimensional.py / comparison_plot.py / bootstrap.py)."""

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

import numpy as np
import pytest

import supervillain_tpu as sv
from supervillain_tpu.analysis import Bootstrap
import supervillain_tpu.analysis.comparison_plot as comparison_plot
from supervillain_tpu.generators import villain as gvillain
from supervillain_tpu.utils import Timer


def test_timer_logs_elapsed_and_per_item():
    messages = []
    with Timer(messages.append, 'work', per=10) as t:
        sum(range(1000))
    assert t.elapsed > 0
    assert 'work' in messages[0] and 'seconds' in messages[0] and 'each' in messages[0]


def test_timer_silent_channel():
    with Timer(None) as t:
        pass
    assert t.elapsed >= 0


def test_benchmark_form_kernels_smoke():
    from supervillain_tpu.benchmark import benchmark_form_kernels
    rows = benchmark_form_kernels(Ds=(2,), Ns=(4,), reps=2)
    assert len(rows) == 4  # d, delta, face_sum, coface_sum
    for (D, N, name, jax_us, oracle_us, speedup) in rows:
        assert jax_us > 0 and oracle_us > 0 and speedup > 0


def test_mod_and_distance_squared():
    L = sv.Lattice(2, 5)
    # mod wraps into the FFT-convention fundamental domain [-N//2, N//2)
    wrapped = np.asarray(L.mod(np.array([5, -5, 3, 7])))
    assert (np.abs(wrapped) <= L.N // 2).all()
    assert (np.asarray(L.mod(np.array([0, 1, -1]))) == np.array([0, 1, -1])).all()
    # distance respects periodic wrapping and symmetry
    a, b = np.array([0, 0]), np.array([4, 4])
    assert L.distance_squared(a, b) == L.distance_squared(b, a) == 2


@pytest.fixture(scope='module')
def small_ensemble():
    L = sv.Lattice2D(4)
    S = sv.Villain(L, 0.5, W=1)
    return sv.Ensemble(S).generate(200, gvillain.NeighborhoodUpdate(S), seed=3)


def test_plot_form_smoke(small_ensemble):
    L = small_ensemble.Action.Lattice
    cfg = small_ensemble.configuration[-1]
    fig, ax = plt.subplots(1, 3)
    L.plot_form(0, cfg['phi'], ax[0], label='phi')
    L.plot_form(1, cfg['n'], ax[1])
    L.plot_form(2, np.asarray(sv.ops.d(L, 1, cfg['n'])), ax[2])
    with pytest.raises(ValueError):
        L.plot_form(3, cfg['phi'], ax[0])
    plt.close(fig)


def test_plot_history_smoke(small_ensemble):
    fig, ax = plt.subplots(1, 2)
    small_ensemble.plot_history(ax, 'ActionDensity')
    plt.close(fig)


def test_comparison_plot_smoke(small_ensemble):
    obs = ('ActionDensity', 'InternalEnergyDensity')
    boot = Bootstrap(small_ensemble.cut(50), 25)
    fig, ax = comparison_plot.setup(obs)
    comparison_plot.bootstraps(ax, (boot,), ('a',), observables=obs)
    comparison_plot.histories(ax, (small_ensemble,), ('a',), observables=obs)
    plt.close(fig)


def test_bootstrap_plot_band_and_correlator(small_ensemble):
    boot = Bootstrap(small_ensemble.cut(50), 25)
    fig, ax = plt.subplots(1, 2)
    boot.plot_band(ax[0], 'ActionDensity', color='C0')
    boot.plot_correlator(ax[1], 'Spin_Spin')
    plt.close(fig)


def test_configurations_string_and_slice_indexing():
    import numpy as np
    from supervillain_tpu.configurations import Configurations
    c = Configurations({'phi': np.arange(12.).reshape(3, 4),
                        'n': np.arange(12).reshape(3, 4)})
    assert (c['phi'] == c.phi).all()           # dict-style column access
    assert set(c[0]) == {'phi', 'n'}           # integer -> one configuration dict
    assert len(c[1:]) == 2                     # slice -> Configurations


def test_autocorrelation_time_floor_and_every_guard():
    """An over-cut (even empty) chain falls back to tau = 1, never 0, and
    every() rejects stride < 1 loudly (regression: a 40-configuration
    algorithm-comparison run cut everything and crashed on slice step 0)."""
    import pytest
    import supervillain_tpu as sv
    from supervillain_tpu.generators import villain as gv
    S = sv.Villain(sv.Lattice2D(4), 0.5, W=1)
    e = sv.Ensemble(S).generate(6, gv.SiteUpdate(S), seed=2)
    empty = e.cut(6)
    assert len(empty) == 0
    assert empty.autocorrelation_time(('ActionDensity',)) == 1
    with pytest.raises(ValueError, match='stride'):
        e.every(0)
