"""Standard comparison figure: history / histogram / bootstrap panels, with the
reference's interface (setup / histories / bootstraps,
/root/reference/supervillain/analysis/comparison_plot.py:8-99)."""

from __future__ import annotations

import numpy as np

from .autocorrelation import autocorrelation_time
from .uncertain import Uncertain

_default_observables = ('ActionDensity', 'InternalEnergyDensity',
                        'InternalEnergyDensitySquared', 'WindingSquared')


def setup(observables=_default_observables):
    """Figure with one row per observable and three columns: Monte Carlo history,
    histogram of measurements, histogram of bootstraps.  Returns (fig, ax) with ax
    two-dimensional even for a single observable."""
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(len(observables), 3,
                           figsize=(12, 2.5 * len(observables)),
                           gridspec_kw={'width_ratios': [4, 1, 1], 'wspace': 0, 'hspace': 0},
                           sharey='row',
                           squeeze=False)
    ax[-1, 0].set_xlabel('Monte Carlo time')
    ax[-1, 1].set_xticks([])
    ax[-1, 1].set_xlabel('Measurements')
    ax[-1, 2].set_xticks([])
    ax[-1, 2].set_xlabel('Bootstraps')
    for a, o in zip(ax, observables):
        a[0].set_ylabel(o)
    return fig, ax


def bootstraps(ax, boots, labels=None, observables=_default_observables):
    """Per observable row: each bootstrap's underlying history, its ±1σ band, and a
    bootstrap histogram labeled with the formatted estimate."""
    if labels is None:
        labels = tuple('' for b in boots)
    for a, o in zip(ax, observables):
        for b, label in zip(boots, labels):
            b.Ensemble.plot_history(a, o, alpha=0.5)
            b.plot_band(a[0], o)
            a[2].hist(np.asarray(getattr(b, o)).real,
                      density=True, orientation='horizontal', alpha=0.5, bins=25,
                      label=f'{label} {Uncertain(*b.estimate(o))}')
        a[2].legend()


def histories(ax, ensembles, labels=None, observables=_default_observables):
    """Per observable row: each ensemble's Monte Carlo history labeled with its
    autocorrelation time."""
    if labels is None:
        labels = tuple('' for e in ensembles)
    for a, o in zip(ax, observables):
        for e, label in zip(ensembles, labels):
            tau = autocorrelation_time(np.asarray(getattr(e, o)).real)
            e.plot_history(a, o, alpha=0.5,
                           history_kwargs={'zorder': -1, 'label': f'{label} τ={tau}'})
        a[0].legend(loc='upper left')
