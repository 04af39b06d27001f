"""Standard comparison figure: history / histogram / bootstrap panels
(capability of /root/reference/supervillain/analysis/comparison_plot.py:8-99)."""

from __future__ import annotations

import numpy as np


def comparison_plot(observables, figsize=(12, 8)):
    """Create a figure with one row per observable and 3 columns
    (Monte Carlo history, histogram, bootstrap distributions).

    Returns (fig, ax) with ax shaped (len(observables), 3).
    """
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(len(observables), 3,
                           figsize=figsize, squeeze=False,
                           gridspec_kw={'width_ratios': (3, 1, 1)},
                           sharey='row')
    for row, name in zip(ax, observables):
        row[0].set_ylabel(name)
    ax[-1, 0].set_xlabel('Monte Carlo time')
    ax[-1, 1].set_xlabel('density')
    ax[-1, 2].set_xlabel('bootstraps')
    return fig, ax


def histories(ax_row, ensemble, observable, label=None, color=None, bins=31):
    """History + histogram of a scalar observable on the first two panels."""
    data = np.asarray(getattr(ensemble, observable)).real
    ax_row[0].plot(np.asarray(ensemble.index), data, label=label, color=color)
    ax_row[1].hist(data, orientation='horizontal', bins=bins, density=True,
                   alpha=0.5, color=color)


def bootstraps(ax_row, bootstrap, observable, label=None, color=None, bins=31):
    """Bootstrap distribution of a scalar quantity on the third panel."""
    data = np.asarray(getattr(bootstrap, observable)).real
    ax_row[2].hist(data, orientation='horizontal', bins=bins, density=True,
                   alpha=0.5, color=color, label=label)
