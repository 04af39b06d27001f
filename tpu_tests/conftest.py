"""Hardware-test guard: exactly ONE process may own the TPU chip.

The repo-wide addopts run pytest-xdist with two workers (right for the
CPU-bound tests/ suite) — but two processes dispatching to the same TPU crash
the runtime ("TPU worker process crashed or restarted").  Force serial runs:

    python -m pytest tpu_tests -q -n 0
"""

import pytest


def pytest_configure(config):
    n = getattr(config.option, 'numprocesses', None)
    if n:  # None or 0 are fine; >=1 spawns worker processes
        raise pytest.UsageError(
            'tpu_tests must run in a single process (one process owns the TPU '
            'chip; parallel workers crash the runtime): pass -n 0.')
