"""Microbenchmark: jitted form-operator kernels vs the NumPy oracle
(the role of /root/reference/supervillain/benchmark/form_kernels.py:1-43).

Run as a script: ``python -m supervillain_tpu.benchmark.form_kernels``.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import Lattice, d, delta, face_sum, coface_sum
from ..ops import oracle


def _time(fn, *args, reps=10):
    fn(*args)  # warmup / compile
    start = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    if isinstance(out, jax.Array):
        float(jnp.asarray(out).sum())
    return (time.perf_counter() - start) / reps


def benchmark_form_kernels(Ds=(2, 3, 4), Ns=(5, 9, 13), p=1, reps=10):
    """Print a μs/op + speedup table for (D, N, op) over the four incidence
    operators, jitted-JAX vs the sparse-matrix oracle."""
    ops = {
        'd': (lambda L, f: d(L, p, f), lambda L, f: oracle.oracle_d(L, p, f)),
        'delta': (lambda L, f: delta(L, p, f), lambda L, f: oracle.oracle_delta(L, p, f)),
        'face_sum': (lambda L, f: face_sum(L, p, f), lambda L, f: oracle.oracle_face_sum(L, p, f)),
        'coface_sum': (lambda L, f: coface_sum(L, p, f), lambda L, f: oracle.oracle_coface_sum(L, p, f)),
    }
    rows = []
    print(f'{"D":>3} {"N":>5} {"op":>12} {"jax μs":>12} {"oracle μs":>12} {"speedup":>9}')
    for D in Ds:
        for N in Ns:
            L = Lattice(D, N)
            f = jnp.asarray(np.random.default_rng(0).normal(size=L.form_shape(p)))
            fn_np = np.asarray(f)
            for name, (fast, slow) in ops.items():
                jitted = jax.jit(lambda x, fast=fast: fast(L, x))
                t_fast = _time(jitted, f, reps=reps)
                t_slow = _time(lambda x, slow=slow: slow(L, x), fn_np, reps=max(1, reps // 5))
                rows.append((D, N, name, t_fast * 1e6, t_slow * 1e6, t_slow / t_fast))
                print(f'{D:>3} {N:>5} {name:>12} {t_fast * 1e6:>12.1f} {t_slow * 1e6:>12.1f} '
                      f'{t_slow / t_fast:>8.1f}x')
    return rows


if __name__ == '__main__':
    benchmark_form_kernels()
