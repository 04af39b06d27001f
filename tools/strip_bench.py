"""Quick strip-kernel throughput probe (villain + worldline) at L in {256, 512, 1024}.

Usage: python tools/strip_bench.py [reps]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from supervillain_tpu.ops.pallas_sweep import neighborhood_sweeps
from supervillain_tpu.ops.pallas_worldline import worldline_sweeps


def vill(L, B, sweeps=50, reps=3, k=3, kappa=0.5):
    phi = jnp.zeros((B, 1, L, L), jnp.float32)
    n = jnp.zeros((B, 2, L, L), jnp.int32)
    phi, n, acc, _ = neighborhood_sweeps(jnp.int32(1), phi, n, N=L, kappa=kappa,
                                         W=1, interval_phi=float(np.pi),
                                         interval_n=1, sweeps=sweeps)
    float(acc.sum())
    rates = []
    for s in range(k):
        start = time.perf_counter()
        for r in range(reps):
            phi, n, acc, _ = neighborhood_sweeps(jnp.int32(2 + s * reps + r), phi, n,
                                                 N=L, kappa=kappa, W=1,
                                                 interval_phi=float(np.pi),
                                                 interval_n=1, sweeps=sweeps)
        float(acc.sum())
        el = time.perf_counter() - start
        rates.append(reps * B * L * L * sweeps / el)
    return sorted(rates)[len(rates) // 2]


def wl(L, B, sweeps=50, reps=3, k=3, kappa=0.5):
    m = jnp.zeros((B, 2, L, L), jnp.int32)
    v = jnp.zeros((B, 1, L, L), jnp.int32)
    m, v, acc = worldline_sweeps(jnp.int32(1), m, v, N=L, kappa=kappa, W=2,
                                 sweeps=sweeps)
    float(acc.sum())
    rates = []
    for s in range(k):
        start = time.perf_counter()
        for r in range(reps):
            m, v, acc = worldline_sweeps(jnp.int32(2 + s * reps + r), m, v, N=L,
                                         kappa=kappa, W=2, sweeps=sweeps)
        float(acc.sum())
        el = time.perf_counter() - start
        rates.append(reps * B * L * L * sweeps / el)
    return sorted(rates)[len(rates) // 2]


if __name__ == '__main__':
    print('device:', jax.devices()[0])
    for L, B in ((256, 256), (512, 64), (1024, 16)):
        r = vill(L, B)
        print(f'villain   L={L:5d} B={B:4d}: {r/1e9:6.2f}e9 su/s', flush=True)
    for L, B in ((256, 256), (512, 64), (1024, 16)):
        r = wl(L, B)
        print(f'worldline L={L:5d} B={B:4d}: {r/1e9:6.2f}e9 su/s', flush=True)
