"""Dev validation: new strip sweep body vs monolithic, on the chip.

Checks, at N=128 where both bodies run:
  - acceptance fraction agreement (< 0.01 absolute)
  - action density pull < 5 over B=32 chains
  - inline ActionDensity consistency with the end-state recomputed density
    (catches residual-maintenance bugs)
  - constraint validity (dn == 0 mod W; exact at W=inf)
for Rb in {128 (S=1, wrap-aliased), 32 (S=4, interior+wrap strips)} and
W in {1, 2, inf}, plus p_n=0.05 zero-inflated draws.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from supervillain_tpu.ops.pallas_sweep import neighborhood_sweeps

N, B = 128, 32
kappa = 0.5


def density(phi, n, W_eff):
    phi = np.asarray(phi)[:, 0]
    n = np.asarray(n)
    r0 = np.roll(phi, -1, axis=1) - phi - 2 * np.pi * n[:, 0]
    r1 = np.roll(phi, -1, axis=2) - phi - 2 * np.pi * n[:, 1]
    return (kappa / 2) * (r0 ** 2 + r1 ** 2).sum(axis=(1, 2)) / (N * N)


def run(W, p_n, force, Rb):
    kw = dict(N=N, kappa=kappa, W=W, interval_phi=0.7, interval_n=1,
              p_n=p_n, force_strips=force)
    if Rb is not None:
        kw['strip_rows'] = Rb
    phi = jnp.zeros((B, 1, N, N), jnp.float32)
    n = jnp.zeros((B, 2, N, N), jnp.int32)
    phi, n, _, _ = neighborhood_sweeps(jnp.int32(5), phi, n, sweeps=600, **kw)
    phi, n, acc, inline = neighborhood_sweeps(jnp.int32(6), phi, n, sweeps=100, **kw)
    nn = np.asarray(n)
    dn = (np.roll(nn[:, 1], -1, axis=1) - nn[:, 1]) - (np.roll(nn[:, 0], -1, axis=2) - nn[:, 0])
    if W == float('inf'):
        ok = np.all(dn == 0)
    else:
        ok = np.all(dn % W == 0) if W > 1 else True
    return (density(phi, n, W), float(acc.sum()) / (B * N * N * 100),
            float(inline['ActionDensity'].mean()), ok)


def main():
    fails = 0
    for W in (1, 2, float('inf')):
        for p_n in (None, 0.05):
            sa, acc_a, in_a, ok_a = run(W, p_n, False, None)
            assert ok_a
            for Rb in (128, 32):
                sb, acc_b, in_b, ok_b = run(W, p_n, True, Rb)
                pull = abs(sa.mean() - sb.mean()) / np.hypot(
                    sa.std() / np.sqrt(B), sb.std() / np.sqrt(B))
                incons = abs(in_b - sb.mean()) / (abs(sb.mean()) + 1e-9)
                status = 'OK'
                if (not ok_b or abs(acc_a - acc_b) > 0.01 or pull > 5
                        or incons > 0.02):
                    status = 'FAIL'
                    fails += 1
                print(f'W={W} p_n={p_n} Rb={Rb}: acc {acc_a:.4f}/{acc_b:.4f} '
                      f'dens {sa.mean():.5f}/{sb.mean():.5f} pull {pull:.2f} '
                      f'inline-cons {incons:.4f} valid {ok_b} -> {status}',
                      flush=True)
    print('FAILURES:', fails)
    sys.exit(1 if fails else 0)


if __name__ == '__main__':
    main()
