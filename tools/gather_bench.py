"""Microbenchmark: random-gather cost vs table size on the attached TPU.

Informs the gather-bound stages (bloom probe, occ) of the scale index:
whether their cost is table-size-driven (HBM row activation) or
count-driven, and what the achievable gathers/sec ceiling is.

Usage: python tools/gather_bench.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=5):
    r = jax.device_get(fn())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = jax.device_get(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    N = 8 << 20  # 8M gathers

    @jax.jit
    def g1(tab, idx):
        return tab[idx].sum()

    @jax.jit
    def g2(tab2, idx):
        return tab2[idx].sum()

    for logsz in (20, 23, 25, 27, 28, 30):
        rows = (1 << logsz) // 4
        tab = jnp.asarray(np.arange(rows, dtype=np.uint32))
        tab2 = jnp.asarray(
            np.arange(2 * rows, dtype=np.uint32).reshape(rows, 2))
        idx = jnp.asarray(rng.integers(0, rows, size=N, dtype=np.int32))
        t1 = timeit(lambda: g1(tab, idx))
        t2 = timeit(lambda: g2(tab2, idx))
        idx_s = jnp.asarray(np.sort(np.asarray(idx)))
        t3 = timeit(lambda: g1(tab, idx_s))
        print(f"table {1<<logsz>>20:5d} MB: 4B gather {N/t1/1e6:8.1f} M/s "
              f"({t1*1e3:6.1f} ms)  8B {N/t2/1e6:8.1f} M/s  "
              f"sorted-4B {N/t3/1e6:8.1f} M/s", flush=True)


if __name__ == "__main__":
    main()
