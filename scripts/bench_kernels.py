"""Kernel micro-benchmarks: TPU sort / scan vs host CPU.

The analogue of the reference's divan benchmark harness
(/root/reference/benches/jit_kernel.rs: GPU radix sort and exclusive scan at
2^23 elements vs rayon par_sort / serial scan). Run on the TPU host:

    python scripts/bench_kernels.py
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import numpy as np
import jax
import jax.numpy as jnp

from gausplat_tpu.ops.binning import sort_entries

N = 1 << 23


def _amortized(jitted, arg, n=8):
    """Seconds per call, amortized inside one compiled chain."""
    @jax.jit
    def many(x):
        acc = jnp.int32(0)
        for i in range(n):
            acc = acc + jitted(x ^ jnp.uint32(i))
        return acc

    int(many(arg))
    t0 = time.time()
    int(many(arg))
    return (time.time() - t0) / n


def main():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    vals = np.arange(N, dtype=np.int32)
    dk = jnp.asarray(keys)
    dv = jnp.asarray(vals)

    def device_sort(k):
        sk, sv = sort_entries(k, dv)
        return sv[-1]

    def device_scan(k):
        return jnp.cumsum(k.astype(jnp.int32))[-1]

    t_sort = _amortized(device_sort, dk)
    t_scan = _amortized(device_scan, dk)

    t0 = time.time()
    order = np.argsort(keys, kind="stable")
    _ = vals[order]
    t_cpu_sort = time.time() - t0
    t0 = time.time()
    _ = np.cumsum(keys.astype(np.int64))
    t_cpu_scan = time.time() - t0

    print(f"elements: 2^23 = {N}")
    print(f"device stable sort (key,value): {t_sort * 1e3:8.2f} ms "
          f"({N / t_sort / 1e6:7.1f} M/s)")
    print(f"cpu numpy stable argsort:       {t_cpu_sort * 1e3:8.2f} ms "
          f"({N / t_cpu_sort / 1e6:7.1f} M/s)")
    print(f"device inclusive scan:          {t_scan * 1e3:8.2f} ms "
          f"({N / t_scan / 1e6:7.1f} M/s)")
    print(f"cpu numpy cumsum:               {t_cpu_scan * 1e3:8.2f} ms "
          f"({N / t_cpu_scan / 1e6:7.1f} M/s)")


if __name__ == "__main__":
    main()
