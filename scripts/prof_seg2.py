import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from gausplat_tpu.ops.prefix import prefix_sum

N, P = 4_194_304, 1_000_000
rng = np.random.default_rng(0)
g = jnp.asarray(rng.standard_normal((9, N)).astype(np.float32))
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
ends_idx = jnp.asarray(np.sort(rng.integers(0, N, P)).astype(np.int32))
ids = jnp.asarray(np.arange(N, dtype=np.int32))
keys = jnp.asarray(rng.integers(0, N, N).astype(np.int32))

def bench(fn, name, n=6):
    @jax.jit
    def many(x):
        a = jnp.float32(0)
        for i in range(n):
            a = a + fn(x, i)
        return a
    float(many(g)); t0=time.time(); float(many(g))
    print("%-40s %8.2f ms" % (name, (time.time()-t0)/n*1000), flush=True)

bench(lambda x, i: (x+i)[:, perm].sum(), "2-D gather [9,4M] by perm")
bench(lambda x, i: jax.lax.sort((keys ^ i, ids), dimension=0, is_stable=True, num_keys=1)[1][-1].astype(jnp.float32), "sort (int,int) 4M")
def tiled9(x, i):
    a = jnp.float32(0)
    for c in range(9):
        cs = prefix_sum(x[c] + i)
        a = a + cs[ends_idx].sum()
    return a
bench(tiled9, "9x tiled prefix_sum + bounds gather")
def full(x, i):
    gu = (x + i)[:, perm]
    a = jnp.float32(0)
    for c in range(9):
        cs = prefix_sum(gu[c])
        a = a + cs[ends_idx].sum()
    return a
bench(full, "full: perm-gather + 9x prefix + bounds")
