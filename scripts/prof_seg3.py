import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from gausplat_tpu.ops.prefix import prefix_sum

N, P = 4_194_304, 1_000_000
rng = np.random.default_rng(0)
g = jnp.asarray(rng.standard_normal((9, N)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
bounds = jnp.asarray(np.sort(rng.integers(0, N, P)).astype(np.int32))

def bench(fn, name, n=6):
    @jax.jit
    def many(x):
        a = jnp.float32(0)
        for i in range(n):
            a = a + fn(x, i)
        return a
    float(many(g)); t0=time.time(); float(many(g))
    print("%-44s %8.2f ms" % (name, (time.time()-t0)/n*1000), flush=True)

def sort10(x, i):
    ops = (ids ^ i,) + tuple(x[c] for c in range(9))
    out = jax.lax.sort(ops, dimension=0, num_keys=1)
    return sum(o[-1] for o in out[1:]).astype(jnp.float32)
bench(sort10, "sort 1 key + 9 f32 payloads, 4M")

def prefix9_bounds(x, i):
    a = jnp.float32(0)
    for c in range(9):
        cs = prefix_sum(x[c] + i)
        a = a + cs[bounds].sum()
    return a
bench(prefix9_bounds, "9x tiled prefix + [1M]-bounds gather")

def bounds_only(x, i):
    a = jnp.float32(0)
    for c in range(9):
        a = a + (x[c] + i)[bounds].sum()
    return a
bench(bounds_only, "9x [1M]-bounds gather only")

def prefix_only(x, i):
    a = jnp.float32(0)
    for c in range(9):
        a = a + prefix_sum(x[c] + i)[-1]
    return a
bench(prefix_only, "9x tiled prefix only")
