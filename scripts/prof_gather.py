import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp

N, P = 4_194_304, 1_000_000
rng = np.random.default_rng(0)
pdata = jnp.asarray(rng.standard_normal((9, P + 1)).astype(np.float32))
rand_idx = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
mono_idx = jnp.asarray(np.sort(rng.integers(0, P, N)).astype(np.int32))
near_idx = jnp.asarray((np.arange(N) % P).astype(np.int32))
g9 = jnp.asarray(rng.standard_normal((9, N)).astype(np.float32))
keys = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int64).astype(np.int32))

def bench(fn, name, n=6):
    @jax.jit
    def many(x):
        a = jnp.float32(0)
        for i in range(n):
            a = a + fn(x, i)
        return a
    float(many(pdata)); t0=time.time(); float(many(pdata))
    print("%-44s %8.2f ms" % (name, (time.time()-t0)/n*1000), flush=True)

bench(lambda x, i: (x+i)[:, rand_idx].sum(), "[9,4M] gather random idx")
bench(lambda x, i: (x+i)[:, mono_idx].sum(), "[9,4M] gather monotone idx")
bench(lambda x, i: (x+i)[:, near_idx].sum(), "[9,4M] gather near-identity idx")
def sort11(x, i):
    ops = (keys ^ i,) + tuple(g9[c] + x[0, 0] for c in range(9)) + (rand_idx,)
    out = jax.lax.sort(ops, dimension=0, num_keys=1)
    return sum(o[-1].astype(jnp.float32) for o in out[1:])
bench(sort11, "sort 1 key + 10 payloads 4M")
