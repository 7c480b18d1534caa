import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp

N, P = 4_194_304, 1_000_000
rng = np.random.default_rng(0)
pdata = jnp.asarray(rng.standard_normal((9, P + 1)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, P, N).astype(np.int32))

def bench(fn, name, n=6):
    @jax.jit
    def many(x):
        a = jnp.float32(0)
        for i in range(n):
            a = a + fn(x, i)
        return a
    float(many(pdata)); t0=time.time(); float(many(pdata))
    print("%-40s %8.2f ms" % (name, (time.time()-t0)/n*1000), flush=True)

bench(lambda x, i: (x+i)[:, idx].sum(), "1x 2-D gather [9,4M]")
def g9(x, i):
    rows = [(x[c]+i)[idx] for c in range(9)]
    return sum(r.sum() for r in rows)
bench(g9, "9x 1-D gather [4M]")
def g9stack(x, i):
    rows = jnp.stack([(x[c]+i)[idx] for c in range(9)])
    return rows.sum()
bench(g9stack, "9x 1-D gather + stack [9,4M]")
