import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp

CAP = 16_000_000
P = 1_000_000
rng = np.random.default_rng(0)
offsets_inc = jnp.asarray(np.sort(rng.integers(0, 2_000_000, P)).astype(np.int32))
keys = jnp.asarray(rng.integers(0, 1 << 31, CAP, dtype=np.int64).astype(np.int32))
vals = jnp.asarray(np.arange(CAP, dtype=np.int32))
pdata = jnp.asarray(rng.standard_normal((9, P + 1)).astype(np.float32))
eidx = jnp.asarray(rng.integers(0, P, CAP).astype(np.int32))

def bench(fn, name, n=6):
    @jax.jit
    def many(x):
        a = jnp.float32(0)
        for i in range(n):
            a = a + fn(x, i)
        return a
    float(many(keys)); t0 = time.time(); float(many(keys))
    print("%-34s %8.2f ms" % (name, (time.time() - t0) / n * 1000), flush=True)

def scatter_max(x, i, unique=False, sorted_=False):
    starts = offsets_inc - 1
    ids = jnp.arange(P, dtype=jnp.int32)
    scat = jnp.zeros((CAP,), jnp.int32)
    scat = scat.at[starts].max(ids + 1 + i, mode="drop",
                               unique_indices=unique, indices_are_sorted=sorted_)
    return jax.lax.cummax(scat)[-1].astype(jnp.float32)

bench(lambda x, i: scatter_max(x, i), "scatter+cummax 16M (no hints)")
bench(lambda x, i: scatter_max(x, i, True, True), "scatter+cummax 16M (hints)")
bench(lambda x, i: jax.lax.sort((x ^ i, vals), dimension=0, is_stable=True, num_keys=1)[1][-1].astype(jnp.float32), "stable sort 16M")
bench(lambda x, i: pdata[:, (eidx ^ (i % 2))].sum(), "gather [9,16M] from [9,P]")
bench(lambda x, i: pdata[0, (eidx ^ (i % 2))].sum(), "gather [16M] 1-D")
bench(lambda x, i: jax.lax.cummax(x ^ i)[-1].astype(jnp.float32), "cummax 16M alone")
