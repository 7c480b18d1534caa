import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp

N, P = 4_194_304, 1_000_000
rng = np.random.default_rng(0)
g = jnp.asarray(rng.standard_normal((9, N)).astype(np.float32))
segs = jnp.asarray(np.sort(rng.integers(0, P, N)).astype(np.int32))  # sorted by point!
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
ends_idx = jnp.asarray(np.sort(rng.integers(0, N, P)).astype(np.int32))

def bench(fn, name, n=6):
    @jax.jit
    def many(x):
        a = jnp.float32(0)
        for i in range(n):
            a = a + fn(x, i)
        return a
    float(many(g)); t0=time.time(); float(many(g))
    print("%-44s %8.2f ms" % (name, (time.time()-t0)/n*1000), flush=True)

# A: current approach — 9 x 1-D segment_sum with unsorted-ish ids
segs_unsorted = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
def seg9(x, i):
    a = jnp.float32(0)
    for c in range(9):
        a = a + jax.ops.segment_sum(x[c]+i, segs_unsorted, num_segments=P+1)[:P].sum()
    return a
bench(seg9, "9x segment_sum (unsorted ids)")

def seg9s(x, i):
    a = jnp.float32(0)
    for c in range(9):
        a = a + jax.ops.segment_sum(x[c]+i, segs, num_segments=P+1,
                                    indices_are_sorted=True)[:P].sum()
    return a
bench(seg9s, "9x segment_sum (sorted ids + hint)")

# B: one sort of (int32,int32) pairs
keys = jnp.asarray(rng.integers(0, 1<<31, N, dtype=np.int64).astype(np.int32))
def pairsort(x, i):
    sk, sv = jax.lax.sort((keys ^ i, perm), dimension=0, is_stable=True, num_keys=1)
    return (sk[-1] + sv[-1]).astype(jnp.float32)
bench(pairsort, "1x sort 4M int pairs")

# C: 9x gather by permutation + cumsum + boundary gather
def gathersum(x, i):
    a = jnp.float32(0)
    for c in range(9):
        gu = (x[c]+i)[perm]
        cs = jnp.cumsum(gu)
        a = a + cs[ends_idx].sum()
    return a
bench(gathersum, "9x (gather-perm + cumsum + bounds)")

# D: one 2-D gather [9, N] by permutation + 2-D cumsum axis=1
def gather2d(x, i):
    gu = (x+i)[:, perm]
    cs = jnp.cumsum(gu, axis=1)
    return cs[:, ends_idx].sum()
bench(gather2d, "1x 2-D gather + 2-D cumsum + bounds")
