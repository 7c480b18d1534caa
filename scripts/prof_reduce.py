"""Micro-benchmark of gradient-reduction variants on the live device.

The reduce takes per-entry gradient rows at sorted-stream positions and
produces per-point sums: stable sort by point id, prefix sums, span-end
gathers. Variants:

  A  per-component: 9x (1-D prefix + 1-D gather)   [current pipeline]
  B  batched: unpack -> [9, cap] rows, one batched prefix (shared
     log-steps), one multi-row gather at shared indices

Env: RED_CAP, RED_POINTS, RED_ITERS, RED_PACKED (1 = bf16-pair rows).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from gausplat_tpu.ops.blend import grad_rows_to_components
from gausplat_tpu.ops.prefix import prefix_sum

CAP = int(os.environ.get("RED_CAP", 2_359_296))
P = int(os.environ.get("RED_POINTS", 1_000_000))
N = int(os.environ.get("RED_ITERS", 8))
PACKED = os.environ.get("RED_PACKED", "1") == "1"
ROWS = 6 if PACKED else 9

rng = np.random.default_rng(0)
counts = rng.integers(0, 5, P).astype(np.int32)
offsets = np.cumsum(counts).astype(np.int32)
total = int(offsets[-1])
entry_point = np.full(CAP, P, np.int32)
pts = np.repeat(np.arange(P, dtype=np.int32), counts)[:CAP]
entry_point[: len(pts)] = np.sort(rng.permutation(pts))  # point-sorted already? no:
entry_point[: len(pts)] = rng.permutation(pts)  # stream order (unsorted)
entry_point = jnp.asarray(entry_point)
offsets_j = jnp.asarray(offsets)
dtype = jnp.int32 if PACKED else jnp.float32
grads = jnp.asarray(
    rng.integers(-(2**20), 2**20, (ROWS, CAP)).astype(np.int32)
    if PACKED
    else rng.standard_normal((ROWS, CAP)).astype(np.float32)
)


def reduce_a(eg, perturb):
    eg = eg + perturb.astype(eg.dtype)
    sorted_ops = jax.lax.sort(
        (entry_point,) + tuple(eg[c] for c in range(ROWS)),
        dimension=0, is_stable=True, num_keys=1,
    )
    comps = grad_rows_to_components(sorted_ops[1:], PACKED)
    hi_idx = jnp.minimum(offsets_j, jnp.int32(min(total, CAP))) - 1
    out = []
    for gu in comps:
        cs = prefix_sum(gu)
        hi = jnp.where(hi_idx >= 0, cs[jnp.maximum(hi_idx, 0)], 0.0)
        lo = jnp.concatenate([jnp.zeros((1,), cs.dtype), hi[:-1]])
        out.append(hi - lo)
    return sum(o.sum() for o in out)


def reduce_b(eg, perturb):
    eg = eg + perturb.astype(eg.dtype)
    sorted_ops = jax.lax.sort(
        (entry_point,) + tuple(eg[c] for c in range(ROWS)),
        dimension=0, is_stable=True, num_keys=1,
    )
    comps = grad_rows_to_components(sorted_ops[1:], PACKED)
    rows = jnp.stack(comps)  # [9, cap] f32
    cs = prefix_sum(rows)  # batched along last axis
    hi_idx = jnp.minimum(offsets_j, jnp.int32(min(total, CAP))) - 1
    hi = jnp.where(
        hi_idx[None, :] >= 0, cs[:, jnp.maximum(hi_idx, 0)], 0.0
    )
    lo = jnp.concatenate([jnp.zeros((9, 1), hi.dtype), hi[:, :-1]], axis=1)
    return (hi - lo).sum()


for name, fn in (("A per-component", reduce_a), ("B batched", reduce_b)):
    @jax.jit
    def many(eg, fn=fn):
        return jax.lax.fori_loop(
            0, N, lambda i, a: a + fn(eg, i), jnp.float32(0)
        )
    float(many(grads))
    t0 = time.time()
    float(many(grads))
    ms = (time.time() - t0) / N * 1000
    print("%-18s %8.2f ms" % (name, ms), flush=True)
