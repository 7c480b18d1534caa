"""Isolate the grad-reduce stage's pieces on the real chip.

Measured verdict (TPU v5 lite, C=2.36M, P=1M — the numbers that set the
current pipeline default): multi-operand ``lax.sort`` is the FAST
permutation primitive on this chip, random gathers/scatters are the slow
ones, and 9-row column slices cross the 8-sublane tile (2x penalty):

  full_current (round-3 perm-gather reduce)  123.9 ms
  gather9 / spandiff (its pieces)            57.4 / 157.9 ms
  sort10 / sort6 / sort2                     5.9 / 5.1 / 4.5 ms
  prefix9 (batched [9, C])                   4.2 ms
  span_batch [9,1]-slice placement gather    24.9 ms
  span_rows8 / span_split81 ([8,1] + [1])    5.7 / 12.5 ms
  segsum (XLA scatter-add) either order      143-187 ms
  full_new81 (sort + prefix + 8/1 gather)    35.0 ms   <- shipped

This script times each piece in isolation so redesigns target the real
wall:

  gather9 / gather6 / gather1   the permutation gather at 9 f32 / 6 i32 / 1 row
  prefix9_loop / prefix9_batch  nine [C] scans vs one [9, C] batched scan
  spandiff                      the two [P]-sized gathers x 9 rows
  full_current                  the as-shipped composition
  sort10 / sort6 / sort2        round-2 style payload sorts (1 key + N-1 rows)
  segsum_presort                segment_sum, sorted ids (post-gather order)
  segsum_sorted_order           segment_sum, unsorted ids (raw sorted order)

Timing: each variant chains ITERS iterations inside one jit with an
input perturbation per step (XLA cannot hoist), amortized (n-run - 1-run)
/ (n-1) to cancel tunnel dispatch latency. Run ON the TPU; compile cache on.

Usage: python scripts/prof_reduce.py [variant ...]   (default: all)
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

C = int(os.environ.get("PROF_CAPACITY", 2_359_296))
P = int(os.environ.get("PROF_POINTS", 1_000_000))
ITERS = int(os.environ.get("PROF_ITERS", 8))


def log(msg):
    print(f"[prof_reduce +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


def main():
    cache_dir = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if os.environ.get("PROF_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gausplat_tpu.ops.prefix import prefix_sum

    log(f"devices: {jax.devices()}  C={C} P={P} iters={ITERS}")

    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(C).astype(np.int32))
    g9 = jnp.asarray(rng.standard_normal((9, C)).astype(np.float32))
    g6 = jnp.asarray(rng.integers(0, 2**31 - 1, (6, C), dtype=np.int32))
    # Point spans: expansion-order entry counts per point (garden-light
    # profile ~2.1 entries/visible, ~82% visible).
    counts = rng.poisson(C / P, P).astype(np.int64)
    excess = int(counts.sum()) - C
    counts[0] = max(counts[0] - excess, 0)
    offsets = jnp.asarray(np.cumsum(counts).clip(0, C).astype(np.int32))
    # Sorted-order point ids: the inverse view of the same spans.
    pid_presort = np.repeat(
        np.arange(P, dtype=np.int32), np.asarray(counts).clip(0)
    )[:C]
    pid_presort = np.pad(pid_presort, (0, C - pid_presort.size), constant_values=P - 1)
    inv = np.empty(C, dtype=np.int32)
    inv[np.asarray(perm)] = np.arange(C, dtype=np.int32)
    pid_sorted_order = jnp.asarray(pid_presort[inv])
    pid_presort = jnp.asarray(pid_presort)

    key_sortback = jnp.asarray(
        (pid_presort[inv].astype(np.int32))
    )  # sort by point id from raw sorted order

    # Index arrays are passed as jit ARGUMENTS (not closure constants) so
    # XLA cannot try to constant-fold a multi-million-element sort/gather
    # at compile time on the 1-core host.
    aux = {}

    def timed(name, fn, x):
        """Amortized chained timing of y = fn(x + eps_i); returns ms/iter."""

        def go_fn(x0, aux_args, n):
            def step(i, acc):
                xi = x0 + (i.astype(x0.dtype) if x0.dtype != jnp.int32 else i)
                out = fn(xi, aux_args)
                return acc + jnp.asarray(out, jnp.float32).ravel()[0]

            first = step(jnp.int32(0), jnp.float32(0))
            return jax.lax.fori_loop(1, n, step, first)

        go = jax.jit(go_fn)
        log(f"{name}: compiling")
        float(go(x, aux, jnp.int32(1)))
        float(go(x, aux, jnp.int32(ITERS)))
        t0 = time.time()
        float(go(x, aux, jnp.int32(ITERS)))
        tn = time.time() - t0
        t0 = time.time()
        float(go(x, aux, jnp.int32(1)))
        t1 = time.time() - t0
        ms = (tn - t1) / (ITERS - 1) * 1000.0
        log(f"{name}: {ms:8.2f} ms")
        return ms

    aux.update(
        perm=perm,
        offsets=offsets,
        pid_presort=pid_presort,
        pid_sorted_order=pid_sorted_order,
        key_sortback=key_sortback,
    )

    results = {}
    want = set(sys.argv[1:]) or None

    def run(name, fn, x):
        if want is None or name in want:
            results[name] = round(timed(name, fn, x), 2)

    run("gather9", lambda g, a: jnp.take(g, a["perm"], axis=1).sum(), g9)
    run("gather6", lambda g, a: jnp.take(g, a["perm"], axis=1).sum(), g6)
    run("gather1", lambda g, a: jnp.take(g[0], a["perm"]).sum(), g9)
    run(
        "prefix9_loop",
        lambda g, a: sum(prefix_sum(g[r])[-1] for r in range(9)),
        g9,
    )
    run("prefix9_batch", lambda g, a: prefix_sum(g)[..., -1].sum(), g9)

    def spandiff(g, a):
        hi_idx = jnp.minimum(a["offsets"], C) - 1
        tot = jnp.float32(0)
        for r in range(9):
            cs = g[r]  # stand-in for an already-scanned row
            hi = jnp.where(hi_idx >= 0, cs[jnp.maximum(hi_idx, 0)], 0.0)
            tot = tot + hi.sum()
        return tot

    run("spandiff", spandiff, g9)

    def full_current(g, a):
        hi_idx = jnp.minimum(a["offsets"], C) - 1
        gp = jnp.take(g, a["perm"], axis=1)
        tot = jnp.float32(0)
        for r in range(9):
            cs = prefix_sum(gp[r])
            hi = jnp.where(hi_idx >= 0, cs[jnp.maximum(hi_idx, 0)], 0.0)
            lo = jnp.concatenate([jnp.zeros((1,), cs.dtype), hi[:-1]])
            tot = tot + (hi - lo).sum()
        return tot

    run("full_current", full_current, g9)

    def sortn(g, a, nrows):
        ops = (a["key_sortback"],) + tuple(g[r] for r in range(nrows))
        out = jax.lax.sort(ops, num_keys=1)
        return out[1].sum()

    def sortn_stable(g, a, nrows):
        ops = (a["key_sortback"],) + tuple(g[r] for r in range(nrows))
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return out[1].sum()

    run("sort10_stable", lambda g, a: sortn_stable(g, a, 9), g9)
    run("sort10", lambda g, a: sortn(g, a, 9), g9)
    run("sort6", lambda g, a: sortn(jnp.asarray(g, jnp.float32), a, 5), g6)
    run("sort2", lambda g, a: sortn(g, a, 1), g9)

    def segsum(g, ids, sorted_):
        tot = jnp.float32(0)
        for r in range(9):
            s = jax.ops.segment_sum(
                g[r], ids, num_segments=P, indices_are_sorted=sorted_
            )
            tot = tot + s[0]
        return tot

    run("segsum_presort", lambda g, a: segsum(g, a["pid_presort"], True), g9)
    run(
        "segsum_sorted_order",
        lambda g, a: segsum(g, a["pid_sorted_order"], False),
        g9,
    )

    # --- targeted placement-gather variants (round-3 session round 2) ---
    # The [P]-indexed span-diff gathers are the measured wall (158 ms for
    # 9 x 1M); these probe which formulation the TPU lowers fast.

    def bitcast_i(g):
        return jax.lax.bitcast_convert_type(g, jnp.int32)

    run(
        "gather9_i32",
        lambda g, a: jnp.take(bitcast_i(g), a["perm"], axis=1).sum(), g9,
    )

    def span_batch(g, a):
        hi_idx = jnp.maximum(jnp.minimum(a["offsets"], C) - 1, 0)
        return jnp.take(g, hi_idx, axis=1).sum()

    run("span_batch", span_batch, g9)

    def span_batch_i32(g, a):
        hi_idx = jnp.maximum(jnp.minimum(a["offsets"], C) - 1, 0)
        return jnp.take(bitcast_i(g), hi_idx, axis=1).sum()

    run("span_batch_i32", span_batch_i32, g9)

    def span_lax_cols(g, a):
        # operand [9, C], gather [9, 1] column slices, sorted indices.
        hi_idx = jnp.maximum(jnp.minimum(a["offsets"], C) - 1, 0)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(1,), start_index_map=(1,)
        )
        out = jax.lax.gather(
            g, hi_idx[:, None], dnums, slice_sizes=(9, 1),
            indices_are_sorted=True,
        )
        return out.sum()

    run("span_lax_cols", span_lax_cols, g9)

    def span_lax_rows(g, a):
        # operand [C, 9] (entries major), gather [1, 9] row slices.
        hi_idx = jnp.maximum(jnp.minimum(a["offsets"], C) - 1, 0)
        gt = g.T
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        out = jax.lax.gather(
            gt, hi_idx[:, None], dnums, slice_sizes=(1, 9),
            indices_are_sorted=True,
        )
        return out.sum()

    run("span_lax_rows", span_lax_rows, g9)

    def span_split81(g, a):
        # [9, C] slices cross the 8-sublane tile boundary; split 8 + 1.
        hi_idx = jnp.maximum(jnp.minimum(a["offsets"], C) - 1, 0)
        top = jnp.take(g[:8], hi_idx, axis=1)
        bot = jnp.take(g[8], hi_idx)
        return top.sum() + bot.sum()

    run("span_split81", span_split81, g9)

    def span_rows8(g, a):
        hi_idx = jnp.maximum(jnp.minimum(a["offsets"], C) - 1, 0)
        return jnp.take(g[:8], hi_idx, axis=1).sum()

    run("span_rows8", span_rows8, g9)

    def span_rows16(g, a):
        hi_idx = jnp.maximum(jnp.minimum(a["offsets"], C) - 1, 0)
        g16 = jnp.concatenate([g, g[:7]], axis=0)
        return jnp.take(g16, hi_idx, axis=1).sum()

    run("span_rows16", span_rows16, g9)

    def full_new81(g, a):
        ops = (a["key_sortback"],) + tuple(g[r] for r in range(9))
        srt = jax.lax.sort(ops, num_keys=1)
        gp = jnp.stack(srt[1:])
        cs = prefix_sum(gp)
        hi_idx = jnp.maximum(jnp.minimum(a["offsets"], C) - 1, 0)
        hi = jnp.concatenate(
            [jnp.take(cs[:8], hi_idx, axis=1), jnp.take(cs[8], hi_idx)[None]],
            axis=0,
        )
        empty = (jnp.minimum(a["offsets"], C) - 1) < 0
        hi = jnp.where(empty[None, :], 0.0, hi)
        lo = jnp.concatenate([jnp.zeros((9, 1), hi.dtype), hi[:, :-1]], axis=1)
        return (hi - lo).sum()

    run("full_new81", full_new81, g9)

    # --- stream-construction variants (entry data via sort payload vs the
    # current post-sort 9-row random gather) ---

    pdata = jnp.asarray(rng.standard_normal((12, P + 1)).astype(np.float32))

    def stream_gather9(g, a):
        # Current build_entry_stream: 9-row random gather at sorted pids.
        # (pdata is perturbed by the loop-varying g so XLA cannot hoist
        # the gather out of the timing loop.)
        src_data = pdata[:9] + g[0, 0]
        return jnp.take(src_data, a["pid_sorted_order"], axis=1).sum()

    run("stream_gather9", stream_gather9, g9)

    def stream_sortpayload(g, a):
        # Candidate: data rides the tile sort as payload (11 operands);
        # the perturbed g rows stand in for the expanded data rows.
        ops = (a["key_sortback"], a["pid_presort"]) + tuple(
            g[r] for r in range(9)
        )
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return sum(out[i].sum() for i in range(2, 11))

    run("stream_sortpayload", stream_sortpayload, g9)

    def presort_fill12(g, a):
        # Expansion-order fill of 12 rows (3 key-pack + 9 data) at the
        # sorted-repeated source map, split 8 + 4, + consume a g row so the
        # fill cannot be hoisted.
        src = a["pid_presort"]
        d = pdata + g[0, 0]
        top = jnp.take(d[:8], src, axis=1)
        bot = jnp.take(d[8:12], src, axis=1)
        return top.sum() + bot.sum()

    run("presort_fill12", presort_fill12, g9)

    def presort_fill3(g, a):
        src = a["pid_presort"]
        return jnp.take(pdata[:3] + g[0, 0], src, axis=1).sum()

    run("presort_fill3", presort_fill3, g9)

    def full_new(g, a):
        # Candidate replacement: payload sort by point id (cheap on TPU),
        # batched prefix, ONE batched span gather.
        ops = (a["key_sortback"],) + tuple(g[r] for r in range(9))
        srt = jax.lax.sort(ops, num_keys=1)
        gp = jnp.stack(srt[1:])
        cs = prefix_sum(gp)
        hi_idx = jnp.maximum(jnp.minimum(a["offsets"], C) - 1, 0)
        hi = jnp.take(cs, hi_idx, axis=1)
        empty = (jnp.minimum(a["offsets"], C) - 1) < 0
        hi = jnp.where(empty[None, :], 0.0, hi)
        lo = jnp.concatenate([jnp.zeros((9, 1), hi.dtype), hi[:, :-1]], axis=1)
        return (hi - lo).sum()

    run("full_new", full_new, g9)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
