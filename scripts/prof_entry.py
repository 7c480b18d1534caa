"""Isolate the entry-stream stages (expand + stream) on the real chip.

Round-4 closed every blend lever with on-chip verdicts, leaving the
non-blend half as the larger half of the frame (prof_stages_r04: expand
17.9 + stream 15.5 + grad-reduce 34.9 = 68 ms vs blend fwd+bwd 64 ms).
This script gives expand and stream the same isolated-cost-model
treatment scripts/prof_reduce.py gave the reduce in round 4.

Stage anatomy (ops/binning.make_point_orders + rasterize.build_entry_stream):

  expand = prefix_sum[P] + scatter@P->C + prefix_max[C] + 3-row gather@C
           (from [3, P]-wide) + ~15 elementwise key/divmod ops @C
  stream = 9-row gather@C (from [9, P+1]-wide) + step-list build @S (~26k)

Variants:

  expand_full      make_point_orders as shipped
  scatter_spans    spans_to_sources alone (scatter .at[].max + prefix_max)
  scatter_only     the scatter alone
  prefixmax_C      prefix_max over [C] alone
  gather3          the packed per-point lookup pack[:, src] (src monotone)
  keymath          the divmod/key arithmetic alone (given looked rows)
  stream_full      build_entry_stream as shipped
  sgather9         point_data[9, P+1][:, sorted_pids]  (as shipped)
  sgather81        split [:8] + [8]   (one sublane tile + one row)
  sgather63        split [:6] + [6:9]
  sgather54        split [:5] + [5:9]
  sgather8         [8, P+1] rows only (lower bound for the split's big half)
  sgather1         one row only
  steplist         the (tile, window) step derivation alone
  mono_gather8     8-row gather at the MONOTONE pre-sort src (sort-payload
                   alternative's data build)
  sort10_data      key+pid+8 data rows through lax.sort (the payload-carry
                   alternative's sort cost)
  sort2            the shipped (key, pid) sort

Timing: each variant chains ITERS iterations inside one jit with an input
perturbation per step (XLA cannot hoist), amortized (n-run - 1-run)/(n-1)
to cancel tunnel dispatch latency. Run ON the TPU; compile cache on.

Usage: python scripts/prof_entry.py [variant ...]    (default: all)
Env: PROF_CAPACITY, PROF_POINTS, PROF_ITERS, PROF_CPU
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

T0 = time.time()


def log(msg):
    print(f"[prof_entry +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    cache_dir = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if os.environ.get("PROF_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gausplat_tpu.ops.binning import (
        depth_to_order,
        make_point_orders,
        spans_to_sources,
    )
    from gausplat_tpu.ops.prefix import prefix_max, prefix_sum
    from gausplat_tpu.ops.rasterize import build_entry_stream

    log(f"devices: {jax.devices()}  C={C} P={P} iters={ITERS}")

    rng = np.random.default_rng(0)

    # Bench-headline-like workload: ~82% visible points, Poisson touched-tile
    # counts summing just under capacity (the 74%-occupancy bench profile).
    target_entries = int(C * 0.745)
    counts = rng.poisson(target_entries / (P * 0.82), P).astype(np.int64)
    counts[rng.random(P) > 0.82] = 0
    excess = int(counts.sum()) - target_entries
    counts[0] = max(int(counts[0]) - excess, 0)
    total_entries = int(counts.sum())
    log(f"entries={total_entries} ({total_entries / C:.1%} of capacity)")

    depths_np = (rng.random(P) * 30 + 0.5).astype(np.float32)
    # Tile AABBs consistent with the counts: width w, height ceil(count/w).
    w_np = np.minimum(np.maximum(counts, 1), 8).astype(np.int32)
    h_np = np.maximum((counts + w_np - 1) // np.maximum(w_np, 1), 1).astype(np.int32)
    tx_min = rng.integers(0, 100, P).astype(np.int32)
    ty_min = rng.integers(0, 50, P).astype(np.int32)
    counts_np = counts.astype(np.int32)

    aux = dict(
        depths=jnp.asarray(depths_np),
        tx_max=jnp.asarray(tx_min + w_np),
        tx_min=jnp.asarray(tx_min),
        ty_min=jnp.asarray(ty_min),
        counts=jnp.asarray(counts_np),
    )

    # Precomputed expansion-order src (monotone) and a random sorted-order
    # pid permutation for the stream-gather variants.
    offsets_inc_np = np.cumsum(counts_np).astype(np.int32)
    starts_np = np.concatenate([[0], offsets_inc_np[:-1]]).astype(np.int32)
    src_np = np.repeat(np.arange(P, dtype=np.int32), counts_np)[:C]
    src_np = np.pad(src_np, (0, max(0, C - src_np.size)), constant_values=P - 1)
    sorted_pids_np = src_np.copy()
    rng.shuffle(sorted_pids_np)  # sorted-by-(tile,depth) order is ~random in pid
    aux.update(
        offsets_inc=jnp.asarray(offsets_inc_np),
        starts=jnp.asarray(starts_np),
        src=jnp.asarray(src_np),
        sorted_pids=jnp.asarray(sorted_pids_np),
        keys_rand=jnp.asarray(
            rng.integers(0, 2**31 - 1, C, dtype=np.int32)
        ),
    )

    pd = jnp.asarray(rng.standard_normal((9, P + 1)).astype(np.float32))
    tile_count_x, tile_count_y = 120, 68
    num_tiles = tile_count_x * tile_count_y
    # tile_ranges consistent with total entries spread over the tiles.
    ends = np.sort(rng.integers(0, total_entries, num_tiles - 1)).astype(np.int32)
    ends = np.concatenate([ends, [total_entries]]).astype(np.int32)
    starts_t = np.concatenate([[0], ends[:-1]]).astype(np.int32)
    aux["tile_ranges"] = jnp.asarray(np.stack([starts_t, ends], axis=-1))

    def timed(name, fn, x):
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

    results = {}
    want = set(sys.argv[1:]) or None

    def run(name, fn, x):
        if want is None or name in want:
            results[name] = round(timed(name, fn, x), 2)

    def live(arr, x):
        """Make ``arr`` loop-iteration-dependent without changing its value.

        The original ``+ (x % 1)`` liveness trick CONSTANT-FOLDS (int % 1
        == 0 statically), so XLA hoisted those variants out of the timing
        loop — scatter_spans/scatter_only/keymath/steplist/sort2 measured
        ~0 in the first capture. A select on a runtime predicate of the
        perturbed input cannot fold or hoist.
        """
        pred = x.ravel()[0].astype(jnp.float32) > jnp.float32(-1e18)
        return jnp.where(pred, arr, jnp.zeros_like(arr))

    # --- expand pieces ---------------------------------------------------

    def expand_full(d, a):
        keys, src, off, total = make_point_orders(
            d, a["tx_max"], a["tx_min"], a["ty_min"], a["counts"],
            tile_count_x=tile_count_x, capacity=C,
        )
        return keys.astype(jnp.float32).sum() + src.sum() + total

    run("expand_full", expand_full, aux["depths"])

    def scatter_spans(d, a):
        off = live(a["offsets_inc"], d)
        return spans_to_sources(off, C).sum()

    run("scatter_spans", scatter_spans, aux["depths"])

    def scatter_only(d, a):
        off = live(a["offsets_inc"], d)
        starts = jnp.concatenate([jnp.zeros((1,), off.dtype), off[:-1]])
        nonempty = off > starts
        ids = jnp.arange(P, dtype=jnp.int32)
        scat = jnp.zeros((C,), jnp.int32)
        scat = scat.at[jnp.where(nonempty, starts, C)].max(ids + 1, mode="drop")
        return scat.sum()

    run("scatter_only", scatter_only, aux["depths"])

    run(
        "prefixmax_C",
        lambda k, a: prefix_max(k).sum(),
        aux["keys_rand"],
    )

    def gather3(d, a):
        width_pt = jnp.maximum(a["tx_max"] - a["tx_min"], 1)
        pack = jnp.stack(
            [
                (depth_to_order(d).astype(jnp.int32) << jnp.int32(16))
                | width_pt.astype(jnp.int32),
                (a["ty_min"].astype(jnp.int32) << jnp.int32(16))
                | a["tx_min"].astype(jnp.int32),
                a["offsets_inc"] - a["counts"],
            ]
        )
        return pack[:, a["src"]].sum()

    run("gather3", gather3, aux["depths"])

    def keymath(d, a):
        # The arithmetic downstream of the gather, on stand-in looked rows.
        looked0 = live(a["keys_rand"], d)
        a_w = looked0 | jnp.int32(1)
        off = (a["keys_rand"] >> 8) % jnp.int32(C)
        entry_ids = jnp.arange(C, dtype=jnp.int32)
        depth16 = (a_w >> jnp.int32(16)).astype(jnp.uint32) & jnp.uint32(0xFFFF)
        width = jnp.maximum(a_w & jnp.int32(0xFF), 1)
        y_min = a_w >> jnp.int32(20)
        x_min = a_w & jnp.int32(0x3FF)
        local = entry_ids - off
        q = jnp.floor(
            local.astype(jnp.float32) / width.astype(jnp.float32)
        ).astype(jnp.int32)
        r = local - q * width
        q = jnp.where(r < 0, q - 1, jnp.where(r >= width, q + 1, q))
        r = jnp.where(r < 0, r + width, jnp.where(r >= width, r - width, r))
        tile_index = ((y_min + q) * tile_count_x + (x_min + r)).astype(jnp.uint32)
        keys = (tile_index << jnp.uint32(16)) | depth16
        return keys.astype(jnp.float32).sum()

    run("keymath", keymath, aux["depths"])

    # --- stream pieces ---------------------------------------------------

    def stream_full(g, a):
        stream = build_entry_stream(
            g, a["sorted_pids"], a["tile_ranges"], block_size=128
        )
        return stream.entry_data.sum() + stream.step_tile.sum()

    run("stream_full", stream_full, pd)

    run("sgather9", lambda g, a: g[:, a["sorted_pids"]].sum(), pd)

    def sgather81(g, a):
        idx = a["sorted_pids"]
        return jnp.take(g[:8], idx, axis=1).sum() + jnp.take(g[8], idx).sum()

    run("sgather81", sgather81, pd)

    def sgather63(g, a):
        idx = a["sorted_pids"]
        return (
            jnp.take(g[:6], idx, axis=1).sum()
            + jnp.take(g[6:9], idx, axis=1).sum()
        )

    run("sgather63", sgather63, pd)

    def sgather54(g, a):
        idx = a["sorted_pids"]
        return (
            jnp.take(g[:5], idx, axis=1).sum()
            + jnp.take(g[5:9], idx, axis=1).sum()
        )

    run("sgather54", sgather54, pd)

    run("sgather8", lambda g, a: jnp.take(g[:8], a["sorted_pids"], axis=1).sum(), pd)
    run("sgather1", lambda g, a: jnp.take(g[8], a["sorted_pids"]).sum(), pd)

    def steplist(g, a):
        stream = build_entry_stream(
            g[:, : 2], a["sorted_pids"][:256], live(a["tile_ranges"], g),
            block_size=128,
        )
        return stream.step_tile.sum() + stream.step_block.sum()

    # steplist via tiny entry arrays isolates the step derivation (the
    # gathers at 256 slots are negligible).
    run("steplist", steplist, pd)

    # --- payload-carry alternative pieces --------------------------------

    run("mono_gather8", lambda g, a: jnp.take(g[:8], a["src"], axis=1).sum(), pd)

    def sort10_data(g, a):
        ops = (a["keys_rand"], a["sorted_pids"]) + tuple(g[r] for r in range(8))
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return out[1].sum() + out[2].sum()

    # data rows at capacity length for the sort (pad column dropped)
    pdC = jnp.asarray(rng.standard_normal((8, C)).astype(np.float32))
    run("sort10_data", sort10_data, pdC)

    def sort2(g, a):
        out = jax.lax.sort((live(a["keys_rand"], g), a["sorted_pids"]),
                           num_keys=1, is_stable=True)
        return out[1].sum() + g[0, 0]

    run("sort2", sort2, pdC)

    # --- layout alternatives (round-5) ---------------------------------

    def sgather_t(g, a):
        # Point-major table [P+1, 9]: each entry's 9 values are contiguous
        # in HBM; one gather of [C] slices then a [C, 9] -> [9, C] transpose.
        gt = g.T  # materialized once per step (counted: it is part of the
        # alternative's real cost — pack_point_data would emit this layout)
        return gt[a["sorted_pids"]].T.sum()

    run("sgatherT", sgather_t, pd)

    def pgather9(g, a):
        # The reduce's span-end placement gather: 9 rows at P monotone
        # (span-end) indices from [*, C]-wide scanned rows.
        csC = jnp.broadcast_to(g[:, :1], (9, C)) + a["keys_rand"].astype(
            jnp.float32
        )
        hi_idx = jnp.minimum(a["offsets_inc"], C - 1)
        hi = jnp.concatenate(
            [jnp.take(csC[:8], hi_idx, axis=1), jnp.take(csC[8], hi_idx)[None]]
        )
        return hi.sum()

    run("pgather9", pgather9, pd)

    print(json.dumps({"workload": {"C": C, "P": P, "entries": total_entries},
                      "ms": results}))


if __name__ == "__main__":
    main()
