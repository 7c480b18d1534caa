"""Tile binning: expand, key, sort, segment — TPU-native.

Parity targets:
- scan (exclusive prefix sum): .../jit/kernel/scan/add/ (subgroup scan)
- rank (tile-key expansion):   .../jit/kernel/rank/kernel.wgsl:34-114
- radix sort:                  .../jit/kernel/sort/radix/ (8-bit LSD, stable)
- segment (tile ranges):       .../jit/kernel/segment/kernel.2.wgsl:40-51

TPU-native design (SURVEY.md section 7): the reference's device scan +
host-readback + scatter expansion + hand-rolled radix sort + indirect
dispatch all assume dynamic shapes and atomics. Under XLA everything is
static-shape:

- The (tile, point) expansion buffer has a *static capacity*; the dynamic
  total is carried on-device and returned for overflow detection.
- Expansion is a **gather**, not a scatter: each entry slot maps to its
  source point via a scatter + cumulative-max over the exclusive-cumsum
  offsets, then derives its tile coordinate from ``e - offset``. No
  atomics, no host sync, fully parallel.
- Sorting uses ``jax.lax.sort`` (stable) on the packed u32 key
  ``tile_index << 16 | depth16`` — the exact bit layout of the reference,
  so blend order (and the image) matches.
- Tile ranges come from a vectorized binary search over the sorted tile
  ids instead of a boundary-detection kernel.

All per-point/per-entry arrays are 1-D (structure-of-arrays) — compact in
HBM under TPU tiling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DEPTH_ORDER_OFFSET
from .prefix import prefix_max, prefix_sum


def searchsorted_right(sorted_arr: jax.Array, queries: jax.Array) -> jax.Array:
    """Vectorized binary search (side='right') via log-steps of gathers.

    ``jnp.searchsorted`` lowers poorly on TPU for large inputs (its 'sort'
    method re-sorts the concatenation on every call; 'scan' is serial); an
    explicit binary search is a handful of cheap gathers.
    """
    n = sorted_arr.shape[0]
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi) // 2
        go_right = sorted_arr[jnp.clip(mid, 0, n - 1)] <= queries
        lo = jnp.where(go_right & (lo < hi), mid + 1, lo)
        hi = jnp.where(go_right | (lo >= hi), hi, mid)
    return lo


def spans_to_sources(
    offsets_inclusive: jax.Array, capacity: int
) -> jax.Array:
    """Map each entry slot to its source span index.

    Given inclusive-cumsum span ends (span i covers
    [offsets_inclusive[i-1], offsets_inclusive[i])), returns for each slot
    ``e`` in [0, capacity) the span containing it (clipped to the last span
    for out-of-range slots). Implemented as scatter + cumulative max — two
    bandwidth-bound passes instead of a per-slot binary search.
    """
    n = offsets_inclusive.shape[0]
    starts = jnp.concatenate(
        [jnp.zeros((1,), offsets_inclusive.dtype), offsets_inclusive[:-1]]
    )
    nonempty = offsets_inclusive > starts
    ids = jnp.arange(n, dtype=jnp.int32)
    # Scatter (id + 1) at each nonempty span's start; drop out-of-capacity.
    scat = jnp.zeros((capacity,), jnp.int32)
    scat = scat.at[jnp.where(nonempty, starts, capacity)].max(
        ids + 1, mode="drop"
    )
    src = prefix_max(scat) - 1
    return jnp.clip(src, 0, n - 1)


class BinningOutput(NamedTuple):
    #: [capacity] int32, sorted by (tile, depth); padding slots carry the
    #: sentinel point id P. The backward's gradient reduction stable-sorts
    #: the per-entry gradient rows by THESE ids (pipeline._render_bwd): on
    #: this chip a multi-operand ``lax.sort`` runs at ~6 ms per 2.4M rows
    #: while any random gather/scatter formulation costs 12-190 ms
    #: (scripts/prof_reduce.py), so the sort IS the fast permutation
    #: primitive — the round-3 inverse-permutation gather was 10x slower.
    point_indices: jax.Array
    point_offsets: jax.Array  # [P] int32 inclusive cumsum of touched-tile counts
    tile_ranges: jax.Array  # [num_tiles, 2] int32 (start, end) into the above
    total: jax.Array  # [] int32 true number of entries (may exceed capacity)


def depth_to_order(depths: jax.Array) -> jax.Array:
    """Map depth in [2^-2, 2^14) to a monotone 16-bit integer.

    Exact reference bit trick (rank/kernel.wgsl:112-114):
    ``(bits(depth) + ((3 << 23) + 0xc0000000)) >> 11`` with wrapping u32 add.
    """
    bits = jax.lax.bitcast_convert_type(depths.astype(jnp.float32), jnp.uint32)
    return (bits + jnp.uint32(DEPTH_ORDER_OFFSET)) >> jnp.uint32(11)


def make_point_orders(
    depths: jax.Array,
    tile_x_max: jax.Array,
    tile_x_min: jax.Array,
    tile_y_min: jax.Array,
    tile_counts: jax.Array,
    *,
    tile_count_x: int,
    capacity: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Expand each visible point into one (key, point-index) entry per
    touched tile, at a static ``capacity``.

    Returns ``(keys [capacity] uint32, src [capacity] int32 source point
    per slot, offsets_inc [P] int32 inclusive count cumsum, total [] int32)``.
    Padding slots have key ``0xFFFFFFFF``; their ``src`` is clipped.
    """
    p = depths.shape[0]

    # Exclusive cumsum of touched-tile counts (the reference scan kernel).
    offsets_inc = prefix_sum(tile_counts.astype(jnp.int32))
    total = offsets_inc[-1] if p > 0 else jnp.int32(0)
    offsets = offsets_inc - tile_counts  # exclusive

    # Gather-based expansion: map each entry slot to its source point via
    # scatter + cummax (bandwidth-bound; no per-slot search).
    entry_ids = jnp.arange(capacity, dtype=jnp.int32)
    src = spans_to_sources(offsets_inc, capacity)
    valid = entry_ids < jnp.minimum(total, jnp.int32(capacity))

    # Pack the six per-point quantities the expansion needs into three
    # int32 words so the random per-slot lookup is ONE 3-row gather
    # (random gathers dominate this stage on TPU).
    # A = depth16 << 16 | width;  B = y_min << 16 | x_min;  C = offset.
    width_pt = jnp.maximum(tile_x_max - tile_x_min, 1)
    pack = jnp.stack(
        [
            (depth_to_order(depths).astype(jnp.int32) << jnp.int32(16))
            | width_pt.astype(jnp.int32),
            (tile_y_min.astype(jnp.int32) << jnp.int32(16))
            | tile_x_min.astype(jnp.int32),
            offsets,
        ]
    )
    looked = pack[:, src]  # [3, capacity]
    a, b_word, off = looked[0], looked[1], looked[2]
    depth16 = (a >> jnp.int32(16)).astype(jnp.uint32) & jnp.uint32(0xFFFF)
    width = a & jnp.int32(0xFFFF)
    y_min = b_word >> jnp.int32(16)
    x_min = b_word & jnp.int32(0xFFFF)

    local = entry_ids - off  # rank of e within its point's tiles
    # Variable-divisor integer div/mod lowers poorly on TPU; use f32 math
    # (exact here: local < 2^24, width <= 2^16) with an integer fix-up.
    q = jnp.floor(
        local.astype(jnp.float32) / width.astype(jnp.float32)
    ).astype(jnp.int32)
    r = local - q * width
    q = jnp.where(r < 0, q - 1, jnp.where(r >= width, q + 1, q))
    r = jnp.where(r < 0, r + width, jnp.where(r >= width, r - width, r))
    tile_x = x_min + r
    tile_y = y_min + q
    tile_index = (tile_y * tile_count_x + tile_x).astype(jnp.uint32)

    keys = (tile_index << jnp.uint32(16)) | depth16
    keys = jnp.where(valid, keys, jnp.uint32(0xFFFFFFFF))
    # Pad slots carry the sentinel point id P: they sort last both in the
    # main (tile, depth) sort (key 0xFFFFFFFF) and in the backward's
    # point-grouped gradient-reduction sort (key = point id).
    src = jnp.where(valid, src, jnp.int32(p))
    return keys, src, offsets_inc, total


def sort_entries(
    keys: jax.Array, point_indices: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Stable sort of (key, point-index) pairs by key.

    Replaces the reference's 4-pass LSD radix sort with XLA's TPU sort
    (sort/radix/mod.rs:43-155). Padding keys (0xFFFFFFFF) sort last.
    """
    # TPU lax.sort is fastest on int32; keys use the full u32 range, so
    # bias to int32 order-preservingly (x ^ 0x80000000).
    signed_keys = (keys ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    sorted_keys, sorted_indices = jax.lax.sort(
        (signed_keys, point_indices),
        dimension=0, is_stable=True, num_keys=1,
    )
    return (
        sorted_keys.astype(jnp.uint32) ^ jnp.uint32(0x80000000),
        sorted_indices,
    )


def tile_ranges_from_keys(
    sorted_keys: jax.Array,
    total: jax.Array,
    *,
    num_tiles: int,
) -> jax.Array:
    """Per-tile [start, end) ranges into the sorted entry list.

    Replaces the boundary-detection kernel (segment/kernel.2.wgsl:40-51)
    with a vectorized binary search over the sorted tile ids. Empty tiles
    get an empty (s, s) range — equivalent to the reference's (0, 0).
    """
    capacity = sorted_keys.shape[0]
    tile_ids = (sorted_keys >> jnp.uint32(16)).astype(jnp.int32)
    queries = jnp.arange(num_tiles, dtype=jnp.int32)
    ends = searchsorted_right(tile_ids, queries)
    # Padding entries (key 0xFFFFFFFF) sort last; stability puts any real
    # tile-0xFFFF entries before them, so clamping by the true total is exact.
    ends = jnp.minimum(ends, jnp.minimum(total, jnp.int32(capacity)))
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    return jnp.stack([starts, ends], axis=-1)


def bin_gaussians(
    depths: jax.Array,
    tile_x_max: jax.Array,
    tile_x_min: jax.Array,
    tile_y_min: jax.Array,
    tile_counts: jax.Array,
    *,
    tile_count_x: int,
    tile_count_y: int,
    capacity: int,
    fused_expand: bool = False,
    interpret: bool = False,
) -> BinningOutput:
    """Full binning pipeline: expand -> sort -> segment.

    The sort carries the source *point id* as its value; the backward's
    gradient reduction re-sorts the per-entry gradient rows by these ids
    (a stable sort restores each point's entries to [offsets[p-1],
    offsets[p]) in the same tile-ascending order they hold in expansion
    order) for a scatter-free, deterministic per-point reduction — see
    ``BinningOutput.point_indices``.
    """
    if fused_expand and capacity < (1 << 24):
        # Pallas windowed expansion (ops/expand.py): bit-identical outputs,
        # no [C]-sized gather — on-chip the XLA pack gather alone costs
        # 10.2 ms at C=2.36M (scripts/prof_entry.py round-5).
        from .expand import fused_point_orders

        keys, src, offsets_inc, total = fused_point_orders(
            depths,
            tile_x_max,
            tile_x_min,
            tile_y_min,
            tile_counts,
            tile_count_x=tile_count_x,
            capacity=capacity,
            interpret=interpret,
        )
    else:
        keys, src, offsets_inc, total = make_point_orders(
            depths,
            tile_x_max,
            tile_x_min,
            tile_y_min,
            tile_counts,
            tile_count_x=tile_count_x,
            capacity=capacity,
        )
    sorted_keys, sorted_points = sort_entries(keys, src)
    ranges = tile_ranges_from_keys(
        sorted_keys, total, num_tiles=tile_count_x * tile_count_y
    )
    return BinningOutput(
        point_indices=sorted_points,
        point_offsets=offsets_inc,
        tile_ranges=ranges,
        total=total,
    )
