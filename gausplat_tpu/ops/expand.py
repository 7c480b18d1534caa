"""Fused tile-key expansion: one Pallas pass replaces the gather chain.

Reference workload being replaced: the rank kernel's per-point entry
writes (rank/kernel.wgsl:59-114) — each visible point emits one
``tile_index << 16 | depth16`` key per touched tile at its scanned offset.

The shipped XLA formulation (ops/binning.make_point_orders) is
gather-bound: ``spans_to_sources`` (scatter + prefix-max over [C]) builds
the slot->point map, then a 3-row packed gather at [C] random-ish indices
feeds the key arithmetic. On-chip isolation (scripts/prof_entry.py,
C=2.36M) puts that gather at 10.2 ms of the stage's 17.5 — XLA's TPU
gather costs ~0.6 ns/element regardless of index monotonicity.

This module exploits the structure XLA cannot: in *expansion order*, the
slot->span map is monotone with steps of +1 at span boundaries, so a block
of B consecutive entry slots touches at most B+1 consecutive *non-empty*
spans. After compacting the per-point span table to visible points (ONE
stable 8-operand ``lax.sort`` at [P] — the fast permutation primitive on
this chip, ~2 ms at 1M), each kernel block stages a 2B-wide span window
selected by a scalar-prefetched block start and resolves every slot's span
with a containment mask — no gather at [C] anywhere:

    mask[k, l] = start_w[k] <= e_l < end_w[k]        # [2B, B] compares
    vals[:, l] = V_w @ mask                          # one MXU dot

Mosaic-safety notes (hard-won, see NOTES.md round-4 lesson):
- start/end windows are consumed from COLUMN-layout [P_pad, 1] arrays
  (two (B, 1) blocks concatenated on sublanes) — the [2B, 1]-vs-[1, B]
  broadcast needs no in-kernel transpose, which Mosaic would reject.
- Every value row fed to the MXU dot is an integer < 2^16 stored as f32
  (span start and point id are split 12/12 bits and recombined after):
  any >= 2-term bf16 decomposition of an f32 dot is then exact, so the
  selection is bit-exact at every XLA precision mode.
- 2-D ``broadcasted_iota`` only; no sublane-offset ref slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import depth_to_order, searchsorted_right
from .prefix import prefix_sum

_BLK = 128  # entry slots per kernel block (the VPU lane width)


def _expand_kernel(
    wb_ref,  # scalar prefetch: [C/B] window base block per entry block
    meta_ref,  # scalar prefetch: [2] (total entries, point sentinel)
    vals1_ref,  # [8, B] f32 value rows, window block 0
    vals2_ref,  # [8, B] f32 value rows, window block 1
    s1_ref,  # [B, 1] i32 span starts (column layout), window block 0
    s2_ref,  # [B, 1] i32, window block 1
    e1_ref,  # [B, 1] i32 span ends, window block 0
    e2_ref,  # [B, 1] i32, window block 1
    keys_ref,  # [1, B] i32 out (bit-pattern of the u32 sort key)
    pid_ref,  # [1, B] i32 out (source point id; sentinel P on padding)
    *,
    block: int,
    tile_count_x: int,
):
    j = pl.program_id(0)
    total = meta_ref[0]
    sentinel = meta_ref[1]

    starts_w = jnp.concatenate([s1_ref[...], s2_ref[...]], axis=0)  # [2B, 1]
    ends_w = jnp.concatenate([e1_ref[...], e2_ref[...]], axis=0)
    vals_w = jnp.concatenate([vals1_ref[...], vals2_ref[...]], axis=1)  # [8, 2B]

    e_ids = j * block + jax.lax.broadcasted_iota(
        jnp.int32, (1, block), 1
    )  # [1, B]

    # Containment: exactly one window span holds each in-range slot
    # (compacted spans are non-empty and consecutive; empty/pad spans have
    # start == end and can never match).
    mask = (starts_w <= e_ids) & (e_ids < ends_w)  # [2B, B] bool
    maskf = mask.astype(jnp.float32)

    # One MXU dot selects all 8 value rows per slot. Rows are integers
    # < 2^16 in f32, so the products (x 0.0/1.0) and one-hot column sums
    # are exact under any bf16-split the compiler picks.
    looked = jax.lax.dot_general(
        vals_w,
        maskf,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [8, B]

    depth16 = looked[0:1]  # f32 integers
    width = jnp.maximum(looked[1:2], 1.0)
    y_min = looked[2:3]
    x_min = looked[3:4]
    start = looked[4:5] * 4096.0 + looked[5:6]  # 12/12-bit recombine
    pid = looked[6:7] * 4096.0 + looked[7:8]

    # Rank of the slot within its span, then the AABB row/col split —
    # all-integer f32 math, exact below 2^24 (capacity < 2^24 asserted by
    # the wrapper; width <= 2^16).
    e_f = e_ids.astype(jnp.float32)
    local = e_f - start
    q = jnp.floor(local / width)
    r = local - q * width
    q = jnp.where(r < 0, q - 1.0, jnp.where(r >= width, q + 1.0, q))
    r = jnp.where(r < 0, r + width, jnp.where(r >= width, r - width, r))

    tile_index = ((y_min + q) * tile_count_x + (x_min + r)).astype(jnp.int32)
    key = (tile_index << 16) | depth16.astype(jnp.int32)  # u32 bit pattern

    valid = e_ids < total
    keys_ref[...] = jnp.where(valid, key, jnp.int32(-1))  # -1 == 0xFFFFFFFF
    pid_ref[...] = jnp.where(valid, pid.astype(jnp.int32), sentinel)


def fused_point_orders(
    depths: jax.Array,
    tile_x_max: jax.Array,
    tile_x_min: jax.Array,
    tile_y_min: jax.Array,
    tile_counts: jax.Array,
    *,
    tile_count_x: int,
    capacity: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for ``binning.make_point_orders`` (same outputs,
    bit-identical): ``(keys [C] uint32, src [C] int32, offsets_inc [P]
    int32, total [] int32)``.
    """
    p = depths.shape[0]
    b = _BLK
    assert capacity % b == 0, (capacity, b)
    assert capacity < (1 << 24), (
        "fused expansion does f32-integer span math; capacity must stay "
        f"below 2^24 (got {capacity})"
    )
    nb = capacity // b

    offsets_inc = prefix_sum(tile_counts.astype(jnp.int32))
    total = offsets_inc[-1] if p > 0 else jnp.int32(0)
    starts = offsets_inc - tile_counts

    visible = tile_counts > 0
    # Empty spans collapse to [total, total): they can never contain a
    # slot, and keep the compacted `ends` monotone for the block-start
    # search below.
    s_eff = jnp.where(visible, starts, total)
    e_eff = jnp.where(visible, offsets_inc, total)

    d16 = depth_to_order(depths).astype(jnp.int32)
    width = jnp.maximum(tile_x_max - tile_x_min, 1).astype(jnp.int32)
    pid = jnp.arange(p, dtype=jnp.int32)

    # Compact to visible points: ONE stable 8-operand sort at [P] (the
    # fast permutation primitive — scripts/prof_reduce.py / prof_entry).
    viskey = jnp.logical_not(visible).astype(jnp.int32)
    (_, s_c, e_c, d16_c, w_c, y_c, x_c, pid_c) = jax.lax.sort(
        (viskey, s_eff, e_eff, d16, width,
         tile_y_min.astype(jnp.int32), tile_x_min.astype(jnp.int32), pid),
        num_keys=1,
        is_stable=True,
    )

    # Pad the span table to a whole number of blocks plus one (the window
    # reads blocks wb and wb+1). Padding spans are [2^24, 2^24): monotone
    # above every real end, never matching any slot.
    pb = -(-p // b) + 1
    p_pad = pb * b
    pad = (0, p_pad - p)
    # Pad sentinel 2^30: above any realistic entry total, keeping the
    # padded `ends` monotone for the block-start search even when the
    # true total overflows the 2^24 capacity bound.
    s_col = jnp.pad(s_c, pad, constant_values=(1 << 30))[:, None]
    e_col = jnp.pad(e_c, pad, constant_values=(1 << 30))[:, None]

    vals = jnp.stack(
        [
            d16_c,
            w_c,
            y_c,
            x_c,
            s_c >> 12,
            s_c & 0xFFF,
            pid_c >> 12,
            pid_c & 0xFFF,
        ]
    ).astype(jnp.float32)
    vals = jnp.pad(vals, ((0, 0), pad))  # [8, P_pad]

    # Per-block window base: the span containing the block's first slot
    # (searchsorted over the padded monotone ends), in units of blocks,
    # clamped so wb+1 stays in range.
    e_padded_1d = e_col[:, 0]
    first_span = searchsorted_right(
        e_padded_1d, jnp.arange(nb, dtype=jnp.int32) * b
    )
    wb = jnp.clip(first_span // b, 0, pb - 2).astype(jnp.int32)
    meta = jnp.stack([total.astype(jnp.int32), jnp.int32(p)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, b), lambda j, wb, meta: (0, wb[j])),
            pl.BlockSpec((8, b), lambda j, wb, meta: (0, wb[j] + 1)),
            pl.BlockSpec((b, 1), lambda j, wb, meta: (wb[j], 0)),
            pl.BlockSpec((b, 1), lambda j, wb, meta: (wb[j] + 1, 0)),
            pl.BlockSpec((b, 1), lambda j, wb, meta: (wb[j], 0)),
            pl.BlockSpec((b, 1), lambda j, wb, meta: (wb[j] + 1, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, b), lambda j, wb, meta: (0, j)),
            pl.BlockSpec((1, b), lambda j, wb, meta: (0, j)),
        ],
    )

    keys_i32, src = pl.pallas_call(
        functools.partial(
            _expand_kernel, block=b, tile_count_x=tile_count_x
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, capacity), jnp.int32),
            jax.ShapeDtypeStruct((1, capacity), jnp.int32),
        ],
        interpret=interpret,
    )(wb, meta, vals, vals, s_col, s_col, e_col, e_col)

    keys = jax.lax.bitcast_convert_type(keys_i32[0], jnp.uint32)
    return keys, src[0], offsets_inc, total
