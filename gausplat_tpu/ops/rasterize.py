"""Tile rasterization: Pallas TPU kernels + XLA fallback.

Parity targets:
- forward: .../jit/kernel/rasterize/kernel.wgsl:60-221 (1 workgroup = 1
  16x16 tile, shared-memory point batches, per-pixel front-to-back blend,
  whole-tile early exit)
- backward: .../jit/kernel/rasterize_backward/kernel.wgsl:71-274
  (back-to-front replay + atomicAdd gradient accumulation)

TPU-native design — the *segment-window* rasterizer:

The kernels consume the (tile, depth)-sorted entry array **directly**, with
no realignment copy. The sorted array is viewed as consecutive blocks of
``B`` entries; each grid step is a (tile, block) pair — one window of one
tile's segment:

- a tile whose segment [r0, r1) overlaps blocks k..m contributes steps
  (t, k) ... (t, m), in order; lanes outside [r0-kB, r1-kB) are masked;
- the entry input is a plain ``(R, B)`` BlockSpec whose *index map reads a
  scalar-prefetched per-step block id* — XLA's pipelining double-buffers
  the HBM->VMEM fetches (the reference's cooperative shared-memory staging);
  a boundary block shared by two tiles is two consecutive steps with the
  same id (no re-fetch);
- per-tile outputs (color / transmittance / rendered-count, stored tiled
  as ``[num_tiles, ...]``) use a prefetched ``step -> tile`` map; the steps
  of one tile are consecutive, so the revisited output block stays in VMEM
  and carries the blend state across windows;
- the backward writes per-entry gradient rows back at the *sorted*
  positions (same BlockSpec, boundary blocks accumulated across their two
  steps), and the pipeline reduces them per point with a deterministic
  stable sort by point id + tiled prefix sums — no atomics
  (SURVEY.md section 7);
- the backward traverses in forward order using the saved forward image
  (see :mod:`gausplat_tpu.ops.blend`), so no reverse pass is needed.

Versus the round-1 block-aligned design this removes the aligned entry
copy entirely (at 1M points / 1080p: two multi-megabyte random gathers and
a 1.5x-inflated gradient array + reduction sort).

Entry rows are f32 ``[9, cap]`` or packed bf16-pair int32 ``[6, cap]``
(``RenderOptions(entry_dtype="bf16")``; see blend.pack_pair) — positions
stay f32 in both.

Whole-tile early exit is preserved as a compute skip once every pixel of
the tile is done.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..constants import TILE_SIZE_X, TILE_SIZE_Y
from .binning import spans_to_sources
from .prefix import prefix_sum
from .blend import (
    ENTRY_ROWS_F32,
    ENTRY_ROWS_PACKED,
    BackwardState,
    ForwardState,
    backward_batch,
    entries_from_rows,
    forward_batch,
    grads_to_rows,
)

try:  # pallas TPU backend is unavailable on some hosts; fall back to XLA.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

PIXELS_PER_TILE = TILE_SIZE_X * TILE_SIZE_Y  # 256

#: Default entries per window (the reference stages 256 = one per thread).
DEFAULT_BLOCK_SIZE = 256

#: Blend sub-batch length inside a window. The in-batch prefix products /
#: sums cost O(log2(batch)) vector ops per (entry, pixel) pair; chaining
#: short sub-batches through the carried state trades that log factor for
#: a few [1, 256] state updates per group. 0 = whole-window batches.
import os as _os

BLEND_GROUP = int(_os.environ.get("GAUSPLAT_BLEND_GROUP", "0"))

#: Group-skip blending (Pallas kernels only, needs BLEND_GROUP): process
#: each window as BLEND_GROUP-entry sub-groups chained through the VMEM
#: state refs, and *skip* a group entirely when it lies outside the step's
#: valid lane window [lo, hi) (forward + backward), is beyond every pixel's
#: forward rendered count (backward), or every pixel is already done
#: (forward). Exact: skipped groups are all-masked no-ops by construction.
#: Attacks the ~1.53x boundary-window lane waste (PERF.md roofline) and
#: shrinks the in-batch prefix log factor from log2(B) to log2(group).
#: Off by default pending an on-chip full-chain A/B (plain grouping was
#: refuted in round 2 — the state ref round-trips defeated pipelining —
#: but the skip predicates change the tradeoff).
GROUP_SKIP = int(_os.environ.get("GAUSPLAT_GROUP_SKIP", "0"))


def _group_size(block_size: int) -> int:
    """The active sub-group length for group-skip kernels (0 = disabled)."""
    g = BLEND_GROUP if GROUP_SKIP else 0
    if g and block_size % g == 0 and block_size > g:
        return g
    return 0


def _blend_forward(state, entries, pix_x, pix_y, base_pos, mask):
    b = entries.opacity.shape[0]
    g = BLEND_GROUP
    if not g or b % g or b <= g:
        return forward_batch(state, entries, pix_x, pix_y, base_pos, mask)
    for s in range(0, b, g):
        sub = jax.tree_util.tree_map(lambda f: f[s : s + g], entries)
        state = forward_batch(
            state, sub, pix_x, pix_y, base_pos + s,
            None if mask is None else mask[s : s + g],
        )
    return state


def _blend_backward(
    state, entries, pix_x, pix_y, base_pos, grad, gdotc, counts, mask
):
    b = entries.opacity.shape[0]
    g = BLEND_GROUP
    if not g or b % g or b <= g:
        return backward_batch(
            state, entries, pix_x, pix_y, base_pos, grad, gdotc, counts, mask
        )
    parts = []
    for s in range(0, b, g):
        sub = jax.tree_util.tree_map(lambda f: f[s : s + g], entries)
        state, grads = backward_batch(
            state, sub, pix_x, pix_y, base_pos + s, grad, gdotc, counts,
            None if mask is None else mask[s : s + g],
        )
        parts.append(grads)
    grads = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *parts
    )
    return state, grads


def entry_rows(packed: bool) -> int:
    return ENTRY_ROWS_PACKED if packed else ENTRY_ROWS_F32


class EntryStream(NamedTuple):
    """The sorted entry array + (tile, window) step metadata.

    The Pallas kernels prefetch the hybrid compact form: per-step
    ``step_tile`` and ``step_block`` (direct lookups keep the BlockSpec
    index maps trivial — deriving the block id arithmetically in the index
    maps measured ~1 us/step slower) plus the per-TILE ``tile_r0 / tile_r1
    / tile_cum0`` and the 2-scalar ``meta``, from which the kernel derives
    each step's window. SMEM is ``2 S + 3 T + 2`` words vs ``5 S`` for the
    naive five-per-step-array form, which exceeds the 1 MB SMEM budget
    near 8M-entry capacities. The XLA fallback scans the expanded per-step
    arrays.
    """

    entry_data: jax.Array  # [R, cap] per-entry point data in sorted order
    entry_point: jax.Array  # [cap] int32 source point (P = padding)
    step_tile: jax.Array  # [S] tile of each step (pads repeat the last real)
    step_block: jax.Array  # [S] block index into entry_data columns
    step_r0: jax.Array  # [S] tile segment start (0 on pad steps)
    step_r1: jax.Array  # [S] tile segment end (0 on pad steps)
    step_first: jax.Array  # [S] 1 iff the step is its tile's first
    tile_r0: jax.Array  # [T] segment starts
    tile_r1: jax.Array  # [T] segment ends
    tile_cum0: jax.Array  # [T] index of the tile's first step
    meta: jax.Array  # [2] (real step count, last real step's block id)
    block_size: int
    packed: bool


def pack_point_data(
    proj, opacities_outer: jax.Array, packed: bool = False
) -> jax.Array:
    """Pack per-point rasterization inputs into row layout [R, P + 1]
    (the last column is the zero padding point).

    ``proj``: a ProjectionOutput (structure-of-arrays components).
    ``opacities_outer``: [P] post-sigmoid opacities.
    """
    if not packed:
        rows = jnp.stack(
            [
                proj.color_r, proj.color_g, proj.color_b,
                proj.conic_xx, proj.conic_xy, proj.conic_yy,
                opacities_outer,
                proj.pos2d_x, proj.pos2d_y,
            ]
        ).astype(jnp.float32)
        return jnp.pad(rows, ((0, 0), (0, 1)))
    from .blend import _bits, pack_pair

    rows = jnp.stack(
        [
            pack_pair(proj.color_r, proj.color_g),
            pack_pair(proj.color_b, opacities_outer),
            pack_pair(proj.conic_xx, proj.conic_xy),
            pack_pair(proj.conic_yy, jnp.zeros_like(proj.conic_yy)),
            _bits(proj.pos2d_x.astype(jnp.float32)),
            _bits(proj.pos2d_y.astype(jnp.float32)),
        ]
    )
    return jnp.pad(rows, ((0, 0), (0, 1)))


def build_entry_stream(
    point_data: jax.Array,  # [R, P + 1] packed per-point data (pad col last)
    sorted_point_indices: jax.Array,  # [capacity] int32 (P = padding)
    tile_ranges: jax.Array,  # [num_tiles, 2]
    *,
    block_size: int = DEFAULT_BLOCK_SIZE,
    packed: bool = False,
) -> EntryStream:
    """Gather sorted per-entry data and derive the (tile, window) step list.

    Static step count: ``S = capacity // B + num_tiles`` (each nonempty tile
    adds at most one boundary-extra step; trailing slots are no-op pad
    steps). ``capacity`` must be a multiple of ``block_size``.
    """
    b = block_size
    capacity = sorted_point_indices.shape[0]
    assert capacity % b == 0, (capacity, b)
    num_tiles = tile_ranges.shape[0]
    s_max = capacity // b + num_tiles

    entry_data = point_data[:, sorted_point_indices]  # [R, cap]

    r0 = tile_ranges[:, 0].astype(jnp.int32)
    r1 = tile_ranges[:, 1].astype(jnp.int32)
    nonempty = r1 > r0
    first_blk = r0 // b
    last_blk = jnp.where(nonempty, (r1 - 1) // b, first_blk)
    steps_per_tile = jnp.where(nonempty, last_blk - first_blk + 1, 0).astype(
        jnp.int32
    )
    cum = prefix_sum(steps_per_tile)  # inclusive
    total_steps = cum[-1]

    sid = jnp.arange(s_max, dtype=jnp.int32)
    in_range = sid < total_steps
    tile_of_step = spans_to_sources(cum, s_max)
    k = sid - (cum[tile_of_step] - steps_per_tile[tile_of_step])
    sblk = first_blk[tile_of_step] + k

    # Pad steps repeat the last real step's (tile, block) with an empty
    # window (r0 = r1 = 0 -> all lanes masked): they revisit that tile's
    # output block without touching it, keeping the revisit chain
    # consecutive. Empty scene: everything clamps to (tile 0, block 0).
    last_sid = jnp.clip(total_steps - 1, 0, s_max - 1)
    lrt = jnp.where(total_steps > 0, tile_of_step[last_sid], 0)
    lrb = jnp.where(
        total_steps > 0, first_blk[lrt] + (last_sid - (cum[lrt] - steps_per_tile[lrt])), 0
    )
    step_tile = jnp.where(in_range, tile_of_step, lrt)
    step_block = jnp.where(in_range, sblk, lrb)
    step_r0 = jnp.where(in_range, r0[tile_of_step], 0)
    step_r1 = jnp.where(in_range, r1[tile_of_step], 0)
    step_first = (in_range & (k == 0)).astype(jnp.int32)

    return EntryStream(
        entry_data=entry_data,
        entry_point=sorted_point_indices,
        step_tile=step_tile.astype(jnp.int32),
        step_block=step_block.astype(jnp.int32),
        step_r0=step_r0,
        step_r1=step_r1,
        step_first=step_first,
        tile_r0=r0,
        tile_r1=r1,
        tile_cum0=(cum - steps_per_tile).astype(jnp.int32),
        meta=jnp.stack([total_steps.astype(jnp.int32), lrb.astype(jnp.int32)]),
        block_size=b,
        packed=packed,
    )


def _pixel_coords(tile_index, tile_count_x):
    """Flat pixel coordinates [1, 256] for a tile (row-major y-major,
    matching local_invocation_index = ly * 16 + lx)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PIXELS_PER_TILE), 1)
    tile_x = tile_index % tile_count_x
    tile_y = tile_index // tile_count_x
    pix_x = (tile_x * TILE_SIZE_X + lane % TILE_SIZE_X).astype(jnp.float32)
    pix_y = (tile_y * TILE_SIZE_Y + lane // TILE_SIZE_X).astype(jnp.float32)
    return pix_x, pix_y


def _window(sblk, r0, r1, block_size):
    """Per-step lane window: (entry mask [B, 1], base_position scalar)."""
    base = sblk * block_size
    lo = jnp.maximum(r0 - base, 0)
    hi = jnp.minimum(r1 - base, block_size)
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_size, 1), 0)
    mask = (lane >= lo) & (lane < hi)
    return mask, base - r0, lo, hi


# --- Pallas forward -----------------------------------------------------------
#
# Scalar prefetch is the compact form (see EntryStream): per-step tile id
# plus per-tile r0/r1/first-step-index and the (step count, last block)
# meta pair; each step's entry-block id and lane window are derived
# arithmetically both here and in the BlockSpec index maps. Pad steps
# (i >= meta[0]) revisit the last real step's block with all compute
# skipped, keeping the output revisit chains consecutive.


def _forward_kernel(
    tile_ref,  # scalar prefetch: [S] step -> tile
    sblk_ref,  # scalar prefetch: [S] step -> entry block (pads clamped)
    r0t_ref,  # scalar prefetch: [T] tile -> segment start
    r1t_ref,  # scalar prefetch: [T] tile -> segment end
    cum0_ref,  # scalar prefetch: [T] tile -> its first step index
    meta_ref,  # scalar prefetch: [2] (real step count, last real block)
    entry_ref,  # [R, B] VMEM
    image_ref,  # [3, 256] VMEM out (revisited per tile)
    trans_ref,  # [1, 256] VMEM out
    count_ref,  # [1, 256] int32 VMEM out
    done_ref,  # [1, 256] int32 scratch
    *,
    block_size: int,
    tile_count_x: int,
    packed: bool,
):
    i = pl.program_id(0)
    t = tile_ref[i]
    real = i < meta_ref[0]

    @pl.when(real & (i == cum0_ref[t]))
    def _():
        image_ref[...] = jnp.zeros_like(image_ref)
        trans_ref[...] = jnp.ones_like(trans_ref)
        count_ref[...] = jnp.zeros_like(count_ref)
        done_ref[...] = jnp.zeros_like(done_ref)

    mask, base_pos, lo, hi = _window(
        sblk_ref[i], r0t_ref[t], r1t_ref[t], block_size
    )
    skip = jnp.logical_not(real) | jnp.all(done_ref[...] > 0) | (hi <= lo)

    @pl.when(jnp.logical_not(skip))
    def _():
        entries = entries_from_rows(entry_ref[...], packed)
        pix_x, pix_y = _pixel_coords(tile_ref[i], tile_count_x)

        # Mosaic note: the [3, 256] color block sits in a (4, 128)-tiled
        # memref whose sublane extent (3) is unaligned, so refs here may
        # only be read/written full-width ([...]); partial subscripts
        # (ref[:, sl]) lower to memref_slice and fail to compile on real
        # TPU. Sub-tile paths slice *values* and store full-width.
        def load_state():
            return ForwardState(
                color=image_ref[...],
                transmittance=trans_ref[...],
                done=done_ref[...] > 0,
                rendered_count=count_ref[...],
            )

        def store_state(new):
            image_ref[...] = new.color
            trans_ref[...] = new.transmittance
            count_ref[...] = new.rendered_count
            done_ref[...] = new.done.astype(jnp.int32)

        g = _group_size(block_size)
        if g:
            for s0 in range(0, block_size, g):
                active = (
                    (lo < s0 + g)
                    & (hi > s0)
                    & jnp.logical_not(jnp.all(done_ref[...] > 0))
                )

                @pl.when(active)
                def _(s0=s0):
                    sub = jax.tree_util.tree_map(
                        lambda f: f[s0 : s0 + g], entries
                    )
                    new = forward_batch(
                        load_state(), sub, pix_x, pix_y, base_pos + s0,
                        mask[s0 : s0 + g],
                    )
                    store_state(new)
        else:
            # Sub-tile (pixel-axis) done-masking was tried here and
            # removed: slicing the [., 256] state to 128-lane halves —
            # as values or refs — hits Mosaic lowering limits on real TPU
            # hardware (memref_slice sublane alignment, no
            # dynamic_update_slice, "invalid input layout" for lane-offset
            # value slices), and the sub-tile pair accounting
            # (scripts/prof_subtile.py) had already shown the lever is a
            # wash. Whole-tile early exit (the `skip` predicate) plus
            # entry-axis group-skip are the supported compute cuts.
            store_state(
                _blend_forward(
                    load_state(), entries, pix_x, pix_y, base_pos, mask
                )
            )


def rasterize_forward_pallas(
    stream: EntryStream,
    *,
    num_tiles: int,
    tile_count_x: int,
    interpret: bool = False,
):
    """Returns (image_tiles [T,3,256], trans_tiles [T,256], count_tiles
    [T,256]). Tiles with no steps (empty segments) are left uninitialized —
    the pipeline masks them via the tile ranges."""
    b = stream.block_size
    s = stream.step_tile.shape[0]
    rows = stream.entry_data.shape[0]

    def entry_index(i, tile, sblk, r0t, r1t, cum0, meta):
        return (0, sblk[i])

    def tile_index(i, tile, sblk, r0t, r1t, cum0, meta):
        return (tile[i], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(s,),
        in_specs=[pl.BlockSpec((rows, b), entry_index)],
        out_specs=[
            pl.BlockSpec((1, 3, PIXELS_PER_TILE), tile_index),
            pl.BlockSpec((1, 1, PIXELS_PER_TILE), tile_index),
            pl.BlockSpec((1, 1, PIXELS_PER_TILE), tile_index),
        ],
        scratch_shapes=[pltpu.VMEM((1, PIXELS_PER_TILE), jnp.int32)],
    )

    def kernel(tile, sblk, r0t, r1t, cum0, meta, entry, image, trans,
               count, done):
        # The tiled output blocks carry a leading singleton dim; present the
        # kernel math with [3, 256] / [1, 256] views.
        _forward_kernel(
            tile, sblk, r0t, r1t, cum0, meta,
            entry,
            image.at[0],
            trans.at[0],
            count.at[0],
            done,
            block_size=b,
            tile_count_x=tile_count_x,
            packed=stream.packed,
        )

    image_tiles, trans_tiles, count_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, PIXELS_PER_TILE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, PIXELS_PER_TILE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, PIXELS_PER_TILE), jnp.int32),
        ],
        interpret=interpret,
    )(
        stream.step_tile,
        stream.step_block,
        stream.tile_r0,
        stream.tile_r1,
        stream.tile_cum0,
        stream.meta,
        stream.entry_data,
    )
    return image_tiles, trans_tiles[:, 0, :], count_tiles[:, 0, :]


# --- Pallas backward ----------------------------------------------------------


def _backward_kernel(
    tile_ref,  # scalar prefetch: [S] step -> tile
    sblk_ref,  # scalar prefetch: [S] step -> entry block (pads clamped)
    r0t_ref,  # scalar prefetch: [T] tile -> segment start
    r1t_ref,  # scalar prefetch: [T] tile -> segment end
    cum0_ref,  # scalar prefetch: [T] tile -> its first step index
    meta_ref,  # scalar prefetch: [2] (real step count, last real block)
    entry_ref,  # [R, B]
    grad_ref,  # [3, 256] upstream pixel-color grad for the tile
    gdotc_ref,  # [1, 256] <g, C_final> for the tile
    count_ref,  # [1, 256] int32 forward rendered counts
    out_ref,  # [R, B] per-entry grads at sorted positions
    trans_ref,  # [1, 256] f32 scratch (running transmittance)
    prefix_ref,  # [1, 256] f32 scratch (<g, prefix color>)
    *,
    block_size: int,
    tile_count_x: int,
    packed: bool,
):
    i = pl.program_id(0)
    t = tile_ref[i]
    real = i < meta_ref[0]

    @pl.when(real & (i == cum0_ref[t]))
    def _():
        trans_ref[...] = jnp.ones_like(trans_ref)
        prefix_ref[...] = jnp.zeros_like(prefix_ref)

    # A boundary block is written by the steps of each tile it spans; zero
    # it on first visit, then merge each step's lane window into it.
    prev = sblk_ref[jnp.maximum(i - 1, 0)]
    binit = (i == 0) | (sblk_ref[i] != prev)

    @pl.when(binit)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    mask, base_pos, lo, hi = _window(
        sblk_ref[i], r0t_ref[t], r1t_ref[t], block_size
    )
    # Skip empty windows, and windows entirely beyond every pixel's forward
    # rendered count (nothing in them was blended — the reference's
    # per-pixel skip at rasterize_backward/kernel.wgsl:151-156, lifted to
    # window granularity). Their grads stay zero from the binit clear.
    skip = (
        jnp.logical_not(real)
        | (hi <= lo)
        | (base_pos + lo >= jnp.max(count_ref[...]))
    )

    @pl.when(jnp.logical_not(skip))
    def _():
        entries = entries_from_rows(entry_ref[...], packed)
        pix_x, pix_y = _pixel_coords(tile_ref[i], tile_count_x)

        g = _group_size(block_size)
        if g:
            # Per-group refinement of the window-level count cut: groups
            # wholly beyond every pixel's rendered count contribute zero
            # grads (their columns keep the binit zeros), exactly.
            maxcnt = jnp.max(count_ref[...])
            for s0 in range(0, block_size, g):
                active = (
                    (lo < s0 + g) & (hi > s0) & (base_pos + s0 < maxcnt)
                )

                @pl.when(active)
                def _(s0=s0):
                    sub = jax.tree_util.tree_map(
                        lambda f: f[s0 : s0 + g], entries
                    )
                    state = BackwardState(
                        transmittance=trans_ref[...],
                        grad_prefix=prefix_ref[...],
                    )
                    new_state, grads = backward_batch(
                        state, sub, pix_x, pix_y, base_pos + s0,
                        grad_ref[...], gdotc_ref[...], count_ref[...],
                        mask[s0 : s0 + g],
                    )
                    trans_ref[...] = new_state.transmittance
                    prefix_ref[...] = new_state.grad_prefix
                    # Full-width read-modify-write: out_ref's sublane
                    # extent (9 or 6 rows) is tiling-unaligned, so partial
                    # lane stores (out_ref[:, s0:s0+g]) fail Mosaic
                    # compilation; pad the group's rows to block width and
                    # merge under a lane mask instead.
                    rows_g = grads_to_rows(grads, packed)
                    rows_full = jnp.pad(
                        rows_g, ((0, 0), (s0, block_size - s0 - g))
                    )
                    lane_row = jax.lax.broadcasted_iota(
                        jnp.int32, (1, block_size), 1
                    )
                    sel = (lane_row >= jnp.maximum(lo, s0)) & (
                        lane_row < jnp.minimum(hi, s0 + g)
                    )
                    out_ref[...] = jnp.where(sel, rows_full, out_ref[...])
            return

        state = BackwardState(
            transmittance=trans_ref[...], grad_prefix=prefix_ref[...]
        )
        new_state, grads = _blend_backward(
            state,
            entries,
            pix_x,
            pix_y,
            base_pos,
            grad_ref[...],
            gdotc_ref[...],
            count_ref[...],
            mask,
        )
        trans_ref[...] = new_state.transmittance
        prefix_ref[...] = new_state.grad_prefix
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, block_size), 1)
        mask_row = (lane_row >= lo) & (lane_row < hi)
        out_ref[...] = jnp.where(
            mask_row, grads_to_rows(grads, packed), out_ref[...]
        )


def rasterize_backward_pallas(
    stream: EntryStream,
    grad_tiles: jax.Array,  # [T, 3, 256]
    gdotc_tiles: jax.Array,  # [T, 256]
    count_tiles: jax.Array,  # [T, 256] int32
    *,
    tile_count_x: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns per-entry gradient rows [R, cap] at the sorted positions.
    Positions not covered by any tile segment (padding) are undefined — the
    pipeline masks them by the valid entry count."""
    b = stream.block_size
    s = stream.step_tile.shape[0]
    rows = stream.entry_data.shape[0]
    capacity = stream.entry_data.shape[1]
    out_dtype = jnp.int32 if stream.packed else jnp.float32

    def entry_index(i, tile, sblk, r0t, r1t, cum0, meta):
        return (0, sblk[i])

    def tile_index(i, tile, sblk, r0t, r1t, cum0, meta):
        return (tile[i], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((rows, b), entry_index),
            pl.BlockSpec((1, 3, PIXELS_PER_TILE), tile_index),
            pl.BlockSpec((1, 1, PIXELS_PER_TILE), tile_index),
            pl.BlockSpec((1, 1, PIXELS_PER_TILE), tile_index),
        ],
        out_specs=pl.BlockSpec((rows, b), entry_index),
        scratch_shapes=[
            pltpu.VMEM((1, PIXELS_PER_TILE), jnp.float32),
            pltpu.VMEM((1, PIXELS_PER_TILE), jnp.float32),
        ],
    )

    def kernel(tile, sblk, r0t, r1t, cum0, meta, entry, grad, gdotc,
               count, out, trans, prefix):
        _backward_kernel(
            tile, sblk, r0t, r1t, cum0, meta,
            entry,
            grad.at[0],
            gdotc.at[0],
            count.at[0],
            out,
            trans,
            prefix,
            block_size=b,
            tile_count_x=tile_count_x,
            packed=stream.packed,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, capacity), out_dtype),
        interpret=interpret,
    )(
        stream.step_tile,
        stream.step_block,
        stream.tile_r0,
        stream.tile_r1,
        stream.tile_cum0,
        stream.meta,
        stream.entry_data,
        grad_tiles,
        gdotc_tiles[:, None, :],
        count_tiles[:, None, :],
    )


# --- XLA fallback (lax.scan over steps; oracle + non-TPU hosts) -----------------


def _match_vma(tree, ref):
    """Tag ``tree`` as varying over the same manual axes as ``ref`` (no-op
    outside shard_map). Needed so lax.scan carries type-check under
    shard_map's varying-manual-axes tracking."""
    try:
        vma = tuple(jax.typeof(ref).vma)
    except AttributeError:  # pragma: no cover - older jax
        return tree
    if not vma:
        return tree
    return jax.tree_util.tree_map(lambda x: jax.lax.pvary(x, vma), tree)


def rasterize_forward_xla(
    stream: EntryStream, *, num_tiles: int, tile_count_x: int
):
    b = stream.block_size
    rows = stream.entry_data.shape[0]

    init = _match_vma(
        (
            jnp.zeros((num_tiles, 3, PIXELS_PER_TILE), jnp.float32),
            jnp.ones((num_tiles, PIXELS_PER_TILE), jnp.float32),
            jnp.zeros((num_tiles, PIXELS_PER_TILE), jnp.bool_),
            jnp.zeros((num_tiles, PIXELS_PER_TILE), jnp.int32),
        ),
        stream.entry_data,
    )

    def step(carry, xs):
        image, trans, done, count = carry
        tile, sblk, r0, r1, first = xs
        blk = jax.lax.dynamic_slice(
            stream.entry_data, (0, sblk * b), (rows, b)
        )
        entries = entries_from_rows(blk, stream.packed)
        pix_x, pix_y = _pixel_coords(tile, tile_count_x)
        state = ForwardState(
            color=jax.lax.dynamic_slice(image, (tile, 0, 0), (1, 3, PIXELS_PER_TILE))[0],
            transmittance=jax.lax.dynamic_slice(trans, (tile, 0), (1, PIXELS_PER_TILE)),
            done=jax.lax.dynamic_slice(done, (tile, 0), (1, PIXELS_PER_TILE)),
            rendered_count=jax.lax.dynamic_slice(count, (tile, 0), (1, PIXELS_PER_TILE)),
        )
        # Reset at the first step of a tile (steps visit tiles in order).
        is_first = first == 1
        state = ForwardState(
            color=jnp.where(is_first, 0.0, state.color),
            transmittance=jnp.where(is_first, 1.0, state.transmittance),
            done=jnp.where(is_first, False, state.done),
            rendered_count=jnp.where(is_first, 0, state.rendered_count),
        )
        mask, base_pos, _, _ = _window(sblk, r0, r1, b)
        new = forward_batch(state, entries, pix_x, pix_y, base_pos, mask)
        image = jax.lax.dynamic_update_slice(image, new.color[None], (tile, 0, 0))
        trans = jax.lax.dynamic_update_slice(trans, new.transmittance, (tile, 0))
        done = jax.lax.dynamic_update_slice(done, new.done, (tile, 0))
        count = jax.lax.dynamic_update_slice(count, new.rendered_count, (tile, 0))
        return (image, trans, done, count), None

    (image, trans, _, count), _ = jax.lax.scan(
        step,
        init,
        (stream.step_tile, stream.step_block, stream.step_r0,
         stream.step_r1, stream.step_first),
    )
    return image, trans, count


def rasterize_backward_xla(
    stream: EntryStream,
    grad_tiles: jax.Array,
    gdotc_tiles: jax.Array,
    count_tiles: jax.Array,
    *,
    tile_count_x: int,
) -> jax.Array:
    b = stream.block_size
    rows = stream.entry_data.shape[0]
    capacity = stream.entry_data.shape[1]
    out_dtype = jnp.int32 if stream.packed else jnp.float32

    init = _match_vma(
        (
            jnp.ones((grad_tiles.shape[0], PIXELS_PER_TILE), jnp.float32),
            jnp.zeros((grad_tiles.shape[0], PIXELS_PER_TILE), jnp.float32),
            jnp.zeros((rows, capacity), out_dtype),
        ),
        grad_tiles,
    )

    def step(carry, xs):
        trans, prefix, gradbuf = carry
        tile, sblk, r0, r1, first = xs
        blk = jax.lax.dynamic_slice(
            stream.entry_data, (0, sblk * b), (rows, b)
        )
        entries = entries_from_rows(blk, stream.packed)
        pix_x, pix_y = _pixel_coords(tile, tile_count_x)
        is_first = first == 1
        state = BackwardState(
            transmittance=jnp.where(
                is_first,
                1.0,
                jax.lax.dynamic_slice(trans, (tile, 0), (1, PIXELS_PER_TILE)),
            ),
            grad_prefix=jnp.where(
                is_first,
                0.0,
                jax.lax.dynamic_slice(prefix, (tile, 0), (1, PIXELS_PER_TILE)),
            ),
        )
        g = jax.lax.dynamic_slice(
            grad_tiles, (tile, 0, 0), (1, 3, PIXELS_PER_TILE)
        )[0]
        gdotc = jax.lax.dynamic_slice(gdotc_tiles, (tile, 0), (1, PIXELS_PER_TILE))
        cnt = jax.lax.dynamic_slice(count_tiles, (tile, 0), (1, PIXELS_PER_TILE))
        mask, base_pos, lo, hi = _window(sblk, r0, r1, b)
        new_state, grads = backward_batch(
            state, entries, pix_x, pix_y, base_pos, g, gdotc, cnt, mask
        )
        trans = jax.lax.dynamic_update_slice(
            trans, new_state.transmittance, (tile, 0)
        )
        prefix = jax.lax.dynamic_update_slice(
            prefix, new_state.grad_prefix, (tile, 0)
        )
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        mask_row = (lane_row >= lo) & (lane_row < hi)
        cur = jax.lax.dynamic_slice(gradbuf, (0, sblk * b), (rows, b))
        merged = jnp.where(mask_row, grads_to_rows(grads, stream.packed), cur)
        gradbuf = jax.lax.dynamic_update_slice(gradbuf, merged, (0, sblk * b))
        return (trans, prefix, gradbuf), None

    (_, _, gradbuf), _ = jax.lax.scan(
        step,
        init,
        (stream.step_tile, stream.step_block, stream.step_r0,
         stream.step_r1, stream.step_first),
    )
    return gradbuf


# --- tiled <-> image layout helpers --------------------------------------------


def mask_empty_tiles(image_tiles, trans_tiles, count_tiles, tile_ranges):
    """Force empty tiles (never visited by any step) to the initial state.

    The Pallas kernels only write output blocks their steps visit; a tile
    with an empty segment is all background by definition.
    """
    empty = tile_ranges[:, 0] >= tile_ranges[:, 1]
    return (
        jnp.where(empty[:, None, None], 0.0, image_tiles),
        jnp.where(empty[:, None], 1.0, trans_tiles),
        jnp.where(empty[:, None], 0, count_tiles),
    )


def untile_image(image_tiles: jax.Array, tile_count_x: int, tile_count_y: int,
                 image_width: int, image_height: int) -> jax.Array:
    """[T, 3, 256] tiled layout -> [H, W, 3] image (cropped)."""
    img = image_tiles.reshape(
        tile_count_y, tile_count_x, 3, TILE_SIZE_Y, TILE_SIZE_X
    )
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        tile_count_y * TILE_SIZE_Y, tile_count_x * TILE_SIZE_X, 3
    )
    return img[:image_height, :image_width, :]


def untile_map(tiles: jax.Array, tile_count_x: int, tile_count_y: int,
               image_width: int, image_height: int) -> jax.Array:
    """[T, 256] tiled layout -> [H, W] map (cropped)."""
    m = tiles.reshape(tile_count_y, tile_count_x, TILE_SIZE_Y, TILE_SIZE_X)
    m = m.transpose(0, 2, 1, 3).reshape(
        tile_count_y * TILE_SIZE_Y, tile_count_x * TILE_SIZE_X
    )
    return m[:image_height, :image_width]


def tile_image(image: jax.Array, tile_count_x: int, tile_count_y: int) -> jax.Array:
    """[H, W, 3] image -> [T, 3, 256] tiled layout (zero-padded)."""
    h, w = image.shape[0], image.shape[1]
    ph = tile_count_y * TILE_SIZE_Y
    pw = tile_count_x * TILE_SIZE_X
    padded = jnp.pad(image, ((0, ph - h), (0, pw - w), (0, 0)))
    t = padded.reshape(tile_count_y, TILE_SIZE_Y, tile_count_x, TILE_SIZE_X, 3)
    return t.transpose(0, 2, 4, 1, 3).reshape(
        tile_count_y * tile_count_x, 3, PIXELS_PER_TILE
    )
