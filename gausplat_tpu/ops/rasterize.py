"""Tile rasterization: Pallas TPU kernels + XLA fallback.

Parity targets:
- forward: .../jit/kernel/rasterize/kernel.wgsl:60-221 (1 workgroup = 1
  16x16 tile, shared-memory point batches, per-pixel front-to-back blend,
  whole-tile early exit)
- backward: .../jit/kernel/rasterize_backward/kernel.wgsl:71-274
  (back-to-front replay + atomicAdd gradient accumulation)

TPU-native design:

The sorted (tile, depth) entry list is re-packed into **block-aligned tile
segments**: every tile's entries start at a multiple of the batch size ``B``
and each tile owns at least one block (empty tiles get a block of padding so
their outputs are still initialized). This turns the reference's dynamic
per-tile ranges + indirect dispatch into a *static 1-D Pallas grid over
blocks*, where

- the entry input is a plain ``(B, 9)`` BlockSpec (auto double-buffered
  HBM->VMEM pipelining — the reference's cooperative shared-memory staging);
- per-tile outputs (color / transmittance / rendered-count, stored tiled as
  ``[num_tiles, ...]``) use a scalar-prefetched ``block -> tile`` map in
  their index maps; consecutive blocks of one tile revisit the same output
  block in VMEM, which carries the blend state across batches;
- gradients are written per *entry* and reduced deterministically (a
  payload-carrying sort into point-grouped order + tiled prefix sums —
  see the pipeline backward) instead of atomics (SURVEY.md section 7);
- the backward traverses in forward order using the saved forward image
  (see :mod:`gausplat_tpu.ops.blend`), so no reverse pass is needed.

Whole-tile early exit is preserved as a compute skip once every pixel of the
tile is done.
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
    ENTRY_COLUMNS,
    BackwardState,
    EntryBlock,
    ForwardState,
    backward_batch,
    forward_batch,
)

try:  # pallas TPU backend is unavailable on some hosts; fall back to XLA.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

PIXELS_PER_TILE = TILE_SIZE_X * TILE_SIZE_Y  # 256

#: Default points per batch (the reference stages 256 = one per thread).
DEFAULT_BLOCK_SIZE = 256


class TileBlocks(NamedTuple):
    """Block-aligned tile segments of the sorted entry list.

    ``entry_data`` is stored transposed ([9, NB * B], components on the
    leading axis): under TPU (8, 128) tiling a ``[N, 9]`` layout pads the
    trailing dim to 128 lanes (14x HBM blowup at production entry counts),
    while ``[9, N]`` pads only 9 -> 16 sublanes.
    """

    entry_data: jax.Array  # [9, NB * B] packed per-entry point data
    entry_point: jax.Array  # [NB * B] int32 source point (P = padding)
    entry_unsorted: jax.Array  # [NB * B] int32 pre-sort slot (>=cap = padding)
    tile_of_block: jax.Array  # [NB] int32
    block_pos: jax.Array  # [NB] int32 position of block within its tile
    block_valid: jax.Array  # [NB] int32 count of real entries in the block
    block_size: int


def build_tile_blocks(
    point_data: jax.Array,  # [9, P + 1] packed per-point data (pad row last)
    sorted_point_indices: jax.Array,  # [capacity] int32 (P = padding)
    tile_ranges: jax.Array,  # [num_tiles, 2]
    sorted_entry_ids: jax.Array | None = None,  # [capacity] pre-sort slots
    *,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> TileBlocks:
    """Gather sorted entries into block-aligned tile segments.

    Static output size: ``NB = capacity // B + num_tiles`` blocks (each tile
    rounds its entry count up to a multiple of ``B``, minimum one block).
    """
    b = block_size
    p = point_data.shape[1] - 1
    capacity = sorted_point_indices.shape[0]
    num_tiles = tile_ranges.shape[0]
    nb_max = capacity // b + num_tiles

    counts = tile_ranges[:, 1] - tile_ranges[:, 0]
    blocks_per_tile = jnp.maximum((counts + b - 1) // b, 1)
    blk_end = prefix_sum(blocks_per_tile)
    blk_start = blk_end - blocks_per_tile
    total_blocks = blk_end[-1]

    block_ids = jnp.arange(nb_max, dtype=jnp.int32)
    in_range = block_ids < total_blocks
    tile_of_block = spans_to_sources(blk_end.astype(jnp.int32), nb_max)
    # Trailing unused blocks: attach to the last tile at a non-zero position
    # so they never reset (or corrupt) live tile state.
    tile_of_block = jnp.where(in_range, tile_of_block, num_tiles - 1)
    block_pos = jnp.where(
        in_range, block_ids - blk_start[tile_of_block], jnp.int32(2**30)
    )

    block_valid = jnp.where(
        in_range,
        jnp.clip(counts[tile_of_block] - block_pos * b, 0, b),
        0,
    ).astype(jnp.int32)

    # Per-entry quantities derive from per-block ones by broadcast (indices
    # slot // B are contiguous runs — never pay for a random gather here).
    def per_entry(block_arr):
        return jnp.broadcast_to(block_arr[:, None], (nb_max, b)).reshape(-1)

    lane = jnp.tile(jnp.arange(b, dtype=jnp.int32), nb_max)
    entry_ids = jnp.arange(nb_max * b, dtype=jnp.int32)
    src = per_entry(tile_ranges[tile_of_block, 0] + block_pos * b) + lane
    valid = lane < per_entry(block_valid)
    src_clipped = jnp.clip(src, 0, capacity - 1)
    if sorted_entry_ids is None:
        entry_point = jnp.where(
            valid, sorted_point_indices[src_clipped], jnp.int32(p)
        )
        entry_unsorted = jnp.where(valid, src_clipped, capacity + entry_ids)
    else:
        # One 2-row gather for (point id, pre-sort slot) per aligned entry.
        looked = jnp.stack([sorted_point_indices, sorted_entry_ids])[
            :, src_clipped
        ]
        entry_point = jnp.where(valid, looked[0], jnp.int32(p))
        # Pre-sort slot per aligned entry; unique out-of-range pad values.
        entry_unsorted = jnp.where(valid, looked[1], capacity + entry_ids)

    entry_data = point_data[:, entry_point]  # [9, NB * B]

    return TileBlocks(
        entry_data=entry_data,
        entry_point=entry_point,
        entry_unsorted=entry_unsorted,
        tile_of_block=tile_of_block,
        block_pos=block_pos,
        block_valid=block_valid,
        block_size=b,
    )


def pack_point_data(proj, opacities_outer: jax.Array) -> jax.Array:
    """Pack per-point rasterization inputs into transposed [9, P + 1] rows
    (canonical component order; the last column is the zero padding point).

    ``proj``: a ProjectionOutput (structure-of-arrays components).
    ``opacities_outer``: [P] post-sigmoid opacities.
    """
    rows = jnp.stack(
        [
            proj.color_r, proj.color_g, proj.color_b,
            proj.conic_xx, proj.conic_xy, proj.conic_yy,
            opacities_outer,
            proj.pos2d_x, proj.pos2d_y,
        ]
    ).astype(jnp.float32)
    return jnp.pad(rows, ((0, 0), (0, 1)))


def _pixel_coords(tile_index, tile_count_x):
    """Flat pixel coordinates [1, 256] for a tile (row-major y-major,
    matching local_invocation_index = ly * 16 + lx)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PIXELS_PER_TILE), 1)
    tile_x = tile_index % tile_count_x
    tile_y = tile_index // tile_count_x
    pix_x = (tile_x * TILE_SIZE_X + lane % TILE_SIZE_X).astype(jnp.float32)
    pix_y = (tile_y * TILE_SIZE_Y + lane // TILE_SIZE_X).astype(jnp.float32)
    return pix_x, pix_y


# --- Pallas forward -----------------------------------------------------------


def _forward_kernel(
    tob_ref,  # scalar prefetch: [NB] block -> tile
    bpos_ref,  # scalar prefetch: [NB] block -> position in tile
    bval_ref,  # scalar prefetch: [NB] block -> valid-entry count
    entry_ref,  # [B, 9] VMEM
    image_ref,  # [3, 256] VMEM out (revisited per tile)
    trans_ref,  # [1, 256] VMEM out
    count_ref,  # [1, 256] int32 VMEM out
    done_ref,  # [1, 256] int32 scratch
    *,
    block_size: int,
    tile_count_x: int,
):
    i = pl.program_id(0)
    first = bpos_ref[i] == 0

    @pl.when(first)
    def _():
        image_ref[...] = jnp.zeros_like(image_ref)
        trans_ref[...] = jnp.ones_like(trans_ref)
        count_ref[...] = jnp.zeros_like(count_ref)
        done_ref[...] = jnp.zeros_like(done_ref)

    skip = jnp.all(done_ref[...] > 0) | (bval_ref[i] == 0)

    @pl.when(jnp.logical_not(skip))
    def _():
        entries = EntryBlock.from_rows(entry_ref[...].T)
        pix_x, pix_y = _pixel_coords(tob_ref[i], tile_count_x)
        state = ForwardState(
            color=image_ref[...],
            transmittance=trans_ref[...],
            done=done_ref[...] > 0,
            rendered_count=count_ref[...],
        )
        new = forward_batch(
            state, entries, pix_x, pix_y, bpos_ref[i] * block_size
        )
        image_ref[...] = new.color
        trans_ref[...] = new.transmittance
        count_ref[...] = new.rendered_count
        done_ref[...] = new.done.astype(jnp.int32)


def rasterize_forward_pallas(
    blocks: TileBlocks,
    *,
    num_tiles: int,
    tile_count_x: int,
    interpret: bool = False,
):
    """Returns (image_tiles [T,3,256], trans_tiles [T,256], count_tiles
    [T,256])."""
    b = blocks.block_size
    nb = blocks.tile_of_block.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ENTRY_COLUMNS, b), lambda i, tob, bpos, bval: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 3, PIXELS_PER_TILE), lambda i, tob, bpos, bval: (tob[i], 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, PIXELS_PER_TILE), lambda i, tob, bpos, bval: (tob[i], 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, PIXELS_PER_TILE), lambda i, tob, bpos, bval: (tob[i], 0, 0)
            ),
        ],
        scratch_shapes=[pltpu.VMEM((1, PIXELS_PER_TILE), jnp.int32)],
    )

    def kernel(tob, bpos, bval, entry, image, trans, count, done):
        # The tiled output blocks carry a leading singleton dim; present the
        # kernel math with [3, 256] / [1, 256] views.
        _forward_kernel(
            tob,
            bpos,
            bval,
            entry,
            image.at[0],
            trans.at[0],
            count.at[0],
            done,
            block_size=b,
            tile_count_x=tile_count_x,
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
        blocks.tile_of_block,
        blocks.block_pos,
        blocks.block_valid,
        blocks.entry_data,
    )
    return image_tiles, trans_tiles[:, 0, :], count_tiles[:, 0, :]


# --- Pallas backward ----------------------------------------------------------


def _backward_kernel(
    tob_ref,
    bpos_ref,
    bval_ref,
    entry_ref,  # [B, 9]
    grad_ref,  # [3, 256] upstream pixel-color grad for the tile
    gdotc_ref,  # [1, 256] <g, C_final> for the tile
    count_ref,  # [1, 256] int32 forward rendered counts
    out_ref,  # [B, 9] per-entry grads
    trans_ref,  # [1, 256] f32 scratch (running transmittance)
    prefix_ref,  # [1, 256] f32 scratch (<g, prefix color>)
    *,
    block_size: int,
    tile_count_x: int,
):
    i = pl.program_id(0)

    @pl.when(bpos_ref[i] == 0)
    def _():
        trans_ref[...] = jnp.ones_like(trans_ref)
        prefix_ref[...] = jnp.zeros_like(prefix_ref)

    # Skip empty blocks, and blocks entirely beyond every pixel's forward
    # rendered count (nothing in them was blended — the reference's
    # per-pixel skip at rasterize_backward/kernel.wgsl:151-156, lifted to
    # block granularity).
    base = bpos_ref[i] * block_size
    skip = (bval_ref[i] == 0) | (base >= jnp.max(count_ref[...]))

    @pl.when(skip)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(skip))
    def _():
        entries = EntryBlock.from_rows(entry_ref[...].T)
        pix_x, pix_y = _pixel_coords(tob_ref[i], tile_count_x)
        state = BackwardState(
            transmittance=trans_ref[...], grad_prefix=prefix_ref[...]
        )
        new_state, grads = backward_batch(
            state,
            entries,
            pix_x,
            pix_y,
            bpos_ref[i] * block_size,
            grad_ref[...],
            gdotc_ref[...],
            count_ref[...],
        )
        trans_ref[...] = new_state.transmittance
        prefix_ref[...] = new_state.grad_prefix
        out_ref[...] = jnp.concatenate(
            [grads.color, grads.conic, grads.opacity, grads.pos_2d], axis=-1
        ).T


def rasterize_backward_pallas(
    blocks: TileBlocks,
    grad_tiles: jax.Array,  # [T, 3, 256]
    gdotc_tiles: jax.Array,  # [T, 256]
    count_tiles: jax.Array,  # [T, 256] int32
    *,
    tile_count_x: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns per-entry gradients, transposed [9, NB * B]."""
    b = blocks.block_size
    nb = blocks.tile_of_block.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ENTRY_COLUMNS, b), lambda i, tob, bpos, bval: (0, i)),
            pl.BlockSpec(
                (1, 3, PIXELS_PER_TILE), lambda i, tob, bpos, bval: (tob[i], 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, PIXELS_PER_TILE), lambda i, tob, bpos, bval: (tob[i], 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, PIXELS_PER_TILE), lambda i, tob, bpos, bval: (tob[i], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (ENTRY_COLUMNS, b), lambda i, tob, bpos, bval: (0, i)
        ),
        scratch_shapes=[
            pltpu.VMEM((1, PIXELS_PER_TILE), jnp.float32),
            pltpu.VMEM((1, PIXELS_PER_TILE), jnp.float32),
        ],
    )

    def kernel(tob, bpos, bval, entry, grad, gdotc, count, out, trans, prefix):
        _backward_kernel(
            tob,
            bpos,
            bval,
            entry,
            grad.at[0],
            gdotc.at[0],
            count.at[0],
            out,
            trans,
            prefix,
            block_size=b,
            tile_count_x=tile_count_x,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ENTRY_COLUMNS, nb * b), jnp.float32),
        interpret=interpret,
    )(
        blocks.tile_of_block,
        blocks.block_pos,
        blocks.block_valid,
        blocks.entry_data,
        grad_tiles,
        gdotc_tiles[:, None, :],
        count_tiles[:, None, :],
    )


# --- XLA fallback (lax.scan over blocks; oracle + non-TPU hosts) ---------------


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


def rasterize_forward_xla(blocks: TileBlocks, *, num_tiles: int, tile_count_x: int):
    b = blocks.block_size
    nb = blocks.tile_of_block.shape[0]
    entry = blocks.entry_data.reshape(ENTRY_COLUMNS, nb, b).transpose(1, 2, 0)

    init = _match_vma(
        (
            jnp.zeros((num_tiles, 3, PIXELS_PER_TILE), jnp.float32),
            jnp.ones((num_tiles, PIXELS_PER_TILE), jnp.float32),
            jnp.zeros((num_tiles, PIXELS_PER_TILE), jnp.bool_),
            jnp.zeros((num_tiles, PIXELS_PER_TILE), jnp.int32),
        ),
        blocks.entry_data,
    )

    def step(carry, xs):
        image, trans, done, count = carry
        rows, tile, pos = xs
        entries = EntryBlock.from_rows(rows)
        pix_x, pix_y = _pixel_coords(tile, tile_count_x)
        state = ForwardState(
            color=jax.lax.dynamic_slice(image, (tile, 0, 0), (1, 3, PIXELS_PER_TILE))[0],
            transmittance=jax.lax.dynamic_slice(trans, (tile, 0), (1, PIXELS_PER_TILE)),
            done=jax.lax.dynamic_slice(done, (tile, 0), (1, PIXELS_PER_TILE)),
            rendered_count=jax.lax.dynamic_slice(count, (tile, 0), (1, PIXELS_PER_TILE)),
        )
        # Reset at the first block of a tile (the scan visits tiles in order).
        is_first = pos == 0
        state = ForwardState(
            color=jnp.where(is_first, 0.0, state.color),
            transmittance=jnp.where(is_first, 1.0, state.transmittance),
            done=jnp.where(is_first, False, state.done),
            rendered_count=jnp.where(is_first, 0, state.rendered_count),
        )
        new = forward_batch(state, entries, pix_x, pix_y, pos * b)
        image = jax.lax.dynamic_update_slice(image, new.color[None], (tile, 0, 0))
        trans = jax.lax.dynamic_update_slice(trans, new.transmittance, (tile, 0))
        done = jax.lax.dynamic_update_slice(done, new.done, (tile, 0))
        count = jax.lax.dynamic_update_slice(count, new.rendered_count, (tile, 0))
        return (image, trans, done, count), None

    (image, trans, _, count), _ = jax.lax.scan(
        step, init, (entry, blocks.tile_of_block, blocks.block_pos)
    )
    return image, trans, count


def rasterize_backward_xla(
    blocks: TileBlocks,
    grad_tiles: jax.Array,
    gdotc_tiles: jax.Array,
    count_tiles: jax.Array,
    *,
    tile_count_x: int,
) -> jax.Array:
    b = blocks.block_size
    nb = blocks.tile_of_block.shape[0]
    entry = blocks.entry_data.reshape(ENTRY_COLUMNS, nb, b).transpose(1, 2, 0)

    init = _match_vma(
        (
            jnp.ones((grad_tiles.shape[0], PIXELS_PER_TILE), jnp.float32),
            jnp.zeros((grad_tiles.shape[0], PIXELS_PER_TILE), jnp.float32),
        ),
        grad_tiles,
    )

    def step(carry, xs):
        trans, prefix = carry
        rows, tile, pos = xs
        entries = EntryBlock.from_rows(rows)
        pix_x, pix_y = _pixel_coords(tile, tile_count_x)
        is_first = pos == 0
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
        new_state, grads = backward_batch(
            state, entries, pix_x, pix_y, pos * b, g, gdotc, cnt
        )
        trans = jax.lax.dynamic_update_slice(
            trans, new_state.transmittance, (tile, 0)
        )
        prefix = jax.lax.dynamic_update_slice(
            prefix, new_state.grad_prefix, (tile, 0)
        )
        out = jnp.concatenate(
            [grads.color, grads.conic, grads.opacity, grads.pos_2d], axis=-1
        )
        return (trans, prefix), out

    _, outs = jax.lax.scan(
        step, init, (entry, blocks.tile_of_block, blocks.block_pos)
    )
    return outs.transpose(2, 0, 1).reshape(ENTRY_COLUMNS, nb * b)


# --- tiled <-> image layout helpers --------------------------------------------


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
