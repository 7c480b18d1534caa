"""Pair-evaluation accounting for the segment-window rasterizer.

The blend kernels are VPU-compute-bound on (entry, pixel) pair
evaluations (PERF.md roofline), so this is the profiler that measures the
quantity that actually costs: for a bench-style workload it reports, with
``tight_culling`` off and on,

- ``entries``: tile-point entries in the sorted stream;
- ``true_pairs``: entries x 256 (each entry meets every pixel of its tile
  — the reference's model, rasterize/kernel.wgsl:107-200);
- ``window_pairs``: real grid steps x B x 256 — what the VPU executes
  with no early exit (lane-masked boundary lanes still occupy the VPU);
- ``exec_pairs``: window_pairs minus windows skipped by the kernel's
  whole-tile early exit (the ``jnp.all(done)`` compute skip in
  ops/rasterize.py:_forward_kernel), counted by replaying the forward
  blend per step exactly as rasterize_forward_xla does.

``window_pairs / true_pairs`` is the window-alignment overhead (the
boundary-compaction lever); ``exec / window`` is what early exit already
saves; the tight-on vs tight-off entry ratio is the culling factor κ₁.

Env knobs mirror bench.py: PAIRS_POINTS, PAIRS_WIDTH, PAIRS_HEIGHT,
PAIRS_SCALE, PAIRS_CAPACITY, PAIRS_BLOCK. Defaults are the lego tier
(100k @ 800x800) so the script finishes on the 1-core CPU host; run the
bench headline (1M @1080p, capacity 2359296) on the chip.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import _make_inputs, _setup_jax
from gausplat_tpu.constants import TILE_SIZE_X, TILE_SIZE_Y
from gausplat_tpu.ops.binning import bin_gaussians
from gausplat_tpu.ops.blend import ForwardState, forward_batch
from gausplat_tpu.ops.projection import project_gaussians
from gausplat_tpu.ops.rasterize import (
    PIXELS_PER_TILE,
    _pixel_coords,
    _window,
    build_entry_stream,
    entries_from_rows,
    pack_point_data,
)


GROUP = int(os.environ.get("PAIRS_GROUP", 32))


def _count(points, width, height, scale, capacity, block, tight):
    scene, camera = _make_inputs(points, width, height, scale)
    tcx = -(-width // TILE_SIZE_X)
    tcy = -(-height // TILE_SIZE_Y)
    num_tiles = tcx * tcy

    @jax.jit
    def go(colors_sh, opacities, positions, rotations, scalings):
        proj = project_gaussians(
            colors_sh, positions, rotations, scalings, camera,
            sh_degree=3, tile_count_x=tcx, tile_count_y=tcy,
            opacities=opacities, tight_culling=tight,
        )
        binning = bin_gaussians(
            proj.depths, proj.tile_x_max, proj.tile_x_min, proj.tile_y_min,
            proj.tile_counts, tile_count_x=tcx, tile_count_y=tcy,
            capacity=capacity,
        )
        point_data = pack_point_data(
            proj, jax.nn.sigmoid(opacities[:, 0]), False
        )
        stream = build_entry_stream(
            point_data, binning.point_indices, binning.tile_ranges,
            block_size=block, packed=False,
        )

        # Replay the forward blend per step (rasterize_forward_xla's loop)
        # and count the windows the Pallas kernel would actually execute:
        # skip = pad step | whole tile done | empty window.
        init = (
            jnp.ones((num_tiles, PIXELS_PER_TILE), jnp.float32),
            jnp.zeros((num_tiles, PIXELS_PER_TILE), jnp.bool_),
            jnp.zeros((num_tiles, PIXELS_PER_TILE), jnp.int32),
            jnp.int32(0),
            jnp.int32(0),
        )
        rows = stream.entry_data.shape[0]

        def step(carry, xs):
            trans, done, count, executed, groups = carry
            sid, tile, sblk, r0, r1, first = xs
            blk = jax.lax.dynamic_slice(
                stream.entry_data, (0, sblk * block), (rows, block)
            )
            entries = entries_from_rows(blk, False)
            pix_x, pix_y = _pixel_coords(tile, tcx)
            state = ForwardState(
                color=jnp.zeros((3, PIXELS_PER_TILE), jnp.float32),
                transmittance=jax.lax.dynamic_slice(
                    trans, (tile, 0), (1, PIXELS_PER_TILE)
                ),
                done=jax.lax.dynamic_slice(
                    done, (tile, 0), (1, PIXELS_PER_TILE)
                ),
                rendered_count=jax.lax.dynamic_slice(
                    count, (tile, 0), (1, PIXELS_PER_TILE)
                ),
            )
            is_first = first == 1
            state = ForwardState(
                color=state.color,
                transmittance=jnp.where(is_first, 1.0, state.transmittance),
                done=jnp.where(is_first, False, state.done),
                rendered_count=jnp.where(is_first, 0, state.rendered_count),
            )
            mask, base_pos, lo, hi = _window(sblk, r0, r1, block)
            real = sid < stream.meta[0]
            skip = (~real) | jnp.all(state.done) | (hi <= lo)
            executed = executed + jnp.where(skip, 0, 1).astype(jnp.int32)
            # Groups of GROUP entries touched by the valid lane window —
            # what the GAUSPLAT_GROUP_SKIP kernel would execute (upper
            # bound: intra-window done transitions ignored).
            n_groups = jnp.where(
                skip, 0, (hi - 1) // GROUP - lo // GROUP + 1
            ).astype(jnp.int32)
            groups = groups + n_groups
            new = forward_batch(state, entries, pix_x, pix_y, base_pos, mask)
            trans = jax.lax.dynamic_update_slice(
                trans, new.transmittance, (tile, 0)
            )
            done = jax.lax.dynamic_update_slice(done, new.done, (tile, 0))
            count = jax.lax.dynamic_update_slice(
                count, new.rendered_count, (tile, 0)
            )
            return (trans, done, count, executed, groups), None

        sids = jnp.arange(stream.step_tile.shape[0], dtype=jnp.int32)
        (_, _, _, executed, groups), _ = jax.lax.scan(
            step,
            init,
            (sids, stream.step_tile, stream.step_block, stream.step_r0,
             stream.step_r1, stream.step_first),
        )
        nonempty = jnp.sum(
            (binning.tile_ranges[:, 1] > binning.tile_ranges[:, 0]).astype(
                jnp.int32
            )
        )
        return binning.total, stream.meta[0], executed, nonempty, groups

    total, steps, executed, nonempty, groups = go(
        scene.colors_sh, scene.opacities, scene.positions,
        scene.rotations, scene.scalings,
    )
    entries = min(int(total), capacity)
    wp = block * PIXELS_PER_TILE
    return {
        "entries": entries,
        "nonempty_tiles": int(nonempty),
        "steps": int(steps),
        "exec_steps": int(executed),
        "true_pairs": entries * PIXELS_PER_TILE,
        "window_pairs": int(steps) * wp,
        "exec_pairs": int(executed) * wp,
        "group_exec_pairs": int(groups) * GROUP * PIXELS_PER_TILE,
    }


def main():
    _setup_jax()
    if os.environ.get("PAIRS_CPU"):  # the axon plugin overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    points = int(os.environ.get("PAIRS_POINTS", 100_000))
    width = int(os.environ.get("PAIRS_WIDTH", 800))
    height = int(os.environ.get("PAIRS_HEIGHT", 800))
    scale = float(os.environ.get("PAIRS_SCALE", 1.0))
    capacity = int(os.environ.get("PAIRS_CAPACITY", 262_144))
    block = int(os.environ.get("PAIRS_BLOCK", 128))

    out = {
        "workload": {
            "points": points, "width": width, "height": height,
            "scale": scale, "capacity": capacity, "block": block,
        }
    }
    for tight in (False, True):
        key = "tight_on" if tight else "tight_off"
        out[key] = _count(points, width, height, scale, capacity, block, tight)
        print(f"# {key}: {out[key]}", file=sys.stderr, flush=True)
    off, on = out["tight_off"], out["tight_on"]
    out["culling_factor"] = round(off["entries"] / max(on["entries"], 1), 3)
    out["window_overhead_on"] = round(
        on["window_pairs"] / max(on["true_pairs"], 1), 3
    )
    out["early_exit_saving_on"] = round(
        1.0 - on["exec_pairs"] / max(on["window_pairs"], 1), 3
    )
    out["group"] = GROUP
    out["group_skip_saving_on"] = round(
        1.0 - on["group_exec_pairs"] / max(on["exec_pairs"], 1), 3
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
