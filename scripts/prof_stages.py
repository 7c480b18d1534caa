"""Per-stage budget of the render pipeline on the live device.

Chained honest timing (positions perturbed per step). Env knobs:
PROF_POINTS, PROF_CAP, PROF_BLOCK, PROF_PACKED=1 (bf16 entry rows),
PROF_STAGE (run only through stage k), PROF_ITERS, PROF_FUSED=1 (the
fused Pallas expansion instead of the XLA gather formulation).
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

from bench import _make_inputs
from gausplat_tpu.ops.binning import (
    make_point_orders, sort_entries, tile_ranges_from_keys,
)
from gausplat_tpu.ops.blend import grad_rows_to_components
from gausplat_tpu.ops.prefix import prefix_sum
from gausplat_tpu.ops.projection import project_gaussians
from gausplat_tpu.ops.rasterize import (
    build_entry_stream, pack_point_data,
    rasterize_backward_pallas, rasterize_forward_pallas,
)

P = int(os.environ.get("PROF_POINTS", 1_000_000))
CAP = int(os.environ.get("PROF_CAP", 4_194_304))
B = int(os.environ.get("PROF_BLOCK", 256))
PACKED = os.environ.get("PROF_PACKED", "0") == "1"
# Interpret-mode Pallas (CPU smoke runs only; timings are meaningless).
INTERPRET = os.environ.get("PROF_INTERPRET", "0") == "1"
# PROF_FUSED=1: profile the fused Pallas expansion (ops/expand.py, the
# round-5 pallas-backend default) instead of the XLA gather formulation.
FUSED = os.environ.get("PROF_FUSED", "0") == "1"
W, H, TCX, TCY = 1920, 1080, 120, 68
scene, cam = _make_inputs(P, W, H)
gimg = jnp.zeros((TCY * TCX, 3, 256), jnp.float32)


def run(pos, i, stage):
    csh = scene.colors_sh
    pos = pos + i * jnp.float32(1e-6)
    proj = project_gaussians(csh, pos, scene.rotations, scene.scalings,
        cam, sh_degree=3, tile_count_x=TCX, tile_count_y=TCY)
    acc = proj.depths.sum() + proj.color_r.sum() + proj.conic_xx.sum()
    if stage < 1: return acc
    if FUSED:
        from gausplat_tpu.ops.expand import fused_point_orders

        keys, src, offsets_inc, total = fused_point_orders(
            proj.depths, proj.tile_x_max, proj.tile_x_min, proj.tile_y_min,
            proj.tile_counts, tile_count_x=TCX, capacity=CAP,
            interpret=INTERPRET)
    else:
        keys, src, offsets_inc, total = make_point_orders(
            proj.depths, proj.tile_x_max, proj.tile_x_min, proj.tile_y_min,
            proj.tile_counts, tile_count_x=TCX, capacity=CAP)
    acc = acc + keys[-1].astype(jnp.float32) + src[-1].astype(jnp.float32)
    if stage < 2: return acc
    sk, sv = sort_entries(keys, src)
    acc = acc + sk[-1].astype(jnp.float32) + sv[-1].astype(jnp.float32)
    if stage < 3: return acc
    ranges = tile_ranges_from_keys(sk, total, num_tiles=TCX * TCY)
    acc = acc + ranges.sum().astype(jnp.float32)
    if stage < 4: return acc
    pd = pack_point_data(proj, jax.nn.sigmoid(scene.opacities[:, 0]), PACKED)
    stream = build_entry_stream(pd, sv, ranges, block_size=B, packed=PACKED)
    acc = acc + stream.entry_data[0].sum().astype(jnp.float32) \
        + stream.step_block[-1].astype(jnp.float32)
    if stage < 5: return acc
    it, tt, ct = rasterize_forward_pallas(
        stream, num_tiles=TCX * TCY, tile_count_x=TCX, interpret=INTERPRET)
    acc = acc + it.sum()
    if stage < 6: return acc
    gdotc = jnp.sum(gimg * it, axis=1)
    eg = rasterize_backward_pallas(
        stream, gimg, gdotc, ct, tile_count_x=TCX, interpret=INTERPRET)
    acc = acc + eg[0].sum().astype(jnp.float32)
    if stage < 7: return acc
    # Mirror the pipeline's default reduce (pipeline._render_bwd): ONE
    # stable payload sort by point id, batched prefix sum, span-end gather
    # split [:8]/[8] (a 9-row column slice crosses the 8-sublane tile).
    valid_count = jnp.minimum(total, jnp.int32(CAP))
    valid = jnp.arange(CAP, dtype=jnp.int32) < valid_count
    eg = jnp.where(valid[None, :], eg, 0)
    srt = jax.lax.sort(
        (sv,) + tuple(eg[r] for r in range(eg.shape[0])),
        num_keys=1, is_stable=True,
    )
    comps = grad_rows_to_components(jnp.stack(srt[1:]), PACKED)
    cs = prefix_sum(jnp.stack(comps))
    hi_raw = jnp.minimum(offsets_inc, valid_count) - 1
    hi_idx = jnp.maximum(hi_raw, 0)
    hi = jnp.concatenate(
        [jnp.take(cs[:8], hi_idx, axis=1), jnp.take(cs[8], hi_idx)[None]],
        axis=0,
    )
    acc = acc + jnp.where(hi_raw[None, :] >= 0, hi, 0.0).sum()
    return acc


names = ["proj", "+expand", "+sort", "+ranges", "+stream",
         "+raster_fwd", "+raster_bwd", "+grad_reduce"]
n = int(os.environ.get("PROF_ITERS", 6))
only = os.environ.get("PROF_STAGE")
prev = 0.0
for stage, name in enumerate(names):
    if only is not None and stage != int(only):
        continue
    @jax.jit
    def many(c, stage=stage):
        # fori_loop, not unrolling: one body compile per stage program
        # (tunnel compiles of the unrolled chain take tens of minutes).
        return jax.lax.fori_loop(
            0, n, lambda i, a: a + run(c, i, stage), jnp.float32(0)
        )
    float(many(scene.positions))
    t0 = time.time(); float(many(scene.positions))
    cur = (time.time() - t0) / n * 1000
    print("%-14s %8.2f ms  (+%.2f)" % (name, cur, cur - prev), flush=True)
    prev = cur
