import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from bench import _make_inputs
from gausplat_tpu.ops.binning import (make_point_orders, sort_entries,
    tile_ranges_from_keys)
from gausplat_tpu.ops.projection import project_gaussians
from gausplat_tpu.ops.rasterize import (build_tile_blocks, pack_point_data,
    rasterize_backward_pallas, rasterize_forward_pallas)

P, CAP, B = 1_000_000, 4_000_000, 256
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
    keys, src, offsets_inc, total = make_point_orders(proj.depths, proj.tile_x_max,
        proj.tile_x_min, proj.tile_y_min, proj.tile_counts, tile_count_x=TCX, capacity=CAP)
    acc = acc + keys[-1].astype(jnp.float32) + src[-1].astype(jnp.float32)
    if stage < 2: return acc
    slots = jnp.arange(CAP, dtype=jnp.int32)
    sk, seids = sort_entries(keys, slots)
    in_range = slots < jnp.minimum(total, jnp.int32(CAP))
    sv = jnp.where(in_range, src[seids], jnp.int32(P))
    acc = acc + sk[-1].astype(jnp.float32) + sv[-1].astype(jnp.float32)
    if stage < 3: return acc
    ranges = tile_ranges_from_keys(sk, total, num_tiles=TCX*TCY)
    acc = acc + ranges.sum().astype(jnp.float32)
    if stage < 4: return acc
    pd = pack_point_data(proj, jax.nn.sigmoid(scene.opacities[:, 0]))
    blocks = build_tile_blocks(pd, sv, ranges, seids, block_size=B)
    acc = acc + blocks.entry_data[0].sum() + blocks.entry_point[-1].astype(jnp.float32)
    if stage < 5: return acc
    it, tt, ct = rasterize_forward_pallas(blocks, num_tiles=TCX*TCY, tile_count_x=TCX)
    acc = acc + it.sum()
    if stage < 6: return acc
    gdotc = jnp.sum(gimg * it, axis=1)
    eg = rasterize_backward_pallas(blocks, gimg, gdotc, ct, tile_count_x=TCX)
    acc = acc + eg[0].sum()
    if stage < 7: return acc
    for c in range(9):
        acc = acc + jax.ops.segment_sum(eg[c], blocks.entry_point, num_segments=P+1)[:P].sum()
    return acc

names = ["proj", "+expand", "+sort", "+ranges", "+blocks", "+raster_fwd", "+raster_bwd", "+segsum"]
n = 6
for stage, name in enumerate(names):
    @jax.jit
    def many(c, stage=stage):
        a = jnp.float32(0)
        for i in range(n):
            a = a + run(c, i, stage)
        return a
    float(many(scene.positions))
    t0 = time.time(); float(many(scene.positions))
    print("%-14s %8.2f ms" % (name, (time.time()-t0)/n*1000), flush=True)
