"""Stage-wise amortized profiling of the 1M@1080p pipeline on TPU."""

import sys
sys.path.insert(0, "/root/repo")

import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import _make_inputs
from gausplat_tpu.ops.binning import bin_gaussians
from gausplat_tpu.ops.projection import project_gaussians
from gausplat_tpu.ops.rasterize import (
    build_tile_blocks,
    pack_point_data,
    rasterize_backward_pallas,
    rasterize_forward_pallas,
    tile_image,
)

P = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
W, H = 1920, 1080
TCX, TCY = 120, 68
B = 256

scene, cam = _make_inputs(P, W, H)
gimg = jnp.zeros((TCY * TCX, 3, 256), jnp.float32)


def run(csh, i, flags):
    csh = csh + i * jnp.float32(1e-7)
    proj = project_gaussians(
        csh, scene.positions, scene.rotations, scene.scalings, cam,
        sh_degree=3, tile_count_x=TCX, tile_count_y=TCY,
    )
    acc = proj.depths.sum()
    if "bin" in flags:
        bn = bin_gaussians(
            proj.depths, proj.tile_x_max, proj.tile_x_min, proj.tile_y_min,
            proj.tile_counts, tile_count_x=TCX, tile_count_y=TCY, capacity=CAP,
        )
        acc = acc + bn.total.astype(jnp.float32)
    if "blocks" in flags:
        pd = pack_point_data(proj, jax.nn.sigmoid(scene.opacities[:, 0]))
        blocks = build_tile_blocks(pd, bn.point_indices, bn.tile_ranges, block_size=B)
        acc = acc + blocks.entry_data[0, 0]
    if "raster" in flags:
        it, tt, ct = rasterize_forward_pallas(blocks, num_tiles=TCX * TCY, tile_count_x=TCX)
        acc = acc + it.sum()
    if "bwd" in flags:
        gdotc = jnp.sum(gimg * it, axis=1)
        eg = rasterize_backward_pallas(blocks, gimg, gdotc, ct, tile_count_x=TCX)
        acc = acc + eg[0].sum()
    if "seg" in flags:
        for c in range(9):
            acc = acc + jax.ops.segment_sum(eg[c], blocks.entry_point, num_segments=P + 1)[:P].sum()
    return acc


def bench(flags, n=8):
    @jax.jit
    def many(c):
        a = 0.0
        for i in range(n):
            a = a + run(c, i, flags)
        return a

    float(many(scene.colors_sh))
    t0 = time.time(); float(many(scene.colors_sh)); tm = time.time() - t0
    print("%-28s %8.2f ms  (incl ~RPC/n)" % ("+".join(flags) or "proj", tm / n * 1000), flush=True)


if __name__ == "__main__":
    # report actual entry count first
    proj = project_gaussians(
        scene.colors_sh, scene.positions, scene.rotations, scene.scalings, cam,
        sh_degree=3, tile_count_x=TCX, tile_count_y=TCY,
    )
    total = int(jnp.sum(proj.tile_counts))
    vis = int(jnp.sum(proj.visible))
    print(f"P={P} visible={vis} entries={total} cap={CAP}")
    bench([])
    bench(["bin"])
    bench(["bin", "blocks"])
    bench(["bin", "blocks", "raster"])
    bench(["bin", "blocks", "raster", "bwd"])
    bench(["bin", "blocks", "raster", "bwd", "seg"])
