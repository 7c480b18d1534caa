import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, time, sys
from gausplat_tpu import View
from gausplat_tpu.ops.projection import Camera, project_gaussians
from gausplat_tpu.ops.binning import bin_gaussians
from gausplat_tpu.ops.rasterize import (pack_point_data, build_tile_blocks,
  rasterize_forward_pallas, rasterize_backward_pallas, tile_image)

flags = sys.argv[1].split('+') if len(sys.argv)>1 and sys.argv[1] else []
rng = np.random.default_rng(0)
P = 100_000
csh = jnp.asarray(rng.standard_normal((P,48)).astype(np.float32)*0.2)
op = jnp.asarray(rng.standard_normal((P,1)).astype(np.float32))
pos = jnp.asarray((rng.standard_normal((P,3))*2.0).astype(np.float32))
rot = jnp.asarray(rng.standard_normal((P,4)).astype(np.float32))
scal = jnp.asarray(np.log(0.005+0.02*rng.random((P,3))).astype(np.float32))
W, H, CAP, B = 800, 800, 2_000_000, 256
view = View(field_of_view_x=1.2, field_of_view_y=1.2, image_height=H, image_width=W,
    view_position=[0.,0.,-8.], view_transform=View.transform(np.eye(3), [0.,0.,8.]))
cam = Camera.from_view(view); tcx = tcy = 50
gimg = jnp.asarray(rng.standard_normal((H,W,3)).astype(np.float32))

def run(c, i):
    c = c + i*1e-6
    proj = project_gaussians(c, pos, rot, scal, cam, sh_degree=3, tile_count_x=tcx, tile_count_y=tcy)
    bn = bin_gaussians(proj.depths, proj.tile_bounds, proj.tile_counts, tile_count_x=tcx, tile_count_y=tcy, capacity=CAP)
    pd = pack_point_data(proj.colors_rgb_3d, proj.conics, jax.nn.sigmoid(op), proj.positions_2d)
    blocks = build_tile_blocks(pd, bn.point_indices, bn.tile_ranges, block_size=B)
    it, tt, ct = rasterize_forward_pallas(blocks, num_tiles=tcx*tcy, tile_count_x=tcx)
    acc = it.sum()
    if 'bwdk' in flags:
        gt = tile_image(gimg, tcx, tcy)
        gdotc = jnp.sum(gt*it, axis=1)
        eg = rasterize_backward_pallas(blocks, gt, gdotc, ct, tile_count_x=tcx)
        acc = acc + eg.sum()
    if 'seg' in flags:
        pp = jax.ops.segment_sum(eg, blocks.entry_point, num_segments=P+1)[:P]
        acc = acc + pp.sum()
    if 'vjp' in flags:
        def pj(c2, po, ro, sc):
            pr = project_gaussians(c2, po, ro, sc, cam, sh_degree=3, tile_count_x=tcx, tile_count_y=tcy)
            return pr.colors_rgb_3d, pr.conics, pr.positions_2d
        _, vjpf = jax.vjp(pj, c, pos, rot, scal)
        d = vjpf((pp[:,0:3], pp[:,3:6], pp[:,7:9]))
        acc = acc + sum(x.sum() for x in d)
    return acc

n = 5
@jax.jit
def many(c):
    a = 0.0
    for i in range(n): a = a + run(c, i)
    return a
@jax.jit
def one(c): return run(c, 0)
float(many(csh)); float(one(csh))
t0=time.time(); float(many(csh)); tm=time.time()-t0
t0=time.time(); float(one(csh)); t1=time.time()-t0
print('%-14s %.2f ms' % ('+'.join(flags) or 'fwd', (tm-t1)/(n-1)*1000))
