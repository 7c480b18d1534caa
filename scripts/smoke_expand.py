"""On-chip Mosaic smoke + parity for the fused Pallas expansion
(ops/expand.py). Round-4 lesson: interpret mode does NOT validate Mosaic
lowering — gate the kernel on hardware before spending A/B time.

Checks, on the real TPU:
  1. fused_point_orders vs make_point_orders at a 100k-point random
     workload: bit-identical (keys, src, offsets, total).
  2. End-to-end render + grad at 256x192 with GAUSPLAT_FUSED_EXPAND=1
     vs =0 in-process (bin_gaussians flag): identical images and grads.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from gausplat_tpu.ops.binning import make_point_orders, bin_gaussians
from gausplat_tpu.ops.expand import fused_point_orders

# --- 1. standalone kernel parity at 100k points -------------------------
rng = np.random.default_rng(0)
p = 100_000
counts_w = rng.integers(1, 6, p).astype(np.int32)
counts_h = rng.integers(1, 6, p).astype(np.int32)
vis = rng.random(p) < 0.8
tx_min = rng.integers(0, 100, p).astype(np.int32)
ty_min = rng.integers(0, 50, p).astype(np.int32)
counts = np.where(vis, counts_w * counts_h, 0).astype(np.int32)
depths = (0.3 + rng.random(p) * 1000).astype(np.float32)
cap = 1 << 20
args = (
    jnp.asarray(depths),
    jnp.asarray(tx_min + counts_w),
    jnp.asarray(tx_min),
    jnp.asarray(ty_min),
    jnp.asarray(counts),
)

t0 = time.time()
ref = jax.jit(
    lambda *a: make_point_orders(*a, tile_count_x=120, capacity=cap)
)(*args)
got = jax.jit(
    lambda *a: fused_point_orders(*a, tile_count_x=120, capacity=cap)
)(*args)
jax.block_until_ready((ref, got))
print(f"kernel compile+run {time.time()-t0:.1f}s", flush=True)

total = int(ref[3])
assert int(got[3]) == total, (int(got[3]), total)
np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
print(f"standalone parity OK (total={total}, cap={cap})", flush=True)

# --- 2. end-to-end render + grad parity ---------------------------------
from gausplat_tpu import RenderOptions, View
from gausplat_tpu.render import pipeline as pl_mod
from gausplat_tpu.scene.gaussian_3d import GaussianScene

rng2 = np.random.default_rng(1)
p2 = 2_000
from gausplat_tpu.scene.point import Points

scene = GaussianScene.from_points(
    Points(
        rng2.random((p2, 3)).astype(np.float32),
        (rng2.standard_normal((p2, 3)) * 0.8).astype(np.float32),
    )
)
scene = scene.set_scalings(
    jnp.asarray(0.02 + 0.08 * rng2.random((p2, 3)), jnp.float32)
)
scene = scene.set_opacities(
    jnp.asarray(0.2 + 0.6 * rng2.random((p2, 1)), jnp.float32)
)
v = View(
    field_of_view_x=1.0,
    field_of_view_y=0.8,
    image_height=192,
    image_width=256,
    view_position=[0.0, 0.0, -4.0],
    view_transform=View.transform(np.eye(3), [0.0, 0.0, 4.0]),
)
opts = RenderOptions()

outs = {}
for flag in (1, 0):
    pl_mod.FUSED_EXPAND = flag
    # The built-fn lru_cache is keyed on static cfg only; the fused flag
    # is read at build time, so flips require a cache clear.
    pl_mod._make_render_fn.cache_clear()
    pl_mod._make_render_views_fn.cache_clear()

    def loss_fn(positions):
        import dataclasses

        sc = dataclasses.replace(scene, positions=positions)
        out = pl_mod.render(sc, v, opts)
        return jnp.sum(out.colors_rgb_2d), out.colors_rgb_2d

    t0 = time.time()
    (val, img), grad = jax.value_and_grad(loss_fn, has_aux=True)(
        scene.positions
    )
    jax.block_until_ready((val, img, grad))
    outs[flag] = (np.asarray(img), np.asarray(grad))
    print(f"e2e flag={flag}: {time.time()-t0:.1f}s  sum={float(val):.6f}",
          flush=True)

np.testing.assert_array_equal(outs[1][0], outs[0][0])
np.testing.assert_array_equal(outs[1][1], outs[0][1])
print("e2e parity OK — fused expansion lowers and matches on-chip",
      flush=True)
