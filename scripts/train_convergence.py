"""Longer training-convergence run (config 4 analogue, scaled): fit a toy
scene over multiple views with densification on the TPU; report PSNR curve."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render
from gausplat_tpu.train import TrainConfig, Trainer

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
size = 256
opts = RenderOptions(tile_entry_capacity=1 << 17, block_size=256)
rng = np.random.default_rng(0)

p = 500
truth = GaussianScene.from_points(
    Points(rng.random((p, 3)).astype(np.float32), rng.standard_normal((p, 3)) * 0.7))
truth = truth.set_scalings(jnp.asarray(0.03 + 0.08 * rng.random((p, 3)), jnp.float32))
truth = truth.set_opacities(jnp.asarray(0.3 + 0.6 * rng.random((p, 1)), jnp.float32))

views = []
for i in range(10):
    a = 2 * np.pi * i / 10
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    pos = np.array([4 * s, 0.0, -4 * c])
    views.append(View(field_of_view_x=1.0, field_of_view_y=1.0,
        image_height=size, image_width=size, view_id=i, view_position=pos,
        view_transform=View.transform(rot.T, -rot @ pos)))
targets = [render(truth, v, opts).colors_rgb_2d for v in views]

q = 150
start = GaussianScene.from_points(
    Points(rng.random((q, 3)).astype(np.float32), rng.standard_normal((q, 3)) * 0.7))

cfg = TrainConfig(render=opts, densify_from=300, densify_until=iters - 300,
                  densify_interval=150, sh_warmup_interval=300,
                  opacity_reset_interval=10**9)
tr = Trainer(start, size, size, cfg)
hist = tr.fit(views, targets, iters)
for k in (0, iters // 4, iters // 2, 3 * iters // 4, iters - 1):
    h = hist[k]
    print(f"step {k+1:5d}: loss={h['loss']:.4f} psnr={h['psnr']:.2f} dB "
          f"pts={h.get('point_count', '')}", flush=True)
print(f"final points: {tr.scene.point_count}")
