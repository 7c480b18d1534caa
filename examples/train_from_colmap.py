"""Train a 3DGS scene from a COLMAP sparse reconstruction.

The reference workflow (gausplat + its downstream trainer): load a COLMAP
sparse model, initialise a Gaussian scene from the SfM points, fit it to
the captured images, export a .3dgs.ply. This example is that workflow on
the TPU engine:

    python examples/train_from_colmap.py SPARSE_DIR IMAGE_DIR [OUT.ply] [ITERS]

``SPARSE_DIR`` holds cameras.bin / images.bin / points3D.bin;
``IMAGE_DIR`` the registered images (file names from images.bin). Images
larger than 1600 px are downscaled like standard 3DGS training does.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gausplat_tpu import GaussianScene, RenderOptions, encode_polygon
from gausplat_tpu.scene.colmap import load_sparse_model
from gausplat_tpu.train import TrainConfig, Trainer
from gausplat_tpu.train.densify import camera_extent


def _load_image(path: str, width: int, height: int) -> np.ndarray:
    try:
        from PIL import Image  # pillow is optional in this environment
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "reading captured images needs PIL (pillow); install it or "
            "adapt _load_image to your codec"
        ) from e
    img = Image.open(path).convert("RGB").resize((width, height))
    return np.asarray(img, np.float32) / 255.0


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    sparse_dir, image_dir = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "scene.3dgs.ply"
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 7_000

    names: dict = {}
    points, views_map = load_sparse_model(sparse_dir, names)
    print(f"{len(points)} SfM points, {len(views_map)} registered views")

    views, targets = [], []
    for vid, view in sorted(views_map.items()):
        if view.image_width > 1600:
            view = view.resize_max(1600)
        path = os.path.join(image_dir, names[vid])
        views.append(view)
        targets.append(_load_image(path, view.image_width, view.image_height))
    # fit_scan batches the views on device; all frames must share one size
    # (standard for COLMAP captures from a single camera).
    assert len({(v.image_width, v.image_height) for v in views}) == 1

    scene = GaussianScene.from_points(points)
    w, h = views[0].image_width, views[0].image_height
    extent = camera_extent(views)

    cfg = TrainConfig(
        iterations=iters,
        render=RenderOptions(entry_dtype="bf16"),
    )
    # Both extent consumers: the densify size thresholds AND the position
    # learning rate (the standard recipe's spatial_lr_scale) key to the
    # camera extent.
    cfg = dataclasses.replace(
        cfg,
        densify=dataclasses.replace(cfg.densify, scene_extent=extent),
        optimizer=dataclasses.replace(cfg.optimizer, scene_extent=extent),
    )
    trainer = Trainer(scene, w, h, cfg)
    history = trainer.fit_scan(views, targets, iters)
    print(
        f"final loss {history[-1]['loss']:.4f}, "
        f"psnr {history[-1]['psnr']:.2f} dB, "
        f"{trainer.scene.point_count} Gaussians"
    )

    with open(out_path, "wb") as fh:
        fh.write(encode_polygon(trainer.scene))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
