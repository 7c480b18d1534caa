"""End-to-end test of examples/train_from_colmap.py.

Builds a synthetic COLMAP capture on disk — a sparse model
(cameras.bin / images.bin / points3D.bin) plus PNG "captured" images
rendered from a known ground-truth Gaussian scene — then runs the example
script as a subprocess (the real user workflow: SfM -> fit -> .3dgs.ply)
and checks it trains and exports a loadable scene.

Reference workflow being mirrored: gausplat-loader's COLMAP source +
downstream trainer (SURVEY.md §3.5, §5); this engine's value-add path.
Runtime: ~2-3 min on the 1-core CPU host (not in the quick tier).
"""

import math
import os
import pathlib
import struct
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from gausplat_tpu import GaussianScene, RenderOptions, decode_polygon, render
from gausplat_tpu.scene.colmap import load_sparse_model
from gausplat_tpu.scene.point import Points

REPO = pathlib.Path(__file__).resolve().parent.parent
W, H = 64, 48
FX = FY = 60.0


def _quat_about_y(a):
    return (math.cos(a / 2), 0.0, math.sin(a / 2), 0.0)  # wxyz


def _rot_y(a):
    c, s = math.cos(a), math.sin(a)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def _write_sparse(model_dir, n_views=3, radius=4.0):
    model_dir.mkdir(parents=True, exist_ok=True)
    with open(model_dir / "cameras.bin", "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<iiQQ", 1, 1, W, H))  # PINHOLE
        fh.write(struct.pack("<4d", FX, FY, W / 2.0, H / 2.0))

    angles = [2 * math.pi * i / n_views for i in range(n_views)]
    with open(model_dir / "images.bin", "wb") as fh:
        fh.write(struct.pack("<Q", n_views))
        for i, a in enumerate(angles):
            r = _rot_y(a)  # world-to-camera
            cam_pos = np.array([radius * math.sin(a), 0.0, -radius * math.cos(a)])
            # COLMAP images.bin: world-to-camera quaternion (wxyz) + t with
            # p_cam = R p_world + t  ->  t = -R cam_pos.
            t = -r @ cam_pos
            qw, qx, qy, qz = _quat_about_y(a)
            fh.write(struct.pack("<I", i + 1))
            fh.write(struct.pack("<7d", qw, qx, qy, qz, *t))
            fh.write(struct.pack("<I", 1))
            fh.write(f"frame_{i:04d}.png".encode() + b"\x00")
            fh.write(struct.pack("<Q", 0))

    rng = np.random.default_rng(5)
    pts = rng.standard_normal((60, 3)) * 0.6
    cols = rng.integers(30, 226, (60, 3)).astype(np.uint8)
    with open(model_dir / "points3D.bin", "wb") as fh:
        fh.write(struct.pack("<Q", len(pts)))
        for j, (p, c) in enumerate(zip(pts, cols)):
            fh.write(struct.pack("<Q", j + 1))
            fh.write(struct.pack("<3d", *p))
            fh.write(struct.pack("<3B", *c))
            fh.write(struct.pack("<d", 0.3))
            fh.write(struct.pack("<Q", 0))
    return pts, cols


def _ground_truth_scene(pts, cols):
    rng = np.random.default_rng(9)
    scene = GaussianScene.from_points(
        Points.from_colmap(cols, pts.astype(np.float64))
    )
    scene = scene.set_scalings(
        jnp.asarray(0.06 + 0.1 * rng.random((len(pts), 3)), jnp.float32)
    )
    scene = scene.set_opacities(
        jnp.asarray(0.4 + 0.55 * rng.random((len(pts), 1)), jnp.float32)
    )
    return scene


def test_train_from_colmap_example_end_to_end(tmp_path):
    from PIL import Image

    sparse = tmp_path / "sparse"
    images = tmp_path / "images"
    images.mkdir()
    pts, cols = _write_sparse(sparse)

    # Render "captured" PNGs from the ground-truth scene at exactly the
    # views the example will load back from the sparse model.
    names = {}
    _, views_map = load_sparse_model(str(sparse), names)
    assert len(views_map) == 3
    gt = _ground_truth_scene(pts, cols)
    opts = RenderOptions(backend="xla", tile_entry_capacity=1 << 14)
    for vid, view in views_map.items():
        img = np.asarray(render(gt, view, opts).colors_rgb_2d)
        png = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        Image.fromarray(png).save(images / names[vid])

    out_ply = tmp_path / "fit.3dgs.ply"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "examples" / "train_from_colmap.py"),
            str(sparse),
            str(images),
            str(out_ply),
            "500",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "3 registered views" in proc.stdout
    assert out_ply.exists()

    # The exported checkpoint must be a loadable 3DGS PLY.
    fitted = decode_polygon(out_ply.read_bytes())
    assert fitted.point_count >= 60  # densification only ever adds

    # And the fit must have actually learned something: PSNR over the
    # captures beats the untrained initialisation by a clear margin.
    psnr = float(proc.stdout.split("psnr")[1].split("dB")[0])
    init = GaussianScene.from_points(
        Points.from_colmap(cols, pts.astype(np.float64))
    )
    view0 = views_map[min(views_map)]
    target0 = np.asarray(render(gt, view0, opts).colors_rgb_2d)
    init_img = np.asarray(render(init, view0, opts).colors_rgb_2d)
    init_psnr = -10.0 * math.log10(
        max(float(np.mean((init_img - target0) ** 2)), 1e-10)
    )
    assert psnr > init_psnr + 3.0, (psnr, init_psnr)
