"""Render a .3dgs.ply scene to an image from the command line.

The reference is a library only; its downstream viewers drive it. This
CLI is the minimal equivalent for this engine: decode a 3DGS PLY
(scene/ply.py, parity with reference import.rs:15-89), place an orbit
camera, render (render/pipeline.py), and write a PNG.

    python scripts/render_ply.py scene.3dgs.ply out.png \
        [--width 1280] [--height 720] [--fov 1.0] [--radius 4.0] \
        [--azimuth 0.0] [--elevation 0.0] [--sh-degree 3] [--cpu]

The camera orbits the scene centroid at `radius` times the cloud's
bounding radius; azimuth/elevation in radians.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ply", type=pathlib.Path)
    ap.add_argument("out", type=pathlib.Path)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--fov", type=float, default=1.0, help="horizontal fov, radians")
    ap.add_argument("--radius", type=float, default=4.0,
                    help="orbit radius in units of the cloud bounding radius")
    ap.add_argument("--azimuth", type=float, default=0.0)
    ap.add_argument("--elevation", type=float, default=0.0)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force the CPU platform")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from gausplat_tpu import RenderOptions, View, decode_polygon

    scene = decode_polygon(args.ply.read_bytes())
    pos = np.asarray(scene.positions)
    center = pos.mean(axis=0)
    bound = float(np.linalg.norm(pos - center, axis=1).max()) or 1.0

    az, el = args.azimuth, args.elevation
    # Camera placed on the orbit sphere, looking at the centroid (-z forward).
    eye = center + args.radius * bound * np.array(
        [np.cos(el) * np.sin(az), np.sin(el), -np.cos(el) * np.cos(az)]
    )
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    rot = np.stack([right, up, fwd])  # world -> camera rows

    fov_y = 2.0 * np.arctan(np.tan(args.fov / 2.0) * args.height / args.width)
    view = View(
        field_of_view_x=args.fov,
        field_of_view_y=float(fov_y),
        image_height=args.height,
        image_width=args.width,
        view_position=[float(x) for x in eye],
        view_transform=View.transform(rot, -rot @ eye),
    )

    from gausplat_tpu import render

    out = render(
        scene, view, RenderOptions(colors_sh_degree_max=args.sh_degree)
    )
    img = np.asarray(out.colors_rgb_2d)
    img8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)

    from PIL import Image

    Image.fromarray(img8).save(args.out)
    print(
        f"rendered {scene.point_count} points -> {args.out} "
        f"({args.width}x{args.height}, sh degree {args.sh_degree})"
    )


if __name__ == "__main__":
    main()
