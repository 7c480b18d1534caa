"""COLMAP binary ingestion tests: synthesize a sparse model, parse it back,
and check the world-to-view convention against the renderer's camera."""

import io
import math
import struct

import numpy as np

from gausplat_tpu.scene.colmap import (
    read_cameras_bin,
    read_images_bin,
    read_points3d_bin,
)

import pytest

pytestmark = pytest.mark.quick


def _cameras_blob():
    out = struct.pack("<Q", 2)
    # PINHOLE: fx fy cx cy
    out += struct.pack("<iiQQ", 1, 1, 1920, 1080)
    out += struct.pack("<4d", 1000.0, 990.0, 960.0, 540.0)
    # SIMPLE_PINHOLE: f cx cy
    out += struct.pack("<iiQQ", 2, 0, 640, 480)
    out += struct.pack("<3d", 500.0, 320.0, 240.0)
    return out


def _images_blob():
    out = struct.pack("<Q", 1)
    # identity rotation quaternion (w=1), translation (1, 2, 3)
    out += struct.pack("<I", 7)
    out += struct.pack("<7d", 1.0, 0.0, 0.0, 0.0, 1.0, 2.0, 3.0)
    out += struct.pack("<I", 1)
    out += b"frame_0001.png\x00"
    out += struct.pack("<Q", 2)  # two 2D points to skip
    out += struct.pack("<2dq", 1.0, 2.0, -1) + struct.pack("<2dq", 3.0, 4.0, 5)
    return out


def _points_blob():
    out = struct.pack("<Q", 2)
    out += struct.pack("<Q", 11) + struct.pack("<3d", 1.0, 2.0, 3.0)
    out += struct.pack("<3B", 64, 128, 192) + struct.pack("<d", 0.5)
    out += struct.pack("<Q", 1) + struct.pack("<ii", 7, 0)
    out += struct.pack("<Q", 12) + struct.pack("<3d", -1.0, 0.0, 0.5)
    out += struct.pack("<3B", 255, 0, 0) + struct.pack("<d", 0.1)
    out += struct.pack("<Q", 0)
    return out


def test_cameras_images_points_roundtrip():
    cameras = read_cameras_bin(io.BytesIO(_cameras_blob()))
    assert cameras[1].model == "PINHOLE"
    assert cameras[1].focal_lengths() == (1000.0, 990.0)
    assert cameras[2].focal_lengths() == (500.0, 500.0)

    names = {}
    views = read_images_bin(io.BytesIO(_images_blob()), cameras, names)
    view = views[7]
    assert names == {7: "frame_0001.png"}
    assert view.image_width == 1920 and view.image_height == 1080
    assert abs(view.field_of_view_x - 2 * math.atan(1920 / 2000)) < 1e-12
    # Identity rotation: p_view = p + t.
    np.testing.assert_allclose(view.view_rotation(), np.eye(3), atol=1e-12)
    np.testing.assert_allclose(view.view_translation(), [1, 2, 3])
    np.testing.assert_allclose(view.view_position, [-1, -2, -3])

    points = read_points3d_bin(io.BytesIO(_points_blob()))
    assert len(points) == 2
    np.testing.assert_allclose(points.positions, [[1, 2, 3], [-1, 0, 0.5]])
    np.testing.assert_allclose(
        points.colors_rgb[0], [64 / 255, 128 / 255, 192 / 255], atol=1e-7
    )


def test_nontrivial_rotation_convention():
    """A 90-degree yaw: the view transform must map world->view like COLMAP."""
    angle = math.pi / 2
    qw, qx, qy, qz = math.cos(angle / 2), 0.0, math.sin(angle / 2), 0.0
    blob = struct.pack("<Q", 1)
    blob += struct.pack("<I", 1)
    blob += struct.pack("<7d", qw, qx, qy, qz, 0.5, 0.0, 0.0)
    blob += struct.pack("<I", 1)
    blob += b"x\x00" + struct.pack("<Q", 0)

    cameras = read_cameras_bin(io.BytesIO(_cameras_blob()))
    view = read_images_bin(io.BytesIO(blob), cameras)[1]
    r = view.view_rotation()
    # Rotation about +y by 90 deg: x -> -z, z -> x (world -> camera).
    p = np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(r @ p, [0, 0, -1], atol=1e-12)
    p = np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(r @ p, [1, 0, 0], atol=1e-12)
