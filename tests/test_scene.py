"""Scene core tests: property transforms, point clouds, views, PLY codec.

Mirrors the reference test strategy (SURVEY.md section 4): property
round-trips, from/to_points round-trip, the golden sixstars PLY fixture,
COLMAP conversion, and view transform/resize.
"""

import io
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gausplat_tpu import (
    GaussianScene,
    Points,
    View,
    decode_polygon,
    encode_polygon,
)
from gausplat_tpu.errors import MismatchedPolygonHeaderError

pytestmark = pytest.mark.quick

REFERENCE_FIXTURE = "/root/reference/examples/data/3dgs-ply/sixstars.3dgs.ply"


# --- property transforms (reference property.rs:262-313) ----------------------


def test_set_outer_property_roundtrip():
    rng = np.random.default_rng(0)
    scene = GaussianScene.default()
    colors_sh = rng.random((10, 48), np.float32)
    opacities = rng.random((10, 1), np.float32) * 0.9 + 0.05
    positions = rng.random((10, 3), np.float32)
    rotations = np.ones((10, 4), np.float32)
    scalings = rng.random((10, 3), np.float32) + 1.0

    scene = (
        scene.set_colors_sh(colors_sh)
        .set_opacities(opacities)
        .set_positions(positions)
        .set_rotations(rotations)
        .set_scalings(scalings)
    )
    assert scene.point_count == 10
    np.testing.assert_allclose(scene.get_colors_sh(), colors_sh, atol=1e-6)
    np.testing.assert_allclose(scene.get_opacities(), opacities, atol=1e-5)
    np.testing.assert_allclose(scene.get_positions(), positions, atol=1e-6)
    np.testing.assert_allclose(scene.get_scalings(), scalings, rtol=1e-4)
    # Rotations are normalized on read.
    assert not np.allclose(scene.get_rotations(), rotations)
    np.testing.assert_allclose(
        scene.get_rotations(), rotations / 2.0, atol=1e-6
    )


# --- point clouds (reference import.rs:263-304, point/mod.rs:43-61) ------------


def test_from_and_to_points():
    source = Points(
        colors_rgb=np.array([[1.0, 0.5, 0.0], [0.5, 1.0, 0.25]], np.float32),
        positions=np.array([[0.0, -0.5, 0.25], [1.0, 0.0, -0.25]], np.float64),
    )
    scene = GaussianScene.from_points(source)
    assert scene.colors_sh.shape == (2, 48)
    assert scene.opacities.shape == (2, 1)
    assert scene.positions.shape == (2, 3)
    assert scene.rotations.shape == (2, 4)
    assert scene.scalings.shape == (2, 3)
    assert scene.point_count == 2
    assert scene.size_bytes == (2 * 48 + 2 + 2 * 3 + 2 * 4 + 2 * 3) * 4

    # Opacity init: sigmoid(inner) == 0.1.
    np.testing.assert_allclose(scene.get_opacities(), 0.1, rtol=1e-5)

    out = scene.to_points()
    np.testing.assert_allclose(out.colors_rgb, source.colors_rgb, atol=1e-6)
    np.testing.assert_allclose(out.positions, source.positions, atol=1e-6)


def test_colmap_point_conversion():
    pts = Points.from_colmap(
        np.array([[64, 128, 192]], np.uint8), np.array([[1.0, 2.0, 3.0]])
    )
    np.testing.assert_allclose(
        pts.colors_rgb, [[0.2509804, 0.5019608, 0.7529412]], atol=1e-7
    )
    colors_u8, positions = pts.to_colmap()
    np.testing.assert_array_equal(colors_u8, [[64, 128, 192]])
    np.testing.assert_array_equal(positions, [[1.0, 2.0, 3.0]])


# --- views (reference view/mod.rs:82-151) --------------------------------------


def test_view_transform_builder():
    rotation = [
        [0.9870946659543874, 0.011754269038001336, 0.1597058471183149],
        [-0.000481623211642526, 0.9975159094549839, -0.07043989227191047],
        [-0.1601370927782764, 0.0694539238889973, 0.9846482945564589],
    ]
    translation = [0.129242027423, 0.0, -0.3424233862]
    out = View.transform(rotation, translation)
    assert out.shape == (4, 4)
    np.testing.assert_array_equal(out[:3, :3], rotation)
    np.testing.assert_array_equal(out[3, :3], translation)
    assert out[3, 3] == 1.0
    assert np.all(out[:3, 3] == 0.0)


def test_view_resize_max():
    view = View(image_width=1920, image_height=1080)
    view.resize_max(1080)
    assert (view.image_width, view.image_height) == (1080, 608)

    view = View(image_width=720, image_height=1080)
    view.resize_max(1080)
    assert (view.image_width, view.image_height) == (720, 1080)


# --- PLY codec (reference import.rs:306-405 golden test) ------------------------


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_FIXTURE), reason="reference fixture not present"
)
def test_decode_golden_sixstars():
    with open(REFERENCE_FIXTURE, "rb") as fh:
        source = fh.read()
    scene = decode_polygon(source)
    assert scene.point_count == 18

    # Golden values from the reference's inline test (import.rs:325-399).
    sh_head = np.tile(
        np.array(
            [
                [1.75, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0],
                [0, 1.75, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0],
                [0, 0, 1.75, 0, 0, 1, 0, 0, 1, 0, 0, 1],
                [1.75, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                [0, 1.75, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                [0, 0, 1.75, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            ],
            np.float32,
        ),
        (3, 1),
    )
    np.testing.assert_array_equal(np.asarray(scene.colors_sh)[:, :12], sh_head)
    np.testing.assert_array_equal(
        np.asarray(scene.opacities), np.full((18, 1), -1.0, np.float32)
    )
    positions = np.tile(
        np.array(
            [
                [1, 0, 0],
                [0, 1, 0],
                [0, 0, 1],
                [-1, 0, 0],
                [0, -1, 0],
                [0, 0, -1],
            ],
            np.float32,
        ),
        (3, 1),
    )
    np.testing.assert_array_equal(np.asarray(scene.positions), positions)
    np.testing.assert_array_equal(
        np.asarray(scene.rotations),
        np.tile(np.array([0, 0, 0, 1], np.float32), (18, 1)),
    )
    scalings = np.array(
        [
            [-0.75, -2.5, -2.5], [-2.5, -0.75, -2.5], [-2.5, -2.5, -0.75],
            [-0.75, -2.5, -2.5], [-2.5, -0.75, -2.5], [-2.5, -2.5, -0.75],
            [-2.0, -1.0, -2.0], [-2.0, -2.0, -1.0], [-1.0, -2.0, -2.0],
            [-2.0, -1.0, -2.0], [-2.0, -2.0, -1.0], [-1.0, -2.0, -2.0],
            [-2.0, -2.0, -1.0], [-1.0, -2.0, -2.0], [-2.0, -1.0, -2.0],
            [-2.0, -2.0, -1.0], [-1.0, -2.0, -2.0], [-2.0, -1.0, -2.0],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(np.asarray(scene.scalings), scalings)

    # Byte-identical re-encode (import.rs:401-404).
    assert encode_polygon(scene) == source


def test_ply_roundtrip_random():
    rng = np.random.default_rng(1)
    scene = GaussianScene(
        colors_sh=jnp.asarray(rng.standard_normal((7, 48)).astype(np.float32)),
        opacities=jnp.asarray(rng.standard_normal((7, 1)).astype(np.float32)),
        positions=jnp.asarray(rng.standard_normal((7, 3)).astype(np.float32)),
        rotations=jnp.asarray(rng.standard_normal((7, 4)).astype(np.float32)),
        scalings=jnp.asarray(rng.standard_normal((7, 3)).astype(np.float32)),
    )
    blob = encode_polygon(scene)
    decoded = decode_polygon(io.BytesIO(blob))
    for name in ("colors_sh", "opacities", "positions", "rotations", "scalings"):
        np.testing.assert_array_equal(
            np.asarray(getattr(scene, name)), np.asarray(getattr(decoded, name))
        )
    # And re-encode is byte-identical.
    assert encode_polygon(decoded) == blob


def test_ply_header_mismatch_raises():
    with pytest.raises(MismatchedPolygonHeaderError):
        decode_polygon(b"ply\nformat ascii 1.0\nelement vertex 0\nend_header\n")
    with pytest.raises(MismatchedPolygonHeaderError):
        decode_polygon(
            b"ply\nformat binary_little_endian 1.0\n"
            b"element vertex 1\nproperty float x\nend_header\n" + b"\x00" * 4
        )


def test_ply_io_failures_wrap_as_io_error():
    """Reader/writer faults surface as GausplatError (ref Error::Io,
    error/mod.rs:15-16), not bare OSError."""
    from gausplat_tpu.errors import GausplatError, IoError

    class FailingReader:
        def readline(self):
            raise OSError("boom")

        def read(self, n=-1):
            raise OSError("boom")

    class FailingWriter:
        def write(self, data):
            raise OSError("disk full")

    with pytest.raises(IoError):
        decode_polygon(FailingReader())

    class HeaderThenFail(FailingReader):
        """Valid header, then the payload read fails."""

        def __init__(self, blob):
            self._buf = io.BytesIO(blob)

        def readline(self):
            return self._buf.readline()

    blob = encode_polygon(GaussianScene.default())
    with pytest.raises(IoError):
        decode_polygon(HeaderThenFail(blob))
    with pytest.raises(IoError):
        encode_polygon(GaussianScene.default(), FailingWriter())
    assert issubclass(IoError, GausplatError)


def test_native_codec_matches_numpy():
    """When the C++ codec is built, it must match the NumPy path exactly."""
    from gausplat_tpu.utils import native
    from gausplat_tpu.scene import ply as ply_mod

    if not native.available():
        import pytest as _pytest

        _pytest.skip("native extension not built")

    rng = np.random.default_rng(8)
    scene = GaussianScene(
        colors_sh=jnp.asarray(rng.standard_normal((33, 48)).astype(np.float32)),
        opacities=jnp.asarray(rng.standard_normal((33, 1)).astype(np.float32)),
        positions=jnp.asarray(rng.standard_normal((33, 3)).astype(np.float32)),
        rotations=jnp.asarray(rng.standard_normal((33, 4)).astype(np.float32)),
        scalings=jnp.asarray(rng.standard_normal((33, 3)).astype(np.float32)),
    )
    # Native encode vs NumPy encode must be byte-identical.
    blob_native = encode_polygon(scene)
    orig = native._native
    native._native = None
    try:
        blob_numpy = encode_polygon(scene)
        scene_numpy = decode_polygon(blob_native)
    finally:
        native._native = orig
    assert blob_native == blob_numpy
    scene_native = decode_polygon(blob_native)
    for name in ("colors_sh", "opacities", "positions", "rotations", "scalings"):
        np.testing.assert_array_equal(
            np.asarray(getattr(scene_native, name)),
            np.asarray(getattr(scene_numpy, name)),
        )


# --- scene shape validation (reference error/mod.rs:30-35) ---------------------


def test_wrong_trailing_dim_raises():
    from gausplat_tpu.errors import MismatchedTensorShapeError

    good = GaussianScene.from_points(Points.default(4))
    with pytest.raises(MismatchedTensorShapeError):
        GaussianScene(
            colors_sh=jnp.zeros((4, 47)),  # should be 48
            opacities=good.opacities,
            positions=good.positions,
            rotations=good.rotations,
            scalings=good.scalings,
        )
    with pytest.raises(MismatchedTensorShapeError):
        good.set_rotations(jnp.zeros((4, 3)))  # quat must be [P, 4]


def test_mismatched_point_counts_raise():
    from gausplat_tpu.errors import MismatchedTensorShapeError

    good = GaussianScene.from_points(Points.default(4))
    bad = GaussianScene(
        colors_sh=good.colors_sh,
        opacities=jnp.zeros((5, 1)),  # 5 != 4
        positions=good.positions,
        rotations=good.rotations,
        scalings=good.scalings,
    )
    # Transient mismatches are legal (setters build one param at a time);
    # consistency is enforced at point_count — i.e. before any render.
    with pytest.raises(MismatchedTensorShapeError):
        bad.point_count


def test_scene_validation_allows_jit_and_vmap():
    import jax

    good = GaussianScene.from_points(Points.default(4))

    @jax.jit
    def double(s):
        return GaussianScene(
            colors_sh=s.colors_sh * 2,
            opacities=s.opacities * 2,
            positions=s.positions * 2,
            rotations=s.rotations * 2,
            scalings=s.scalings * 2,
        )

    out = double(good)
    np.testing.assert_allclose(
        np.asarray(out.positions), np.asarray(good.positions) * 2
    )


def test_truncated_payload_raises():
    good = GaussianScene.from_points(Points.default(4))
    blob = encode_polygon(good)
    with pytest.raises(MismatchedPolygonHeaderError):
        decode_polygon(blob[:-8])


def test_negative_point_count_raises():
    blob = encode_polygon(GaussianScene.from_points(Points.default(2)))
    bad = blob.replace(b"element vertex 2", b"element vertex -2", 1)
    with pytest.raises(MismatchedPolygonHeaderError):
        decode_polygon(bad)


# --- reference RNG stream (import.rs:217-237) -----------------------------------


def test_reference_rng_stream_golden():
    """Pin the reimplemented Rust StdRng(0x3D65) LogNormal(0, e) stream.

    The ChaCha12 core is validated against the published zero-key test
    vector; these goldens lock the composed stream (seed_from_u64 ->
    ChaCha12 -> ziggurat f64 normal -> f32 LogNormal) against regression.
    """
    from gausplat_tpu.utils.rand_compat import (
        ChaCha12U64Stream,
        reference_lognormal_e_f32,
        seed_from_u64,
    )

    # ChaCha12, all-zero seed: first keystream bytes are the published
    # test vector 9BF49A6A 0755F953 811FCE12 5F2683D5 ...
    s = ChaCha12U64Stream(bytes(32))
    first = [int(x) for x in s.take(2)]
    assert first == [0x53F955076A9AF49B, 0xD583265F12CE1F81]

    v = reference_lognormal_e_f32(8)
    np.testing.assert_array_equal(
        v,
        np.array(
            [
                1.03561187, 2.83414578, 1.71022177, 4.31253433,
                41.1576691, 0.889902353, 0.431984365, 48.3707466,
            ],
            np.float32,
        ),
    )


def test_from_points_seed_compat():
    pts = Points.default(64)
    a = GaussianScene.from_points(pts)  # reference stream (default)
    b = GaussianScene.from_points(pts, seed_compat="reference")
    c = GaussianScene.from_points(pts, seed_compat="numpy")
    np.testing.assert_array_equal(np.asarray(a.scalings), np.asarray(b.scalings))
    assert not np.array_equal(np.asarray(a.scalings), np.asarray(c.scalings))
    # Everything but the scale stream is identical.
    for name in ("colors_sh", "opacities", "positions", "rotations"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(c, name))
        )
