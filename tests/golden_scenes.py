"""Shared golden-view definitions: scene builders + the CASES table.

Single source of truth for BOTH the golden generator
(``scripts/gen_goldens.py`` — renders each case through the independent
f64 oracle) and the regression test (``tests/test_golden_image.py`` —
renders the same case through the engine and compares). Keeping them in
one module means an edit to a scene cannot silently desynchronize the
golden from the test (round-4 advisor finding #4).

Every builder is deterministic (fixed seeds; the RNG *draw order* inside
each pre-existing builder is preserved verbatim — the committed goldens
depend on it). Reference semantics each view pins (WGSL lines under
/root/reference/src/render/gaussian_3d/jit/kernel/):

- sixstars_128x96:        the 18-point reference fixture, SH degree 3
- sixstars_shdeg3_96x64:  off-axis close view; SH degrees 1-3 + color clamp
- tieddepth_64x48:        equal view depth -> equal (tile, depth16) keys;
                          stable point-id tie order
- ewaclamp_96x64:         points ringing the clamped normalized-coordinate
                          bound tan(fov/2)*1.3 (transform/kernel.wgsl:214-241)
- saturated_48x48:        near-opaque stack; 252/255 alpha ceiling +
                          transmittance-floor stop (rasterize/kernel.wgsl:163-185)
- aabbedge_80x56:         anisotropic splats straddling every image border
                          (tile-AABB truncation, transform/kernel.wgsl:286-306)
- depthwindow_64x48:      points straddling BOTH depth-window bounds
                          [0.25, 16384) (transform/kernel.wgsl:104-106)
- depthtie16_64x48:       DISTINCT f32 depths quantizing to EQUAL depth16
                          keys ((bits + offset) >> 11, rank/kernel.wgsl:112-114);
                          blend order must fall back to stable point-id order,
                          NOT true f32 depth order
"""

import numpy as np

from gausplat_tpu import GaussianScene, Points, View, decode_polygon

REFERENCE_FIXTURE = "/root/reference/examples/data/3dgs-ply/sixstars.3dgs.ply"


def sixstars_scene():
    with open(REFERENCE_FIXTURE, "rb") as fh:
        return decode_polygon(fh.read())


def tieddepth_scene():
    """6 overlapping Gaussians at identical view depth (equal z toward a
    -z-looking camera) with distinct colors — any divergence from the
    stable point-id tie order changes the image."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    p = 40
    positions = rng.standard_normal((p, 3)).astype(np.float32) * 0.5
    positions[:6, 2] = 0.125
    positions[:6, 0] = 0.05 * np.arange(6) - 0.12
    positions[:6, 1] = 0.0
    scene = GaussianScene.from_points(Points.default(p))
    scene = scene.set_positions(jnp.asarray(positions))
    scene = scene.set_rotations(
        jnp.asarray(rng.standard_normal((p, 4)).astype(np.float32))
    )
    scene = scene.set_scalings(
        jnp.asarray((0.05 + 0.12 * rng.random((p, 3))).astype(np.float32))
    )
    scene = scene.set_opacities(
        jnp.asarray((0.4 + 0.55 * rng.random((p, 1))).astype(np.float32))
    )
    csh = np.zeros((p, 48), np.float32)
    csh[:, :3] = rng.random((p, 3)).astype(np.float32) * 2.0 - 0.5
    return scene.set_colors_sh(jnp.asarray(csh))


def ewaclamp_scene():
    """Points ringing the view-bound clamp (|norm| vs tan(fov/2)*1.3)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    p = 24
    z = 2.0
    # fov_x=1.2 -> bound_x = tan(0.6)*1.3 = 0.889; fov_y=0.9 -> 0.628.
    fracs = np.linspace(0.75, 1.25, p)  # straddle the clamp boundary
    ang = rng.random(p) * 2 * np.pi
    positions = np.stack(
        [
            fracs * 0.889 * z * np.cos(ang),
            fracs * 0.628 * z * np.sin(ang),
            np.full(p, z),
        ],
        axis=1,
    ).astype(np.float32)
    scene = GaussianScene.from_points(Points.default(p))
    scene = scene.set_positions(jnp.asarray(positions))
    scene = scene.set_rotations(
        jnp.asarray(rng.standard_normal((p, 4)).astype(np.float32))
    )
    scene = scene.set_scalings(
        jnp.asarray((0.08 + 0.25 * rng.random((p, 3))).astype(np.float32))
    )
    scene = scene.set_opacities(
        jnp.asarray((0.5 + 0.45 * rng.random((p, 1))).astype(np.float32))
    )
    csh = np.zeros((p, 48), np.float32)
    csh[:, :3] = rng.random((p, 3)).astype(np.float32) * 2.0 - 0.5
    return scene.set_colors_sh(jnp.asarray(csh))


def saturated_scene():
    """A deep stack of near-opaque splats on one screen region: the alpha
    ceiling min(op*density, 252/255) clamps on the front layers and the
    transmittance floor (1-252/255)^2 stops every pixel early — pinning
    both constants and the first-crossing stop order
    (rasterize/kernel.wgsl:163-185)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(41)
    p = 30
    positions = np.stack(
        [
            rng.standard_normal(p).astype(np.float32) * 0.15,
            rng.standard_normal(p).astype(np.float32) * 0.15,
            np.linspace(1.5, 3.0, p).astype(np.float32),
        ],
        axis=1,
    )
    scene = GaussianScene.from_points(Points.default(p))
    scene = scene.set_positions(jnp.asarray(positions))
    scene = scene.set_rotations(
        jnp.asarray(rng.standard_normal((p, 4)).astype(np.float32))
    )
    scene = scene.set_scalings(
        jnp.asarray((0.15 + 0.2 * rng.random((p, 3))).astype(np.float32))
    )
    scene = scene.set_opacities(
        jnp.asarray((0.97 + 0.029 * rng.random((p, 1))).astype(np.float32))
    )
    csh = np.zeros((p, 48), np.float32)
    csh[:, :3] = rng.random((p, 3)).astype(np.float32) * 2.0 - 0.5
    return scene.set_colors_sh(jnp.asarray(csh))


def aabbedge_scene():
    """Anisotropic splats straddling the image borders + one frame-filler."""
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    p = 16
    # fov 1.1/0.85 at z=3: view half-extents ~ tan(0.55)*3=1.84 x,
    # tan(0.425)*3=1.36 y. Park centers just outside/inside each border.
    edge = np.array(
        [
            [-2.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, -1.5, 0.0],
            [0.0, 1.5, 0.0], [-1.9, -1.4, 0.0], [1.9, 1.4, 0.0],
            [-1.7, 1.3, 0.0], [1.7, -1.3, 0.0],
        ],
        dtype=np.float32,
    )
    positions = np.concatenate(
        [edge, rng.standard_normal((p - len(edge) - 1, 3)).astype(np.float32) * 0.7,
         np.zeros((1, 3), np.float32)],
    )
    scene = GaussianScene.from_points(Points.default(p))
    scene = scene.set_positions(jnp.asarray(positions))
    rot = rng.standard_normal((p, 4)).astype(np.float32)
    scene = scene.set_rotations(jnp.asarray(rot))
    # Strong anisotropy: one axis 10-30x the others (eigen-radius path).
    scal = 0.02 + 0.03 * rng.random((p, 3)).astype(np.float32)
    scal[:, 0] *= 10.0 + 20.0 * rng.random(p).astype(np.float32)
    scal[-1] = [2.5, 2.5, 0.05]  # frame-filling splat
    scene = scene.set_scalings(jnp.asarray(scal))
    scene = scene.set_opacities(
        jnp.asarray((0.35 + 0.6 * rng.random((p, 1))).astype(np.float32))
    )
    csh = np.zeros((p, 48), np.float32)
    csh[:, :3] = rng.random((p, 3)).astype(np.float32) * 2.0 - 0.5
    return scene.set_colors_sh(jnp.asarray(csh))


def _basic_scene(rng, positions, scalings, opacities):
    """Shared assembly for the NEW (round-5) scenes: rotations, then colors,
    drawn from ``rng`` AFTER the caller's own draws."""
    import jax.numpy as jnp

    p = positions.shape[0]
    scene = GaussianScene.from_points(Points.default(p))
    scene = scene.set_positions(jnp.asarray(positions.astype(np.float32)))
    scene = scene.set_rotations(
        jnp.asarray(rng.standard_normal((p, 4)).astype(np.float32))
    )
    scene = scene.set_scalings(jnp.asarray(scalings.astype(np.float32)))
    scene = scene.set_opacities(jnp.asarray(opacities.astype(np.float32)))
    csh = np.zeros((p, 48), np.float32)
    csh[:, :3] = rng.random((p, 3)).astype(np.float32) * 2.0 - 0.5
    return scene.set_colors_sh(jnp.asarray(csh))


def depthwindow_scene():
    """Points straddling BOTH depth-window bounds.

    The window is [0.25, 16384) in view depth (DEPTH_MIN <= d < DEPTH_MAX,
    transform/kernel.wgsl:104-106; constants.py). Camera at the origin
    looking +z (identity transform), so view depth == world z exactly (no
    rounding in the transform). Near group: bright splats at z just below
    / exactly at / just above 0.25 — an inclusion-boundary flip
    adds/removes a dominant foreground layer. Far group: enormous splats
    at z just inside / exactly at / beyond 16384 — the in-window ones must
    render, the others must cull. Exact-boundary values are f32-exact
    (0.25 and 16384 are powers of two; np.nextafter picks the adjacent
    representables)."""
    rng = np.random.default_rng(53)
    f32 = np.float32
    z_near = [
        np.nextafter(f32(0.25), f32(0.0)),     # culled (just below min)
        f32(0.25),                             # included (closed lower bound)
        np.nextafter(f32(0.25), f32(1.0)),     # included
    ]
    z_far = [
        f32(16000.0),                          # included
        np.nextafter(f32(16384.0), f32(0.0)),  # included (open upper bound)
        f32(16384.0),                          # culled (== max)
        f32(17000.0),                          # culled
    ]
    # Near splats: small offsets so all three would overlap on screen.
    near = np.array(
        [[-0.01 + 0.01 * i, 0.005 * i, z] for i, z in enumerate(z_near)],
        dtype=np.float32,
    )
    # Far splats: at z~16k a splat needs world scale O(100) to cover pixels
    # (focal ~59 px at fov 1.0 / width 64 -> radius_px ~ 3*scale*focal/z).
    far = np.array(
        [[300.0 * i - 450.0, 100.0 * (i % 2), z] for i, z in enumerate(z_far)],
        dtype=np.float32,
    )
    # Mid-scene filler so the image has structure either way.
    mid = rng.standard_normal((6, 3)).astype(np.float32) * 0.4
    mid[:, 2] = 1.5 + 0.4 * rng.random(6).astype(np.float32)
    positions = np.concatenate([near, far, mid])
    p = positions.shape[0]
    scal = np.empty((p, 3), np.float32)
    scal[:3] = 0.004 + 0.004 * rng.random((3, 3))   # near: tiny world scale
    scal[3:7] = 250.0 + 150.0 * rng.random((4, 3))  # far: enormous
    scal[7:] = 0.06 + 0.1 * rng.random((6, 3))
    return _basic_scene(rng, positions, scal, 0.6 + 0.35 * rng.random((p, 1)))


def depthtie16_scene():
    """DISTINCT f32 view depths that quantize to EQUAL depth16 keys.

    depth16 = (bits(d) + offset) >> 11 drops the 11 low mantissa bits
    (rank/kernel.wgsl:112-114): consecutive f32 values can share a key.
    Six overlapping splats sit at z = 2.0 + k*ulp(2.0), assigned to point
    ids in REVERSE depth order — an engine that blended by true f32 depth
    would paint them in id order 5,4,3,2,1,0, while the reference
    semantics (equal 16-bit keys, stable sort) blend in point-id order
    0..5. The builder asserts the depths are distinct in f32 but equal in
    depth16. Camera at the origin looking +z: view depth == world z with
    no transform rounding."""
    rng = np.random.default_rng(67)
    base = np.float32(2.0)
    ulp = np.float32(np.spacing(base))
    ks = np.arange(6)
    # Reverse: point id 0 gets the DEEPEST depth of the tied group.
    z = (base + ulp * (5 - ks)).astype(np.float32)
    assert len(np.unique(z)) == 6, "depths must be distinct in f32"
    # Mirror the reference quantization to assert the tie holds.
    bits = z.view(np.uint32)
    d16 = (bits + np.uint32(((3 << 23) + 0xC0000000) & 0xFFFFFFFF)) >> np.uint32(11)
    assert len(np.unique(d16)) == 1, f"depth16 keys must tie, got {d16}"
    positions = np.stack(
        [
            (0.04 * ks - 0.1).astype(np.float32),  # heavy x-overlap
            np.zeros(6, np.float32),
            z,
        ],
        axis=1,
    )
    # A few background points so mis-ordered blending also shifts
    # occlusion against non-tied content.
    bg = rng.standard_normal((8, 3)).astype(np.float32) * 0.3
    bg[:, 2] = 2.5 + rng.random(8).astype(np.float32)
    positions = np.concatenate([positions, bg])
    p = positions.shape[0]
    scal = np.concatenate(
        [
            np.full((6, 3), 0.12, np.float32),
            (0.05 + 0.08 * rng.random((8, 3))).astype(np.float32),
        ]
    )
    return _basic_scene(rng, positions, scal, 0.55 + 0.4 * rng.random((p, 1)))


def _rot_y(a):
    return np.array(
        [
            [np.cos(a), 0.0, np.sin(a)],
            [0.0, 1.0, 0.0],
            [-np.sin(a), 0.0, np.cos(a)],
        ]
    )


def _view(fx, fy, h, w, pos, rot=None):
    rot = np.eye(3) if rot is None else rot
    pos = np.asarray(pos, np.float64)
    return View(
        field_of_view_x=fx, field_of_view_y=fy,
        image_height=h, image_width=w,
        view_position=pos,
        view_transform=View.transform(rot.T, -rot @ pos),
    )


#: name -> (scene builder, view builder, sh_degree)
CASES = {
    "sixstars_128x96": (
        sixstars_scene,
        lambda: _view(1.2, 0.9, 96, 128, [0.5, -0.3, -3.5]),
        3,
    ),
    "sixstars_shdeg3_96x64": (
        sixstars_scene,
        lambda: _view(1.4, 1.0, 64, 96, [1.2, 0.4, -1.8], _rot_y(0.5)),
        3,
    ),
    "tieddepth_64x48": (
        tieddepth_scene,
        lambda: _view(1.0, 0.8, 48, 64, [0.0, 0.0, -4.0]),
        0,
    ),
    "ewaclamp_96x64": (
        ewaclamp_scene,
        lambda: _view(1.2, 0.9, 64, 96, [0.0, 0.0, 0.0]),
        0,
    ),
    "saturated_48x48": (
        saturated_scene,
        lambda: _view(0.9, 0.9, 48, 48, [0.0, 0.0, -2.0]),
        0,
    ),
    "aabbedge_80x56": (
        aabbedge_scene,
        lambda: _view(1.1, 0.85, 56, 80, [0.0, 0.0, -3.0]),
        0,
    ),
    "depthwindow_64x48": (
        depthwindow_scene,
        lambda: _view(1.0, 0.8, 48, 64, [0.0, 0.0, 0.0]),
        0,
    ),
    "depthtie16_64x48": (
        depthtie16_scene,
        lambda: _view(1.0, 0.8, 48, 64, [0.0, 0.0, 0.0]),
        0,
    ),
}
