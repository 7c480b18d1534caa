"""Rasterizer tests: differential tests of the vectorized TPU rasterizer
against the sequential NumPy oracle (reference semantics), and of the
custom-VJP backward against pure JAX autodiff of the forward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gausplat_tpu import GaussianScene, View
from gausplat_tpu.ops.binning import bin_gaussians
from gausplat_tpu.ops.projection import Camera, project_gaussians
from gausplat_tpu.ops.rasterize import (
    build_entry_stream,
    pack_point_data,
    rasterize_backward_xla,
    rasterize_forward_xla,
    tile_image,
    untile_image,
    untile_map,
)
from gausplat_tpu.render import pipeline as pipeline_mod

import oracle

W, H = 56, 40  # partial tiles on both axes (56 = 3.5 tiles, 40 = 2.5 tiles)
TCX, TCY = 4, 3
CAP, B = 1024, 64
P = 80


def _scene_arrays(seed=3):
    rng = np.random.default_rng(seed)
    csh = rng.standard_normal((P, 48)).astype(np.float32) * 0.4
    positions = (rng.standard_normal((P, 3)) * 0.8).astype(np.float32)
    rotations = rng.standard_normal((P, 4)).astype(np.float32)
    scalings = np.log(0.02 + 0.15 * rng.random((P, 3))).astype(np.float32)
    op_inner = (rng.standard_normal((P, 1)) * 2).astype(np.float32)
    return csh, positions, rotations, scalings, op_inner


def _view():
    return View(
        field_of_view_x=1.0,
        field_of_view_y=0.8,
        image_height=H,
        image_width=W,
        view_position=[0.0, 0.0, -4.0],
        view_transform=View.transform(np.eye(3), [0.0, 0.0, 4.0]),
    )


def _forward_pieces(seed=3, block=B):
    csh, positions, rotations, scalings, op_inner = _scene_arrays(seed)
    cam = Camera.from_view(_view())
    proj = project_gaussians(
        jnp.asarray(csh),
        jnp.asarray(positions),
        jnp.asarray(rotations),
        jnp.asarray(scalings),
        cam,
        sh_degree=3,
        tile_count_x=TCX,
        tile_count_y=TCY,
    )
    binning = bin_gaussians(
        proj.depths,
        proj.tile_x_max,
        proj.tile_x_min,
        proj.tile_y_min,
        proj.tile_counts,
        tile_count_x=TCX,
        tile_count_y=TCY,
        capacity=CAP,
    )
    pd_t = pack_point_data(proj, jax.nn.sigmoid(jnp.asarray(op_inner[:, 0])))
    stream = build_entry_stream(
        pd_t, binning.point_indices, binning.tile_ranges, block_size=block
    )
    # AoS [P, 9] view for the NumPy oracle.
    pd = np.asarray(pd_t).T[:P]
    return pd, binning, stream


def test_forward_matches_oracle():
    pd, binning, stream = _forward_pieces()
    it, tt, ct = rasterize_forward_xla(stream, num_tiles=TCX * TCY, tile_count_x=TCX)
    img = np.asarray(untile_image(it, TCX, TCY, W, H))
    trans = np.asarray(untile_map(tt, TCX, TCY, W, H))
    cnt = np.asarray(untile_map(ct, TCX, TCY, W, H))

    oimg, otrans, ocnt = oracle.rasterize_forward(
        np.asarray(pd),
        np.asarray(binning.point_indices),
        np.asarray(binning.tile_ranges),
        W, H, TCX,
    )
    assert int(binning.total) > 100  # the scene actually covers tiles
    np.testing.assert_allclose(img, oimg, atol=5e-5)
    np.testing.assert_allclose(trans, otrans, atol=5e-5)
    np.testing.assert_array_equal(cnt, ocnt)


def test_backward_matches_oracle():
    pd, binning, stream = _forward_pieces()
    it, tt, ct = rasterize_forward_xla(stream, num_tiles=TCX * TCY, tile_count_x=TCX)

    rng = np.random.default_rng(11)
    gimg = rng.standard_normal((H, W, 3)).astype(np.float32)
    gt = tile_image(jnp.asarray(gimg), TCX, TCY)
    gdotc = jnp.sum(gt * it, axis=1)
    eg = rasterize_backward_xla(stream, gt, gdotc, ct, tile_count_x=TCX)
    pp = jax.ops.segment_sum(eg.T, stream.entry_point, num_segments=P + 1)[:P]

    ocnt = np.asarray(untile_map(ct, TCX, TCY, W, H))
    otr = np.asarray(untile_map(tt, TCX, TCY, W, H))
    ref = oracle.rasterize_backward(
        np.asarray(pd),
        np.asarray(binning.point_indices),
        np.asarray(binning.tile_ranges),
        gimg, ocnt, otr, W, H, TCX,
    )
    got = (pp[:, 0:3], pp[:, 3:6], pp[:, 6:7], pp[:, 7:9])
    for name, a, b in zip(("color", "conic", "opacity", "pos2d"), got, ref):
        a = np.asarray(a)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=2e-4, err_msg=name
        )


def test_custom_vjp_matches_autodiff(atol=1e-5):
    """The hand-written backward must equal autodiff of the pure forward."""
    csh, positions, rotations, scalings, op_inner = _scene_arrays(7)
    cam = Camera.from_view(_view())
    rng = np.random.default_rng(13)
    gimg = jnp.asarray(rng.standard_normal((H, W, 3)).astype(np.float32))

    fn = pipeline_mod._make_render_fn(W, H, P, 3, CAP, B, "xla", False)

    def pure_loss(csh, op, pos, rot, scal):
        proj = project_gaussians(
            csh, pos, rot, scal, cam, sh_degree=3, tile_count_x=TCX, tile_count_y=TCY
        )
        binning = bin_gaussians(
            proj.depths, proj.tile_x_max, proj.tile_x_min, proj.tile_y_min,
            proj.tile_counts,
            tile_count_x=TCX, tile_count_y=TCY, capacity=CAP,
        )
        pd_t = pack_point_data(proj, jax.nn.sigmoid(op[:, 0]))
        stream = build_entry_stream(
            pd_t, binning.point_indices, binning.tile_ranges, block_size=B
        )
        it, _, _ = rasterize_forward_xla(stream, num_tiles=TCX * TCY, tile_count_x=TCX)
        return jnp.sum(untile_image(it, TCX, TCY, W, H) * gimg)

    def custom_loss(csh, op, pos, rot, scal):
        out = fn(csh, op, pos, rot, scal, jnp.zeros((P,)), cam)
        return jnp.sum(out.colors_rgb_2d * gimg)

    args = (
        jnp.asarray(csh), jnp.asarray(op_inner), jnp.asarray(positions),
        jnp.asarray(rotations), jnp.asarray(scalings),
    )
    g_auto = jax.jit(jax.grad(pure_loss, argnums=(0, 1, 2, 3, 4)))(*args)
    g_custom = jax.grad(custom_loss, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(
        ("colors_sh", "opacities", "positions", "rotations", "scalings"),
        g_auto, g_custom,
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b / scale, a / scale, atol=atol, err_msg=name)


def test_pallas_interpret_matches_xla(block=B, img_atol=1e-6, grad_atol=1e-5):
    """Pallas kernels (interpreter mode on CPU) vs the XLA fallback."""
    pytest.importorskip("jax.experimental.pallas")
    from gausplat_tpu.ops.rasterize import (
        rasterize_backward_pallas,
        rasterize_forward_pallas,
    )

    from gausplat_tpu.ops.rasterize import mask_empty_tiles

    pd, binning, stream = _forward_pieces(block=block)
    it_x, tt_x, ct_x = rasterize_forward_xla(
        stream, num_tiles=TCX * TCY, tile_count_x=TCX
    )
    it_p, tt_p, ct_p = rasterize_forward_pallas(
        stream, num_tiles=TCX * TCY, tile_count_x=TCX, interpret=True
    )
    # Pallas leaves tiles with no steps uninitialized by design; the
    # pipeline (and this comparison) masks them via the tile ranges.
    it_p, tt_p, ct_p = mask_empty_tiles(it_p, tt_p, ct_p, binning.tile_ranges)
    it_x, tt_x, ct_x = mask_empty_tiles(it_x, tt_x, ct_x, binning.tile_ranges)
    np.testing.assert_allclose(np.asarray(it_p), np.asarray(it_x), atol=img_atol)
    np.testing.assert_allclose(np.asarray(tt_p), np.asarray(tt_x), atol=img_atol)
    np.testing.assert_array_equal(np.asarray(ct_p), np.asarray(ct_x))

    rng = np.random.default_rng(17)
    gimg = rng.standard_normal((H, W, 3)).astype(np.float32)
    gt = tile_image(jnp.asarray(gimg), TCX, TCY)
    gdotc = jnp.sum(gt * it_x, axis=1)
    eg_x = rasterize_backward_xla(stream, gt, gdotc, ct_x, tile_count_x=TCX)
    eg_p = rasterize_backward_pallas(
        stream, gt, gdotc, ct_x, tile_count_x=TCX, interpret=True
    )
    # Positions beyond the segments (padding) are undefined in the Pallas
    # output by design; mask as the pipeline does.
    valid = np.arange(CAP) < int(binning.total)
    np.testing.assert_allclose(
        np.asarray(eg_p)[:, valid], np.asarray(eg_x)[:, valid], atol=grad_atol
    )


def test_packed_bf16_entries_close_to_f32():
    """The packed bf16-pair entry layout (RenderOptions(entry_dtype='bf16'))
    must match the f32 path to bf16 tolerance, forward and backward."""
    csh, positions, rotations, scalings, op_inner = _scene_arrays(5)
    cam = Camera.from_view(_view())
    rng = np.random.default_rng(23)
    gimg = jnp.asarray(rng.standard_normal((H, W, 3)).astype(np.float32))

    fn32 = pipeline_mod._make_render_fn(W, H, P, 3, CAP, B, "xla", False, False)
    fn16 = pipeline_mod._make_render_fn(W, H, P, 3, CAP, B, "xla", False, True)

    args = (
        jnp.asarray(csh), jnp.asarray(op_inner), jnp.asarray(positions),
        jnp.asarray(rotations), jnp.asarray(scalings),
        jnp.zeros((P,)), cam,
    )
    out32 = fn32(*args)
    out16 = fn16(*args)
    img32 = np.asarray(out32.colors_rgb_2d)
    img16 = np.asarray(out16.colors_rgb_2d)
    # bf16 mantissa is 8 bits: ~0.4% relative per entry.
    assert np.abs(img16 - img32).max() < 0.02
    assert np.abs(img16 - img32).mean() < 2e-3

    def loss(f, a):
        return jnp.sum(f(*a[:5], a[5], a[6]).colors_rgb_2d * gimg)

    g32 = jax.grad(lambda *p: loss(fn32, p + (args[5], args[6])), argnums=(0, 1, 2, 3, 4))(*args[:5])
    g16 = jax.grad(lambda *p: loss(fn16, p + (args[5], args[6])), argnums=(0, 1, 2, 3, 4))(*args[:5])
    for name, a, b in zip(
        ("colors_sh", "opacities", "positions", "rotations", "scalings"),
        g32, g16,
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, atol=2e-2, err_msg=name
        )


def test_pack_pair_roundtrip():
    from gausplat_tpu.ops.blend import pack_pair, unpack_hi, unpack_lo

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal(1024).astype(np.float32) * 100)
    b = jnp.asarray(rng.standard_normal(1024).astype(np.float32) * 0.01)
    w = pack_pair(a, b)
    ra, rb = np.asarray(unpack_hi(w)), np.asarray(unpack_lo(w))
    # bf16 keeps 7 mantissa bits; nearest-rounding max relative error 2**-8.
    np.testing.assert_allclose(ra, np.asarray(a), rtol=2.0**-8)
    np.testing.assert_allclose(rb, np.asarray(b), rtol=2.0**-8)
    # Zero is exact; packing is monotone in each half.
    assert np.asarray(unpack_hi(pack_pair(jnp.zeros(4), b[:4]))).max() == 0.0


def test_entry_stream_step_metadata_randomized():
    """Randomized invariants of the (tile, window) step decomposition:
    every tile's segment entries are covered exactly once, in order; each
    nonempty tile is initialized exactly once before any blending; output
    revisits are consecutive (the VMEM-residency requirement)."""
    rng = np.random.default_rng(0)
    for trial in range(60):
        t_count = int(rng.integers(1, 9))
        b = int(rng.choice([4, 8]))
        cap = b * int(rng.integers(1, 9))
        n = int(rng.integers(0, cap + 1))
        cuts = (
            np.sort(rng.integers(0, n + 1, t_count - 1))
            if t_count > 1 else np.array([], int)
        )
        bounds = np.concatenate([[0], cuts, [n]])
        ranges = np.stack([bounds[:-1], bounds[1:]], -1).astype(np.int32)
        s = build_entry_stream(
            jnp.zeros((9, 3)), jnp.zeros((cap,), jnp.int32),
            jnp.asarray(ranges), block_size=b,
        )
        tile, sblk, r0, r1, first = (
            np.asarray(x) for x in
            (s.step_tile, s.step_block, s.step_r0, s.step_r1, s.step_first)
        )
        covered = {t: [] for t in range(t_count)}
        inits = set()
        last_of = {}
        for i in range(len(tile)):
            lo = max(r0[i] - sblk[i] * b, 0)
            hi = min(r1[i] - sblk[i] * b, b)
            if first[i]:
                assert tile[i] not in inits
                inits.add(tile[i])
            if hi > lo:
                assert tile[i] in inits
                covered[tile[i]].extend(range(sblk[i] * b + lo, sblk[i] * b + hi))
            if tile[i] in last_of:
                assert last_of[tile[i]] == i - 1, "non-consecutive revisit"
            last_of[tile[i]] = i
        for t in range(t_count):
            assert covered[t] == list(range(ranges[t, 0], ranges[t, 1]))
            if ranges[t, 1] > ranges[t, 0]:
                assert t in inits

def test_gradients_match_finite_differences():
    """Central-difference spot check of the custom VJP (SURVEY section 4:
    the reference has no numerical-gradient tests; JAX makes them cheap).
    A handful of coordinates across all 5 parameter groups."""
    csh, positions, rotations, scalings, op_inner = _scene_arrays(21)
    cam = Camera.from_view(_view())
    rng = np.random.default_rng(3)
    gimg = jnp.asarray(rng.standard_normal((H, W, 3)).astype(np.float32))
    fn = pipeline_mod._make_render_fn(W, H, P, 3, CAP, B, "xla", False)

    args = [
        jnp.asarray(csh), jnp.asarray(op_inner), jnp.asarray(positions),
        jnp.asarray(rotations), jnp.asarray(scalings),
    ]

    def loss(*a):
        out = fn(*a, jnp.zeros((P,)), cam)
        return jnp.sum(out.colors_rgb_2d * gimg)

    loss_j = jax.jit(loss)
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(*args)

    eps = 1e-3
    checked = 0
    for ai, name in ((0, "colors_sh"), (1, "opacities"), (2, "positions"),
                     (3, "rotations"), (4, "scalings")):
        g = np.asarray(grads[ai])
        flat = g.ravel()
        # Pick the largest-|grad| coordinates: the finite difference is
        # well-conditioned there (tiny-gradient coords drown in fp noise).
        for idx in np.argsort(-np.abs(flat))[:2]:
            pert = np.zeros_like(flat)
            pert[idx] = eps
            pert = pert.reshape(g.shape)
            hi = args.copy()
            lo = args.copy()
            hi[ai] = args[ai] + pert
            lo[ai] = args[ai] - pert
            fd = (float(loss_j(*hi)) - float(loss_j(*lo))) / (2 * eps)
            an = float(flat[idx])
            scale = max(abs(an), abs(fd), 1e-3)
            # Geometric parameters cross discrete structure (tile
            # assignment, alpha floors) within +-eps: the loss is only
            # piecewise-smooth in them, so the check is coarser there.
            tol = 5e-2 if ai in (0, 1) else 2e-1
            assert abs(fd - an) / scale < tol, (name, idx, fd, an)
            checked += 1
    assert checked == 10


def test_group_skip_interpret_matches(monkeypatch):
    """GAUSPLAT_GROUP_SKIP + BLEND_GROUP: the group-skipping kernels must
    match the ungrouped XLA fallback exactly (skipped groups are all-masked
    no-ops; the chained sub-group states recompose the window blend)."""
    pytest.importorskip("jax.experimental.pallas")
    from gausplat_tpu.ops import rasterize

    monkeypatch.setattr(rasterize, "GROUP_SKIP", 1)
    monkeypatch.setattr(rasterize, "BLEND_GROUP", 16)
    test_pallas_interpret_matches_xla()


def test_group_skip_64_block_128_matches(monkeypatch):
    """The gs64 / b256_gs32 chip A/B configs' code path: multiple 64-entry
    sub-groups per window (group < block), with group-level skip predicates
    active across window boundaries."""
    pytest.importorskip("jax.experimental.pallas")
    from gausplat_tpu.ops import rasterize

    monkeypatch.setattr(rasterize, "GROUP_SKIP", 1)
    monkeypatch.setattr(rasterize, "BLEND_GROUP", 64)
    test_pallas_interpret_matches_xla(block=128)


def test_mxu_blend_matches_oracle(monkeypatch):
    """GAUSPLAT_MXU (dot_general for the color contractions) matches the
    oracle — same contractions, different summation order (ULP-level)."""
    from gausplat_tpu.ops import blend

    monkeypatch.setattr(blend, "MXU_BLEND", 1)
    test_forward_matches_oracle()
    test_backward_matches_oracle()


def test_exp2_density_matches_oracle(monkeypatch):
    """GAUSPLAT_EXP2 (exp2 density with per-entry conic pre-scale) stays
    within the oracle tolerances forward and backward (ULP-level change)."""
    from gausplat_tpu.ops import blend

    monkeypatch.setattr(blend, "EXP2_DENSITY", 1)
    test_forward_matches_oracle()
    test_backward_matches_oracle()


def test_all_flags_combined_matches(monkeypatch):
    """The combined flag config the on-chip A/B runs as ``all`` (exp2 +
    group-skip + MXU contractions together) must match
    the oracle and the XLA fallback — guards against flag interactions
    before chip time is spent on the combo."""
    pytest.importorskip("jax.experimental.pallas")
    from gausplat_tpu.ops import blend, rasterize

    monkeypatch.setattr(blend, "EXP2_DENSITY", 1)
    monkeypatch.setattr(blend, "MXU_BLEND", 1)
    monkeypatch.setattr(rasterize, "GROUP_SKIP", 1)
    monkeypatch.setattr(rasterize, "BLEND_GROUP", 32)
    test_forward_matches_oracle()
    test_backward_matches_oracle()
    test_pallas_interpret_matches_xla()


def test_quad_matmul_close_to_default(monkeypatch):
    """GAUSPLAT_QUADM (density exponent + backward grad reductions as MXU
    dots in the tile-local monomial basis) matches the default per-pair VPU
    path to f32-reassociation tolerance, forward and backward."""
    from gausplat_tpu.ops import blend

    pd, binning, stream = _forward_pieces()
    it0, tt0, ct0 = rasterize_forward_xla(
        stream, num_tiles=TCX * TCY, tile_count_x=TCX
    )
    rng = np.random.default_rng(29)
    gimg = rng.standard_normal((H, W, 3)).astype(np.float32)
    gt = tile_image(jnp.asarray(gimg), TCX, TCY)
    gdotc0 = jnp.sum(gt * it0, axis=1)
    eg0 = rasterize_backward_xla(stream, gt, gdotc0, ct0, tile_count_x=TCX)
    pp0 = jax.ops.segment_sum(eg0.T, stream.entry_point, num_segments=P + 1)[:P]

    monkeypatch.setattr(blend, "QUAD_MATMUL", 1)
    it1, tt1, ct1 = rasterize_forward_xla(
        stream, num_tiles=TCX * TCY, tile_count_x=TCX
    )
    gdotc1 = jnp.sum(gt * it1, axis=1)
    eg1 = rasterize_backward_xla(stream, gt, gdotc1, ct1, tile_count_x=TCX)
    pp1 = jax.ops.segment_sum(eg1.T, stream.entry_point, num_segments=P + 1)[:P]

    # The expanded quad in the tile-local frame is exact up to f32
    # reassociation (terms O(10), no cancellation); a blendability flip at
    # the exact 1/255 alpha threshold would show up as a count mismatch.
    np.testing.assert_array_equal(np.asarray(ct1), np.asarray(ct0))
    np.testing.assert_allclose(np.asarray(it1), np.asarray(it0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tt1), np.asarray(tt0), atol=1e-4)
    a, b = np.asarray(pp1), np.asarray(pp0)
    scale = np.maximum(np.abs(b).max(axis=0, keepdims=True), 1e-6)
    np.testing.assert_allclose(a / scale, b / scale, atol=5e-4)


def test_quadm_bwd_only_close_to_default(monkeypatch):
    """GAUSPLAT_QUADM_BWD (backward moment matmul alone, forward density on
    the default VPU path) matches the default backward to f32-reassociation
    tolerance, and leaves the forward bit-identical."""
    from gausplat_tpu.ops import blend

    pd, binning, stream = _forward_pieces()
    it0, tt0, ct0 = rasterize_forward_xla(
        stream, num_tiles=TCX * TCY, tile_count_x=TCX
    )
    rng = np.random.default_rng(29)
    gimg = rng.standard_normal((H, W, 3)).astype(np.float32)
    gt = tile_image(jnp.asarray(gimg), TCX, TCY)
    gdotc0 = jnp.sum(gt * it0, axis=1)
    eg0 = rasterize_backward_xla(stream, gt, gdotc0, ct0, tile_count_x=TCX)
    pp0 = jax.ops.segment_sum(eg0.T, stream.entry_point, num_segments=P + 1)[:P]

    monkeypatch.setattr(blend, "QUADM_BWD", 1)
    it1, tt1, ct1 = rasterize_forward_xla(
        stream, num_tiles=TCX * TCY, tile_count_x=TCX
    )
    np.testing.assert_array_equal(np.asarray(it1), np.asarray(it0))
    eg1 = rasterize_backward_xla(stream, gt, gdotc0, ct0, tile_count_x=TCX)
    pp1 = jax.ops.segment_sum(eg1.T, stream.entry_point, num_segments=P + 1)[:P]
    a, b = np.asarray(pp1), np.asarray(pp0)
    scale = np.maximum(np.abs(b).max(axis=0, keepdims=True), 1e-6)
    np.testing.assert_allclose(a / scale, b / scale, atol=5e-4)


def test_quad_matmul_interpret_matches(monkeypatch):
    """QUADM through the Pallas kernels (interpret mode) vs the QUADM XLA
    fallback — guards the in-kernel dot_general plumbing."""
    pytest.importorskip("jax.experimental.pallas")
    from gausplat_tpu.ops import blend

    monkeypatch.setattr(blend, "QUAD_MATMUL", 1)
    # Interpreter and compiled dots sum in different orders; the drift
    # compounds through the transmittance chain (reassociation-scale).
    test_pallas_interpret_matches_xla(img_atol=5e-5, grad_atol=2e-4)


def test_quad_matmul_vjp_matches_autodiff(monkeypatch):
    """With QUADM on, the hand-written moment-matmul backward must equal
    autodiff of the QUADM forward — the strongest check of the moment
    algebra (s_x, d_conic, d_opacity recovered from one [B,N]x[N,6] dot).
    Autodiff differentiates *through* the dot_general (different summation
    order than the per-entry combines), hence the reassociation atol."""
    from gausplat_tpu.ops import blend

    monkeypatch.setattr(blend, "QUAD_MATMUL", 1)
    test_custom_vjp_matches_autodiff(atol=1e-4)


def test_quad_matmul_exp2_group_skip_matches(monkeypatch):
    """QUADM composed with exp2 density, MXU color contractions and
    group-skip (the full dot-offload config if everything wins the chip
    A/B) stays on the oracle tolerances."""
    pytest.importorskip("jax.experimental.pallas")
    from gausplat_tpu.ops import blend, rasterize

    monkeypatch.setattr(blend, "QUAD_MATMUL", 1)
    monkeypatch.setattr(blend, "EXP2_DENSITY", 1)
    monkeypatch.setattr(blend, "MXU_BLEND", 1)
    monkeypatch.setattr(rasterize, "GROUP_SKIP", 1)
    monkeypatch.setattr(rasterize, "BLEND_GROUP", 32)
    test_forward_matches_oracle()
    test_backward_matches_oracle()
    test_pallas_interpret_matches_xla(block=128, img_atol=5e-5, grad_atol=2e-4)
