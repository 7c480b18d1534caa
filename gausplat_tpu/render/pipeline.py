"""The compiled render pipeline: forward + custom VJP backward.

Parity targets:
- pipeline orchestration + validation: .../render/gaussian_3d/jit/mod.rs:32-331
- autodiff bridge (custom 5-parent backward op + positions_2d_grad_norm side
  channel): /root/reference/src/scene/gaussian_3d/mod.rs:85-324

One jitted step runs: project -> bin (expand/sort/segment) -> rasterize, all
static-shape (no host sync — the reference's one CPU<->GPU readback at
rank/mod.rs:61-63 becomes a static entry-buffer capacity with an on-device
overflow indicator).

The backward is a ``jax.custom_vjp``: the rasterizer gradients come from
the Pallas backward kernel + a deterministic scatter-free reduction (a
payload-carrying sort into point-grouped order + tiled prefix sums —
instead of f32 atomics), and the projection gradients from ``jax.vjp`` of
the pure-jnp projection (instead of the hand-derived transform_backward
kernel — the equations are the same chain rule).

The densification signal ``positions_2d_grad_norm`` is delivered exactly as
in the reference: callers pass a dummy ``positions_2d_grad_norm_ref`` array
(shape [P]) whose *gradient* is the per-point grad norm
(scene/gaussian_3d/mod.rs:222-229,318-322).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..constants import (
    PIXEL_COUNT_MAX,
    SH_DEGREE_MAX,
    TILE_POINT_EXPANSION,
    TILE_SIZE_X,
    TILE_SIZE_Y,
)
from ..errors import (
    InvalidPixelCountError,
    MismatchedPointCountError,
    UnsupportedSphericalHarmonicsDegreeError,
)
from ..ops.binning import bin_gaussians
from ..ops.blend import grad_rows_to_components
from ..ops.prefix import prefix_sum
from ..ops.projection import Camera, project_gaussians
from ..ops.rasterize import (
    build_entry_stream,
    mask_empty_tiles,
    pack_point_data,
    rasterize_backward_pallas,
    rasterize_backward_xla,
    rasterize_forward_pallas,
    rasterize_forward_xla,
    tile_image,
    untile_image,
    untile_map,
    DEFAULT_BLOCK_SIZE,
)
from ..scene.gaussian_3d import GaussianScene
from .view import View

import os as _os

#: Fused Pallas tile-key expansion (ops/expand.py) — opt-in, default OFF.
#: REFUTED as the default on this chip class (PERF_AB_r05.jsonl): the
#: chain A/B is a wash at the light tier (122.99 fused vs 122.72 gather)
#: and 2.6% slower at the heavy tier (222.75 vs 217.01) — the isolated
#: 10.2 ms pack-gather saving does not survive in-chain, where XLA
#: overlaps the expand with neighboring stages. Kept (bit-identical,
#: tested) for re-evaluation on TPU generations with a different
#: gather/MXU balance, like GROUP_SKIP.
FUSED_EXPAND = int(_os.environ.get("GAUSPLAT_FUSED_EXPAND", "0"))


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Rendering options (reference Gaussian3dRenderOptions + TPU knobs)."""

    #: Max SH degree used for color (reference mod.rs:46-52).
    colors_sh_degree_max: int = SH_DEGREE_MAX
    #: Static capacity of the (tile, point) entry buffer. ``None`` derives
    #: ``point_count * TILE_POINT_EXPANSION`` (clamped to at least 2^16).
    tile_entry_capacity: Optional[int] = None
    #: Points per rasterization batch.
    block_size: int = DEFAULT_BLOCK_SIZE
    #: 'pallas' | 'xla' | 'auto' (pallas on TPU, xla elsewhere).
    backend: str = "auto"
    #: Run Pallas kernels in interpreter mode (debugging).
    interpret: bool = False
    #: Per-entry data precision: 'f32' (reference parity) or 'bf16'
    #: (packed bf16-pair rows — halves the rasterizer's HBM traffic;
    #: positions and accumulation stay f32).
    entry_dtype: str = "f32"
    #: Alpha-aware tile culling: shrink each point's touched-tile AABB to
    #: the exact bounding box of its blendable (alpha >= 1/255) ellipse
    #: (see ops.projection.project_gaussians). Image and gradients are
    #: unchanged up to a few ULPs (dropped entries blend into nothing;
    #: batch boundaries regroup); the entry stream and pair-evaluation
    #: count shrink. Off = reference AABB semantics
    #: (point_rendered_counts then also match the reference's indices).
    tight_culling: bool = True


class RenderOutput(NamedTuple):
    """Forward render results."""

    colors_rgb_2d: jax.Array  # [H, W, 3]
    radii: jax.Array  # [P] int32 (0 = culled) — densification signal
    tile_point_total: jax.Array  # [] int32 true entry count (overflow check)
    transmittances: jax.Array  # [H, W] final per-pixel transmittance
    point_rendered_counts: jax.Array  # [H, W] int32


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend


def _capacity(point_count: int, options: RenderOptions) -> int:
    if options.tile_entry_capacity is not None:
        cap = int(options.tile_entry_capacity)
    else:
        cap = point_count * TILE_POINT_EXPANSION
    cap = max(cap, 1 << 16)
    # Keep it a multiple of the block size for clean alignment math.
    b = options.block_size
    return (cap + b - 1) // b * b


def reduce_entry_grads(
    entry_grads: jax.Array,  # [R, capacity] rows at sorted-entry positions
    sorted_pids: jax.Array,  # [capacity] int32 source point (P = padding)
    point_offsets: jax.Array,  # [P] inclusive cumsum of touched-tile counts
    entry_total: jax.Array,  # [] int32 true entry count
    capacity: int,
    packed: bool,
) -> list:
    """Deterministic, scatter-free per-point gradient accumulation.

    Replaces the reference's atomicAdd (rasterize_backward/kernel.wgsl:
    255-269): ONE stable payload sort groups the per-entry grad rows by
    point id (within a point, entries keep their tile-ascending stream
    order), then per-row prefix sums differenced at each point's span end
    yield the per-point totals. On this chip the multi-operand lax.sort is
    the FAST permutation primitive (~6 ms at 2.4M rows) while every random
    gather/scatter formulation measured 12-190 ms (scripts/prof_reduce.py:
    full_current 124 ms with the round-3 inverse-permutation gather vs
    35 ms for this sort-based form). Returns the 9 per-point component
    sums [color_r, color_g, color_b, conic_xx, conic_xy, conic_yy,
    opacity(outer), pos2d_x, pos2d_y].
    """
    with jax.named_scope("gausplat.grad_reduce"):
        valid_count = jnp.minimum(entry_total, jnp.int32(capacity))
        # No padding mask is needed before the sort: every slot the
        # backward kernel never writes (blocks past the last real
        # step) lies at position >= valid_count, where sorted_pids
        # already holds the sentinel P — the sort moves those slots
        # (and any uninitialized garbage they carry, NaN included)
        # past every real entry, and the span-end gather below only
        # reads inclusive prefixes at indices <= valid_count - 1,
        # which garbage at higher positions cannot reach.
        srt = jax.lax.sort(
            (sorted_pids,)
            + tuple(entry_grads[r] for r in range(entry_grads.shape[0])),
            num_keys=1,
            is_stable=True,
        )
        grads_by_point = grad_rows_to_components(srt[1:], packed)
        # Row-by-row scans, then one stack for the placement gather:
        # a batched [9, rows, 512] scan crosses the 8-sublane tile
        # (4.2 vs 2.2 ms measured), and stacking before unpack would
        # materialize an extra [9, capacity] copy.
        cs = jnp.stack([prefix_sum(g) for g in grads_by_point])
        hi_raw = jnp.minimum(point_offsets, valid_count) - 1
        hi_idx = jnp.maximum(hi_raw, 0)
        # The span-end gather is split [:8] / [8]: a 9-row column slice
        # crosses the 8-sublane tile boundary, alone a 2x gather penalty.
        hi = jnp.concatenate(
            [
                jnp.take(cs[:8], hi_idx, axis=1),
                jnp.take(cs[8], hi_idx)[None],
            ],
            axis=0,
        )
        hi = jnp.where(hi_raw[None, :] >= 0, hi, 0.0)
        lo = jnp.concatenate(
            [jnp.zeros((hi.shape[0], 1), hi.dtype), hi[:, :-1]], axis=1
        )
        d_all = hi - lo
        return [d_all[r] for r in range(d_all.shape[0])]


def _build_render_fn(
    image_width: int,
    image_height: int,
    point_count: int,
    sh_degree: int,
    capacity: int,
    block_size: int,
    backend: str,
    interpret: bool,
    packed: bool = False,
    grad_norm_half: Optional[tuple] = None,
    grad_norm_psum_axis: Optional[str] = None,
    tight_culling: bool = True,
):
    """Build the (unjitted) custom-VJP render core for a static config.

    The returned function is a pure jittable function of
    ``(colors_sh, opacities, positions, rotations, scalings,
    positions_2d_grad_norm_ref, camera)`` and composes with ``jax.vmap``
    (view batching) and ``jax.shard_map`` (tile sharding / data
    parallelism) — see :mod:`gausplat_tpu.parallel`.

    ``grad_norm_half``: static (half_width, half_height) used for the
    densification grad norm instead of the camera's (which is shifted
    per-slab under tile sharding — the signal must use the full-frame
    scale). ``grad_norm_psum_axis``: mesh axis over which the 2-D position
    gradient is summed *before* taking the norm, so slab-spanning Gaussians
    get the exact single-chip norm (divided by the axis size because the
    shard_map transpose psums the replicated ref cotangent afterwards).
    """
    tile_count_x = -(-image_width // TILE_SIZE_X)
    tile_count_y = -(-image_height // TILE_SIZE_Y)
    num_tiles = tile_count_x * tile_count_y

    def _forward_internals(colors_sh, opacities, positions, rotations, scalings, camera):
        with jax.named_scope("gausplat.project"):
            proj = project_gaussians(
                colors_sh,
                positions,
                rotations,
                scalings,
                camera,
                sh_degree=sh_degree,
                tile_count_x=tile_count_x,
                tile_count_y=tile_count_y,
                opacities=opacities,
                tight_culling=tight_culling,
            )
        with jax.named_scope("gausplat.bin"):
            binning = bin_gaussians(
                proj.depths,
                proj.tile_x_max,
                proj.tile_x_min,
                proj.tile_y_min,
                proj.tile_counts,
                tile_count_x=tile_count_x,
                tile_count_y=tile_count_y,
                capacity=capacity,
                # Opt-in Pallas windowed expansion (bit-identical; see
                # ops/expand.py and the FUSED_EXPAND refutation note).
                fused_expand=FUSED_EXPAND and backend == "pallas",
                interpret=interpret,
            )
        with jax.named_scope("gausplat.entry_stream"):
            opac_outer = jax.nn.sigmoid(opacities[:, 0])
            point_data = pack_point_data(proj, opac_outer, packed)
            stream = build_entry_stream(
                point_data,
                binning.point_indices,
                binning.tile_ranges,
                block_size=block_size,
                packed=packed,
            )
        with jax.named_scope("gausplat.rasterize"):
            if backend == "pallas":
                image_tiles, trans_tiles, count_tiles = rasterize_forward_pallas(
                    stream,
                    num_tiles=num_tiles,
                    tile_count_x=tile_count_x,
                    interpret=interpret,
                )
            else:
                image_tiles, trans_tiles, count_tiles = rasterize_forward_xla(
                    stream, num_tiles=num_tiles, tile_count_x=tile_count_x
                )
            image_tiles, trans_tiles, count_tiles = mask_empty_tiles(
                image_tiles, trans_tiles, count_tiles, binning.tile_ranges
            )
        return proj, binning, stream, image_tiles, trans_tiles, count_tiles

    @jax.custom_vjp
    def render_fn(
        colors_sh, opacities, positions, rotations, scalings,
        positions_2d_grad_norm_ref, camera,
    ):
        out, _ = _render_fwd(
            colors_sh, opacities, positions, rotations, scalings,
            positions_2d_grad_norm_ref, camera,
        )
        return out

    def _render_fwd(
        colors_sh, opacities, positions, rotations, scalings,
        positions_2d_grad_norm_ref, camera,
    ):
        del positions_2d_grad_norm_ref  # value unused; its *grad* is the signal
        proj, binning, stream, image_tiles, trans_tiles, count_tiles = (
            _forward_internals(
                colors_sh, opacities, positions, rotations, scalings, camera
            )
        )
        image = untile_image(
            image_tiles, tile_count_x, tile_count_y, image_width, image_height
        )
        out = RenderOutput(
            colors_rgb_2d=image,
            radii=proj.radii,
            tile_point_total=binning.total,
            transmittances=untile_map(
                trans_tiles, tile_count_x, tile_count_y, image_width, image_height
            ),
            point_rendered_counts=untile_map(
                count_tiles, tile_count_x, tile_count_y, image_width, image_height
            ),
        )
        residuals = (
            colors_sh, opacities, positions, rotations, scalings, camera,
            stream, binning.point_offsets, binning.point_indices,
            binning.total, image_tiles, count_tiles,
        )
        return out, residuals

    def _render_bwd(residuals, cotangents):
        (
            colors_sh, opacities, positions, rotations, scalings, camera,
            stream, point_offsets, sorted_pids, entry_total,
            image_tiles, count_tiles,
        ) = residuals
        grad_image = cotangents.colors_rgb_2d  # [H, W, 3]

        grad_tiles = tile_image(grad_image, tile_count_x, tile_count_y)
        gdotc_tiles = jnp.sum(grad_tiles * image_tiles, axis=1)  # [T, 256]

        if backend == "pallas":
            entry_grads = rasterize_backward_pallas(
                stream,
                grad_tiles,
                gdotc_tiles,
                count_tiles,
                tile_count_x=tile_count_x,
                interpret=interpret,
            )
        else:
            entry_grads = rasterize_backward_xla(
                stream,
                grad_tiles,
                gdotc_tiles,
                count_tiles,
                tile_count_x=tile_count_x,
            )

        # Deterministic, scatter-free gradient accumulation over duplicated
        # entries (replaces atomicAdd: rasterize_backward/kernel.wgsl:
        # 255-269): ONE stable payload sort groups the per-entry grad rows
        # by point id (within a point, entries keep their tile-ascending
        # stream order), then a batched prefix sum differenced at each
        # point's span end yields the per-point totals. On this chip the
        # multi-operand lax.sort is the FAST permutation primitive
        # (~6 ms at 2.4M rows) while every random gather/scatter
        # formulation measured 12-190 ms (scripts/prof_reduce.py:
        # full_current 124 ms with the round-3 inverse-permutation gather
        # vs 35 ms for this sort-based form). The span-end gather is split
        # [:8] / [8] because a 9-row column slice crosses the 8-sublane
        # tile boundary, which alone is a 2x gather penalty.
        d_comp = reduce_entry_grads(
            entry_grads, sorted_pids, point_offsets, entry_total, capacity,
            packed,
        )

        # Opacity: chain through the sigmoid (the reference applies it
        # in-kernel, rasterize_backward/kernel.wgsl:229).
        op_outer = jax.nn.sigmoid(opacities[:, 0])
        d_opacities = (op_outer * (1.0 - op_outer) * d_comp[6])[:, None]

        # Projection gradients via VJP of the pure-jnp projection.
        def proj_diff(csh, pos, rot, scal):
            p = project_gaussians(
                csh, pos, rot, scal, camera,
                sh_degree=sh_degree,
                tile_count_x=tile_count_x,
                tile_count_y=tile_count_y,
            )
            return (
                p.color_r, p.color_g, p.color_b,
                p.conic_xx, p.conic_xy, p.conic_yy,
                p.pos2d_x, p.pos2d_y,
            )

        _, vjp_fn = jax.vjp(proj_diff, colors_sh, positions, rotations, scalings)
        d_colors_sh, d_positions, d_rotations, d_scalings = vjp_fn(
            tuple(d_comp[0:6]) + tuple(d_comp[7:9])
        )

        # Densification signal (transform_backward/kernel.wgsl:364-370):
        # || dL/d pos2d * [I_x / 2, I_y / 2] ||, in half-pixel units.
        # Under tile sharding the camera's half-size is slab-shifted, so the
        # full-frame value is threaded in statically; the pos-2d gradient is
        # summed across the slabs first so boundary-spanning Gaussians get
        # the exact single-chip norm.
        gx, gy = d_comp[7], d_comp[8]
        if grad_norm_psum_axis is not None:
            axis_size = jax.lax.psum(1, grad_norm_psum_axis)
            gx = jax.lax.psum(gx, grad_norm_psum_axis)
            gy = jax.lax.psum(gy, grad_norm_psum_axis)
        if grad_norm_half is not None:
            hx = jnp.float32(grad_norm_half[0])
            hy = jnp.float32(grad_norm_half[1])
        else:
            hx = camera.image_size_half[0]
            hy = camera.image_size_half[1]
        grad_norm = jnp.sqrt((gx * hx) ** 2 + (gy * hy) ** 2)
        if grad_norm_psum_axis is not None:
            # The shard_map transpose psums the replicated ref cotangent
            # over every mesh axis; pre-divide so the tile axis contributes
            # the norm exactly once.
            grad_norm = grad_norm / axis_size

        zero_camera = jax.tree_util.tree_map(jnp.zeros_like, camera)
        return (
            d_colors_sh, d_opacities, d_positions, d_rotations, d_scalings,
            grad_norm, zero_camera,
        )

    render_fn.defvjp(_render_fwd, _render_bwd)
    return render_fn


@functools.lru_cache(maxsize=64)
def _make_render_fn(*cfg):
    """Jitted, cached variant of :func:`_build_render_fn`."""
    return jax.jit(_build_render_fn(*cfg))


@functools.lru_cache(maxsize=64)
def _make_render_views_fn(mode, *cfg):
    """Jitted, cached batched-render builder for :func:`render_views`.

    Keyed on (mode, static render config); the returned function takes the
    5 scene params + [V, P] refs + stacked cameras. Without this cache every
    ``render_views`` call wrapped a fresh ``jax.jit`` and re-traced —
    defeating the dispatch-amortization rationale for batched serving.
    (A new batch size V still retraces: the shapes change.)
    """
    fn = _build_render_fn(*cfg)

    def one(csh, op, pos, rot, scal, ref, camera):
        return fn(csh, op, pos, rot, scal, ref, camera)

    if mode == "vmap":
        return jax.jit(jax.vmap(one, in_axes=(None,) * 5 + (0, 0)))

    def mapped(csh, op, pos, rot, scal, refs, cameras):
        return jax.lax.map(
            lambda rc: one(csh, op, pos, rot, scal, *rc), (refs, cameras)
        )

    return jax.jit(mapped)


def count_tile_entries(
    scene: GaussianScene,
    view: View,
    options: RenderOptions = RenderOptions(),
) -> int:
    """True (tile, point) entry count for one view — the reference's scan
    total T (the value it reads back at rank/mod.rs:61-63), without running
    expansion or rasterization. One tiny jitted program (projection +
    count-sum); used by :func:`calibrate_options`."""
    tile_count_x = -(-view.image_width // TILE_SIZE_X)
    tile_count_y = -(-view.image_height // TILE_SIZE_Y)

    @functools.partial(jax.jit, static_argnums=(5, 6, 7))
    def total(csh, op, pos, rot, scal, shd, tcx, tcy):
        proj = project_gaussians(
            csh, pos, rot, scal, Camera.from_view(view),
            sh_degree=shd, tile_count_x=tcx, tile_count_y=tcy,
            opacities=op, tight_culling=options.tight_culling,
        )
        return proj.tile_counts.astype(jnp.int32).sum()

    return int(
        total(
            scene.colors_sh, scene.opacities, scene.positions,
            scene.rotations, scene.scalings,
            options.colors_sh_degree_max, tile_count_x, tile_count_y,
        )
    )


def calibrate_options(
    scene: GaussianScene,
    views: Sequence[View] | View,
    options: RenderOptions = RenderOptions(),
    *,
    margin: float = 1.0625,
) -> RenderOptions:
    """Right-size ``tile_entry_capacity`` for a scene + view set.

    The reference sizes its entry buffers to the *exact* per-frame total by
    reading the scan total back to the host every frame
    (rank/mod.rs:61-63) — 100% occupancy, one device sync per render. The
    TPU pipeline instead compiles one static capacity; the default serving
    recipe is to calibrate it once against representative views and keep a
    safety ``margin`` (so the static buffer is a strict superset of what
    the reference would have allocated for those frames), then watch
    ``RenderOutput.tile_point_total`` for overflow (> capacity means
    truncation: re-calibrate, as the adaptive Trainer does automatically
    via its 0.85-watermark growth policy).

    Every entry-proportional stage (expansion, sort, stream gather,
    rasterization step list, gradient reduction) pays for *capacity*, not
    true entries, so slack is pure cost: measured on-chip, shrinking the
    bench headline's 74%-occupancy capacity to a calibrated one cut the
    frame by a double-digit ms figure (PERF.md round-5 section).
    """
    if isinstance(views, View):
        views = [views]
    if not views:
        raise ValueError("calibrate_options needs at least one view")
    worst = max(count_tile_entries(scene, v, options) for v in views)
    b = options.block_size
    cap = max(int(worst * margin), 1 << 12)
    cap = (cap + b - 1) // b * b
    return dataclasses.replace(options, tile_entry_capacity=cap)


def render(
    scene: GaussianScene,
    view: View,
    options: RenderOptions = RenderOptions(),
    positions_2d_grad_norm_ref: Optional[jax.Array] = None,
) -> RenderOutput:
    """Render a scene from a view. Differentiable in the scene parameters.

    To obtain the densification signal, pass ``positions_2d_grad_norm_ref``
    (zeros of shape [P]) and take its gradient — mirroring the reference's
    dummy-ref side channel (scene/gaussian_3d/mod.rs:222-229).
    """
    point_count = scene.point_count
    pixel_count = view.image_width * view.image_height

    if options.colors_sh_degree_max > SH_DEGREE_MAX:
        raise UnsupportedSphericalHarmonicsDegreeError(options.colors_sh_degree_max)
    if options.entry_dtype not in ("f32", "bf16"):
        raise ValueError(
            f"entry_dtype must be 'f32' or 'bf16', got {options.entry_dtype!r}"
        )
    if pixel_count == 0 or pixel_count > PIXEL_COUNT_MAX:
        raise InvalidPixelCountError(pixel_count)
    if point_count == 0:
        raise MismatchedPointCountError(0, "non-zero")

    fn = _make_render_fn(
        view.image_width,
        view.image_height,
        point_count,
        options.colors_sh_degree_max,
        _capacity(point_count, options),
        options.block_size,
        _resolve_backend(options.backend),
        options.interpret,
        options.entry_dtype == "bf16",
        None,
        None,
        options.tight_culling,
    )
    if positions_2d_grad_norm_ref is None:
        positions_2d_grad_norm_ref = jnp.zeros((point_count,), jnp.float32)
    camera = Camera.from_view(view)
    return fn(
        scene.colors_sh,
        scene.opacities,
        scene.positions,
        scene.rotations,
        scene.scalings,
        positions_2d_grad_norm_ref,
        camera,
    )


def render_views(
    scene: GaussianScene,
    views: Sequence[View],
    options: RenderOptions = RenderOptions(),
    *,
    mode: str = "vmap",
) -> RenderOutput:
    """Render one scene from a batch of same-resolution views in ONE jitted
    dispatch. Returns a :class:`RenderOutput` whose leaves carry a leading
    view axis ``[V, ...]``.

    The reference renders one view per call (``render/gaussian_3d/mod.rs``
    trait surface); on TPU, batching views into one program amortizes the
    dispatch/compile boundary and lets XLA overlap the per-view pipelines —
    the serving-path analogue of the trainer's ``train_step_batch``.

    ``mode``:
    - ``"vmap"``: all views in flight at once (throughput; V x the entry
      buffers live in HBM);
    - ``"map"``: sequential ``lax.map`` inside one program (memory-lean —
      one view's buffers at a time — while still a single dispatch).
    """
    views = list(views)
    if not views:
        raise ValueError("render_views needs at least one view")
    w, h = views[0].image_width, views[0].image_height
    for v in views[1:]:
        if (v.image_width, v.image_height) != (w, h):
            raise InvalidPixelCountError(
                v.image_width * v.image_height
            )  # batched rendering requires one static resolution
    if mode not in ("vmap", "map"):
        raise ValueError(f"mode must be 'vmap' or 'map', got {mode!r}")

    point_count = scene.point_count
    pixel_count = w * h
    if options.colors_sh_degree_max > SH_DEGREE_MAX:
        raise UnsupportedSphericalHarmonicsDegreeError(options.colors_sh_degree_max)
    if pixel_count == 0 or pixel_count > PIXEL_COUNT_MAX:
        raise InvalidPixelCountError(pixel_count)
    if point_count == 0:
        raise MismatchedPointCountError(0, "non-zero")

    fn = _make_render_views_fn(
        mode,
        w,
        h,
        point_count,
        options.colors_sh_degree_max,
        _capacity(point_count, options),
        options.block_size,
        _resolve_backend(options.backend),
        options.interpret,
        options.entry_dtype == "bf16",
        None,
        None,
        options.tight_culling,
    )
    cameras = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[Camera.from_view(v) for v in views]
    )
    refs = jnp.zeros((len(views), point_count), jnp.float32)
    return fn(
        scene.colors_sh,
        scene.opacities,
        scene.positions,
        scene.rotations,
        scene.scalings,
        refs,
        cameras,
    )
