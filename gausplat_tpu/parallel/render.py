"""Sharded rendering: data parallelism over views, tile sharding over rows.

TPU-native scale-out (SURVEY.md section 7, step 6). Both modes are built by
composing the single-view custom-VJP render core with ``jax.vmap`` and
``jax.shard_map``:

- **Data parallel**: the camera batch is sharded over a mesh axis; scene
  parameters are replicated. ``shard_map``'s transpose inserts a ``psum``
  over the axis for the replicated-parameter cotangents, so a loss gradient
  through :func:`render_data_parallel` is the exact sum over views — the
  all-reduce rides ICI.

- **Tile-sharded**: one large frame is split by *tile rows* across the
  axis. Each device renders its horizontal slab via the camera's exact
  screen-origin shift (``Camera.pos2d_shift`` — bitwise identical to the
  matching rows of a full-frame render) — binning then produces only the
  slab's tiles, so the sort/raster work is 1/D per device. Per-point radii
  are combined with ``pmax``; parameter gradients again psum via the
  shard_map transpose.

Note on the densification signal under sharding: the reference computes
``positions_2d_grad_norm`` per view (transform_backward/kernel.wgsl:364-370)
and the downstream 3DGS densifier *accumulates norms additively across
views*. The data-parallel gradient of the dummy ref reproduces exactly that
(sum of per-view norms). Under tile sharding the per-slab 2-D position
gradients are psum'd across the slab axis *before* the norm (and the norm
is taken against the full-frame half-size, not the slab-shifted camera's),
so the signal equals the single-chip value exactly — see
``grad_norm_psum_axis`` in :func:`gausplat_tpu.render.pipeline._build_render_fn`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map_fn  # jax >= 0.7 API

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: the custom-VJP transpose's replication over the
        # mesh axis can't be statically inferred.
        return _shard_map_fn(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                              check_rep=False)

from ..constants import TILE_SIZE_Y
from ..ops.projection import Camera
from ..render.pipeline import (
    RenderOptions,
    RenderOutput,
    _build_render_fn,
    _capacity,
    _resolve_backend,
)
from ..render.view import View
from ..scene.gaussian_3d import GaussianScene


def _core(
    view_w,
    view_h,
    point_count,
    options: RenderOptions,
    capacity=None,
    grad_norm_half=None,
    grad_norm_psum_axis=None,
):
    return _build_render_fn(
        view_w,
        view_h,
        point_count,
        options.colors_sh_degree_max,
        capacity if capacity is not None else _capacity(point_count, options),
        options.block_size,
        _resolve_backend(options.backend),
        options.interpret,
        options.entry_dtype == "bf16",
        grad_norm_half,
        grad_norm_psum_axis,
        options.tight_culling,
    )


def _shard_capacity(capacity: int, d: int, block_size: int) -> int:
    """Per-shard tile-entry capacity: the global budget split D ways,
    rounded up to a block multiple (the stream kernels require it)."""
    local = max(capacity // d, 1 << 14)
    return -(-local // block_size) * block_size


def stack_cameras(views) -> Camera:
    """Stack per-view :class:`Camera` pytrees into one batched Camera."""
    cams = [Camera.from_view(v) for v in views]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


@functools.lru_cache(maxsize=64)
def _make_batched_render(image_width, image_height, point_count, options):
    """Jitted, cached vmapped single-view core (keyed on the static config).

    Without the cache every :func:`render_views` call re-traced the vmapped
    pipeline — recompiling on each batched-serving invocation.
    """
    fn = _core(image_width, image_height, point_count, options)
    return jax.jit(
        jax.vmap(fn, in_axes=(None, None, None, None, None, None, 0))
    )


def render_views(
    scene: GaussianScene,
    cameras: Camera,  # batched Camera pytree, leading axis V
    image_width: int,
    image_height: int,
    options: RenderOptions = RenderOptions(),
) -> RenderOutput:
    """Render a batch of views on one device (vmapped single-view core)."""
    batched = _make_batched_render(
        image_width, image_height, scene.point_count, options
    )
    ref = jnp.zeros((scene.point_count,), jnp.float32)
    return batched(
        scene.colors_sh, scene.opacities, scene.positions, scene.rotations,
        scene.scalings, ref, cameras,
    )


def render_data_parallel(
    scene: GaussianScene,
    cameras: Camera,  # batched Camera pytree, leading axis V (divisible by D)
    image_width: int,
    image_height: int,
    mesh: Mesh,
    axis: str = "data",
    options: RenderOptions = RenderOptions(),
    positions_2d_grad_norm_ref: Optional[jax.Array] = None,
) -> RenderOutput:
    """Render a camera batch sharded over ``mesh[axis]``.

    Returns per-view outputs with the view axis sharded over the mesh.
    Differentiable: parameter cotangents are psum'd over the axis.
    """
    p = scene.point_count
    fn = _core(image_width, image_height, p, options)
    if positions_2d_grad_norm_ref is None:
        positions_2d_grad_norm_ref = jnp.zeros((p,), jnp.float32)

    def local(colors_sh, opacities, positions, rotations, scalings, ref, cams):
        batched = jax.vmap(fn, in_axes=(None, None, None, None, None, None, 0))
        return batched(
            colors_sh, opacities, positions, rotations, scalings, ref, cams
        )

    spec_rep = P()
    cam_specs = jax.tree_util.tree_map(lambda _: P(axis), cameras)
    out_specs = RenderOutput(
        colors_rgb_2d=P(axis),
        radii=P(axis),
        tile_point_total=P(axis),
        transmittances=P(axis),
        point_rendered_counts=P(axis),
    )
    return shard_map(
        local,
        mesh,
        in_specs=(spec_rep,) * 6 + (cam_specs,),
        out_specs=out_specs,
    )(
        scene.colors_sh, scene.opacities, scene.positions, scene.rotations,
        scene.scalings, positions_2d_grad_norm_ref, cameras,
    )


def render_tile_sharded(
    scene: GaussianScene,
    view: View,
    mesh: Mesh,
    axis: str = "tiles",
    options: RenderOptions = RenderOptions(),
    positions_2d_grad_norm_ref: Optional[jax.Array] = None,
) -> RenderOutput:
    """Render one frame with its tile rows sharded over ``mesh[axis]``.

    The image is padded to a multiple of ``D * 16`` rows; each device
    renders a horizontal slab via the exact screen-origin shift and the slabs
    are concatenated (sharded) along the row axis. Entry-buffer capacity is
    divided by D (each slab bins only its own tiles).
    """
    d = mesh.shape[axis]
    p = scene.point_count
    w, h = view.image_width, view.image_height
    tcy = -(-h // TILE_SIZE_Y)
    tcy_pad = -(-tcy // d) * d
    h_local = (tcy_pad // d) * TILE_SIZE_Y
    h_pad = h_local * d

    cap_local = _shard_capacity(_capacity(p, options), d, options.block_size)
    fn = _core(
        w,
        h_local,
        p,
        options,
        capacity=cap_local,
        grad_norm_half=(w / 2.0, h / 2.0),
        grad_norm_psum_axis=axis,
    )
    camera = Camera.from_view(view)
    if positions_2d_grad_norm_ref is None:
        positions_2d_grad_norm_ref = jnp.zeros((p,), jnp.float32)

    def local(colors_sh, opacities, positions, rotations, scalings, ref, cam):
        idx = jax.lax.axis_index(axis)
        y0 = (idx * h_local).astype(jnp.float32)
        cam_local = dataclasses.replace(
            cam, pos2d_shift=jnp.stack([jnp.float32(0), y0])
        )
        out = fn(
            colors_sh, opacities, positions, rotations, scalings, ref, cam_local
        )
        # pmax has no differentiation rule; these are integer diagnostics.
        radii = jax.lax.pmax(jax.lax.stop_gradient(out.radii), axis)
        total = jax.lax.pmax(jax.lax.stop_gradient(out.tile_point_total), axis)
        return RenderOutput(
            colors_rgb_2d=out.colors_rgb_2d[None],
            radii=radii,
            tile_point_total=total,
            transmittances=out.transmittances[None],
            point_rendered_counts=out.point_rendered_counts[None],
        )

    out_specs = RenderOutput(
        colors_rgb_2d=P(axis),
        radii=P(),
        tile_point_total=P(),
        transmittances=P(axis),
        point_rendered_counts=P(axis),
    )
    out = shard_map(
        local,
        mesh,
        in_specs=(P(),) * 7,
        out_specs=out_specs,
    )(
        scene.colors_sh, scene.opacities, scene.positions, scene.rotations,
        scene.scalings, positions_2d_grad_norm_ref, camera,
    )
    # Un-stack slabs -> full rows; crop padding.
    img = out.colors_rgb_2d.reshape(h_pad, w, 3)[:h]
    trans = out.transmittances.reshape(h_pad, w)[:h]
    counts = out.point_rendered_counts.reshape(h_pad, w)[:h]
    return RenderOutput(
        colors_rgb_2d=img,
        radii=out.radii,
        tile_point_total=out.tile_point_total,
        transmittances=trans,
        point_rendered_counts=counts,
    )
