"""Fully-sharded training step: data parallelism x tile sharding on a mesh.

One compiled step over a 2-D mesh ``(data, tiles)``:

- scene parameters + Adam state are replicated;
- the camera batch is sharded over ``data`` (each device group trains on a
  view subset);
- each view's frame is sharded over ``tiles`` by rows (principal-point
  shift, as in :func:`gausplat_tpu.parallel.render.render_tile_sharded`);
- gradients are ``psum``'d over both axes (XLA collectives over ICI) before
  the replicated Adam update, so every device applies the identical update.

The loss here is L1 (SSIM needs halo exchange across slab boundaries; it is
available in the single-device trainer).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import TILE_SIZE_Y
from ..render.pipeline import (
    RenderOptions,
    _build_render_fn,
    _capacity,
    _resolve_backend,
)
from ..scene.gaussian_3d import GaussianScene
from ..train.optimizer import OptimizerConfig, make_optimizer
from .render import shard_map


def make_sharded_train_step(
    mesh: Mesh,
    image_width: int,
    image_height: int,
    point_count: int,
    options: RenderOptions = RenderOptions(),
    optimizer_config: OptimizerConfig = OptimizerConfig(),
    data_axis: str = "data",
    tile_axis: str = "tiles",
):
    """Build (step_fn, optimizer). ``step_fn(scene, opt_state, cameras,
    targets) -> (scene, opt_state, loss)`` with ``cameras`` a batched
    Camera pytree [V, ...] and ``targets`` [V, H_pad, W, 3] (rows padded to
    a multiple of D_tiles * 16)."""
    d_tiles = mesh.shape[tile_axis]
    tcy = -(-image_height // TILE_SIZE_Y)
    tcy_pad = -(-tcy // d_tiles) * d_tiles
    h_local = (tcy_pad // d_tiles) * TILE_SIZE_Y
    h_pad = h_local * d_tiles

    cap_local = max(_capacity(point_count, options) // d_tiles, 1 << 14)
    render_fn = _build_render_fn(
        image_width,
        h_local,
        point_count,
        options.colors_sh_degree_max,
        cap_local,
        options.block_size,
        _resolve_backend(options.backend),
        options.interpret,
    )
    optimizer = make_optimizer(optimizer_config)
    denom = float(image_height * image_width * 3)

    def local_step(scene: GaussianScene, opt_state, cams, targets):
        # cams: local view batch [V_local, ...]; targets [V_local, h_local, W, 3]
        tile_idx = jax.lax.axis_index(tile_axis)
        y0 = (tile_idx * h_local).astype(jnp.float32)
        n_views_local = targets.shape[0]

        def loss_fn(s):
            def one_view(cam, target):
                cam_local = dataclasses.replace(
                    cam,
                    image_size_half=cam.image_size_half
                    - jnp.stack([jnp.float32(0), y0]),
                )
                ref = jnp.zeros((point_count,), jnp.float32)
                out = render_fn(
                    s.colors_sh, s.opacities, s.positions, s.rotations,
                    s.scalings, ref, cam_local,
                )
                return jnp.sum(jnp.abs(out.colors_rgb_2d - target))

            local_sum = jnp.sum(jax.vmap(one_view)(cams, targets))
            return local_sum

        local_sum, grads = jax.value_and_grad(loss_fn)(scene)
        # All-reduce over both mesh axes (ICI collectives).
        grads = jax.lax.psum(grads, (data_axis, tile_axis))
        loss = jax.lax.psum(local_sum, (data_axis, tile_axis)) / (
            denom * (n_views_local * mesh.shape[data_axis])
        )
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = jax.tree_util.tree_map(lambda p, u: p + u, scene, updates)
        return scene, opt_state, loss

    rep = P()
    sharded = shard_map(
        local_step,
        mesh,
        in_specs=(rep, rep, P(data_axis), P(data_axis, tile_axis)),
        out_specs=(rep, rep, rep),
    )

    @jax.jit
    def step(scene, opt_state, cameras, targets):
        return sharded(scene, opt_state, cameras, targets)

    return step, optimizer, h_pad
