"""Fully-sharded training step: data parallelism x tile sharding on a mesh.

One compiled step over a 2-D mesh ``(data, tiles)``:

- scene parameters + Adam state are replicated;
- the camera batch is sharded over ``data`` (each device group trains on a
  view subset);
- each view's frame is sharded over ``tiles`` by rows (exact screen-origin
  shift, as in :func:`gausplat_tpu.parallel.render.render_tile_sharded`);
- the objective is the full 3DGS photometric loss, L1 + D-SSIM: the SSIM
  window needs 5 rows of context past each slab boundary, which is
  exchanged between neighboring slabs with ``jax.lax.ppermute`` over ICI
  (frame borders see zeros — identical to the single-device SAME padding);
- rows past the true image height (slab padding) are masked out of both
  terms, so non-divisible heights train identically to a single device;
- gradients are ``psum``'d over both axes (XLA collectives over ICI) before
  the replicated Adam update, so every device applies the identical update;
- the step returns the entry-buffer high-water mark (max over views and
  shards of ``tile_point_total``) as a device array, so the host can grow
  per-shard capacity at its own cadence without a per-step sync.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import SH_DEGREE_MAX, TILE_SIZE_Y
from ..render.pipeline import RenderOptions, _capacity
from ..scene.gaussian_3d import GaussianScene
from ..train.densify import zero_densify_acc
from ..train.losses import ssim_map
from ..train.optimizer import OptimizerConfig, make_optimizer, seed_count
from .render import _core, _shard_capacity, shard_map

#: Rows of cross-slab context the 11x11 SSIM window needs.
_HALO = 5


@functools.lru_cache(maxsize=16)
def make_sharded_train_step(
    mesh: Mesh,
    image_width: int,
    image_height: int,
    point_count: int,
    options: RenderOptions = RenderOptions(),
    optimizer_config: OptimizerConfig = OptimizerConfig(),
    data_axis: str = "data",
    tile_axis: str = "tiles",
    ssim_weight: float = 0.2,
):
    """Build (step_fn, optimizer, h_pad). ``step_fn(scene, opt_state,
    densify_acc, cameras, targets) -> (scene, opt_state, densify_acc,
    metrics)`` with ``cameras`` a batched Camera pytree [V, ...] and
    ``targets`` [V, H_pad, W, 3] (rows padded to a multiple of
    D_tiles * 16; pad-row values are ignored). ``metrics`` = {"loss",
    "tile_point_total"} as device scalars; ``densify_acc`` accumulates the
    densification signals exactly as the single-device Trainer does
    (grad-norm sums / visibility counts / max radii, replicated)."""
    d_tiles = mesh.shape[tile_axis]
    d_data = mesh.shape[data_axis]
    tcy = -(-image_height // TILE_SIZE_Y)
    tcy_pad = -(-tcy // d_tiles) * d_tiles
    h_local = (tcy_pad // d_tiles) * TILE_SIZE_Y
    h_pad = h_local * d_tiles

    cap_local = _shard_capacity(
        _capacity(point_count, options), d_tiles, options.block_size
    )
    render_fn = _core(
        image_width,
        h_local,
        point_count,
        options,
        capacity=cap_local,
        grad_norm_half=(image_width / 2.0, image_height / 2.0),
        grad_norm_psum_axis=tile_axis,
    )
    optimizer = make_optimizer(optimizer_config)
    denom = float(image_height * image_width * 3)

    def local_step(scene: GaussianScene, opt_state, densify_acc, cams, targets):
        # cams: local view batch [V_local, ...]; targets [V_local, h_local, W, 3]
        tile_idx = jax.lax.axis_index(tile_axis)
        y0 = (tile_idx * h_local).astype(jnp.float32)
        n_views_local = targets.shape[0]
        # Mask for rows that exist in the true image (slab padding off).
        row_valid = (
            tile_idx * h_local + jnp.arange(h_local, dtype=jnp.int32)
            < image_height
        ).astype(jnp.float32)[None, :, None, None]

        def loss_terms(s, ref):
            def render_view(cam):
                cam_local = dataclasses.replace(
                    cam, pos2d_shift=jnp.stack([jnp.float32(0), y0])
                )
                out = render_fn(
                    s.colors_sh, s.opacities, s.positions, s.rotations,
                    s.scalings, ref, cam_local,
                )
                return out.colors_rgb_2d, out.tile_point_total, out.radii

            rendered, totals, radii = jax.vmap(render_view)(cams)
            rendered = rendered * row_valid
            tgt = targets * row_valid
            l1_sum = jnp.sum(jnp.abs(rendered - tgt))

            ssim_sum = jnp.float32(0.0)
            if ssim_weight != 0.0:
                # Exchange 5 boundary rows with the neighboring slabs so the
                # 11x11 window sees true pixels across slab boundaries.
                def halo_extend(x):
                    up = [(i, i + 1) for i in range(d_tiles - 1)]
                    down = [(i + 1, i) for i in range(d_tiles - 1)]
                    from_above = jax.lax.ppermute(x[:, -_HALO:], tile_axis, up)
                    from_below = jax.lax.ppermute(x[:, :_HALO], tile_axis, down)
                    return jnp.concatenate([from_above, x, from_below], axis=1)

                smap = jax.vmap(ssim_map)(halo_extend(rendered), halo_extend(tgt))
                smap = smap[:, _HALO : _HALO + h_local] * row_valid
                ssim_sum = jnp.sum(smap)
            return l1_sum, ssim_sum, jnp.max(totals), radii

        def loss_fn(s, ref):
            l1_sum, ssim_sum, max_total, radii = loss_terms(s, ref)
            # Pixel sums become full-frame means only after the psum; fold
            # the normalization in here so the gradient is of the true loss.
            scale = 1.0 / (denom * n_views_local * d_data)
            local = (1.0 - ssim_weight) * l1_sum * scale + ssim_weight * (
                1.0 / (d_tiles * d_data)  # each shard's share of the constant 1
                - ssim_sum * scale
            )
            return local, (max_total, radii)

        ref = jnp.zeros((point_count,), jnp.float32)
        (local_loss, (max_total, radii)), (grads, grad_norm) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                scene, ref
            )
        )
        # All-reduce over both mesh axes (ICI collectives).
        grads = jax.lax.psum(grads, (data_axis, tile_axis))
        loss = jax.lax.psum(local_loss, (data_axis, tile_axis))
        max_total = jax.lax.pmax(max_total, (data_axis, tile_axis))
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = jax.tree_util.tree_map(lambda p, u: p + u, scene, updates)

        # Densification signals, matching the single-device Trainer's
        # accumulation semantics (one view at a time there; here summed
        # over the whole view batch). grad_norm (the ref cotangent) is
        # already the exact per-view full-frame norm summed over local
        # views / divided by d_tiles (see pipeline grad_norm_psum_axis).
        grad_norm = jax.lax.psum(grad_norm, (data_axis, tile_axis))
        # radii: [V_local, P]. A point's per-view radius is the max over
        # slabs; visibility counts views where any slab saw it.
        radii = jax.lax.pmax(radii, tile_axis)
        visible = jax.lax.psum(
            jnp.sum((radii > 0).astype(jnp.int32), axis=0), data_axis
        )
        max_radii = jax.lax.pmax(jnp.max(radii, axis=0), (data_axis, tile_axis))
        densify_acc = {
            "grad_norm_sum": densify_acc["grad_norm_sum"] + grad_norm,
            "visible_count": densify_acc["visible_count"] + visible,
            "max_radii": jnp.maximum(densify_acc["max_radii"], max_radii),
        }
        return scene, opt_state, densify_acc, {
            "loss": loss,
            "tile_point_total": max_total,
        }

    rep = P()
    sharded = shard_map(
        local_step,
        mesh,
        in_specs=(rep, rep, rep, P(data_axis), P(data_axis, tile_axis)),
        out_specs=(rep, rep, rep, rep),
    )

    @jax.jit
    def step(scene, opt_state, densify_acc, cameras, targets):
        return sharded(scene, opt_state, densify_acc, cameras, targets)

    @functools.lru_cache(maxsize=64)
    def make_step_scan(num_steps: int):
        """Compile ``num_steps`` sharded batch steps into ONE dispatch
        (``lax.scan`` around the shard_map'd step) — the multi-chip
        counterpart of the single-device Trainer's scanned chunks; without
        it, training is dispatch-bound (host RPC per step)."""

        @jax.jit
        def step_scan(scene, opt_state, densify_acc, cameras, targets):
            def body(carry, _):
                scene, opt_state, densify_acc = carry
                scene, opt_state, densify_acc, metrics = sharded(
                    scene, opt_state, densify_acc, cameras, targets
                )
                return (scene, opt_state, densify_acc), metrics

            (scene, opt_state, densify_acc), metrics = jax.lax.scan(
                body, (scene, opt_state, densify_acc), None, length=num_steps
            )
            return scene, opt_state, densify_acc, metrics

        return step_scan

    return step, optimizer, h_pad, make_step_scan


class ShardedTrainer:
    """Host-side orchestration of the fully-sharded train step + density
    control: the multi-chip counterpart of :class:`gausplat_tpu.train.trainer.Trainer`.

    Densification reshapes the (replicated) scene between jit regions; the
    step is rebuilt on point-count change or entry-capacity growth, and the
    optimizer state re-initialized (new points start with fresh Adam
    moments). The per-step path performs no device->host sync; the entry
    overflow watermark is read at ``overflow_check_interval`` cadence.
    """

    def __init__(
        self,
        scene: GaussianScene,
        mesh: Mesh,
        image_width: int,
        image_height: int,
        config: "TrainConfig" = None,
        data_axis: str = "data",
        tile_axis: str = "tiles",
    ):
        from ..train.trainer import TrainConfig

        self.scene = scene
        self.mesh = mesh
        self.config = config if config is not None else TrainConfig()
        self.image_width = image_width
        self.image_height = image_height
        self.data_axis = data_axis
        self.tile_axis = tile_axis
        self.step_count = 0
        self._densify_acc = zero_densify_acc(scene.point_count)
        self._opt_state = None
        self._opt_point_count = -1
        self._entry_capacity = _capacity(scene.point_count, self.config.render)
        # Running on-device max of tile_point_total since the last overflow
        # check (mirrors Trainer._entry_watermark).
        self._entry_watermark = jnp.int32(0)
        self.h_pad = None

    def _sh_degree(self) -> int:
        """SH warmup schedule, identical to Trainer._sh_degree."""
        warm = self.step_count // max(self.config.sh_warmup_interval, 1)
        return min(
            min(warm, SH_DEGREE_MAX), self.config.render.colors_sh_degree_max
        )

    def _get_step(self):
        r = self.config.render
        options = dataclasses.replace(
            r,
            tile_entry_capacity=self._entry_capacity,
            # SH warmup: rebuild the sharded step at warmup boundaries with
            # the warmed degree, matching the single-device Trainer.
            colors_sh_degree_max=self._sh_degree(),
        )
        step, optimizer, h_pad, make_step_scan = make_sharded_train_step(
            self.mesh,
            self.image_width,
            self.image_height,
            self.scene.point_count,
            options,
            self.config.optimizer,
            self.data_axis,
            self.tile_axis,
            self.config.ssim_weight,
        )
        self.h_pad = h_pad
        return step, optimizer, make_step_scan

    def pad_targets(self, targets) -> jnp.ndarray:
        """[V, H, W, 3] -> [V, h_pad, W, 3] (zero rows; values ignored)."""
        if self.h_pad is None:
            self._get_step()
        t = jnp.asarray(targets)
        return jnp.pad(
            t, ((0, 0), (0, self.h_pad - t.shape[1]), (0, 0), (0, 0))
        )

    def train_step(self, cameras, targets_padded) -> dict:
        """One optimization step on a batched view set. Returns metrics as
        device scalars (no per-step host sync)."""
        step, optimizer, _ = self._get_step()
        if self._opt_point_count != self.scene.point_count:
            self._opt_state = seed_count(
                optimizer.init(self.scene), self.step_count
            )
            self._opt_point_count = self.scene.point_count
            self._densify_acc = zero_densify_acc(self.scene.point_count)

        self.scene, self._opt_state, self._densify_acc, metrics = step(
            self.scene, self._opt_state, self._densify_acc, cameras,
            targets_padded,
        )
        self.step_count += 1

        self._entry_watermark = jnp.maximum(
            self._entry_watermark, metrics["tile_point_total"]
        )
        stats = self._host_events()
        return {**metrics, **stats} if stats else metrics

    def _host_events(self) -> dict:
        """Post-step host interventions at the current ``step_count``
        (densify, opacity reset, overflow watch), mirroring
        ``Trainer._host_events``; shared by the per-step and scanned fit
        paths so both follow the identical schedule."""
        import numpy as np

        c = self.config
        stats = {}
        check_overflow = self.step_count % c.overflow_check_interval == 0
        watermark_scale = 1.0
        if c.densify_from <= self.step_count < c.densify_until:
            if self.step_count % c.densify_interval == 0:
                from ..train.densify import DensifyState, densify_and_prune

                old_count = self.scene.point_count
                state = DensifyState(
                    grad_norm_sum=np.asarray(self._densify_acc["grad_norm_sum"]),
                    visible_count=np.asarray(self._densify_acc["visible_count"]),
                    max_radii=np.asarray(self._densify_acc["max_radii"]),
                )
                self.scene, _, stats = densify_and_prune(
                    self.scene, state, c.densify
                )
                self._densify_acc = zero_densify_acc(self.scene.point_count)
                # Re-check capacity right away with the watermark projected
                # by the point growth (mirrors Trainer._host_events).
                check_overflow = True
                watermark_scale = self.scene.point_count / max(old_count, 1)
            if self.step_count % c.opacity_reset_interval == 0:
                from ..train.densify import reset_opacity

                self.scene = reset_opacity(self.scene, c.densify)
        if check_overflow:
            # Per-shard capacity = global / d_tiles, so compare the global
            # watermark against the global budget.
            total = int(
                int(self._entry_watermark)
                * self.mesh.shape[self.tile_axis]
                * watermark_scale
            )
            if total > c.capacity_grow_at * self._entry_capacity:
                b = c.render.block_size
                new_cap = int(total * c.capacity_grow_factor)
                self._entry_capacity = max(
                    (new_cap + b - 1) // b * b, self._entry_capacity
                )
            self._entry_watermark = jnp.int32(0)
        return stats

    def fit(self, cameras, targets, iterations: int) -> list:
        """Run ``iterations`` steps on the fixed view batch."""
        padded = self.pad_targets(targets)
        history = [
            self.train_step(cameras, padded) for _ in range(iterations)
        ]
        history = jax.device_get(history)
        return [
            {
                k: (float(v) if jnp.ndim(v) == 0 else v)
                for k, v in h.items()
            }
            for h in history
        ]

    def fit_scan(
        self, cameras, targets, iterations: int, max_chunk: int = 100
    ) -> list:
        """Like :meth:`fit`, but runs steps in compiled ``lax.scan`` chunks
        — one dispatch per chunk instead of per step (multi-chip training
        is otherwise dispatch-bound on host RPC latency, exactly as the
        single-device ``Trainer.fit_scan`` rationale). Chunks break at
        every host-intervention step (shared ``next_host_event`` schedule),
        so the result follows the identical schedule as per-step
        :meth:`fit`."""
        from ..train.trainer import next_host_event

        padded = self.pad_targets(targets)
        end = self.step_count + iterations
        history = []
        while self.step_count < end:
            _, optimizer, make_step_scan = self._get_step()
            if self._opt_point_count != self.scene.point_count:
                self._opt_state = seed_count(
                optimizer.init(self.scene), self.step_count
            )
                self._opt_point_count = self.scene.point_count
                self._densify_acc = zero_densify_acc(self.scene.point_count)
            k = min(
                next_host_event(self.config, self.step_count, end)
                - self.step_count,
                max_chunk,
            )
            step_scan = make_step_scan(k)
            (
                self.scene, self._opt_state, self._densify_acc, metrics
            ) = step_scan(
                self.scene, self._opt_state, self._densify_acc, cameras,
                padded,
            )
            self.step_count += k
            history.append(metrics)
            self._entry_watermark = jnp.maximum(
                self._entry_watermark, jnp.max(metrics["tile_point_total"])
            )
            self._host_events()
        history = jax.device_get(history)
        out = []
        for chunk in history:
            ks = list(chunk.keys())
            for i in range(len(chunk[ks[0]])):
                out.append({k: float(chunk[k][i]) for k in ks})
        return out
