"""The 3DGS training loop: jitted train step + host-side density control.

Completes the reference's training story (its renderer exports the densify
signals; the loop itself lives downstream — SURVEY.md intro). One compiled
step renders, computes L1 + D-SSIM, and applies per-parameter Adam; the
densification controller runs between jit regions (it reshapes the scene).

Supports SH-degree warmup (``colors_sh_degree_max`` raised every
``sh_warmup_interval`` steps, as in standard 3DGS training) and optional
data parallelism over a device mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SH_DEGREE_MAX
from ..ops.projection import Camera
from ..render.pipeline import (
    RenderOptions,
    _build_render_fn,
    _capacity,
    _resolve_backend,
)
from ..render.view import View
from ..scene.gaussian_3d import GaussianScene
from .densify import (
    DensifyConfig,
    DensifyState,
    densify_and_prune,
    reset_opacity,
    zero_densify_acc,
)
from .losses import photometric_loss, psnr
from .optimizer import OptimizerConfig, make_optimizer, seed_count


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    iterations: int = 30_000
    ssim_weight: float = 0.2
    sh_warmup_interval: int = 1_000
    densify_from: int = 500
    densify_until: int = 15_000
    densify_interval: int = 100
    opacity_reset_interval: int = 3_000
    #: Grow the tile-entry buffer when usage crosses this fraction.
    capacity_grow_at: float = 0.85
    capacity_grow_factor: float = 2.0
    #: Steps between device->host reads of the overflow watermark. The
    #: per-step path performs no host sync; the buffer is sized with
    #: ``capacity_grow_at`` headroom so a few stale steps cannot clip.
    overflow_check_interval: int = 50
    optimizer: OptimizerConfig = OptimizerConfig()
    densify: DensifyConfig = DensifyConfig()
    render: RenderOptions = RenderOptions()


@functools.lru_cache(maxsize=32)
def _make_train_step(
    image_width: int,
    image_height: int,
    point_count: int,
    sh_degree: int,
    capacity: int,
    block_size: int,
    backend: str,
    interpret: bool,
    ssim_weight: float,
    optimizer_config: OptimizerConfig,
    packed: bool = False,
    tight_culling: bool = True,
):
    render_fn = _build_render_fn(
        image_width, image_height, point_count, sh_degree, capacity,
        block_size, backend, interpret, packed, None, None, tight_culling,
    )
    optimizer = make_optimizer(optimizer_config)

    def loss_fn(scene, ref, camera, target):
        out = render_fn(
            scene.colors_sh, scene.opacities, scene.positions,
            scene.rotations, scene.scalings, ref, camera,
        )
        loss = photometric_loss(out.colors_rgb_2d, target, ssim_weight)
        return loss, out

    @jax.jit
    def step(scene, opt_state, densify_acc, camera, target):
        # Densification statistics accumulate on-device (no per-step host
        # sync); the controller fetches them only at densify events.
        return _one_step(scene, opt_state, densify_acc, camera, target)

    @jax.jit
    def step_batch(scene, opt_state, densify_acc, cameras, targets):
        """vmap'd multi-view variant: one update from the mean loss over a
        view batch (cameras: batched Camera pytree [V, ...]; targets
        [V, H, W, 3]). Densify signals accumulate per view, matching V
        successive single-view steps' statistics."""
        ref = jnp.zeros((point_count,), jnp.float32)

        def batch_loss(scene, ref, cameras, targets):
            losses, outs = jax.vmap(
                loss_fn, in_axes=(None, None, 0, 0)
            )(scene, ref, cameras, targets)
            return jnp.mean(losses), outs

        (loss, outs), (grads, grad_norm) = jax.value_and_grad(
            batch_loss, argnums=(0, 1), has_aux=True
        )(scene, ref, cameras, targets)
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = jax.tree_util.tree_map(lambda p, u: p + u, scene, updates)
        visible = outs.radii > 0  # [V, P]
        n_views = targets.shape[0]
        densify_acc = {
            # grad_norm (the shared ref's cotangent) sums the per-view
            # norms of the *mean* loss's gradients — scale by V so the
            # accumulated statistic equals V successive single-view steps
            # (each with a per-view mean loss). Invisible points are 0.
            "grad_norm_sum": densify_acc["grad_norm_sum"]
            + grad_norm * n_views,
            "visible_count": densify_acc["visible_count"]
            + jnp.sum(visible.astype(jnp.int32), axis=0),
            "max_radii": jnp.maximum(
                densify_acc["max_radii"], jnp.max(outs.radii, axis=0)
            ),
        }
        metrics = {
            "loss": loss,
            "psnr": psnr(outs.colors_rgb_2d, targets),
            "tile_point_total": jnp.max(outs.tile_point_total),
        }
        return scene, opt_state, densify_acc, metrics

    @functools.lru_cache(maxsize=64)
    def make_step_scan(num_steps: int):
        """Compile ``num_steps`` round-robin single-view steps into ONE
        dispatch (``lax.scan``) — the host-dispatch (tunnel RPC) cost is
        paid once per chunk instead of once per step. The view index walks
        ``(start + j) % V`` so chunked fits replay exactly the same view
        sequence as ``num_steps`` calls to ``step``."""

        @jax.jit
        def step_scan(scene, opt_state, densify_acc, cameras, targets, start):
            n_views = targets.shape[0]

            def body(carry, j):
                scene, opt_state, densify_acc = carry
                idx = jax.lax.rem(start + j, jnp.int32(n_views))
                camera = jax.tree_util.tree_map(lambda x: x[idx], cameras)
                target = targets[idx]
                scene, opt_state, densify_acc, metrics = _one_step(
                    scene, opt_state, densify_acc, camera, target
                )
                return (scene, opt_state, densify_acc), metrics

            (scene, opt_state, densify_acc), metrics = jax.lax.scan(
                body,
                (scene, opt_state, densify_acc),
                jnp.arange(num_steps, dtype=jnp.int32),
            )
            return scene, opt_state, densify_acc, metrics

        return step_scan

    def _one_step(scene, opt_state, densify_acc, camera, target):
        ref = jnp.zeros((point_count,), jnp.float32)
        (loss, out), (grads, grad_norm) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(scene, ref, camera, target)
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = jax.tree_util.tree_map(lambda p, u: p + u, scene, updates)
        visible = out.radii > 0
        densify_acc = {
            "grad_norm_sum": densify_acc["grad_norm_sum"]
            + jnp.where(visible, grad_norm, 0.0),
            "visible_count": densify_acc["visible_count"]
            + visible.astype(jnp.int32),
            "max_radii": jnp.maximum(densify_acc["max_radii"], out.radii),
        }
        metrics = {
            "loss": loss,
            "psnr": psnr(out.colors_rgb_2d, target),
            "tile_point_total": out.tile_point_total,
        }
        return scene, opt_state, densify_acc, metrics

    return step, optimizer, step_batch, make_step_scan


_zero_densify_acc = zero_densify_acc


def next_host_event(c: TrainConfig, now: int, end: int) -> int:
    """First step index > ``now`` at which host intervention is due
    (SH-warmup recompile, overflow check, densify, opacity reset), or
    ``end``. Shared by the single-device and sharded trainers so their
    scanned chunks break at the identical schedule."""

    def nxt(interval: int) -> int:
        interval = max(interval, 1)
        return (now // interval + 1) * interval

    cands = [end, nxt(c.sh_warmup_interval), nxt(c.overflow_check_interval)]
    d = max(
        nxt(c.densify_interval),
        -(-c.densify_from // c.densify_interval) * c.densify_interval,
    )
    if d < c.densify_until:
        cands.append(d)
    r = nxt(c.opacity_reset_interval)
    if c.densify_from <= r < c.densify_until:
        cands.append(r)
    return min(cands)


class Trainer:
    """Host-side orchestration of the compiled train step + density control.

    The optimizer state is re-initialized whenever densification reshapes
    the scene (new points start with fresh Adam moments).
    """

    def __init__(
        self,
        scene: GaussianScene,
        image_width: int,
        image_height: int,
        config: TrainConfig = TrainConfig(),
    ):
        self.scene = scene
        self.config = config
        self.image_width = image_width
        self.image_height = image_height
        self.step_count = 0
        self._densify_acc = _zero_densify_acc(scene.point_count)
        self._opt_state = None
        self._opt_point_count = -1
        # Adaptive tile-entry capacity (the dynamic (tile, point) expansion
        # under static shapes — SURVEY.md section 7 hard part (a)): start
        # from the configured/estimated budget, grow on near-overflow with
        # a recompile.
        self._entry_capacity = _capacity(scene.point_count, config.render)
        # Running on-device max of tile_point_total since the last overflow
        # check: a binning spike between the periodic checks is not lost
        # (one jnp.maximum per step, no host sync).
        self._entry_watermark = jnp.int32(0)

    # -- internals -------------------------------------------------------------

    def _sh_degree(self) -> int:
        warm = self.step_count // max(self.config.sh_warmup_interval, 1)
        return min(
            min(warm, SH_DEGREE_MAX), self.config.render.colors_sh_degree_max
        )

    def _get_step(self):
        p = self.scene.point_count
        r = self.config.render
        return _make_train_step(
            self.image_width,
            self.image_height,
            p,
            self._sh_degree(),
            self._entry_capacity,
            r.block_size,
            _resolve_backend(r.backend),
            r.interpret,
            self.config.ssim_weight,
            self.config.optimizer,
            r.entry_dtype == "bf16",
            r.tight_culling,
        )

    # -- public API ------------------------------------------------------------

    def train_step(self, view: View, target: jax.Array) -> dict:
        """One optimization step against one view.

        Returns metrics as *device* scalars — the per-step path performs no
        device->host synchronization (the tunnel round-trip would dominate
        step time; cf. the pipeline's elimination of the reference's one
        readback). Convert with ``float()``/``jax.device_get`` only when a
        value is actually needed on the host.
        """
        step, optimizer, _, _ = self._get_step()
        if self._opt_point_count != self.scene.point_count:
            self._opt_state = seed_count(
                optimizer.init(self.scene), self.step_count
            )
            self._opt_point_count = self.scene.point_count
            self._densify_acc = _zero_densify_acc(self.scene.point_count)

        camera = Camera.from_view(view)
        self.scene, self._opt_state, self._densify_acc, metrics = step(
            self.scene, self._opt_state, self._densify_acc, camera,
            jnp.asarray(target),
        )
        self.step_count += 1

        self._entry_watermark = jnp.maximum(
            self._entry_watermark, metrics["tile_point_total"]
        )
        stats = self._host_events()
        return {**metrics, **stats} if stats else metrics

    def train_step_batch(self, views, targets) -> dict:
        """One optimization step from the mean loss over a view batch
        (vmap'd single-device multi-view step). Densify statistics match
        ``len(views)`` successive single-view steps; ``step_count``
        advances by the batch size so schedules stay comparable."""
        _, optimizer, step_batch, _ = self._get_step()
        if self._opt_point_count != self.scene.point_count:
            self._opt_state = seed_count(
                optimizer.init(self.scene), self.step_count
            )
            self._opt_point_count = self.scene.point_count
            self._densify_acc = _zero_densify_acc(self.scene.point_count)

        from ..parallel.render import stack_cameras

        cameras = stack_cameras(views)
        self.scene, self._opt_state, self._densify_acc, metrics = step_batch(
            self.scene, self._opt_state, self._densify_acc, cameras,
            jnp.asarray(np.stack([np.asarray(t) for t in targets])),
        )
        self.step_count += len(views)
        return metrics

    def fit(self, views, targets, iterations: Optional[int] = None) -> list:
        """Round-robin fit over (views, targets). Returns metric history
        (fetched to host floats in one transfer at the end)."""
        iterations = iterations or self.config.iterations
        history = []
        n = len(views)
        for _ in range(iterations):
            # Index by the global step counter (not a local loop counter) so
            # a resumed trainer replays the same view sequence as fit_scan.
            j = self.step_count % n
            history.append(self.train_step(views[j], targets[j]))
        history = jax.device_get(history)
        return [
            {k: (float(v) if np.ndim(v) == 0 else v) for k, v in h.items()}
            for h in history
        ]

    def _next_event(self, end: int) -> int:
        """First step index > step_count at which host intervention is due
        (SH-warmup recompile, overflow check, densify, opacity reset), or
        ``end``. Scanned chunks must break exactly there so chunked fits
        replay the per-step schedule."""
        return next_host_event(self.config, self.step_count, end)

    def _host_events(self) -> dict:
        """Post-step host interventions at the current ``step_count``:
        densification, opacity reset, overflow watch at its cadence (no
        per-step host sync otherwise — the watermark is the running
        on-device max carried in ``self._entry_watermark``). Returns
        densify stats when an event fired (``fit_scan`` chunk boundaries
        land exactly on these steps, so chunked and per-step fits follow
        the identical schedule)."""
        c = self.config
        stats = {}
        check_overflow = self.step_count % c.overflow_check_interval == 0
        watermark_scale = 1.0
        if c.densify_from <= self.step_count < c.densify_until:
            if self.step_count % c.densify_interval == 0:
                old_count = self.scene.point_count
                state = DensifyState(
                    grad_norm_sum=np.asarray(self._densify_acc["grad_norm_sum"]),
                    visible_count=np.asarray(self._densify_acc["visible_count"]),
                    max_radii=np.asarray(self._densify_acc["max_radii"]),
                )
                self.scene, _, stats = densify_and_prune(
                    self.scene, state, c.densify
                )
                self._densify_acc = _zero_densify_acc(self.scene.point_count)
                # A densify step changes the entry load immediately; check
                # now with the watermark projected by the point growth so
                # the buffer cannot silently clip until the next cadence
                # check (we are already host-synced here anyway).
                check_overflow = True
                watermark_scale = self.scene.point_count / max(old_count, 1)
            if self.step_count % c.opacity_reset_interval == 0:
                self.scene = reset_opacity(self.scene, c.densify)
        if check_overflow:
            total = int(int(self._entry_watermark) * watermark_scale)
            if total > c.capacity_grow_at * self._entry_capacity:
                b = c.render.block_size
                new_cap = int(total * c.capacity_grow_factor)
                self._entry_capacity = max(
                    (new_cap + b - 1) // b * b, self._entry_capacity
                )
            self._entry_watermark = jnp.int32(0)
        return stats

    def fit_scan(
        self,
        views,
        targets,
        iterations: Optional[int] = None,
        max_chunk: int = 200,
    ) -> list:
        """Like :meth:`fit`, but runs steps in compiled ``lax.scan`` chunks
        — one device dispatch per chunk instead of per step (the tunnel RPC
        latency otherwise dominates small-scene training). Chunks break at
        every host-intervention step, so the result follows the identical
        schedule as per-step :meth:`fit`."""
        from ..parallel.render import stack_cameras

        iterations = iterations or self.config.iterations
        end = self.step_count + iterations
        cameras = stack_cameras(views)
        targets_d = jnp.asarray(np.stack([np.asarray(t) for t in targets]))
        n = len(views)
        history = []
        while self.step_count < end:
            _, optimizer, _, make_step_scan = self._get_step()
            if self._opt_point_count != self.scene.point_count:
                self._opt_state = seed_count(
                optimizer.init(self.scene), self.step_count
            )
                self._opt_point_count = self.scene.point_count
                self._densify_acc = _zero_densify_acc(self.scene.point_count)
            k = min(self._next_event(end) - self.step_count, max_chunk)
            step_scan = make_step_scan(k)
            (
                self.scene, self._opt_state, self._densify_acc, metrics
            ) = step_scan(
                self.scene, self._opt_state, self._densify_acc,
                cameras, targets_d, jnp.int32(self.step_count % n),
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
