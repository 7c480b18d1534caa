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
from .densify import DensifyConfig, DensifyState, densify_and_prune, reset_opacity
from .losses import photometric_loss, psnr
from .optimizer import OptimizerConfig, make_optimizer


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
):
    render_fn = _build_render_fn(
        image_width, image_height, point_count, sh_degree, capacity,
        block_size, backend, interpret,
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
        ref = jnp.zeros((point_count,), jnp.float32)
        (loss, out), (grads, grad_norm) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(scene, ref, camera, target)
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = jax.tree_util.tree_map(lambda p, u: p + u, scene, updates)
        # Densification statistics accumulate on-device (no per-step host
        # sync); the controller fetches them only at densify events.
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

    return step, optimizer


def _zero_densify_acc(point_count: int):
    return {
        "grad_norm_sum": jnp.zeros((point_count,), jnp.float32),
        "visible_count": jnp.zeros((point_count,), jnp.int32),
        "max_radii": jnp.zeros((point_count,), jnp.int32),
    }


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
        )

    # -- public API ------------------------------------------------------------

    def train_step(self, view: View, target: jax.Array) -> dict:
        """One optimization step against one view. Returns metrics."""
        step, optimizer = self._get_step()
        if self._opt_point_count != self.scene.point_count:
            self._opt_state = optimizer.init(self.scene)
            self._opt_point_count = self.scene.point_count
            self._densify_acc = _zero_densify_acc(self.scene.point_count)

        camera = Camera.from_view(view)
        self.scene, self._opt_state, self._densify_acc, metrics = step(
            self.scene, self._opt_state, self._densify_acc, camera,
            jnp.asarray(target),
        )
        self.step_count += 1

        c = self.config
        # Overflow watch: grow the static entry buffer before it clips.
        total = int(metrics["tile_point_total"])
        if total > c.capacity_grow_at * self._entry_capacity:
            b = c.render.block_size
            new_cap = int(total * c.capacity_grow_factor)
            self._entry_capacity = max(
                (new_cap + b - 1) // b * b, self._entry_capacity
            )
        in_densify_phase = (
            c.densify_from <= self.step_count < c.densify_until
        )
        if in_densify_phase:
            if self.step_count % c.densify_interval == 0:
                state = DensifyState(
                    grad_norm_sum=np.asarray(self._densify_acc["grad_norm_sum"]),
                    visible_count=np.asarray(self._densify_acc["visible_count"]),
                    max_radii=np.asarray(self._densify_acc["max_radii"]),
                )
                self.scene, _, stats = densify_and_prune(
                    self.scene, state, c.densify
                )
                self._densify_acc = _zero_densify_acc(self.scene.point_count)
                metrics = {**metrics, **stats}
            if self.step_count % c.opacity_reset_interval == 0:
                self.scene = reset_opacity(self.scene, c.densify)

        return {
            k: (float(v) if jnp.ndim(v) == 0 else v) for k, v in metrics.items()
        }

    def fit(self, views, targets, iterations: Optional[int] = None) -> list:
        """Round-robin fit over (views, targets). Returns metric history."""
        iterations = iterations or self.config.iterations
        history = []
        n = len(views)
        for i in range(iterations):
            j = i % n
            history.append(self.train_step(views[j], targets[j]))
        return history
