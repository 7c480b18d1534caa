"""Densification / pruning controller.

Driven by exactly the two signals the reference renderer exports for this
purpose (render/gaussian_3d/mod.rs:78-93): the per-point 2D-position
gradient norms (``positions_2d_grad_norm``) and the visible radii. Standard
3DGS adaptive density control: clone small high-gradient Gaussians, split
large ones, prune transparent / oversized ones, periodically reset opacity.

Runs on host (NumPy): densification changes the point count, i.e. the
compiled shapes — a host-side decision between jit regions by construction.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..scene.gaussian_3d import GaussianScene


def zero_densify_acc(point_count: int) -> dict:
    """Fresh on-device densification accumulators (grad-norm sums,
    visibility counts, max radii), shared by the single-device Trainer and
    the sharded train step."""
    return {
        "grad_norm_sum": jnp.zeros((point_count,), jnp.float32),
        "visible_count": jnp.zeros((point_count,), jnp.int32),
        "max_radii": jnp.zeros((point_count,), jnp.int32),
    }


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 2.0e-4
    percent_dense: float = 0.01
    scene_extent: float = 1.0
    split_factor: float = 1.6
    split_samples: int = 2
    min_opacity: float = 5.0e-3
    max_screen_radius: float = 0.0  # 0 disables radius pruning
    opacity_reset_value: float = 0.01
    seed: int = 0


@dataclasses.dataclass
class DensifyState:
    """Accumulated densification statistics between densify events."""

    grad_norm_sum: np.ndarray  # [P]
    visible_count: np.ndarray  # [P]
    max_radii: np.ndarray  # [P]

    @classmethod
    def zeros(cls, point_count: int) -> "DensifyState":
        return cls(
            grad_norm_sum=np.zeros(point_count, np.float32),
            visible_count=np.zeros(point_count, np.int32),
            max_radii=np.zeros(point_count, np.int32),
        )

    def accumulate(self, grad_norm, radii) -> None:
        grad_norm = np.asarray(grad_norm)
        radii = np.asarray(radii)
        visible = radii > 0
        self.grad_norm_sum += np.where(visible, grad_norm, 0.0)
        self.visible_count += visible.astype(np.int32)
        self.max_radii = np.maximum(self.max_radii, radii)


def densify_and_prune(
    scene: GaussianScene,
    state: DensifyState,
    config: DensifyConfig = DensifyConfig(),
) -> tuple[GaussianScene, DensifyState, dict]:
    """One densify/prune event. Returns (new scene, fresh state, stats)."""
    params = {
        name: np.asarray(getattr(scene, name))
        for name in ("colors_sh", "opacities", "positions", "rotations", "scalings")
    }
    p = params["positions"].shape[0]
    rng = np.random.default_rng(config.seed + p)

    avg_grad = state.grad_norm_sum / np.maximum(state.visible_count, 1)
    high_grad = avg_grad > config.grad_threshold
    scales = np.exp(params["scalings"])
    max_scale = scales.max(axis=1)
    dense_limit = config.percent_dense * config.scene_extent

    clone_mask = high_grad & (max_scale <= dense_limit)
    split_mask = high_grad & (max_scale > dense_limit)

    # Clones: exact copies (they will drift apart under their own grads).
    clones = {k: v[clone_mask] for k, v in params.items()}

    # Splits: sample positions from the Gaussian, shrink scales.
    k = config.split_samples
    idx = np.nonzero(split_mask)[0]
    splits = {key: np.repeat(v[idx], k, axis=0) for key, v in params.items()}
    if idx.size:
        q = params["rotations"][idx]
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        rot = np.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
            ],
            axis=-1,
        ).reshape(-1, 3, 3)
        rot = np.repeat(rot, k, axis=0)
        local = rng.standard_normal((idx.size * k, 3)).astype(np.float32)
        local *= np.repeat(scales[idx], k, axis=0)
        splits["positions"] = splits["positions"] + np.einsum(
            "pij,pj->pi", rot, local
        ).astype(np.float32)
        splits["scalings"] = np.log(
            np.repeat(scales[idx], k, axis=0) / config.split_factor
        ).astype(np.float32)

    # Prune: split originals + transparent + (optionally) oversized.
    opacity = 1.0 / (1.0 + np.exp(-params["opacities"][:, 0]))
    prune_mask = split_mask | (opacity < config.min_opacity)
    if config.max_screen_radius > 0:
        prune_mask |= state.max_radii > config.max_screen_radius
    keep = ~prune_mask

    new_params = {
        key: np.concatenate([v[keep], clones[key], splits[key]], axis=0)
        for key, v in params.items()
    }
    new_scene = GaussianScene(
        **{key: jnp.asarray(v) for key, v in new_params.items()}
    )
    stats = {
        "cloned": int(clone_mask.sum()),
        "split": int(split_mask.sum()),
        "pruned": int(prune_mask.sum()),
        "point_count": new_scene.point_count,
    }
    return new_scene, DensifyState.zeros(new_scene.point_count), stats


def reset_opacity(
    scene: GaussianScene, config: DensifyConfig = DensifyConfig()
) -> GaussianScene:
    """Clamp opacity (outer) to at most ``opacity_reset_value``."""
    outer = np.asarray(scene.get_opacities())
    clamped = np.minimum(outer, config.opacity_reset_value)
    clamped = np.clip(clamped, 1e-6, 1 - 1e-6)
    inner = np.log(clamped / (1.0 - clamped)).astype(np.float32)
    import dataclasses as _dc

    return _dc.replace(scene, opacities=jnp.asarray(inner))


def camera_extent(views) -> float:
    """Scene extent from the training cameras, as standard 3DGS derives it
    (radius of the camera-center bounding sphere x 1.1). Feed this into
    ``DensifyConfig.scene_extent`` and ``OptimizerConfig.scene_extent`` —
    the densify size thresholds and the position learning rate are keyed
    to it (the reference leaves training to its downstream crate; these
    are that crate's conventions)."""
    centers = np.stack(
        [np.asarray(v.view_position, np.float64) for v in views]
    )
    center = centers.mean(axis=0)
    radius = float(np.linalg.norm(centers - center, axis=1).max())
    return max(radius * 1.1, 1e-6)
