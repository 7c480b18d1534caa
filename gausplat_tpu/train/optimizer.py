"""Per-parameter Adam for 3DGS scenes (standard 3DGS schedule).

The reference leaves optimization to its downstream trainer; these are the
canonical 3DGS hyperparameters used with it: per-parameter Adam learning
rates, with the position lr decayed exponentially over training and scaled
by the scene extent.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax

from ..scene.gaussian_3d import GaussianScene


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_max_steps: int = 30_000
    colors_sh_dc_lr: float = 2.5e-3
    colors_sh_rest_div: float = 20.0  # rest lr = dc lr / 20
    opacity_lr: float = 5.0e-2
    scaling_lr: float = 5.0e-3
    rotation_lr: float = 1.0e-3
    scene_extent: float = 1.0
    eps: float = 1e-15


def position_lr_schedule(config: OptimizerConfig):
    """Log-linear interpolation from init to final over max_steps."""
    init = config.position_lr_init * config.scene_extent
    final = config.position_lr_final * config.scene_extent

    def schedule(step):
        t = jnp.clip(step / config.position_lr_max_steps, 0.0, 1.0)
        return jnp.exp((1.0 - t) * jnp.log(init) + t * jnp.log(final))

    return schedule


def _sh_lr_mask(config: OptimizerConfig):
    """Column-wise lr scale for colors_sh: DC columns (0:3) at full lr,
    higher-order columns divided by ``colors_sh_rest_div``."""
    scale = jnp.ones((1, 48), jnp.float32) / config.colors_sh_rest_div
    return scale.at[:, 0:3].set(1.0)


def seed_count(state, step) -> dict:
    """Re-key a freshly init'd optimizer state to the training-global step.

    Densification reshapes the scene, which forces a fresh optimizer state —
    but the position-lr schedule must continue from the *global* iteration
    (the standard 3DGS recipe keys ``position_lr`` to the training
    iteration). Without this, every densify rewound the schedule to step 0;
    after the last densify at 15k the position lr sat ~8x too high for the
    rest of a 30k fit, which showed up as the post-15k PSNR decay in
    train_long_r03.json (46.6 dB peak -> 38.4 at 30k).
    """
    return {**state, "count": jnp.asarray(step, jnp.int32)}


def make_optimizer(config: OptimizerConfig = OptimizerConfig()):
    """An optax-style GradientTransformation over the GaussianScene pytree.

    Explicit per-field Adam: each of the five parameters gets its own Adam
    moments and learning rate (positions on the decaying schedule; the
    higher-order SH columns at dc_lr / 20).
    """
    sh_scale = _sh_lr_mask(config)
    pos_schedule = position_lr_schedule(config)
    adam = optax.scale_by_adam(eps=config.eps)
    fields = ("colors_sh", "opacities", "positions", "rotations", "scalings")

    def init(params: GaussianScene):
        return {
            "adam": {f: adam.init(getattr(params, f)) for f in fields},
            "count": jnp.zeros((), jnp.int32),
        }

    def update(grads: GaussianScene, state, params=None):
        del params
        count = state["count"] + 1
        new_adam = {}
        scaled = {}
        for f in fields:
            u, new_adam[f] = adam.update(getattr(grads, f), state["adam"][f])
            scaled[f] = u
        scaled["colors_sh"] = scaled["colors_sh"] * (
            -config.colors_sh_dc_lr * sh_scale
        )
        scaled["opacities"] = scaled["opacities"] * (-config.opacity_lr)
        scaled["positions"] = scaled["positions"] * (-pos_schedule(count))
        scaled["rotations"] = scaled["rotations"] * (-config.rotation_lr)
        scaled["scalings"] = scaled["scalings"] * (-config.scaling_lr)
        return GaussianScene(**scaled), {"adam": new_adam, "count": count}

    return optax.GradientTransformation(init, update)
