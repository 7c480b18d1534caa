"""Training-state checkpoint round trip (orbax)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gausplat_tpu import GaussianScene, Points
from gausplat_tpu.train import make_optimizer
from gausplat_tpu.train.checkpoint import load_training_state, save_training_state

pytestmark = pytest.mark.quick

ocp = pytest.importorskip("orbax.checkpoint")


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    scene = GaussianScene(
        colors_sh=jnp.asarray(rng.standard_normal((11, 48)).astype(np.float32)),
        opacities=jnp.asarray(rng.standard_normal((11, 1)).astype(np.float32)),
        positions=jnp.asarray(rng.standard_normal((11, 3)).astype(np.float32)),
        rotations=jnp.asarray(rng.standard_normal((11, 4)).astype(np.float32)),
        scalings=jnp.asarray(rng.standard_normal((11, 3)).astype(np.float32)),
    )
    optimizer = make_optimizer()
    opt_state = optimizer.init(scene)

    path = str(tmp_path / "ckpt")
    save_training_state(path, scene, opt_state, step=42)
    scene2, opt_state2, step = load_training_state(path, opt_state)

    assert step == 42
    for name in ("colors_sh", "opacities", "positions", "rotations", "scalings"):
        np.testing.assert_array_equal(
            np.asarray(getattr(scene, name)), np.asarray(getattr(scene2, name))
        )
    # Optimizer moments survive.
    assert int(opt_state2["count"]) == int(opt_state["count"])
    np.testing.assert_array_equal(
        np.asarray(opt_state2["adam"]["positions"].mu),
        np.asarray(opt_state["adam"]["positions"].mu),
    )


def test_restore_rejects_mismatched_opt_template(tmp_path):
    """Restoring against a template whose pytree layout changed must fail
    loudly, not silently permute optimizer moments."""
    import pytest
    from gausplat_tpu.train.checkpoint import (
        load_training_state, save_training_state,
    )
    from gausplat_tpu.train.optimizer import make_optimizer

    scene = GaussianScene.from_points(Points.default(5))
    optimizer = make_optimizer()
    opt_state = optimizer.init(scene)
    path = str(tmp_path / "ck")
    save_training_state(path, scene, opt_state, step=3)

    # A template with a different structure (renamed key).
    bad_template = {"renamed": opt_state["adam"], "count": opt_state["count"]}
    with pytest.raises(ValueError, match="mismatch"):
        load_training_state(path, bad_template)


def test_camera_extent():
    from gausplat_tpu.train.densify import camera_extent
    from gausplat_tpu import View
    views = [
        View(view_position=[2.0, 0.0, 0.0]),
        View(view_position=[-2.0, 0.0, 0.0]),
    ]
    assert abs(camera_extent(views) - 2.0 * 1.1) < 1e-6
