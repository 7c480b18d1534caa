"""Checkpoint / resume.

Two formats, mirroring the reference's story (SURVEY.md section 5):

- the **3DGS PLY codec** is the interchange/checkpoint format for the scene
  parameters (byte-exact round trips — ``scene/ply.py``), as in the
  reference where encode/decode_polygon round-trip the full state;
- **orbax** checkpoints carry full training state (scene + optimizer
  moments + step counters) for resume, the analogue of burn's ``Record``
  serialization on the reference's Module/Config derive.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None

from ..scene.gaussian_3d import GaussianScene


def save_training_state(
    path: str,
    scene: GaussianScene,
    opt_state: Any = None,
    step: int = 0,
) -> None:
    """Save scene (+ optional optimizer state) with orbax."""
    if ocp is None:
        raise RuntimeError("orbax-checkpoint is not available")
    payload = {
        "scene": dataclasses.asdict(scene),
        "step": np.int64(step),
    }
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, payload)


def load_training_state(
    path: str,
    opt_state_template: Any = None,
) -> tuple[GaussianScene, Optional[Any], int]:
    """Load (scene, opt_state, step) saved by :func:`save_training_state`.

    Pass ``opt_state_template`` (e.g. ``optimizer.init(scene)``) to restore
    the optimizer state with its original pytree structure; without it the
    optimizer state comes back as raw nested dicts/arrays.
    """
    if ocp is None:
        raise RuntimeError("orbax-checkpoint is not available")
    ckpt = ocp.PyTreeCheckpointer()
    payload = ckpt.restore(path)
    scene = GaussianScene(
        **{k: jax.numpy.asarray(v) for k, v in payload["scene"].items()}
    )
    opt_state = payload.get("opt_state")
    if opt_state is not None and opt_state_template is not None:
        leaves = jax.tree_util.tree_leaves(opt_state)
        treedef = jax.tree_util.tree_structure(opt_state_template)
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return scene, opt_state, int(payload["step"])
