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
        # Restore against the template structure *with validation*: orbax
        # returns plain nested containers, so rebuilding by leaf order is
        # only sound if the keyed paths line up — verify every leaf path
        # (names + order), not just the count, so a changed optimizer
        # layout fails loudly instead of silently scrambling moments.
        restored = jax.tree_util.tree_flatten_with_path(opt_state)[0]
        wanted = jax.tree_util.tree_flatten_with_path(opt_state_template)[0]

        def _names(path):
            out = []
            for p in path:
                key = getattr(p, "key", getattr(p, "name", getattr(p, "idx", p)))
                out.append(str(key))
            return tuple(out)

        got_paths = [_names(p) for p, _ in restored]
        want_paths = [_names(p) for p, _ in wanted]
        if got_paths != want_paths:
            mismatch = next(
                (a, b)
                for a, b in zip(got_paths + [None], want_paths + [None])
                if a != b
            )
            raise ValueError(
                "checkpointed optimizer state does not match the template "
                f"structure; first mismatch: {mismatch}"
            )
        for (gp, gleaf), (_, wleaf) in zip(restored, wanted):
            if np.shape(gleaf) != np.shape(wleaf):
                raise ValueError(
                    f"optimizer-state leaf {'/'.join(_names(gp))} shape "
                    f"{np.shape(gleaf)} != template {np.shape(wleaf)}"
                )
        treedef = jax.tree_util.tree_structure(opt_state_template)
        opt_state = jax.tree_util.tree_unflatten(
            treedef, [leaf for _, leaf in restored]
        )
    return scene, opt_state, int(payload["step"])
