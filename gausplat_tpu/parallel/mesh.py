"""Device-mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a mesh over the first ``prod(axis_sizes)`` devices.

    Example: ``make_mesh((2, 4), ("data", "tiles"))`` for 2-way view
    batching x 4-way tile sharding on 8 chips.
    """
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(axis_sizes))
    if len(devices) < n:
        raise ValueError(
            f"Mesh of {axis_sizes} needs {n} devices, have {len(devices)}"
        )
    grid = np.array(devices[:n]).reshape(axis_sizes)
    return Mesh(grid, tuple(axis_names))
