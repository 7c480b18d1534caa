"""Multi-chip rendering and training via jax.sharding.

The reference is a single-device library (SURVEY.md section 2: no
distributed components); its scale axes are point count x image size. This
module provides the TPU-native scale-out the task mandates:

- :func:`render_views` / :func:`render_data_parallel` — batched multi-view
  rendering, sharded over a mesh axis (data parallelism over cameras);
- :func:`render_tile_sharded` — one large frame sharded spatially across
  the mesh by tile rows (the 4K config in BASELINE.json);
- :func:`make_mesh` — mesh construction helper.

Gradient reductions ride XLA collectives inserted by ``shard_map``'s
transpose (replicated parameters -> psum of cotangents over ICI).
"""

from .mesh import make_mesh
from .render import render_data_parallel, render_tile_sharded, render_views

__all__ = [
    "make_mesh",
    "render_data_parallel",
    "render_tile_sharded",
    "render_views",
]
