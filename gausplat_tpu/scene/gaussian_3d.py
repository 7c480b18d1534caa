"""3DGS scene representation.

Parity targets:
- Scene params + render entry points:
  /root/reference/src/scene/gaussian_3d/mod.rs:54-275
- Inner/outer property transforms:
  /root/reference/src/scene/gaussian_3d/property.rs:61-170
- Point-cloud initialisation:
  /root/reference/src/scene/gaussian_3d/import.rs:92-258

The scene is a JAX pytree of the five *inner* (optimisable) parameters:

- ``colors_sh``  [P, 48]   SH coefficients ([P, M, 3] flattened, M=16)
- ``opacities``  [P, 1]    logit-space opacity (outer = sigmoid(inner))
- ``positions``  [P, 3]    world positions
- ``rotations``  [P, 4]    quaternion, scalar-last (x, y, z, w); normalized on read
- ``scalings``   [P, 3]    log-space scale (outer = exp(inner))
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SEED, SH_C0, SH_COUNT_MAX
from ..errors import MismatchedTensorShapeError
from .point import Points

_F32_EPS = float(np.finfo(np.float32).eps)

#: Trailing (per-point) dimension of each parameter tensor.
_PARAM_DIMS = {
    "colors_sh": SH_COUNT_MAX * 3,
    "opacities": 1,
    "positions": 3,
    "rotations": 4,
    "scalings": 3,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianScene:
    """The five inner parameters of a 3DGS scene, as a pytree."""

    colors_sh: jax.Array
    opacities: jax.Array
    positions: jax.Array
    rotations: jax.Array
    scalings: jax.Array

    def __post_init__(self):
        """Shape validation mirroring the reference's typed-tensor API
        (error surface: /root/reference/src/error/mod.rs:30-35).

        Lenient where JAX needs it to be: leaves without a ``.shape`` (pytree
        sentinels during tree transforms) skip validation, and extra leading
        (batch/vmap) dimensions are allowed; only the trailing per-point dims
        are enforced here. Cross-parameter point-count consistency is checked
        at :attr:`point_count` (i.e. on render), because the setter API builds
        scenes one parameter at a time — transient mismatches are legal.
        """
        for name, want in _PARAM_DIMS.items():
            shape = getattr(getattr(self, name), "shape", None)
            if shape is None or not isinstance(shape, tuple):
                continue  # non-array pytree leaf (tracing/transform internals)
            if len(shape) < 2 or shape[-1] != want:
                raise MismatchedTensorShapeError(
                    f"{name}: {shape}", f"[..., P, {want}]"
                )

    # -- attributes ------------------------------------------------------------

    @property
    def point_count(self) -> int:
        shapes = {
            name: getattr(self, name).shape for name in _PARAM_DIMS
        }
        if len({s[:-1] for s in shapes.values()}) != 1:
            raise MismatchedTensorShapeError(
                shapes,
                "a single shared point dimension across all five parameters",
            )
        return self.colors_sh.shape[-2]

    @property
    def size_bytes(self) -> int:
        return sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in (
                self.colors_sh,
                self.opacities,
                self.positions,
                self.rotations,
                self.scalings,
            )
        )

    def __repr__(self) -> str:
        return (
            f"GaussianScene(point_count={self.point_count}, "
            f"size={self.size_bytes}B)"
        )

    # -- outer property getters (property.rs:61-93) ----------------------------

    def get_colors_sh(self) -> jax.Array:
        return make_colors_sh(self.colors_sh)

    def get_opacities(self) -> jax.Array:
        return make_opacities(self.opacities)

    def get_positions(self) -> jax.Array:
        return make_positions(self.positions)

    def get_rotations(self) -> jax.Array:
        return make_rotations(self.rotations)

    def get_scalings(self) -> jax.Array:
        return make_scalings(self.scalings)

    # -- outer property setters (functional; property.rs:96-137) ---------------

    def set_colors_sh(self, v) -> "GaussianScene":
        return dataclasses.replace(self, colors_sh=make_inner_colors_sh(v))

    def set_opacities(self, v) -> "GaussianScene":
        return dataclasses.replace(self, opacities=make_inner_opacities(v))

    def set_positions(self, v) -> "GaussianScene":
        return dataclasses.replace(self, positions=make_inner_positions(v))

    def set_rotations(self, v) -> "GaussianScene":
        return dataclasses.replace(self, rotations=make_inner_rotations(v))

    def set_scalings(self, v) -> "GaussianScene":
        return dataclasses.replace(self, scalings=make_inner_scalings(v))

    # -- constructors ----------------------------------------------------------

    @classmethod
    def from_points(
        cls,
        points: Points,
        seed: int = SEED,
        seed_compat: str = "reference",
    ) -> "GaussianScene":
        """Initialise a scene from an SfM point cloud.

        Mirrors import.rs:92-258: SH DC from RGB, opacity 0.1, identity
        rotations, seeded LogNormal(0, e) scales normalized by the max then
        sqrt'd and repeated over the 3 axes.

        ``seed_compat="reference"`` (default) draws the scale samples from
        a bit-compatible reimplementation of the reference's RNG stream
        (Rust ``StdRng(0x3D65)`` = ChaCha12 + the rand_distr ziggurat —
        :mod:`gausplat_tpu.utils.rand_compat`), so point-cloud-initialized
        scenes match the reference's numerically. ``seed_compat="numpy"``
        uses NumPy's PCG64 (same distribution, different stream; ~2x
        faster on multi-million-point clouds).
        """
        point_count = len(points)

        colors_sh = np.zeros((point_count, SH_COUNT_MAX * 3), np.float32)
        colors_sh[:, 0:3] = (points.colors_rgb - 0.5) / np.float32(SH_C0)

        opacities = np.full((point_count, 1), 25.5 / 255.0, np.float32)
        opacities = np.log(opacities / (1.0 - opacities))

        positions = points.positions.astype(np.float32)

        rotations = np.tile(
            np.array([0.0, 0.0, 0.0, 1.0], np.float32), (point_count, 1)
        )

        if seed_compat == "reference":
            from ..utils.rand_compat import reference_lognormal_e_f32

            samples = reference_lognormal_e_f32(point_count, seed)[:, None]
        else:
            rng = np.random.default_rng(seed)
            samples = rng.lognormal(
                mean=0.0, sigma=float(np.e), size=(point_count, 1)
            ).astype(np.float32)
        samples = np.maximum(samples, _F32_EPS)
        sample_max = max(float(samples.max()) if point_count else 0.0, _F32_EPS)
        scalings = np.sqrt(samples / np.float32(sample_max))
        scalings = np.maximum(scalings, _F32_EPS)
        scalings = np.log(np.repeat(scalings, 3, axis=1))

        return cls(
            colors_sh=jnp.asarray(colors_sh),
            opacities=jnp.asarray(opacities),
            positions=jnp.asarray(positions),
            rotations=jnp.asarray(rotations),
            scalings=jnp.asarray(scalings),
        )

    @classmethod
    def default(cls) -> "GaussianScene":
        """16 default points, as the reference's ``Default`` impl."""
        return cls.from_points(Points.default(16))

    def to_points(self) -> Points:
        """Export as a point cloud (export.rs:75-106)."""
        p = self.point_count
        colors_rgb = np.asarray(self.get_colors_sh()[:, 0:3]) * np.float32(
            SH_C0
        ) + np.float32(0.5)
        positions = np.asarray(self.get_positions()).astype(np.float64)
        return Points(colors_rgb[:p], positions[:p])


# --- inner <-> outer transforms (property.rs) ---------------------------------


def make_colors_sh(colors_sh):
    return colors_sh


def make_opacities(opacities):
    return jax.nn.sigmoid(opacities)


def make_positions(positions):
    return positions


def make_rotations(rotations):
    norm = jnp.sqrt(jnp.sum(rotations**2, axis=-1, keepdims=True))
    return rotations / norm


def make_scalings(scalings):
    return jnp.exp(scalings)


def make_inner_colors_sh(colors_sh):
    return jnp.asarray(colors_sh)


def make_inner_opacities(opacities):
    opacities = jnp.asarray(opacities)
    return jnp.log(opacities / (1.0 - opacities))


def make_inner_positions(positions):
    return jnp.asarray(positions)


def make_inner_rotations(rotations):
    return jnp.asarray(rotations)


def make_inner_scalings(scalings):
    return jnp.log(jnp.asarray(scalings))
