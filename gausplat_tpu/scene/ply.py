"""3DGS PLY codec (checkpoint / interchange format).

Parity targets:
- Canonical header: /root/reference/src/scene/gaussian_3d/header.3dgs.ply
- Decode (strict header-order check, f_dc/f_rest interleave, wxyz -> xyzw):
  /root/reference/src/scene/gaussian_3d/import.rs:15-89
- Encode (62 floats/point, binary little-endian):
  /root/reference/src/scene/gaussian_3d/export.rs:11-71

Layout per vertex (62 float32 properties)::

    x y z | nx ny nz | f_dc_0..2 | f_rest_0..44 | opacity | scale_0..2 | rot_0..3

``f_rest`` is stored channel-major on disk ([3, 15]) while the scene tensor is
coefficient-major ([15, 3] within [P, 16, 3] flattened). ``rot`` is stored
scalar-first (w, x, y, z) on disk; the scene tensor is scalar-last.

A native C++ fast path (``gausplat_tpu.utils.native``) is used for payload
(de)interleaving when available; NumPy otherwise.
"""

from __future__ import annotations

import io
from typing import BinaryIO, Union

import jax.numpy as jnp
import numpy as np

from ..constants import SH_COUNT_MAX
from ..errors import IoError, MismatchedPolygonHeaderError
from ..utils import native
from .gaussian_3d import GaussianScene

PROPERTY_COUNT = 62

#: Property names in canonical order.
PROPERTY_NAMES = (
    ["x", "y", "z", "nx", "ny", "nz"]
    + [f"f_dc_{i}" for i in range(3)]
    + [f"f_rest_{i}" for i in range(45)]
    + ["opacity"]
    + [f"scale_{i}" for i in range(3)]
    + [f"rot_{i}" for i in range(4)]
)


def _header_text(point_count: int) -> str:
    lines = [
        "ply",
        "format binary_little_endian 1.0",
        f"element vertex {point_count}",
    ]
    lines += [f"property float {name}" for name in PROPERTY_NAMES]
    lines.append("end_header")
    return "\n".join(lines) + "\n"


def _parse_header(reader: BinaryIO) -> tuple[int, str]:
    """Parse and validate a 3DGS PLY header; return (point_count, fmt)."""
    raw_lines = []
    while True:
        try:
            line = reader.readline()
        except OSError as e:  # ref Error::Io from the header reads (import.rs)
            raise IoError(e) from e
        if not line:
            raise MismatchedPolygonHeaderError("".join(raw_lines))
        text = line.decode("ascii", errors="replace").rstrip("\r\n")
        raw_lines.append(text + "\n")
        if text == "end_header":
            break
        if len(raw_lines) > 4096:
            raise MismatchedPolygonHeaderError("".join(raw_lines[:64]))

    header = "".join(raw_lines)

    # Strict order check against the canonical 3DGS layout (comments ignored),
    # matching Header::is_same_order in the reference (import.rs:22-24).
    fmt = None
    point_count = None
    elements = []  # (name, [property names]) in order
    for text in raw_lines:
        parts = text.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1] if len(parts) > 1 else None
        elif parts[0] == "element" and len(parts) == 3:
            elements.append((parts[1], []))
            if parts[1] == "vertex":
                point_count = int(parts[2])
        elif parts[0] == "property" and elements:
            if len(parts) == 3 and parts[1] == "float":
                elements[-1][1].append(parts[2])
            else:
                raise MismatchedPolygonHeaderError(header)

    if (
        fmt not in ("binary_little_endian", "binary_big_endian")
        or point_count is None
        or point_count < 0
        or [name for name, _ in elements] != ["vertex"]
        or elements[0][1] != PROPERTY_NAMES
    ):
        raise MismatchedPolygonHeaderError(header)
    return point_count, fmt


def decode_polygon(source: Union[bytes, BinaryIO]) -> GaussianScene:
    """Decode a 3DGS PLY file into a :class:`GaussianScene`."""
    reader = io.BytesIO(source) if isinstance(source, (bytes, bytearray)) else source
    point_count, fmt = _parse_header(reader)

    dtype = "<f4" if fmt == "binary_little_endian" else ">f4"
    try:
        payload = reader.read(point_count * PROPERTY_COUNT * 4)
    except OSError as e:  # ref Error::Io from the payload read_exact
        raise IoError(e) from e
    if len(payload) != point_count * PROPERTY_COUNT * 4:
        raise MismatchedPolygonHeaderError(
            f"payload holds {len(payload)} bytes; header declares "
            f"{point_count} vertices ({point_count * PROPERTY_COUNT * 4} bytes)"
        )

    if fmt == "binary_little_endian" and native.available():
        arrays = native.decode_payload(payload, point_count)
        colors_sh, opacities, positions, rotations, scalings = arrays
        return GaussianScene(
            colors_sh=jnp.asarray(colors_sh),
            opacities=jnp.asarray(opacities),
            positions=jnp.asarray(positions),
            rotations=jnp.asarray(rotations),
            scalings=jnp.asarray(scalings),
        )

    data = np.frombuffer(payload, dtype=dtype, count=point_count * PROPERTY_COUNT)
    data = data.astype(np.float32).reshape(point_count, PROPERTY_COUNT)

    positions = data[:, 0:3]
    f_dc = data[:, 6:9]
    f_rest = data[:, 9:54].reshape(point_count, 3, SH_COUNT_MAX - 1)
    opacities = data[:, 54:55]
    scalings = data[:, 55:58]
    rot_wxyz = data[:, 58:62]

    # [P, M, 3]: DC at m=0; rest transposed channel-major -> coefficient-major.
    colors_sh = np.empty((point_count, SH_COUNT_MAX, 3), np.float32)
    colors_sh[:, 0, :] = f_dc
    colors_sh[:, 1:, :] = np.transpose(f_rest, (0, 2, 1))
    colors_sh = colors_sh.reshape(point_count, SH_COUNT_MAX * 3)

    rotations = rot_wxyz[:, [1, 2, 3, 0]]  # wxyz -> xyzw

    return GaussianScene(
        colors_sh=jnp.asarray(colors_sh),
        opacities=jnp.asarray(opacities),
        positions=jnp.asarray(positions),
        rotations=jnp.asarray(np.ascontiguousarray(rotations)),
        scalings=jnp.asarray(scalings),
    )


def encode_polygon(scene: GaussianScene, writer: BinaryIO | None = None) -> bytes:
    """Encode a :class:`GaussianScene` as a 3DGS PLY file (little-endian)."""
    point_count = scene.point_count

    if native.available():
        payload = native.encode_payload(
            np.asarray(scene.colors_sh, np.float32),
            np.asarray(scene.opacities, np.float32),
            np.asarray(scene.positions, np.float32),
            np.asarray(scene.rotations, np.float32),
            np.asarray(scene.scalings, np.float32),
        )
        out = _header_text(point_count).encode("ascii") + payload
        if writer is not None:
            _write(writer, out)
        return out

    colors_sh = np.asarray(scene.colors_sh, np.float32)
    f_dc = colors_sh[:, 0:3]
    f_rest = (
        colors_sh[:, 3:]
        .reshape(point_count, SH_COUNT_MAX - 1, 3)
        .transpose(0, 2, 1)
        .reshape(point_count, 3 * (SH_COUNT_MAX - 1))
    )
    rotations = np.asarray(scene.rotations, np.float32)
    rot_wxyz = rotations[:, [3, 0, 1, 2]]

    data = np.empty((point_count, PROPERTY_COUNT), np.float32)
    data[:, 0:3] = np.asarray(scene.positions, np.float32)
    data[:, 3:6] = 0.0  # unused normals
    data[:, 6:9] = f_dc
    data[:, 9:54] = f_rest
    data[:, 54:55] = np.asarray(scene.opacities, np.float32)
    data[:, 55:58] = np.asarray(scene.scalings, np.float32)
    data[:, 58:62] = rot_wxyz

    out = _header_text(point_count).encode("ascii") + data.astype("<f4").tobytes()
    if writer is not None:
        _write(writer, out)
    return out


def _write(writer: BinaryIO, out: bytes) -> None:
    try:
        writer.write(out)
    except OSError as e:  # ref Error::Io from encode_polygon's writes (export.rs)
        raise IoError(e) from e
