"""Loader for the native (C++) PLY payload codec, with NumPy fallback.

Build with ``python native/setup.py build_ext --inplace`` from the repo
root (see native/ply_codec.cpp). When absent, the pure-NumPy path in
:mod:`gausplat_tpu.scene.ply` is used — identical results, slower on
multi-million-point scenes.
"""

from __future__ import annotations

import numpy as np

try:
    import _gausplat_native as _native
except ImportError:  # pragma: no cover - build-dependent
    _native = None

PROPERTY_COUNT = 62


def available() -> bool:
    return _native is not None


def decode_payload(payload: bytes, point_count: int):
    """Payload bytes -> (colors_sh, opacities, positions, rotations,
    scalings) float32 arrays, or None if the extension is unavailable."""
    if _native is None:
        return None
    colors_sh = np.empty((point_count, 48), np.float32)
    opacities = np.empty((point_count, 1), np.float32)
    positions = np.empty((point_count, 3), np.float32)
    rotations = np.empty((point_count, 4), np.float32)
    scalings = np.empty((point_count, 3), np.float32)
    _native.decode_payload(
        payload, point_count, colors_sh, opacities, positions, rotations,
        scalings,
    )
    return colors_sh, opacities, positions, rotations, scalings


def encode_payload(colors_sh, opacities, positions, rotations, scalings):
    """Five float32 arrays -> interleaved payload bytes, or None."""
    if _native is None:
        return None
    point_count = colors_sh.shape[0]
    out = np.empty((point_count, PROPERTY_COUNT), np.float32)
    _native.encode_payload(
        np.ascontiguousarray(colors_sh, np.float32),
        np.ascontiguousarray(opacities, np.float32),
        np.ascontiguousarray(positions, np.float32),
        np.ascontiguousarray(rotations, np.float32),
        np.ascontiguousarray(scalings, np.float32),
        point_count,
        out,
    )
    return out.tobytes()
