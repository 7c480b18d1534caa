"""Fast 1-D prefix scans (sum / max) via 2-D tiling.

XLA's native 1-D ``cumsum``/``cummax`` lower poorly on TPU at multi-million
lengths (tens of ms for a 4M-element scan — each log-step is a full badly
tiled pass). Reshaping to ``[rows, 512]`` makes every log-step a wide VPU
op over a compact (8, 128)-tiled buffer: intra-row scan (9 shifted ops),
a recursive scan of the ~n/512 row totals, then one broadcast combine —
two orders of magnitude faster.

This is the engine's equivalent of the reference's hierarchical subgroup
scan kernel (scan/add/kernel.1.wgsl: subgroup scan + cross-subgroup combine
+ recursive group-total scan) — the same two-level structure, expressed as
jnp ops for XLA instead of workgroup shuffles.
"""

from __future__ import annotations

import jax.numpy as jnp

_WIDTH = 512


def _shift_right(x, s, fill):
    filler = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
    return jnp.concatenate([filler, x[..., :-s]], axis=-1)


def _scan_rows(x, op, identity):
    """Inclusive scan along the last axis (log-steps)."""
    n = x.shape[-1]
    s = 1
    while s < n:
        x = op(x, _shift_right(x, s, identity))
        s *= 2
    return x


def _prefix(x, op, identity):
    """Inclusive scan along the LAST axis (any leading batch axes —
    batched rows share every log-step as one wider VPU op)."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    if n <= _WIDTH:
        return _scan_rows(x, op, identity)
    rows = -(-n // _WIDTH)
    padded = jnp.concatenate(
        [x, jnp.full(lead + (rows * _WIDTH - n,), identity, x.dtype)],
        axis=-1,
    ).reshape(lead + (rows, _WIDTH))
    scanned = _scan_rows(padded, op, identity)
    row_totals = scanned[..., -1]
    row_prefix_incl = _prefix(row_totals, op, identity)
    row_prefix_excl = jnp.concatenate(
        [
            jnp.full(lead + (1,), identity, x.dtype),
            row_prefix_incl[..., :-1],
        ],
        axis=-1,
    )
    return op(scanned, row_prefix_excl[..., None]).reshape(
        lead + (rows * _WIDTH,)
    )[..., :n]


def prefix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along the last axis (drop-in for
    ``jnp.cumsum``; leading axes are batched)."""
    return _prefix(x, jnp.add, 0)


def prefix_max(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative max along the last axis (drop-in for
    ``jax.lax.cummax``; leading axes are batched)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        identity = jnp.iinfo(x.dtype).min
    else:
        identity = -jnp.inf
    return _prefix(x, jnp.maximum, identity)
