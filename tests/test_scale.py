"""Reference-scale differential tests for the production-size primitives.

The reference tests its scan at 2^22 - 1 elements and its radix sort at
2^18 - 1 pairs (scan/add/mod.rs:104-189, sort/radix/mod.rs:163-303); the
tiled prefix scan and the sort-based gradient reduction are this repo's
own primitives and run at 2.4-8M elements in production, so they get
multi-million-element checks here (round-3 VERDICT #6).

Runtime: ~35 s total on the 1-core CPU host (not in the quick tier).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gausplat_tpu.ops.prefix import prefix_max, prefix_sum


def test_prefix_sum_reference_scale():
    """prefix_sum at the reference's scan test size (2^22 - 1, non-power-of
    -two to exercise partial-tile edges) and at 2^22, exact in int32."""
    rng = np.random.default_rng(7)
    for n in ((1 << 22) - 1, 1 << 22):
        x = rng.integers(-50, 90, n).astype(np.int32)
        np.testing.assert_array_equal(
            np.asarray(prefix_sum(jnp.asarray(x))), np.cumsum(x)
        )


def test_prefix_max_reference_scale():
    rng = np.random.default_rng(8)
    n = (1 << 22) - 1
    x = rng.integers(-(1 << 20), 1 << 20, n).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(prefix_max(jnp.asarray(x))), np.maximum.accumulate(x)
    )


def _make_reduce_case(rng, point_count, capacity, rows, lo=-4, hi=4):
    """Random entry expansion: per-point touched-tile counts, shuffled entry
    order (the tile sort scatters a point's entries arbitrarily), integer-
    valued f32 grads so prefix-sum differencing is EXACT (|running sum|
    stays far below 2^24) and the test can assert equality, not closeness.
    """
    counts = rng.integers(0, 14, point_count).astype(np.int64)
    while counts.sum() > capacity - 8:
        counts[rng.integers(0, point_count)] //= 2
    total = int(counts.sum())
    offsets = np.cumsum(counts).astype(np.int32)  # inclusive
    pids = np.repeat(np.arange(point_count, dtype=np.int32), counts)
    perm = rng.permutation(total)
    sorted_pids = np.full(capacity, point_count, np.int32)  # sentinel P
    sorted_pids[:total] = pids[perm]
    grads = rng.integers(lo, hi, (rows, capacity)).astype(np.float32)
    # Slots past the true total are never written by the backward kernel:
    # poison them to prove the sentinel sort + span-end windows mask them.
    grads[:, total:] = np.nan
    return sorted_pids, offsets, grads, total


def test_grad_reduce_2m_vs_segment_sum():
    """The sort+prefix gradient reduction at production scale (2^21 entries,
    300k points) against a direct f64 segment-sum oracle — exact, because
    the grad values are small integers. Covers: stable-sort grouping,
    span-end differencing, sentinel padding (NaN-poisoned), truncated
    entry_total."""
    from gausplat_tpu.render.pipeline import reduce_entry_grads

    rng = np.random.default_rng(42)
    point_count, capacity, rows = 300_000, 1 << 21, 9
    sorted_pids, offsets, grads, total = _make_reduce_case(
        rng, point_count, capacity, rows
    )

    got = jax.jit(
        lambda g, p, o, t: reduce_entry_grads(
            g, p, o, t, capacity, packed=False
        )
    )(
        jnp.asarray(grads),
        jnp.asarray(sorted_pids),
        jnp.asarray(offsets),
        jnp.int32(total),
    )

    valid = sorted_pids[:total]
    for r in range(rows):
        want = np.zeros(point_count, np.float64)
        np.add.at(want, valid, grads[r, :total].astype(np.float64))
        np.testing.assert_array_equal(
            np.asarray(got[r]), want.astype(np.float32), err_msg=f"row {r}"
        )


def test_grad_reduce_packed_matches_segment_sum():
    """The bf16-pair packed reduce path (6-operand sort + unpack) at 1M+
    entries: grads are small integers (exactly bf16-representable), so the
    packed result must equal the f64 segment-sum oracle bit-for-bit."""
    from gausplat_tpu.ops.blend import _bits, pack_pair
    from gausplat_tpu.render.pipeline import reduce_entry_grads

    rng = np.random.default_rng(17)
    point_count, capacity = 150_000, 1 << 20
    sorted_pids, offsets, comp, total = _make_reduce_case(
        rng, point_count, capacity, rows=9
    )
    comp = np.nan_to_num(comp, nan=0.0)  # re-poison as int garbage below
    c = [jnp.asarray(comp[r]) for r in range(9)]
    rows = jnp.stack(
        [
            pack_pair(c[0], c[1]),
            pack_pair(c[2], c[6]),
            pack_pair(c[3], c[4]),
            pack_pair(c[5], jnp.zeros_like(c[5])),
            _bits(c[7]),
            _bits(c[8]),
        ]
    )
    poison = jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, (6, capacity - total), np.int64)
        .astype(np.int32)
    )
    rows = rows.at[:, total:].set(poison)

    got = jax.jit(
        lambda g, p, o, t: reduce_entry_grads(
            g, p, o, t, capacity, packed=True
        )
    )(rows, jnp.asarray(sorted_pids), jnp.asarray(offsets), jnp.int32(total))

    valid = sorted_pids[:total]
    for r in range(9):
        want = np.zeros(point_count, np.float64)
        np.add.at(want, valid, comp[r, :total].astype(np.float64))
        np.testing.assert_array_equal(
            np.asarray(got[r]), want.astype(np.float32), err_msg=f"row {r}"
        )


def test_grad_reduce_truncated_capacity():
    """When entry_total exceeds capacity (overflow frame), only the first
    `capacity` sorted entries contribute — matching the forward's
    truncation — and offsets past the cut clamp to the valid window."""
    from gausplat_tpu.render.pipeline import reduce_entry_grads

    rng = np.random.default_rng(3)
    point_count, capacity, rows = 5_000, 1 << 14, 9
    counts = rng.integers(0, 14, point_count).astype(np.int64)
    total = int(counts.sum())
    assert total > capacity  # the point of the test
    offsets = np.cumsum(counts).astype(np.int32)
    pids = np.repeat(np.arange(point_count, dtype=np.int32), counts)
    # Expansion writes the first `capacity` entries in expansion order.
    sorted_pids = pids[:capacity].copy()
    grads = rng.integers(-4, 4, (rows, capacity)).astype(np.float32)

    got = jax.jit(
        lambda g, p, o, t: reduce_entry_grads(
            g, p, o, t, capacity, packed=False
        )
    )(
        jnp.asarray(grads),
        jnp.asarray(sorted_pids),
        jnp.asarray(offsets),
        jnp.int32(total),
    )

    for r in range(rows):
        want = np.zeros(point_count, np.float64)
        np.add.at(want, sorted_pids, grads[r].astype(np.float64))
        np.testing.assert_array_equal(
            np.asarray(got[r]), want.astype(np.float32), err_msg=f"row {r}"
        )
