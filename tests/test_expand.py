"""Fused Pallas expansion vs the XLA gather formulation: bit-identical
(keys, src) across workload shapes, including the edge cases that break
windowed designs (empty spans between visible points, overflow past
capacity, single visible point spanning many blocks, all-invisible)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gausplat_tpu.ops.binning import make_point_orders
from gausplat_tpu.ops.expand import fused_point_orders


def _workload(p, seed, vis_frac=0.8, mean_tiles=2.5, max_wh=6):
    rng = np.random.default_rng(seed)
    counts_w = rng.integers(1, max_wh, p).astype(np.int32)
    counts_h = rng.integers(1, max_wh, p).astype(np.int32)
    vis = rng.random(p) < vis_frac
    del mean_tiles
    tx_min = rng.integers(0, 100, p).astype(np.int32)
    ty_min = rng.integers(0, 50, p).astype(np.int32)
    counts = np.where(vis, counts_w * counts_h, 0).astype(np.int32)
    depths = (0.3 + rng.random(p) * 1000).astype(np.float32)
    return (
        jnp.asarray(depths),
        jnp.asarray(tx_min + counts_w),
        jnp.asarray(tx_min),
        jnp.asarray(ty_min),
        jnp.asarray(counts),
    )


def _compare(args, capacity, tile_count_x=120):
    ref = make_point_orders(
        *args, tile_count_x=tile_count_x, capacity=capacity
    )
    got = fused_point_orders(
        *args, tile_count_x=tile_count_x, capacity=capacity, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    total = int(ref[3])
    n_valid = min(total, capacity)
    # Valid slots: bit-identical keys and source ids.
    np.testing.assert_array_equal(
        np.asarray(got[0][:n_valid]), np.asarray(ref[0][:n_valid])
    )
    np.testing.assert_array_equal(
        np.asarray(got[1][:n_valid]), np.asarray(ref[1][:n_valid])
    )
    # Padding slots: sentinel key and sentinel pid (the gather formulation
    # clips src pre-sentinel identically).
    assert (np.asarray(got[0][n_valid:]) == 0xFFFFFFFF).all()
    np.testing.assert_array_equal(
        np.asarray(got[1][n_valid:]), np.asarray(ref[1][n_valid:])
    )
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))


@pytest.mark.quick
@pytest.mark.parametrize(
    "p,seed,vis,cap",
    [
        (1000, 0, 0.8, 1 << 13),
        (1000, 1, 0.05, 1 << 13),   # long invisible runs between spans
        (257, 2, 1.0, 1 << 12),     # all visible, odd point count
        (64, 3, 0.5, 1 << 12),      # p < one kernel block
    ],
)
def test_fused_expand_matches_gather(p, seed, vis, cap):
    _compare(_workload(p, seed, vis), cap)


@pytest.mark.quick
def test_fused_expand_overflow_truncation():
    """total > capacity: both formulations truncate at the same slots."""
    args = _workload(2000, 7, 1.0, max_wh=8)
    total = int(np.asarray(args[4]).sum())
    cap = (total // 2) // 128 * 128
    _compare(args, cap)


@pytest.mark.quick
def test_fused_expand_all_invisible():
    rng = np.random.default_rng(9)
    p = 300
    z = jnp.zeros((p,), jnp.int32)
    args = (
        jnp.asarray(rng.random(p).astype(np.float32) + 0.5),
        z, z, z, z,
    )
    _compare(args, 1 << 12)


@pytest.mark.quick
def test_fused_expand_one_giant_span():
    """One visible point whose span covers many kernel blocks (the window
    base stays pinned to the same span for every block it covers)."""
    p = 10
    counts = np.zeros(p, np.int32)
    counts[4] = 1000  # ~8 blocks from one span
    args = (
        jnp.asarray(np.full(p, 2.0, np.float32)),
        jnp.asarray(np.full(p, 25, np.int32)),
        jnp.asarray(np.full(p, 5, np.int32)),
        jnp.asarray(np.full(p, 3, np.int32)),
        jnp.asarray(counts),
    )
    _compare(args, 1 << 11)
