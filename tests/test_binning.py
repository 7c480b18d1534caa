"""Binning tests: depth key monotonicity, gather expansion, tile ranges.

Differential-tested against a naive Python expansion, mirroring the
reference's scan/sort tests (scan/add/mod.rs:104-189, sort/radix/mod.rs:
163-303) including non-power-of-two sizes.
"""

import numpy as np
import jax.numpy as jnp

from gausplat_tpu.constants import DEPTH_MAX, DEPTH_MIN
from gausplat_tpu.ops.binning import (
    bin_gaussians,
    depth_to_order,
    make_point_orders,
    sort_entries,
    tile_ranges_from_keys,
)

import pytest

pytestmark = pytest.mark.quick


def test_depth_order_monotone_16bit():
    rng = np.random.default_rng(0)
    depths = np.sort(
        np.exp(
            rng.uniform(np.log(DEPTH_MIN), np.log(DEPTH_MAX * 0.999), 4093)
        ).astype(np.float32)
    )
    orders = np.asarray(depth_to_order(jnp.asarray(depths)))
    assert orders.min() >= 0 and orders.max() < (1 << 16)
    assert np.all(np.diff(orders.astype(np.int64)) >= 0)
    # Window edges.
    edge = np.asarray(
        depth_to_order(jnp.asarray([DEPTH_MIN, np.nextafter(
            np.float32(DEPTH_MAX), np.float32(0)
        )], jnp.float32))
    )
    assert edge[0] == 0
    assert edge[1] == (1 << 16) - 1


def _naive_expand(depths, bounds, counts, tile_count_x):
    keys, idx = [], []
    for p in range(len(depths)):
        if counts[p] == 0:
            continue
        x_max, x_min, y_max, y_min = bounds[p]
        for ty in range(y_min, y_max):
            for tx in range(x_min, x_max):
                tile = ty * tile_count_x + tx
                d = np.asarray(
                    depth_to_order(jnp.asarray([depths[p]], jnp.float32))
                )[0]
                keys.append((tile << 16) | int(d))
                idx.append(p)
    return np.array(keys, np.uint64), np.array(idx, np.int64)


def test_expansion_matches_naive():
    rng = np.random.default_rng(1)
    p, tcx, tcy = 37, 5, 4
    depths = rng.uniform(0.3, 10.0, p).astype(np.float32)
    x_min = rng.integers(0, tcx, p)
    x_max = x_min + rng.integers(0, 3, p)
    y_min = rng.integers(0, tcy, p)
    y_max = y_min + rng.integers(0, 3, p)
    x_max, y_max = np.minimum(x_max, tcx), np.minimum(y_max, tcy)
    counts = ((x_max - x_min) * (y_max - y_min)).astype(np.int32)
    # Some fully-culled points.
    culled = rng.random(p) < 0.3
    counts[culled] = 0
    bounds = np.stack([x_max, x_min, y_max, y_min], -1).astype(np.int32)

    capacity = 257  # deliberately not a power of two
    keys, src, offsets_inc, total = make_point_orders(
        jnp.asarray(depths),
        jnp.asarray(bounds[:, 0]),
        jnp.asarray(bounds[:, 1]),
        jnp.asarray(bounds[:, 3]),
        jnp.asarray(counts),
        tile_count_x=tcx,
        capacity=capacity,
    )
    nkeys, nidx = _naive_expand(depths, bounds, counts, tcx)
    t = int(total)
    assert t == len(nkeys) and t <= capacity
    np.testing.assert_array_equal(np.asarray(keys[:t]).astype(np.uint64), nkeys)
    np.testing.assert_array_equal(np.asarray(src[:t]), nidx)
    assert np.all(np.asarray(keys[t:]) == 0xFFFFFFFF)
    np.testing.assert_array_equal(np.asarray(offsets_inc), np.cumsum(counts))


def test_sort_stable_and_ranges():
    rng = np.random.default_rng(2)
    n = (1 << 10) - 1  # non-power-of-two
    keys = rng.integers(0, 1 << 20, n, dtype=np.uint32).astype(np.uint32)
    vals = np.arange(n, dtype=np.int32)
    sk, sv = sort_entries(jnp.asarray(keys), jnp.asarray(vals))
    sk, sv = np.asarray(sk), np.asarray(sv)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(sk, keys[order])
    np.testing.assert_array_equal(sv, vals[order])  # stability

    num_tiles = 20
    tiles = rng.integers(0, num_tiles, n, dtype=np.uint32)
    keys2 = (tiles.astype(np.uint32) << np.uint32(16)) | np.uint32(7)
    sk2, _ = sort_entries(jnp.asarray(keys2), jnp.asarray(vals))
    ranges = np.asarray(
        tile_ranges_from_keys(sk2, jnp.int32(n), num_tiles=num_tiles)
    )
    counts = np.bincount(tiles, minlength=num_tiles)
    ends = np.cumsum(counts)
    np.testing.assert_array_equal(ranges[:, 1], ends)
    np.testing.assert_array_equal(ranges[:, 0], ends - counts)


def test_bin_gaussians_overflow_detection():
    depths = jnp.asarray(np.full(16, 1.0, np.float32))
    full4 = jnp.asarray(np.full(16, 4, np.int32))
    zero = jnp.asarray(np.zeros(16, np.int32))
    counts = jnp.asarray(np.full(16, 16, np.int32))
    out = bin_gaussians(
        depths, full4, zero, zero, counts,
        tile_count_x=4, tile_count_y=4, capacity=64,
    )
    assert int(out.total) == 256  # true total reported even past capacity
    assert out.point_indices.shape == (64,)


def test_pid_sort_restores_point_grouped_order():
    """Stable-sorting the sorted stream by its point ids must reproduce
    the pre-sort expansion layout: point p's entries at
    [offsets[p-1], offsets[p]) in tile-ascending order — the layout the
    backward's per-point gradient reduction assumes (pipeline._render_bwd
    sorts the gradient rows by BinningOutput.point_indices)."""
    rng = np.random.default_rng(3)
    p = 40
    depths = jnp.asarray(rng.uniform(0.5, 8.0, p).astype(np.float32))
    x_min = rng.integers(0, 3, p).astype(np.int32)
    widths = rng.integers(0, 4, p).astype(np.int32)  # some zero-count points
    y_min = rng.integers(0, 3, p).astype(np.int32)
    heights = rng.integers(0, 3, p).astype(np.int32)
    counts = widths * heights
    out = bin_gaussians(
        depths,
        jnp.asarray(x_min + widths),
        jnp.asarray(x_min),
        jnp.asarray(y_min),
        jnp.asarray(counts),
        tile_count_x=6, tile_count_y=5, capacity=256,
    )
    total = int(out.total)
    assert 0 < total <= 256
    pids = np.asarray(out.point_indices)
    order = np.argsort(pids, kind="stable")
    regrouped = pids[order]
    expected = np.repeat(np.arange(p, dtype=np.int32), counts)
    np.testing.assert_array_equal(regrouped[:total], expected)
    # Pads (point id P) stay in the tail.
    assert (regrouped[total:] == p).all()
    # Stability: within each point's span the entries keep their
    # (tile, depth)-sorted stream order, i.e. tiles strictly ascending
    # (a point touches each tile at most once).
    tile_of_slot = np.full(256, -1, np.int32)
    for t, (s, e) in enumerate(np.asarray(out.tile_ranges)):
        tile_of_slot[s:e] = t
    tiles_regrouped = tile_of_slot[order]
    offs = np.cumsum(counts)
    for pt in range(p):
        seg = tiles_regrouped[offs[pt] - counts[pt] : offs[pt]]
        assert (np.diff(seg) > 0).all(), pt
    # Span ends line up with the inclusive count cumsum.
    np.testing.assert_array_equal(
        np.asarray(out.point_offsets), np.cumsum(counts).astype(np.int32)
    )
