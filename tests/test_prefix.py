"""Tiled prefix-scan tests (the reference's hierarchical scan analogue),
including non-power-of-two sizes as in scan/add/mod.rs:104-189."""

import numpy as np
import jax.numpy as jnp

from gausplat_tpu.ops.prefix import prefix_max, prefix_sum
import pytest

pytestmark = pytest.mark.quick


def test_prefix_sum_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (1, 2, 9, 511, 512, 513, 4095, (1 << 16) - 1, 300_001):
        x = rng.integers(-50, 90, n).astype(np.int32)
        np.testing.assert_array_equal(
            np.asarray(prefix_sum(jnp.asarray(x))), np.cumsum(x)
        )
    xf = rng.standard_normal(100_003).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(prefix_sum(jnp.asarray(xf))),
        np.cumsum(xf, dtype=np.float64),
        rtol=1e-4, atol=1e-2,
    )


def test_prefix_max_matches_numpy():
    rng = np.random.default_rng(1)
    for n in (1, 7, 512, 1000, (1 << 14) + 3):
        x = rng.integers(-1000, 1000, n).astype(np.int32)
        np.testing.assert_array_equal(
            np.asarray(prefix_max(jnp.asarray(x))), np.maximum.accumulate(x)
        )
        xf = rng.standard_normal(n).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(prefix_max(jnp.asarray(xf))), np.maximum.accumulate(xf)
        )
