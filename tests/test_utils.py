"""Utility tests: profiling helpers and the native-codec loader surface."""

import logging

import jax.numpy as jnp

from gausplat_tpu.utils import native
from gausplat_tpu.utils.profiling import (
    log_stage,
    logger_forward,
    stage,
    wall_timer,
)

import pytest

pytestmark = pytest.mark.quick


def test_stage_scope_composes_with_tracing():
    with stage("gausplat.test"):
        x = jnp.ones((4,)) * 2
    assert float(x.sum()) == 8.0


def test_wall_timer_records():
    results = {}
    with wall_timer("unit", results):
        pass
    assert "unit" in results and results["unit"] >= 0


def test_log_stage_no_crash():
    log_stage(logger_forward, "forward stage message")


def test_native_loader_surface():
    assert isinstance(native.available(), bool)
    if not native.available():
        assert native.decode_payload(b"", 0) is None
        assert native.encode_payload(None, None, None, None, None) is None
