"""Tracing / profiling helpers.

The reference's only observability is a hierarchy of debug log targets
(``gausplat::renderer::gaussian_3d::{scene,forward,backward}`` —
jit/mod.rs:37-38 etc.). TPU-native equivalents:

- :func:`stage`: named scopes that show up in XLA/xprof traces;
- :func:`trace`: wrap a block in a JAX profiler trace, dumping to a
  directory viewable with TensorBoard/xprof;
- :data:`logger` hierarchy matching the reference's targets;
- :func:`log_stage`: debug logging gated on the ``GAUSPLAT_DEBUG`` env var.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

import jax

logger = logging.getLogger("gausplat.renderer.gaussian_3d")
logger_scene = logger.getChild("scene")
logger_forward = logger.getChild("forward")
logger_backward = logger.getChild("backward")

_DEBUG = bool(os.environ.get("GAUSPLAT_DEBUG"))


def stage(name: str):
    """Named scope for a pipeline stage (visible in xprof traces)."""
    return jax.named_scope(name)


def log_stage(which: logging.Logger, message: str) -> None:
    if _DEBUG:
        which.debug(message)


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block with the JAX profiler (view with xprof/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer(label: str, results: dict | None = None):
    """Host wall-clock timer (remember: dispatch is async; block first)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    log_stage(logger, f"{label}: {dt * 1000:.2f} ms")
