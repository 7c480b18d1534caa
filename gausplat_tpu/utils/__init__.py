"""Utilities: native extension loader, profiling helpers."""

from . import native

__all__ = ["native"]
