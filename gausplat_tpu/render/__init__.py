"""Rendering: camera views, render options/outputs, the compiled pipeline."""

from .pipeline import render, render_views, RenderOptions, RenderOutput
from .view import View, Views

__all__ = ["RenderOptions", "RenderOutput", "View", "Views", "render", "render_views"]
