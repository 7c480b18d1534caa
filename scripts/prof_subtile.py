"""Sub-tile pair accounting: would 16x8 (half-height) tiles cut the blend?

The blend kernels are pair-count-bound (PERF.md roofline). Each entry is
evaluated against every pixel of its tile, so shrinking the tile from
16x16 to 16x8 halves pairs-per-entry while the entry count grows only by
the AABB perimeter effect — and N = 128 pixels still fills the full VPU
lane width. This script measures the tradeoff ANALYTICALLY (pair counts
are platform-independent) for tile heights 16 / 8 / 4 at a bench-style
workload:

- per-tile covered counts via a 2-D difference array over the touched-tile
  AABBs (reference semantics: projection radius box intersected with the
  tight-culling blendable-ellipse box, re-derived from the projection's
  conic/opacity outputs);
- ``entries``, ``true_pairs`` = entries x tile pixels;
- ``window_pairs``: segment-window grid steps x B x pixels (the sorted
  layout reproduced from the per-tile counts: r0 = exclusive cumsum in
  tile-id order, windows = aligned B-blocks overlapping [r0, r1));
- ``group_pairs``: with GROUP-entry skip granularity (the
  GAUSPLAT_GROUP_SKIP kernel), ignoring early exit (upper bound for all
  tile heights equally).

Sort-key feasibility: tile id must fit 16 bits (binning.depth_to_order);
at 4K, 240 x ceil(2160/8) = 64,800 < 65,536 — half-height tiles fit.

Env knobs: SUB_POINTS, SUB_WIDTH, SUB_HEIGHT, SUB_SCALE, SUB_BLOCK,
SUB_GROUP, SUB_CPU=1 to force the cpu platform.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _make_inputs, _setup_jax
from gausplat_tpu.constants import FACTOR_RADIUS  # noqa: F401 (parity note)
from gausplat_tpu.ops.projection import project_gaussians


def _aabbs(proj, opacities, width, height, tile_w, tile_h):
    """Touched-tile AABBs at (tile_w, tile_h) granularity, reproducing
    ops/projection.py:tile_bounds + the tight-culling intersection."""
    vis = np.asarray(proj.radii) > 0
    px = np.asarray(proj.pos2d_x, np.float64)
    py = np.asarray(proj.pos2d_y, np.float64)
    r = np.asarray(proj.radii, np.float64)
    cxx = np.asarray(proj.conic_xx, np.float64)
    cxy = np.asarray(proj.conic_xy, np.float64)
    cyy = np.asarray(proj.conic_yy, np.float64)
    tcx = -(-width // tile_w)
    tcy = -(-height // tile_h)

    # Reference box (trunc-toward-zero + clamp, projection.py:421-430).
    x_max = np.clip(((px + r + (tile_w - 1.0)) / tile_w).astype(np.int64), 0, tcx)
    x_min = np.clip(((px - r) / tile_w).astype(np.int64), 0, tcx)
    y_max = np.clip(((py + r + (tile_h - 1.0)) / tile_h).astype(np.int64), 0, tcy)
    y_min = np.clip(((py - r) / tile_h).astype(np.int64), 0, tcy)

    # Tight-culling ellipse box (projection.py:436-471), cov re-derived
    # from the conic (conic = cov^-1).
    op = 1.0 / (1.0 + np.exp(-np.asarray(opacities, np.float64)[:, 0]))
    ll2 = 2.0 * np.log(np.maximum(op, 1e-12) * 255.0)
    alive = ll2 > 0.0
    ll2 = np.maximum(ll2, 0.0)
    det_conic = cxx * cyy - cxy * cxy
    safe = np.where(det_conic != 0.0, det_conic, 1.0)
    cov_xx = np.where(det_conic != 0.0, cyy / safe, 0.0)
    cov_yy = np.where(det_conic != 0.0, cxx / safe, 0.0)
    margin = 0.01
    ex = np.sqrt(ll2 * np.maximum(cov_xx, 0.0)) + margin
    ey = np.sqrt(ll2 * np.maximum(cov_yy, 0.0)) + margin
    x_min = np.maximum(x_min, np.clip(np.floor((px - ex) / tile_w).astype(np.int64), 0, tcx))
    x_max = np.minimum(x_max, np.clip(np.floor((px + ex) / tile_w).astype(np.int64) + 1, 0, tcx))
    y_min = np.maximum(y_min, np.clip(np.floor((py - ey) / tile_h).astype(np.int64), 0, tcy))
    y_max = np.minimum(y_max, np.clip(np.floor((py + ey) / tile_h).astype(np.int64) + 1, 0, tcy))

    keep = vis & alive & (x_max > x_min) & (y_max > y_min)
    return (
        x_min[keep], x_max[keep], y_min[keep], y_max[keep], tcx, tcy
    )


def _tile_counts(x_min, x_max, y_min, y_max, tcx, tcy):
    """Per-tile covered counts via a 2-D difference array (O(P) scatter)."""
    diff = np.zeros((tcy + 1, tcx + 1), np.int64)
    np.add.at(diff, (y_min, x_min), 1)
    np.add.at(diff, (y_min, x_max), -1)
    np.add.at(diff, (y_max, x_min), -1)
    np.add.at(diff, (y_max, x_max), 1)
    return diff.cumsum(0).cumsum(1)[:tcy, :tcx].ravel()


def _window_stats(counts, block, group):
    """Grid steps / executed groups for segments laid out consecutively
    in tile-id order (build_entry_stream semantics)."""
    r1 = counts.cumsum()
    r0 = r1 - counts
    ne = counts > 0
    first_blk = r0[ne] // block
    last_blk = (r1[ne] - 1) // block
    steps = int((last_blk - first_blk + 1).sum())
    # Per-window valid-lane range -> touched GROUP-sized groups. Vectorize
    # over tiles: a tile's k windows have full [0, B) coverage except the
    # first (lo = r0 mod B) and last (hi = r1 - last_blk*B).
    lo = r0[ne] % block
    hi = r1[ne] - last_blk * block
    one_win = first_blk == last_blk
    g = group
    # groups in a [lo, hi) window = (hi-1)//g - lo//g + 1
    g_single = (np.minimum(hi, block) - 1) // g - lo // g + 1
    g_first = (block - 1) // g - lo // g + 1
    g_last = (hi - 1) // g + 1
    g_mid = (last_blk - first_blk - 1).clip(0) * (block // g)
    groups = int(
        np.where(one_win, g_single, g_first + g_last).sum() + g_mid.sum()
    )
    return steps, groups


def main():
    _setup_jax()
    if os.environ.get("SUB_CPU"):
        jax.config.update("jax_platforms", "cpu")
    points = int(os.environ.get("SUB_POINTS", 100_000))
    width = int(os.environ.get("SUB_WIDTH", 800))
    height = int(os.environ.get("SUB_HEIGHT", 800))
    scale = float(os.environ.get("SUB_SCALE", 1.0))
    block = int(os.environ.get("SUB_BLOCK", 128))
    group = int(os.environ.get("SUB_GROUP", 32))

    scene, camera = _make_inputs(points, width, height, scale)
    tcx = -(-width // 16)
    tcy = -(-height // 16)
    proj = jax.jit(
        lambda c, o, p, r, s: project_gaussians(
            c, p, r, s, camera, sh_degree=3,
            tile_count_x=tcx, tile_count_y=tcy, opacities=o,
            tight_culling=False,  # bounds re-derived per tile height below
        )
    )(scene.colors_sh, scene.opacities, scene.positions, scene.rotations,
      scene.scalings)

    out = {
        "workload": {
            "points": points, "width": width, "height": height,
            "scale": scale, "block": block, "group": group,
        }
    }
    base = None
    for tile_h in (16, 8, 4):
        bb = _aabbs(proj, scene.opacities, width, height, 16, tile_h)
        counts = _tile_counts(*bb)
        entries = int(counts.sum())
        pixels = 16 * tile_h
        steps, groups = _window_stats(counts, block, group)
        rec = {
            "tiles": int(counts.size),
            "nonempty_tiles": int((counts > 0).sum()),
            "entries": entries,
            "true_pairs": entries * pixels,
            "window_pairs": steps * block * pixels,
            "group_pairs": groups * group * pixels,
            "mean_segment": round(entries / max((counts > 0).sum(), 1), 1),
        }
        if tile_h == 16:
            base = rec
        rec["group_pairs_vs_16"] = round(
            rec["group_pairs"] / max(base["group_pairs"], 1), 3
        )
        rec["entries_vs_16"] = round(
            rec["entries"] / max(base["entries"], 1), 3
        )
        out[f"tile_h{tile_h}"] = rec
        print(f"# tile_h={tile_h}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
