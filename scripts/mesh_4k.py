"""BASELINE config 5, executed for real: a 4K (3840x2176) tile-sharded
render at multi-million Gaussians on the 8-way virtual mesh, with a
slab-vs-single-device parity spot check.

Round-4 VERDICT missing #2: the 4K case had only ever existed as a gated
smoke test at 400 points; no committed artifact showed 4K at multi-million
Gaussians on any mesh. Single-chip 4K is blocked by the remote-compile
endpoint's HTTP 413 program-size limit (NOTES.md), so the virtual 8-way
mesh — whose per-shard grids are 1/8 the size, exactly the sharding that
fixes the real-chip limit too — is where this must run.

Writes MESH4K_r05.json: shapes, point/entry counts, per-slab watermark vs
capacity (no-truncation proof), wall times, and the parity result of the
first tile-row slab against the single-device renderer.

Usage (from the repo root; ~1 h on the 1-core CPU host):
    python scripts/mesh_4k.py
Env: MESH4K_POINTS (default 2_000_000), MESH4K_CAPACITY (default 2^23).
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_DEV = 8
W, H = 3840, 2176  # 240 x 136 tiles = 32,640 (within the 2^16 tile ceiling)
P = int(os.environ.get("MESH4K_POINTS", 2_000_000))
CAP = int(os.environ.get("MESH4K_CAPACITY", 1 << 23))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
cache = REPO / ".jax_cache"
cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render  # noqa: E402
from gausplat_tpu.parallel import make_mesh, render_tile_sharded  # noqa: E402

T0 = time.time()


def log(msg):
    print(f"[mesh_4k +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    log(f"devices: {len(jax.devices())}  P={P} cap={CAP} ({W}x{H})")
    rng = np.random.default_rng(7)
    pts = Points(
        rng.random((P, 3)).astype(np.float32),
        (rng.standard_normal((P, 3)) * np.array([2.2, 1.3, 1.0])).astype(
            np.float32
        ),
    )
    scene = GaussianScene.from_points(pts)
    scene = scene.set_scalings(
        jnp.asarray(0.004 + 0.008 * rng.random((P, 3)), jnp.float32)
    )
    scene = scene.set_opacities(
        jnp.asarray(0.2 + 0.7 * rng.random((P, 1)), jnp.float32)
    )
    view = View(
        field_of_view_x=1.2,
        field_of_view_y=0.75,
        image_height=H,
        image_width=W,
        view_position=[0.0, 0.0, -5.0],
        view_transform=View.transform(np.eye(3), [0.0, 0.0, 5.0]),
    )
    mesh = make_mesh((N_DEV,), ("tiles",))
    opts = RenderOptions(backend="xla", tile_entry_capacity=CAP, block_size=128)

    log("sharded render: compiling + running")
    t0 = time.time()
    out = render_tile_sharded(scene, view, mesh, "tiles", opts)
    img = np.asarray(out.colors_rgb_2d)
    t_sharded = time.time() - t0
    per_slab_cap = CAP // N_DEV
    slab_watermark = int(out.tile_point_total)  # per-slab maximum
    visible = int((np.asarray(out.radii) > 0).sum())
    log(
        f"sharded done in {t_sharded:.0f}s: visible={visible} "
        f"slab watermark={slab_watermark}/{per_slab_cap}"
    )
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.01
    assert visible > P // 4, f"only {visible} visible of {P}"
    assert slab_watermark < per_slab_cap, (
        f"slab truncation: watermark {slab_watermark} >= per-slab capacity "
        f"{per_slab_cap} — parity below would be void"
    )

    log("single-device reference render (same scene, same options)")
    t0 = time.time()
    single = render(scene, view, opts)
    simg = np.asarray(single.colors_rgb_2d)
    t_single = time.time() - t0
    total_entries = int(single.tile_point_total)
    log(f"single done in {t_single:.0f}s: total entries={total_entries}")
    assert total_entries < CAP, "single-device truncation voids the parity"

    # Slab-parity spot check over the first shard's tile-row band. Mismatch
    # source (tests/test_4k_sharded.py::test_fullhd_tile_sharded_always_on):
    # the sharded and single programs are separate XLA compilations whose
    # fusion/FMA choices differ in the last ulp, flipping entries whose
    # alpha sits within an ulp of the 1/255 blend threshold. The INCIDENCE
    # scales with per-pixel blend count — this run blends ~350 entries/tile
    # (11.7M entries) vs the FullHD test's handful, so the pixel-count
    # tolerance is 10x the small test's 5e-5 (measured 1.49e-4 at 2M
    # points). The MAGNITUDE guard is the real parity check: every
    # mismatched pixel must be off by at most a couple of sub-1/255 blend
    # contributions (measured max 2.0e-3 — half an 8-bit level).
    band = slice(0, H // N_DEV)
    diff = np.abs(img[band] - simg[band])
    pix_bad = diff.max(axis=-1) > 1e-5
    bad_frac = float(pix_bad.mean())
    max_diff = float(diff.max())
    mean_bad = float(diff.max(axis=-1)[pix_bad].mean()) if pix_bad.any() else 0.0
    log(
        f"slab-0 parity: bad pixel frac={bad_frac:.2e} max diff="
        f"{max_diff:.3e} mean bad-pixel diff={mean_bad:.3e}"
    )
    assert bad_frac < 5e-4, f"{int(pix_bad.sum())} mismatched pixels"
    assert max_diff < 1e-2, "mismatch above the sub-quantization band"
    assert mean_bad < 2.0 / 255.0
    # And a coarse whole-frame agreement check (all 8 slabs assembled).
    full_bad = float((np.abs(img - simg).max(axis=-1) > 1e-5).mean())
    assert full_bad < 5e-4, f"whole-frame bad pixel frac {full_bad}"

    rec = {
        "image": [W, H],
        "tiles": [W // 16, H // 16],
        "points": P,
        "visible_points": visible,
        "total_entries": total_entries,
        "capacity": CAP,
        "per_slab_capacity": per_slab_cap,
        "per_slab_watermark_max": slab_watermark,
        "mesh": {"tiles": N_DEV},
        "sharded_wall_s": round(t_sharded, 1),
        "single_wall_s": round(t_single, 1),
        "slab0_bad_pixel_frac": bad_frac,
        "whole_frame_bad_pixel_frac": full_bad,
        "max_abs_diff": max_diff,
        "mean_bad_pixel_diff": mean_bad,
        "parity": "ok",
        "platform": "cpu-virtual-mesh",
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    (REPO / "MESH4K_r05.json").write_text(json.dumps(rec, indent=1) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
