"""Headline benchmark: fwd+bwd ms/frame at 1080p with 1M Gaussians.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the 10 ms/frame target from BASELINE.json (the reference itself
publishes no numbers — BASELINE.md). vs_baseline = baseline_ms / value
(higher is better; 1.0 means hitting the 10 ms target).

Tiers (all reported in the one JSON line, budget permitting):
- primary ("value"): 1080p / 1M Gaussians, garden-light expansion, f32
  entries (reference-parity precision).
- "ms_bf16": same workload with packed bf16-pair entry rows (the
  mixed-precision performance config; positions/accumulation stay f32).
- "ms_forward": pure rendering, no backward (the reference's primary
  inference use case; the grad machinery is DCE'd from the chain).
- "ms_heavy": BENCH_SCALE=3.5 (~7-8 entries per visible point — the
  honest garden-class expansion per E[T/P] guidance, SURVEY §6).

Robustness (round-2 driver run timed out with no output — never again):
- the persistent XLA compilation cache is enabled HERE, not only in
  tests/conftest.py, so a driver `timeout 600 python bench.py` from a
  clean shell hits warm executables;
- progress lines go to stderr (stdout carries only the JSON line);
- each chain compiles ONCE with a *dynamic* iteration count (lax.fori_loop
  over a traced bound), instead of separate n=1 / n=N programs;
- secondary tiers run only while inside the time budget (BENCH_BUDGET_S,
  default 480 s), and SIGTERM/SIGINT mid-tier still prints whatever
  tiers finished.

Knobs (env): BENCH_POINTS, BENCH_WIDTH, BENCH_HEIGHT, BENCH_CAPACITY,
BENCH_BLOCK, BENCH_ITERS, BENCH_ENTRY_DTYPE (f32 | bf16), BENCH_SCALE,
BENCH_BUDGET_S, BENCH_TIERS (comma list among: primary,bf16,heavy).

Timing is amortized inside a single compiled chain (the hosted TPU tunnel
adds tens of ms of RPC latency per dispatch, which would otherwise
dominate), perturbing POSITIONS per step so no pipeline stage can be
hoisted out of the chain.

Tunnel-down fallback: when the hosted TPU tunnel is unreachable
(jax.devices() hangs forever — it did for the back half of round 3), a
subprocess probe with a hard timeout detects it and the script emits the
most recent successful on-chip result from BENCH_LAST_TPU.json, explicitly
flagged ``"stale": true`` with the measurement date and reason — a
transparent, parseable record instead of the round-2 rc=124/no-output
failure. Every successful TPU run refreshes the snapshot.
"""

import json
import os
import pathlib
import signal
import subprocess
import sys
import time

import numpy as np

BASELINE_MS = 10.0
T_START = time.time()
RESULT = {}
REPO = pathlib.Path(__file__).resolve().parent
LAST_TPU_SNAPSHOT = REPO / "BENCH_LAST_TPU.json"


def _progress(msg):
    print(f"[bench +{time.time() - T_START:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit_and_exit(signum=None, frame=None):
    """Print whatever we have (SIGTERM safety net) and exit."""
    if RESULT.get("value") is not None:
        print(json.dumps(RESULT), flush=True)
        sys.exit(0)
    sys.exit(1)


def _probe_platform(timeout_s=150):
    """Resolve the default JAX platform in a SUBPROCESS with a hard timeout.

    jax.devices() blocks forever while the hosted TPU tunnel is down, so the
    hang-prone call must live in a killable child. Returns the platform name
    ('tpu', 'cpu', ...) or None if the probe timed out / crashed.
    """
    code = "import jax; print(jax.devices()[0].platform, flush=True)"
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    lines = [l.strip() for l in out.stdout.splitlines() if l.strip()]
    return lines[-1] if out.returncode == 0 and lines else None


def _emit_stale_snapshot(reason):
    """Tunnel down: emit the last successful on-chip result, flagged stale."""
    if not LAST_TPU_SNAPSHOT.exists():
        _progress(f"no {LAST_TPU_SNAPSHOT.name}; nothing to emit ({reason})")
        sys.exit(1)
    snap = json.loads(LAST_TPU_SNAPSHOT.read_text())
    snap["stale"] = True
    snap["stale_reason"] = reason
    print(json.dumps(snap), flush=True)
    sys.exit(0)


def _setup_jax():
    # Persistent compilation cache: without it, the 1080p/1M Pallas chain
    # recompiles from scratch through the TPU tunnel on a 1-core host —
    # tens of minutes, which is exactly what timed out the round-2 driver
    # run (VERDICT.md Missing #1). Mirrors tests/conftest.py:24-31.
    cache_dir = pathlib.Path(__file__).resolve().parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _make_inputs(point_count, width, height, scale_mult=1.0):
    import jax.numpy as jnp
    from gausplat_tpu import GaussianScene, View
    from gausplat_tpu.ops.projection import Camera

    rng = np.random.default_rng(0)
    # A synthetic but representative scene: points in a ball around the
    # camera target, scale distribution tuned to a garden-like tile-point
    # expansion (~2.4 entries/visible at scale 1, ~7.8 at scale 3.5).
    positions = (rng.standard_normal((point_count, 3)) * 2.2).astype(np.float32)
    scene = GaussianScene(
        colors_sh=jnp.asarray(
            rng.standard_normal((point_count, 48)).astype(np.float32) * 0.2
        ),
        opacities=jnp.asarray(
            rng.standard_normal((point_count, 1)).astype(np.float32)
        ),
        positions=jnp.asarray(positions),
        rotations=jnp.asarray(
            rng.standard_normal((point_count, 4)).astype(np.float32)
        ),
        scalings=jnp.asarray(
            np.log(
                scale_mult * (0.002 + 0.008 * rng.random((point_count, 3)))
            ).astype(np.float32)
        ),
    )
    view = View(
        field_of_view_x=1.2,
        field_of_view_y=0.8,
        image_height=height,
        image_width=width,
        view_position=[0.0, 0.0, -8.0],
        view_transform=View.transform(np.eye(3), [0.0, 0.0, 8.0]),
    )
    return scene, Camera.from_view(view)


def _calibrated_capacity(point_count, width, height, scale_mult, block_size,
                         margin=1.0625):
    """Right-size the entry capacity for a tier by counting its true
    (tile, point) entry total — the serving recipe
    (gausplat_tpu.calibrate_options). The reference sizes its buffers to
    the EXACT per-frame total via a host readback every frame
    (rank/mod.rs:61-63); a calibrated static capacity with a 6.25% margin
    is strictly more conservative while keeping the pipeline sync-free.
    Every entry-proportional stage pays for capacity, not entries, so the
    old fixed 2.36M capacity (74% occupancy at the light tier, 62% heavy)
    was pure slack — see PERF.md round-5.
    """
    import jax
    import jax.numpy as jnp
    from gausplat_tpu.ops.projection import project_gaussians

    scene, camera = _make_inputs(point_count, width, height, scale_mult)
    tcx, tcy = -(-width // 16), -(-height // 16)

    @jax.jit
    def count(csh, op, pos, rot, scal):
        proj = project_gaussians(
            csh, pos, rot, scal, camera, sh_degree=3,
            tile_count_x=tcx, tile_count_y=tcy,
            opacities=op, tight_culling=True,
        )
        return proj.tile_counts.astype(jnp.int32).sum()

    total = int(
        count(scene.colors_sh, scene.opacities, scene.positions,
              scene.rotations, scene.scalings)
    )
    cap = int(total * margin)
    cap = (cap + block_size - 1) // block_size * block_size
    _progress(
        f"calibrated capacity: {total} entries -> cap {cap} "
        f"({total / cap:.1%} occupancy)"
    )
    return cap


def _resolve_capacity(env_key, default_fixed, point_count, width, height,
                      scale_mult, block_size):
    raw = os.environ.get(env_key, "calibrated")
    if raw != "calibrated":
        return int(raw)
    try:
        return _calibrated_capacity(
            point_count, width, height, scale_mult, block_size
        )
    except Exception as e:  # calibration must never kill the bench
        _progress(f"capacity calibration failed ({e!r}); fixed {default_fixed}")
        return default_fixed


def _measure_tier(
    jax, point_count, width, height, scale_mult, capacity, block_size,
    entry_dtype, iters, forward_only=False,
):
    """Compile one dynamic-count chain and return (ms, stats dict)."""
    import jax.numpy as jnp
    from gausplat_tpu import RenderOptions
    from gausplat_tpu.render.pipeline import _build_render_fn, _resolve_backend

    scene, camera = _make_inputs(point_count, width, height, scale_mult)
    options = RenderOptions(
        tile_entry_capacity=capacity, entry_dtype=entry_dtype
    )
    fn = _build_render_fn(
        width, height, point_count, 3, capacity, block_size,
        _resolve_backend(options.backend), False, entry_dtype == "bf16",
    )
    ref = jnp.zeros((point_count,), jnp.float32)

    def loss(csh, op, pos, rot, scal):
        out = fn(csh, op, pos, rot, scal, ref, camera)
        return jnp.mean(out.colors_rgb_2d**2), (
            out.tile_point_total,
            jnp.sum((out.radii > 0).astype(jnp.int32)),
        )

    if forward_only:
        # Pure rendering (inference) cost: no custom-VJP backward, so the
        # grad reduce and per-entry gradient rows are DCE'd from the chain.
        def grad_fn(csh, op, pos, rot, scal):
            v, aux = loss(csh, op, pos, rot, scal)
            return (v, aux), (csh[:1, :1],) * 5
    else:
        grad_fn = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )

    # Perturb POSITIONS per step: every pipeline stage depends on them,
    # so XLA cannot hoist any stage out of the chain (perturbing a
    # color-only input lets the binning/sort subgraphs be computed once
    # and reused, understating the per-frame cost ~5x).
    def step(pos, i):
        (v, aux), g = grad_fn(
            scene.colors_sh, scene.opacities,
            pos + i.astype(jnp.float32) * jnp.float32(1e-6),
            scene.rotations, scene.scalings,
        )
        return v + g[0].ravel()[0], aux

    @jax.jit
    def go(pos, n):
        # Dynamic trip count: ONE compiled executable serves both the
        # 1-step and the n-step run (fori_loop with a traced bound lowers
        # to while_loop; the body compiles once).
        acc0, (total, visible) = step(pos, jnp.int32(0))
        acc = jax.lax.fori_loop(
            1, n, lambda i, a: a + step(pos, jnp.int32(i))[0], acc0
        )
        return acc, total, visible

    _progress(f"compiling chain (cap={capacity}, block={block_size}, {entry_dtype})")
    acc, total, visible = go(scene.positions, jnp.int32(1))
    total, visible = int(total), int(visible)
    _progress(f"compiled; entries={total} visible={visible}; warming n={iters}")
    if total > capacity:
        raise RuntimeError(
            f"entry overflow: {total} entries > capacity {capacity} — the "
            "tier would silently truncate and its ms/frame would be a lie"
        )
    float(go(scene.positions, jnp.int32(iters))[0])
    # Amortized timing: (n-run - 1-run) / (n - 1) removes dispatch latency.
    t0 = time.time()
    float(go(scene.positions, jnp.int32(iters))[0])
    tm = time.time() - t0
    t0 = time.time()
    float(go(scene.positions, jnp.int32(1))[0])
    t1 = time.time() - t0
    ms = (tm - t1) / (iters - 1) * 1000.0
    _progress(f"tier done: {ms:.1f} ms/frame")
    return ms, {
        "entries": total,
        "visible": visible,
        "entries_per_visible": round(total / max(visible, 1), 2),
    }


def main():
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)
    # Default budget sized for the measured tunnel reality: each tier's
    # chain build costs ~420-455 s even with a warm .jax_cache (the axon
    # remote-compile endpoint does not honor the local persistent cache).
    # A driver that hard-kills earlier still gets a full JSON line: the
    # SIGTERM handler emits the fresh tiers measured so far plus the
    # `*_cached` snapshot values for the rest.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1500))

    # Probe the device in a killable subprocess FIRST: jax.devices() blocks
    # forever while the hosted TPU tunnel is down (it did for hours in
    # round 3), which is what turned the round-2 driver run into rc=124
    # with no output. If the platform is unreachable or not a TPU, emit the
    # last on-chip result flagged stale instead of hanging.
    platform = None
    if not int(os.environ.get("BENCH_SKIP_PROBE", "0")):
        _progress("probing device platform (150 s limit)")
        platform = _probe_platform()
        _progress(f"probe: platform={platform}")
        if platform != "tpu" and not int(os.environ.get("BENCH_ALLOW_CPU", "0")):
            reason = (
                "TPU tunnel unreachable at bench time (device probe timed out)"
                if platform is None
                else f"no TPU available at bench time (platform={platform})"
            )
            _emit_stale_snapshot(reason)

    _progress("importing jax")
    jax = _setup_jax()
    if platform != "tpu" and int(os.environ.get("BENCH_ALLOW_CPU", "0")):
        # CPU dev run (BENCH_ALLOW_CPU=1): pin the platform so backend init
        # cannot touch the (possibly hung) tunnel. Env JAX_PLATFORMS is
        # overridden by the axon plugin; the config knob is not.
        jax.config.update("jax_platforms", platform or "cpu")
    _progress(f"devices: {jax.devices()}")

    point_count = int(os.environ.get("BENCH_POINTS", 1_000_000))
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    # Capacity: calibrated per tier by default (serving recipe — measure
    # the true entry total, apply a 6.25% margin; the reference's own
    # sizing is the EXACT per-frame total via readback). Override with
    # BENCH_CAPACITY=<int> for fixed-capacity A/Bs. Block 128 = the VPU
    # lane width, the boundary-window sweet spot for this workload's
    # ~240-entry mean tile segment.
    block_size = int(os.environ.get("BENCH_BLOCK", 128))
    capacity = _resolve_capacity(
        "BENCH_CAPACITY", 2_359_296, point_count, width, height,
        float(os.environ.get("BENCH_SCALE", 1.0)), block_size,
    )
    entry_dtype = os.environ.get("BENCH_ENTRY_DTYPE", "f32")
    scale_mult = float(os.environ.get("BENCH_SCALE", 1.0))
    # Amortized timing needs >= 2 chained steps ((n-run - 1-run) / (n - 1)).
    iters = max(int(os.environ.get("BENCH_ITERS", 4)), 2)
    tiers = os.environ.get(
        "BENCH_TIERS", "primary,bf16,forward,heavy"
    ).split(",")

    # Primary: reference-parity f32 entries (per round-2 advisor: keep the
    # headline precision-stable across rounds; bf16 is reported alongside).
    ms, stats = _measure_tier(
        jax, point_count, width, height, scale_mult, capacity, block_size,
        entry_dtype, iters,
    )
    RESULT.update(
        {
            "metric": "ms/frame fwd+bwd at 1080p with 1M Gaussians",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(BASELINE_MS / ms, 4),
            "tile_point_entries": stats["entries"],
            "visible_points": stats["visible"],
            "entries_per_visible": stats["entries_per_visible"],
            "capacity": capacity,
            "entry_dtype": entry_dtype,
        }
    )

    def _have_time(frac):
        return (time.time() - T_START) < budget_s * frac

    # Secondary tiers cost a ~5-7 min chain build EACH through the tunnel
    # (the remote-compile endpoint does not honor the local persistent
    # cache — measured 435 s on a fully warm .jax_cache), so a
    # budget-truncated run is the common case for the driver capture.
    # Two mitigations: (a) run the HEAVY tier first — it is the
    # co-headline (PERF.md reporting policy), bf16/forward are secondary;
    # (b) pre-fill each truncated tier from the last default-config
    # on-chip snapshot as an explicit `<tier>_cached` field (dropped the
    # moment the fresh measurement lands), so the one JSON line always
    # carries the full tier picture with honest provenance.
    # Config overrides (GAUSPLAT_*/BENCH_* flags) mark an A/B run: neither
    # pre-fill cached default-config tiers next to overridden-config fresh
    # ones (round-4 advisor #2) nor refresh the fallback snapshot below.
    overrides = [
        k for k in os.environ
        if k.startswith("GAUSPLAT_")
        or (k.startswith("BENCH_") and k not in ("BENCH_BUDGET_S", "BENCH_SKIP_PROBE"))
    ]
    if (
        LAST_TPU_SNAPSHOT.exists()
        and not overrides
        and not int(os.environ.get("BENCH_SKIP_PROBE", "0"))
    ):
        try:
            _prev = json.loads(LAST_TPU_SNAPSHOT.read_text())
            _prev_stamps = _prev.get("tier_measured_at", {})
            for key in ("ms_heavy", "heavy_entries_per_visible",
                        "ms_bf16", "ms_forward"):
                if key in _prev:
                    RESULT[key + "_cached"] = _prev[key]
                    stamp = _prev_stamps.get(key, _prev.get("measured_at"))
                    if stamp:
                        RESULT.setdefault("cached_tiers_from", {})[key] = stamp
        except (ValueError, OSError):
            pass

    def _fresh(key, value):
        RESULT[key] = value
        RESULT.pop(key + "_cached", None)

    try:
        if "heavy" in tiers and _have_time(0.5):
            # Garden-class heavy expansion (~7-8 entries/visible): the
            # honest real-scene load tier (VERDICT round-2 Weak #3).
            heavy_scale = float(os.environ.get("BENCH_HEAVY_SCALE", 3.5))
            heavy_block = int(os.environ.get("BENCH_HEAVY_BLOCK", 256))
            ms_heavy, hstats = _measure_tier(
                jax, point_count, width, height, heavy_scale,
                _resolve_capacity(
                    "BENCH_HEAVY_CAPACITY", 8_388_608, point_count, width,
                    height, heavy_scale, heavy_block,
                ),
                heavy_block,
                "bf16", iters,
            )
            _fresh("ms_heavy", round(ms_heavy, 3))
            _fresh("heavy_entries_per_visible", hstats["entries_per_visible"])
        if "bf16" in tiers and entry_dtype == "f32" and _have_time(0.7):
            ms_bf16, _ = _measure_tier(
                jax, point_count, width, height, scale_mult, capacity,
                block_size, "bf16", iters,
            )
            _fresh("ms_bf16", round(ms_bf16, 3))
        if "forward" in tiers and _have_time(0.8):
            # Pure rendering (no backward): the reference's primary use
            # case is inference-time rasterization.
            ms_fwd, _ = _measure_tier(
                jax, point_count, width, height, scale_mult, capacity,
                block_size, entry_dtype, iters, forward_only=True,
            )
            _fresh("ms_forward", round(ms_fwd, 3))
    except Exception as e:  # secondary tiers must never kill the headline
        _progress(f"secondary tier failed: {e!r}")
    if not any(k.endswith("_cached") for k in RESULT):
        RESULT.pop("cached_tiers_from", None)  # every tier measured fresh

    # Refresh the tunnel-down fallback snapshot ONLY for a default-config
    # run: the A/B driver exports GAUSPLAT_*/BENCH_* flags and often runs
    # while a background fit loads the chip — one such run overwrote the
    # snapshot with a 17x-inflated number in round 3.
    if jax.devices()[0].platform == "tpu" and not overrides:
        # Merge over the previous snapshot: a budget-truncated run (e.g. the
        # r03 driver capture got only primary+forward) must not drop the
        # secondary-tier fields (ms_bf16 / ms_heavy / ...) the prior
        # snapshot carried — the stale fallback should always report the
        # fullest tier set measured at default config. Each tier keeps its
        # own measurement timestamp in `tier_measured_at` (round-4 advisor
        # #1: re-stamping merged-in tiers with the current time misreported
        # when they were actually measured).
        now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        snap, stamps = {}, {}
        if LAST_TPU_SNAPSHOT.exists():
            try:
                prev = json.loads(LAST_TPU_SNAPSHOT.read_text())
                prev_stamps = prev.get("tier_measured_at", {})
                for k in ("ms_bf16", "ms_forward", "ms_heavy",
                          "heavy_entries_per_visible"):
                    if k in prev:
                        snap[k] = prev[k]
                        stamps[k] = prev_stamps.get(k, prev.get("measured_at"))
            except (ValueError, OSError):
                pass
        for k, v in RESULT.items():
            if not k.endswith("_cached") and k != "cached_tiers_from":
                snap[k] = v
                if k.startswith(("ms_", "value", "heavy_")):
                    stamps[k] = now
        snap["tier_measured_at"] = stamps
        snap["measured_at"] = now
        LAST_TPU_SNAPSHOT.write_text(json.dumps(snap) + "\n")
    elif overrides:
        _progress(f"snapshot not refreshed (env overrides: {overrides})")

    print(json.dumps(RESULT), flush=True)


if __name__ == "__main__":
    main()
