"""On-chip Pallas compile smoke: verify every A/B flag config COMPILES
and runs on the real TPU at tiny shapes before any session time is spent
benchmarking it.

Round-3 lesson: the CPU suite runs the Pallas kernels in interpret mode,
which does not enforce Mosaic's memref tiling rules — a kernel can pass
every CPU test and still fail to compile on hardware (observed: partial
subscripts of the [3, 256] color block, whose 3-row sublane extent is
unaligned to the (4, 128) tile). This script is the cheap hardware gate:
one subprocess per env-flag config (kernel variants are selected at module
import), a ~64x48 render + grad through the custom VJP, ~30-60 s each.

Usage:
  python scripts/tpu_smoke.py                 # all configs
  python scripts/tpu_smoke.py --configs base,gs32
  python scripts/tpu_smoke.py --child         # (internal) one config
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent

# Kernel-variant configs (superset of scripts/ab_flags.py's kernel flags;
# bench-only knobs like BENCH_TIERS are irrelevant here).
CONFIGS = {
    "base": {},
    "bf16": {"SMOKE_ENTRY_DTYPE": "bf16"},
    "exp2": {"GAUSPLAT_EXP2": "1"},
    "gs16": {"GAUSPLAT_GROUP_SKIP": "1", "GAUSPLAT_BLEND_GROUP": "16"},
    "gs32": {"GAUSPLAT_GROUP_SKIP": "1", "GAUSPLAT_BLEND_GROUP": "32"},
    "gs64": {"GAUSPLAT_GROUP_SKIP": "1", "GAUSPLAT_BLEND_GROUP": "64"},
    "b256_gs32": {
        "SMOKE_BLOCK": "256",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
    },
    "mxu": {"GAUSPLAT_MXU": "1"},
    "quadm": {"GAUSPLAT_QUADM": "1"},
    "quadm_dp": {
        "GAUSPLAT_QUADM": "1",
        "GAUSPLAT_QUADM_PRECISION": "default",
    },
    "all": {
        "GAUSPLAT_EXP2": "1",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
        "GAUSPLAT_MXU": "1",
    },
    "quadm_exp2_gs32": {
        "GAUSPLAT_QUADM": "1",
        "GAUSPLAT_EXP2": "1",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
    },
}


def child() -> None:
    sys.path.insert(0, str(ROOT))
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", str(ROOT / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render

    plat = jax.devices()[0].platform
    print(f"platform={plat}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(42)
    p = 50
    pts = Points(
        rng.random((p, 3)).astype(np.float32),
        rng.standard_normal((p, 3)) * 0.8,
    )
    scene = GaussianScene.from_points(pts)
    scene = scene.set_scalings(
        jnp.asarray(0.02 + 0.1 * rng.random((p, 3)), jnp.float32)
    )
    scene = scene.set_opacities(
        jnp.asarray(0.1 + 0.8 * rng.random((p, 1)), jnp.float32)
    )
    view = View(
        field_of_view_x=1.0,
        field_of_view_y=0.8,
        image_height=48,
        image_width=64,
        view_position=[0.0, 0.0, -4.0],
        view_transform=View.transform(np.eye(3), [0.0, 0.0, 4.0]),
    )
    opts = RenderOptions(
        tile_entry_capacity=2048,
        block_size=int(os.environ.get("SMOKE_BLOCK", "128")),
        entry_dtype=os.environ.get("SMOKE_ENTRY_DTYPE", "f32"),
    )

    def loss(s, ref):
        out = render(s, view, opts, positions_2d_grad_norm_ref=ref)
        return jnp.sum(out.colors_rgb_2d ** 2)

    ref = jnp.zeros((p,))
    g, gn = jax.grad(loss, argnums=(0, 1))(scene, ref)
    img = render(scene, view, opts).colors_rgb_2d
    sums = {
        "img": float(jnp.sum(img)),
        "g_pos": float(jnp.sum(jnp.abs(g.positions))),
        "g_sh": float(jnp.sum(jnp.abs(g.colors_sh))),
        "gn": float(jnp.sum(gn)),
    }
    assert all(np.isfinite(v) for v in sums.values()), sums
    print(json.dumps(sums), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--configs", type=str, default=",".join(CONFIGS))
    ap.add_argument("--timeout", type=int, default=420)
    args = ap.parse_args()
    if args.child:
        child()
        return

    failures = []
    base_sums = None
    for name in args.configs.split(","):
        env = dict(os.environ)
        env.update(CONFIGS[name])
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--child"],
                cwd=ROOT,
                env=env,
                capture_output=True,
                text=True,
                timeout=args.timeout,
            )
            rc: object = proc.returncode
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("{")),
                None,
            )
        except subprocess.TimeoutExpired:
            rc, line, proc = "timeout", None, None
        dt = time.time() - t0
        if rc == 0 and line:
            sums = json.loads(line)
            if name == "base":
                base_sums = sums
            drift = ""
            if base_sums and name != "base":
                d = max(
                    abs(sums[k] - base_sums[k])
                    / max(abs(base_sums[k]), 1e-6)
                    for k in sums
                )
                drift = f" maxrel_vs_base={d:.2e}"
                # bf16/quadm trade precision for speed; others are exact
                # up to regrouping ULPs. quadm_dp (single-pass bf16 dots)
                # is compile-gated only: near-cancelling sums at this tiny
                # scale make relative drift meaningless for it.
                lim = (
                    float("inf") if name == "quadm_dp"
                    else 2e-2 if name in ("bf16", "quadm", "all",
                                          "quadm_exp2_gs32")
                    else 1e-3
                )
                if d > lim:
                    failures.append((name, f"value drift {d:.2e}"))
            print(f"OK   {name:18s} {dt:6.1f}s{drift}", flush=True)
        else:
            tail = ""
            if proc is not None:
                errl = [l for l in proc.stderr.splitlines() if l.strip()]
                tail = " | ".join(errl[-3:])[-300:]
            failures.append((name, f"rc={rc} {tail}"))
            print(f"FAIL {name:18s} {dt:6.1f}s rc={rc}\n     {tail}",
                  flush=True)
    if failures:
        print(f"\n{len(failures)} config(s) failed:", flush=True)
        for name, msg in failures:
            print(f"  {name}: {msg}", flush=True)
        sys.exit(1)
    print("\nall configs compiled and ran on this platform", flush=True)


if __name__ == "__main__":
    main()
