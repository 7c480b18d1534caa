"""On-chip A/B driver for the opt-in kernel flags.

Runs ``bench.py`` (primary tier only) under a matrix of env-flag configs,
serially (the host has one core; XLA compiles serialize), appending one
JSON line per config to ``PERF_AB.jsonl``. Designed for the hosted-TPU
tunnel: per-config subprocess timeout, partial results preserved, the
baseline config runs first (it doubles as the driver-bench cache pre-warm).

Usage:  python scripts/ab_flags.py [--timeout 900] [--configs a,b,...]

Flag configs (kernel variants are env-selected at module import, hence the
subprocess-per-config structure):
- base:        round-3 defaults (tight culling on, sort-free reduce)
- exp2:        GAUSPLAT_EXP2=1 (exp2 density, per-entry conic pre-scale)
- gs32/gs16:   GAUSPLAT_GROUP_SKIP=1 with BLEND_GROUP 32/16
- exp2_gs32:   both combined
- heavy_*:     the garden-class heavy tier for the winning flags
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent

CONFIGS = {
    "base": {},
    "gs32": {"GAUSPLAT_GROUP_SKIP": "1", "GAUSPLAT_BLEND_GROUP": "32"},
    "exp2": {"GAUSPLAT_EXP2": "1"},
    "exp2_gs32": {
        "GAUSPLAT_EXP2": "1",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
    },
    "gs16": {"GAUSPLAT_GROUP_SKIP": "1", "GAUSPLAT_BLEND_GROUP": "16"},
    "gs64": {"GAUSPLAT_GROUP_SKIP": "1", "GAUSPLAT_BLEND_GROUP": "64"},
    # B=256 revisited with group-skip (round-2 refuted plain B=256; the
    # skip predicates + shorter round-3 state change the tradeoff — half
    # the steps, same group-level pair waste as gs32 at B=128).
    "b256_gs32": {
        "BENCH_BLOCK": "256",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
    },
    "mxu": {"GAUSPLAT_MXU": "1"},  # precision=highest (the default)
    # Window size: the pair model favors smaller blocks (window pairs =
    # capacity/B + nonempty_tiles windows of [B, 256]; boundary waste is
    # ~B/2 per nonempty tile -> B=64 executes ~18% fewer window pairs
    # than B=128 at the light tier) at the cost of more grid steps and a
    # shorter prefix log factor.
    # REFUTED on hardware: Mosaic requires the entry block's lane dim to
    # be a 128-multiple, so windows below 128 fail BlockSpec validation.
    "b64": {"BENCH_BLOCK": "64"},
    "b96": {"BENCH_BLOCK": "96"},
    # Backward-only moment matmul: REFUTED load-matched (149.8 vs 136.7
    # base) — like full QUADM, the monomial dot's layout cost exceeds the
    # VPU ops it removes on this chip.
    "quadm_bwd": {"GAUSPLAT_QUADM_BWD": "1"},
    "mxu_dp": {"GAUSPLAT_MXU": "1", "GAUSPLAT_MXU_PRECISION": "default"},
    "heavy_mxu": {"GAUSPLAT_MXU": "1", "BENCH_TIERS": "primary,heavy"},
    # Quadratic-form-as-matmul: density exponent via one [B,6]x[6,256] MXU
    # dot; backward grad reductions via one [B,N]x[N,6] moment dot.
    "quadm": {"GAUSPLAT_QUADM": "1"},
    "quadm_exp2_gs32": {
        "GAUSPLAT_QUADM": "1",
        "GAUSPLAT_EXP2": "1",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
    },
    # Single-pass bf16 dots (half the MXU passes; training-grade accuracy).
    "quadm_dp": {
        "GAUSPLAT_QUADM": "1",
        "GAUSPLAT_QUADM_PRECISION": "default",
    },
    "sht": {"GAUSPLAT_SH_T": "1"},
    "projt": {"GAUSPLAT_SH_T": "1", "GAUSPLAT_POS_T": "1"},
    "all": {
        "GAUSPLAT_EXP2": "1",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
        "GAUSPLAT_MXU": "1",
    },
    # Round-4 decisive re-run (VERDICT #1): group-skip at the CURRENT
    # defaults (post reduce-rebuild, MXU highest on). pb_* measure the f32
    # and bf16 primary tiers in one run; hv_* make the heavy garden-class
    # workload the PRIMARY tier (one chain compile instead of two).
    "pb_base": {"BENCH_TIERS": "primary,bf16"},
    "pb_gs16": {
        "BENCH_TIERS": "primary,bf16",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "16",
    },
    "pb_gs32": {
        "BENCH_TIERS": "primary,bf16",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
    },
    "pb_gs64": {
        "BENCH_TIERS": "primary,bf16",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "64",
    },
    "hv_base": {
        "BENCH_SCALE": "3.5",
        "BENCH_CAPACITY": "8388608",
        "BENCH_BLOCK": "256",
        "BENCH_ENTRY_DTYPE": "bf16",
    },
    "hv_gs32": {
        "BENCH_SCALE": "3.5",
        "BENCH_CAPACITY": "8388608",
        "BENCH_BLOCK": "256",
        "BENCH_ENTRY_DTYPE": "bf16",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
    },
    "hv_gs64": {
        "BENCH_SCALE": "3.5",
        "BENCH_CAPACITY": "8388608",
        "BENCH_BLOCK": "256",
        "BENCH_ENTRY_DTYPE": "bf16",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "64",
    },
    "heavy_base": {"BENCH_TIERS": "primary,heavy"},
    "heavy_exp2_gs32": {
        "GAUSPLAT_EXP2": "1",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
        "BENCH_TIERS": "primary,heavy",
    },
    "heavy_quadm_exp2_gs32": {
        "GAUSPLAT_QUADM": "1",
        "GAUSPLAT_EXP2": "1",
        "GAUSPLAT_GROUP_SKIP": "1",
        "GAUSPLAT_BLEND_GROUP": "32",
        "BENCH_TIERS": "primary,heavy",
    },
}


def run_config(name: str, extra_env: dict, timeout_s: int) -> dict:
    env = dict(os.environ)
    env.setdefault("BENCH_TIERS", "primary")
    env.setdefault("BENCH_BUDGET_S", str(max(timeout_s - 60, 120)))
    env.update(extra_env)
    t0 = time.time()
    rec = {"config": name, "env": extra_env}
    try:
        proc = subprocess.run(
            [sys.executable, str(ROOT / "bench.py")],
            cwd=ROOT,
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        rec["rc"] = proc.returncode
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        rec["bench"] = json.loads(line) if line else None
        if rec["bench"] is None:
            rec["stderr_tail"] = proc.stderr.splitlines()[-4:]
    except subprocess.TimeoutExpired:
        rec["rc"] = "timeout"
        rec["bench"] = None
    rec["elapsed_s"] = round(time.time() - t0, 1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--configs", type=str, default=",".join(CONFIGS))
    ap.add_argument("--out", type=str, default=str(ROOT / "PERF_AB.jsonl"))
    args = ap.parse_args()

    for name in args.configs.split(","):
        if name not in CONFIGS:
            print(f"unknown config {name!r}", file=sys.stderr)
            continue
        print(f"=== {name} ===", file=sys.stderr, flush=True)
        rec = run_config(name, CONFIGS[name], args.timeout)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        val = (rec["bench"] or {}).get("value")
        print(f"  -> {val} ms (rc={rec['rc']}, {rec['elapsed_s']}s)",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
