#!/bin/bash
# One serial measurement session on the hosted TPU, designed to run
# unattended the moment the tunnel returns (round-3 lesson: the tunnel can
# be down for hours and return between working turns).
#
# Time-adaptive (round-3-continuation lesson: the tunnel may return with
# only a few hours left, and the 30k train_long needs ~4 h):
#   1. bench.py              — headline tiers; pre-warms .jax_cache for the
#                              driver's end-of-round run. Always first.
#   DECISION POINT: if less than TRAIN_LONG_NEED seconds remain before
#   CHIP_DEADLINE_EPOCH, launch train_long NOW (background) and run the
#   remaining stages under its load (A/B deltas stay comparable — every
#   config sees the same background load — absolutes are inflated and are
#   written to PERF_AB_bgload.jsonl instead).
#   2. ab_flags decisive set — the configs that decide the round-3 flag
#                              defaults, in value order
#   3. prof_stages.py        — on-chip per-stage ms budget, headline config
#   4. train_long --full     — 30k-iter config-4 analogue (background) if
#                              not already launched at the decision point
#   5. ab_flags secondary set (under train_long load; separate out file)
#   6. rasterize tests on the real chip (compiled Pallas path)
#
# Logs to /tmp/chip_session.log AND copies every result into the repo root
# (the round driver commits uncommitted files at round end, so results
# survive even if the session finishes after the last working turn).

set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
LOG=/tmp/chip_session.log
exec >> "$LOG" 2>&1

# Fixed at watchdog start (round start); default: 11 h from now.
DEADLINE=${CHIP_DEADLINE_EPOCH:-$(( $(date +%s) + 39600 ))}
# train_long wall need: ~4 h fit + compile + margin.
TRAIN_LONG_NEED=${TRAIN_LONG_NEED:-18000}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

launch_train_long() {
  echo "--- train_long --full (background, ~4 h; writes into the repo)"
  nohup timeout 21600 python scripts/train_long.py 30000 \
    "$REPO/train_long_r03.json" --full > /tmp/train_long_full.log 2>&1 &
  echo $! > /tmp/train_long.pid
  echo "train_long pid $(cat /tmp/train_long.pid)"
}

snap() { cp "$LOG" "$REPO/chip_session_log.txt" 2>/dev/null; }

echo "=== chip session start $(date -u +%FT%TZ) deadline_in=$(remaining)s ==="

echo "--- stage 1: bench.py (cold compile: the cache has no round-3/4 executables)"
BENCH_BUDGET_S=3000 timeout 3600 python bench.py > /tmp/bench_session.json.tmp
rc=$?
echo "bench rc=$rc"
if [ $rc -eq 0 ]; then
  cp /tmp/bench_session.json.tmp "$REPO/BENCH_session.json"
  cat "$REPO/BENCH_session.json"
fi
snap

TRAIN_LONG_LAUNCHED=0
AB_OUT="$REPO/PERF_AB.jsonl"
if [ "$(remaining)" -lt "$TRAIN_LONG_NEED" ]; then
  echo "--- decision: only $(remaining)s left < ${TRAIN_LONG_NEED}s; train_long first"
  launch_train_long
  TRAIN_LONG_LAUNCHED=1
  AB_OUT="$REPO/PERF_AB_bgload.jsonl"
fi

echo "--- stage 2: ab_flags decisive set -> $AB_OUT (value order; each config"
echo "    is a fresh executable, so give compiles room)"
timeout 10000 python scripts/ab_flags.py --timeout 1500 --out "$AB_OUT" \
  --configs all,quadm_exp2_gs32,heavy_quadm_exp2_gs32,quadm,exp2_gs32,gs32
snap

echo "--- stage 3: prof_stages.py (headline config stage budget)"
PROF_POINTS=1000000 PROF_CAP=2359296 PROF_BLOCK=128 \
  timeout 2400 python scripts/prof_stages.py > "$REPO/prof_stages_r03.txt" 2>&1
echo "prof_stages rc=$?"
cat "$REPO/prof_stages_r03.txt"
snap

if [ "$TRAIN_LONG_LAUNCHED" -eq 0 ]; then
  echo "--- stage 4: launch train_long now (remaining $(remaining)s)"
  launch_train_long
fi

echo "--- stage 5: ab_flags secondary set (under train_long load; absolutes"
echo "    inflated, deltas comparable) -> PERF_AB_bgload.jsonl"
timeout 14000 python scripts/ab_flags.py --timeout 1500 \
  --out "$REPO/PERF_AB_bgload.jsonl" \
  --configs mxu,exp2,gs16,gs64,b256_gs32,quadm_dp,sht,projt,heavy_base,heavy_exp2_gs32
snap

echo "--- stage 6: rasterize tests on the real chip (compiled Pallas path)"
GAUSPLAT_TEST_TPU=1 timeout 3600 python -m pytest tests/test_rasterize.py -q -x
echo "tpu rasterize tests rc=$?"
snap

echo "=== chip session stages done $(date -u +%FT%TZ) (train_long still in bg) ==="
snap
