#!/bin/bash
# One serial measurement session on the hosted TPU, designed to run
# unattended the moment the tunnel returns (round-3 lesson: the tunnel can
# be down for hours and return between working turns).
#
# Round-4 state: the flag matrix is settled (MXU_BLEND default ON at
# precision=highest; exp2 / group-skip / QUADM / QUADM_BWD / B!=128 all
# refuted on-chip — PERF.md round-4 section), so the session is now
# measurement + validation rather than A/B hunting:
#   1. bench.py            — all four tiers (f32/bf16/forward/heavy);
#                            pre-warms .jax_cache for the driver's
#                            end-of-round capture. Always first.
#   2. prof_stages.py      — per-stage ms budget at the headline config
#   3. train_long --full   — 30k config-4 analogue (background, ~4 h)
#   4. on-chip tests       — rasterize + pipeline on the real chip
#   5. ab_flags            — only if AB_CONFIGS is set (new flags to try)
#
# Time-adaptive: if less than TRAIN_LONG_NEED seconds remain before
# CHIP_DEADLINE_EPOCH, train_long launches right after bench and stages
# 2/4 run under its load (absolutes inflated, still useful as smoke).
#
# Logs to /tmp/chip_session.log AND copies every result into the repo root
# (the round driver commits uncommitted files at round end).

set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
LOG=/tmp/chip_session.log
exec >> "$LOG" 2>&1

DEADLINE=${CHIP_DEADLINE_EPOCH:-$(( $(date +%s) + 39600 ))}
TRAIN_LONG_NEED=${TRAIN_LONG_NEED:-18000}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

launch_train_long() {
  echo "--- train_long --full (background, ~4 h; writes into the repo)"
  nohup timeout 21600 python scripts/train_long.py 30000 \
    "$REPO/train_long_r04.json" --full > /tmp/train_long_full.log 2>&1 &
  echo $! > /tmp/train_long.pid
  echo "train_long pid $(cat /tmp/train_long.pid)"
}

snap() { cp "$LOG" "$REPO/chip_session_log.txt" 2>/dev/null; }

echo "=== chip session start $(date -u +%FT%TZ) deadline_in=$(remaining)s ==="

echo "--- stage 1: bench.py (warms .jax_cache for the driver capture)"
BENCH_BUDGET_S=3000 timeout 3600 python bench.py > /tmp/bench_session.json.tmp
rc=$?
echo "bench rc=$rc"
if [ $rc -eq 0 ]; then
  cp /tmp/bench_session.json.tmp "$REPO/BENCH_session.json"
  cat "$REPO/BENCH_session.json"
fi
snap

TRAIN_LONG_LAUNCHED=0
if [ "$(remaining)" -lt "$TRAIN_LONG_NEED" ]; then
  echo "--- decision: only $(remaining)s left < ${TRAIN_LONG_NEED}s; train_long first"
  launch_train_long
  TRAIN_LONG_LAUNCHED=1
fi

echo "--- stage 2: prof_stages.py (headline config stage budget)"
PROF_POINTS=1000000 PROF_CAP=2359296 PROF_BLOCK=128 \
  timeout 2400 python scripts/prof_stages.py > "$REPO/prof_stages_r03.txt" 2>&1
echo "prof_stages rc=$?"
cat "$REPO/prof_stages_r03.txt"
snap

if [ "$TRAIN_LONG_LAUNCHED" -eq 0 ]; then
  echo "--- stage 3: launch train_long now (remaining $(remaining)s)"
  launch_train_long
fi

echo "--- stage 4: rasterize + pipeline tests on the real chip"
GAUSPLAT_TEST_TPU=1 timeout 5400 python -m pytest \
  tests/test_rasterize.py tests/test_pipeline.py -q
echo "tpu tests rc=$?"
snap

if [ -n "${AB_CONFIGS:-}" ]; then
  echo "--- stage 5: ab_flags (under train_long load) -> PERF_AB_bgload.jsonl"
  timeout 14000 python scripts/ab_flags.py --timeout 2400 \
    --out "$REPO/PERF_AB_bgload.jsonl" --configs "$AB_CONFIGS"
  snap
fi

echo "=== chip session stages done $(date -u +%FT%TZ) (train_long still in bg) ==="
snap
