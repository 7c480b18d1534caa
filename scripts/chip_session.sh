#!/bin/bash
# One serial measurement session on the hosted TPU, designed to run
# unattended the moment the tunnel returns (round-3 lesson: the tunnel can
# be down for hours and return between working turns).
#
# Sequence (strictly serial — the 1-core host serializes XLA compiles):
#   1. bench.py            — headline tiers; pre-warms .jax_cache for the
#                            driver's end-of-round run
#   2. ab_flags.py         — flag A/B matrix (each config a subprocess)
#   3. prof_stages.py      — on-chip per-stage ms budget at the headline
#                            config (pair COUNTS are already measured on
#                            CPU — prof_pairs_headline.json — timing is
#                            what only the chip can give)
#   3.5 rasterize tests on the real chip (compiled Pallas path)
#   4. train_long --full   — 30k-iter config-4 analogue, backgrounded last
#
# Logs to /tmp/chip_session.log AND copies every result into the repo root
# (the round driver commits uncommitted files at round end, so results
# survive even if the session finishes after the last working turn).

set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
LOG=/tmp/chip_session.log
exec >> "$LOG" 2>&1

echo "=== chip session start $(date -u +%FT%TZ) ==="

echo "--- stage 1: bench.py (cold compile: the cache has no round-3/4 executables)"
BENCH_BUDGET_S=3000 timeout 3600 python bench.py > /tmp/bench_session.json.tmp
rc=$?
echo "bench rc=$rc"
if [ $rc -eq 0 ]; then
  cp /tmp/bench_session.json.tmp "$REPO/BENCH_session.json"
  cat "$REPO/BENCH_session.json"
fi
cp "$LOG" "$REPO/chip_session_log.txt" 2>/dev/null

echo "--- stage 2: ab_flags.py (value order: the combined config answers the"
echo "    decisive question first if the stage budget runs out; each config"
echo "    is a fresh executable, so give compiles room)"
timeout 16000 python scripts/ab_flags.py --timeout 1500 \
  --configs all,quadm,quadm_exp2_gs32,gs32,exp2,mxu,projt,sht,half,gs16,gs64,b256_gs32
cp "$LOG" "$REPO/chip_session_log.txt" 2>/dev/null

echo "--- stage 3: prof_stages.py (headline config stage budget)"
PROF_POINTS=1000000 PROF_CAP=2359296 PROF_BLOCK=128 \
  timeout 2400 python scripts/prof_stages.py > "$REPO/prof_stages_r03.txt" 2>&1
echo "prof_stages rc=$?"
cat "$REPO/prof_stages_r03.txt"
cp "$LOG" "$REPO/chip_session_log.txt" 2>/dev/null

echo "--- stage 3.5: rasterize tests on the real chip (compiled Pallas path)"
GAUSPLAT_TEST_TPU=1 timeout 3600 python -m pytest tests/test_rasterize.py -q -x
echo "tpu rasterize tests rc=$?"
cp "$LOG" "$REPO/chip_session_log.txt" 2>/dev/null

echo "--- stage 4: train_long --full (background, ~4 h; writes into the repo)"
nohup timeout 21600 python scripts/train_long.py 30000 "$REPO/train_long_r03.json" --full \
  > /tmp/train_long_full.log 2>&1 &
echo $! > /tmp/train_long.pid
echo "train_long pid $(cat /tmp/train_long.pid)"

echo "=== chip session stages 1-3.5 done $(date -u +%FT%TZ) ==="
cp "$LOG" "$REPO/chip_session_log.txt" 2>/dev/null
