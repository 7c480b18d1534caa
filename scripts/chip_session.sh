#!/bin/bash
# One serial measurement session on the hosted TPU, designed to run
# unattended the moment the tunnel returns (round-3 lesson: the tunnel can
# be down for hours and return between working turns).
#
# Sequence (strictly serial — the 1-core host serializes XLA compiles):
#   1. bench.py            — headline tiers; pre-warms .jax_cache for the
#                            driver's end-of-round run
#   2. ab_flags.py         — flag A/B matrix (each config a subprocess)
#   3. prof_pairs.py       — pair accounting at the bench workload
#   4. train_long --full   — 30k-iter config-4 analogue, backgrounded last
#
# Logs to /tmp/chip_session.log; each stage bounded by timeout.

set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session.log
exec >> "$LOG" 2>&1

echo "=== chip session start $(date -u +%FT%TZ) ==="

echo "--- stage 1: bench.py (cold compile: the cache has no round-3/4 executables)"
BENCH_BUDGET_S=3000 timeout 3600 python bench.py > /tmp/bench_r03.json.tmp
rc=$?
echo "bench rc=$rc"
if [ $rc -eq 0 ]; then
  cp /tmp/bench_r03.json.tmp /tmp/bench_r03.json
  cat /tmp/bench_r03.json
fi

echo "--- stage 2: ab_flags.py (value order: the combined config answers the"
echo "    decisive question first if the stage budget runs out; each config"
echo "    is a fresh executable, so give compiles room)"
timeout 11500 python scripts/ab_flags.py --timeout 1500 \
  --configs all,gs32,exp2,mxu,projt,sht,half,gs16

echo "--- stage 3: prof_pairs.py (bench workload)"
PAIRS_POINTS=1000000 PAIRS_WIDTH=1920 PAIRS_HEIGHT=1080 \
PAIRS_CAPACITY=2359296 PAIRS_BLOCK=128 \
  timeout 1800 python scripts/prof_pairs.py > /tmp/prof_pairs_headline.json
echo "prof_pairs rc=$?"
cat /tmp/prof_pairs_headline.json 2>/dev/null

echo "--- stage 3.5: rasterize tests on the real chip (compiled Pallas path)"
GAUSPLAT_TEST_TPU=1 timeout 2400 python -m pytest tests/test_rasterize.py -q -x
echo "tpu rasterize tests rc=$?"

echo "--- stage 4: train_long --full (background, ~4 h)"
nohup timeout 21600 python scripts/train_long.py 30000 /tmp/train_long_full.json --full \
  > /tmp/train_long_full.log 2>&1 &
echo $! > /tmp/train_long.pid
echo "train_long pid $(cat /tmp/train_long.pid)"

echo "=== chip session stages 1-3 done $(date -u +%FT%TZ) ==="
