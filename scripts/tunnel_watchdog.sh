#!/bin/bash
# Probe the hosted-TPU tunnel every ~4 min; the moment a probe sees a TPU
# device, launch scripts/chip_session.sh exactly once and exit.
#
# jax.devices() hangs forever while the tunnel is down (round-3 lesson), so
# every probe runs under timeout in a fresh subprocess.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tunnel_watchdog.log
exec >> "$LOG" 2>&1

echo "=== watchdog start $(date -u +%FT%TZ) pid $$ ==="
# Freeze the round deadline at watchdog (round) start so chip_session.sh
# can decide whether the 30k train_long must jump the measurement queue.
export CHIP_DEADLINE_EPOCH=${CHIP_DEADLINE_EPOCH:-$(( $(date +%s) + 39600 ))}
echo "deadline epoch $CHIP_DEADLINE_EPOCH"
while true; do
  out=$(timeout 150 python - <<'EOF' 2>&1
import jax
ds = jax.devices()
print("PLATFORM", ds[0].platform, len(ds))
EOF
)
  if echo "$out" | grep -q "PLATFORM tpu"; then
    echo "$(date -u +%FT%TZ) tunnel UP: $out"
    bash scripts/chip_session.sh
    echo "$(date -u +%FT%TZ) chip session launched+finished (stages 1-3.5); exiting watchdog"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) down ($(echo "$out" | tail -1 | cut -c1-80))"
  sleep 240
done
