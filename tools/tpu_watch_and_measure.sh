#!/bin/bash
# Round-3 watcher: probe the axon tunnel until it is healthy, then run the
# measurement queue (tools/tpu_measure_queue.sh) exactly once.
#
# Probe discipline (measured, round 2): each jax device-init attempt through
# the tunnel either succeeds in seconds or fails naturally after ~25 min of
# server-side waiting. NEVER kill the probe process mid-wait — killing a TPU
# client wedges the axon server for ~45-60 min. So each probe runs to natural
# completion and we sleep between attempts.
# Usage: bash tools/tpu_watch_and_measure.sh [outdir]
set -u
OUT=${1:-/tmp/tpuq_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
LOG="$OUT/watch.log"

while true; do
  echo "probe start $(date +%H:%M:%S)" >> "$LOG"
  python - >> "$LOG" 2>&1 <<'EOF'
import sys
import jax
d = jax.devices()
# a failed axon init can fall back to the CPU backend without raising;
# only a real TPU device counts as a healthy tunnel
if d[0].platform not in ("tpu", "axon"):
    print("PROBE_FALLBACK_NOT_TPU", d)
    sys.exit(1)
print("TUNNEL_UP", d)
EOF
  rc=$?
  echo "probe done rc=$rc $(date +%H:%M:%S)" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "tunnel healthy; running measurement queue $(date +%H:%M:%S)" >> "$LOG"
    bash tools/tpu_measure_queue.sh "$OUT" >> "$LOG" 2>&1
    qrc=$?
    echo "queue complete rc=$qrc $(date +%H:%M:%S)" >> "$LOG"
    if [ $qrc -eq 0 ]; then
      exit 0
    fi
    # a step failed (tunnel flap mid-queue?): re-arm and retry the whole
    # idempotent pass, bounded so a real (non-tunnel) bug can't loop forever
    PASSES=$((${PASSES:-0} + 1))
    if [ "$PASSES" -ge 3 ]; then
      echo "queue failed $PASSES passes; giving up $(date +%H:%M:%S)" >> "$LOG"
      exit 1
    fi
    echo "queue had failed steps; re-arming (pass $PASSES) $(date +%H:%M:%S)" >> "$LOG"
  fi
  sleep 300
done
