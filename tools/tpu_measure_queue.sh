#!/bin/bash
# Round-3 TPU measurement queue. One TPU client at a time, no kills:
# each step runs to completion (wedging the axon server by killing a
# client mid-compile costs ~45-60 min of tunnel downtime — measured).
# Usage: bash tools/tpu_measure_queue.sh [outdir]
set -u
OUT=${1:-/tmp/tpuq}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# Lock out other TPU clients (bench.py waits on this): two concurrent
# clients through the axon tunnel starve each other. flock(2) makes
# acquisition AND crash-release kernel-atomic — no stale-pid reclaim step,
# which was itself a race (two queues both observing a dead holder could
# rm each other's fresh locks and both run). The pid is written into the
# file for bench.py's waiter (kill -0 liveness probe); the file is removed
# on clean exit so the waiter sees an immediate release.
LOCK=/tmp/tpu_queue.lock
exec 9>>"$LOCK"
if ! flock -n 9; then
  echo "queue lock held by a live queue instance; refusing to run" >&2
  exit 1
fi
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT
export TPU_QUEUE_OWNER=1  # our own bench step must not wait on our lock

FAILED=0
run() {
  name=$1; shift
  echo "=== $name: $* (start $(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && FAILED=1
  echo "=== $name done rc=$rc ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  grep -v Warning "$OUT/$name.log" | tail -8
  # commit incrementally merged results after EVERY step: a tunnel flap
  # mid-queue (three rounds of history) must not discard what did measure
  if ! git diff --quiet -- BENCH_LAST_GOOD.json 2>/dev/null; then
    git add BENCH_LAST_GOOD.json
    git commit -m "bench: on-chip results through step $name" \
      --only BENCH_LAST_GOOD.json >> "$OUT/queue.log" 2>&1 || true
  fi
}

# 0. production bench FIRST (the headline number; probes after).
# Round-5b sweep: the 2026-08-18 morning queue proved every flat2d/lnk/fq
# config unlowerable on real TPU (Mosaic 8-sublane block rule; see
# tests/test_tpu_lowering.py). Those kernels are fixed (flat attention now
# rides the 3D kernels through a bitcast reshape; LN/quant row blocks are
# 8-divisible), so the full 13-config ladder is measurable for the first
# time. Morning results to beat: bf16+v3 283.1 fps (76.8% MFU).
run bench_ladder python bench.py --batch=128 --no-cache

# 1. padded heads (88 -> 128) + v3 + flat: the round-4 lane-alignment
#    prediction, now actually lowerable (--experiment: forced-config runs
#    must not overwrite the ladder's headline in BENCH_LAST_GOOD.json)
run padded_v3 python bench.py --padded-heads --bf16 --flat2d --attn-v3 \
  --batch=128 --budget=300 --no-cache --experiment

# 2. padded heads + v2 + flat (the other padded composition)
run padded_flat python bench.py --padded-heads --bf16 --flat2d --attn-v2 \
  --batch=128 --budget=300 --no-cache --experiment

# 3. device-time attribution of the v3 family: 3D vs flat trunk, hg16
#    score-tensor doubling, pallas-LN composition (morning numbers:
#    attn3-fences 433.8 device-ms/call = 295.1 fps-dev)
run attn3_probe python tools/block_probe.py \
  --variants attn3-fastgelu-fences,flat-attn3-fastgelu-fences,flat-attn3-hg16-fastgelu-fences,flat-attn3-lnk-fastgelu-fences \
  --iters 2 --hlodir "$OUT/hlo"

# 4. int8 attribution: dyn-quant baseline vs the (now-lowerable) fused-quant
#    kernels, with v3 attention (VERDICT r4 #3: make int8 pay or explain)
run int8_probe python tools/block_probe.py --int8 \
  --variants fastgelu-fences,fq-fastgelu,fq-attn3-fastgelu,flat-fq-attn3-fastgelu \
  --iters 2 --hlodir "$OUT/hlo"

# 5. secondary tracked metrics, now net-of-tunnel-RTT (the morning wall
#    numbers — 10 s p50, 16.7 q/s — measured the tunnel, not the chip)
run latency python bench.py --latency
run vr python bench.py --vr

# 5b. end-to-end extraction duty cycle
run e2e python bench.py --e2e --no-cache

# 6. persist the round's on-chip numbers in the repo so a later tunnel
#    outage degrades the bench signal instead of zeroing it (VERDICT r3 #2)
if [ -s BENCH_LAST_GOOD.json ]; then
  git add BENCH_LAST_GOOD.json
  git commit -m "bench: record on-chip last-known-good results" \
    --only BENCH_LAST_GOOD.json >> "$OUT/queue.log" 2>&1 || true
fi

# nonzero when any step failed (e.g. the tunnel flapped mid-queue) so the
# watcher can re-arm and retry the whole pass; steps are idempotent
exit $FAILED
