#!/bin/bash
# Round-4 chip work queue (docs/ROUND4_CHIP_QUEUE.md), runnable as one
# command the moment the axon tunnel answers.  Each step logs to
# $LOGDIR/NN_name.log, records its rc, and the queue CONTINUES past
# failures (a flaky tunnel must not erase the later artifacts).
#
# Usage:  bash tools/chip_queue.sh [logdir]
# NOTE: do NOT set JAX_PLATFORMS — every step needs the real chip.
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/chip_queue}
mkdir -p "$LOGDIR"
SUMMARY="$LOGDIR/summary.txt"
: > "$SUMMARY"

run_step() {
  local name=$1; shift
  local log="$LOGDIR/${name}.log"
  echo "=== $name: $* (started $(date -u +%H:%M:%S)) ==="
  "$@" > "$log" 2>&1
  local rc=$?
  echo "$name rc=$rc ($(date -u +%H:%M:%S))" | tee -a "$SUMMARY"
  tail -3 "$log"
  return $rc
}

# 1. end-to-end drive (embed->detect roundtrip through the public API).
#    First fused compile after the round-4 kernel changes is ~10 min cold;
#    this also warms the persistent compile cache for everything below.
run_step 01_verify timeout 1800 python tools/verify_drive.py

# 2. headline benchmark (self-retrying through tunnel flaps)
run_step 02_bench timeout 3600 python bench.py --full

# 3. real-chip regression tier -> TPU_TIER.json -> committed artifact
run_step 03_tpu_tier timeout 5400 python -m pytest tests_tpu -q
[ -f TPU_TIER.json ] && cp TPU_TIER.json TPU_TIER_r05.json

# 4. per-stage perf probe (target ms/iter/clip <= 0.030 at B=256).
#    --pallas-roundtrip is REQUIRED to measure the bench flagship path:
#    without it the probe times the XLA slab solver (~0.096 ms/clip/iter)
#    and reads like a 3x kernel regression that isn't there (round-5
#    finding — the first r5 probe ran flagless and recorded exactly that).
run_step 04_perf_probe timeout 3600 python tools/perf_probe.py \
  --pallas-roundtrip --batches 64 256 --out PERF_PROBE_STEP.json

# 5a. parity embeds on chip (minutes); 5b (host, ~2h) runs AFTER the
#     remaining chip steps so the chip isn't idle behind a host job.
run_step 05a_parity_embeds timeout 5400 python tools/parity_embed_batch.py

# 6. throughput sweep incl. robust-card + 60s long-clip rows
run_step 06_bench_sweep timeout 7200 python tools/bench_sweep.py

# 7. hour-scale streaming detection
run_step 07_streaming timeout 7200 python tools/streaming_eval.py --hours 1

# 8. extended robustness suite (real MP3/Opus/GSM/AAC/Vorbis/Speex/G.722
#    rows) with chip embeds; host-side codec attacks run in-process (no
#    ffmpeg needed).  8b repeats on the deployment-grade robust card.
run_step 08_eval_extended timeout 7200 bash -c \
  'python -m aware_tpu.eval --clips 10 --extended > EVAL_RESULTS_EXTENDED.json'
run_step 08b_eval_extended_robust timeout 7200 bash -c \
  'python -m aware_tpu.eval --clips 10 --extended --card robust > EVAL_RESULTS_EXTENDED_ROBUST.json'

# 8c. compression card (low-bitrate-codec operating point, new in round 4)
#     with chip embeds — confirms the COMPRESSION_EOT_AB.json CPU numbers.
run_step 08c_eval_extended_compression timeout 7200 bash -c \
  'python -m aware_tpu.eval --clips 6 --extended --card compression > EVAL_RESULTS_EXTENDED_COMPRESSION.json'

# 8d. message-level ECC eval with chip embeds (compression card, real
#     low-bitrate codec rows) — the system-level payload-survival metric
run_step 08d_ecc_eval timeout 7200 python tools/ecc_eval.py \
  --card compression --clips 6 --k 8 --out ECC_EVAL_CHIP.json

# 5b. host-side parity eval against the chip embeds (CPU, long)
if [ -f PARITY_EMBEDS.npz ]; then
  run_step 05b_parity_eval timeout 14400 python tools/parity_eval.py \
    --our-embeds PARITY_EMBEDS.npz --clips 80
fi

echo "=== queue done ==="
cat "$SUMMARY"

# Persist the artifacts immediately (the queue may finish while no build
# session is active); restricted to the known artifact files so an
# in-flight working tree is never swept up.
cp "$SUMMARY" CHIP_QUEUE_r05_SUMMARY.txt 2>/dev/null
# Stage each artifact individually: a missing file (failed step) must not
# abort staging of the ones that DID land.
for f in TPU_TIER_r05.json TPU_TIER.json PERF_PROBE_STEP.json \
  BENCH_SWEEP.json STREAMING_EVAL.json EVAL_RESULTS_EXTENDED.json \
  EVAL_RESULTS_EXTENDED_ROBUST.json EVAL_RESULTS_EXTENDED_COMPRESSION.json \
  ECC_EVAL_CHIP.json \
  PARITY_EMBEDS.npz PARITY.md PARITY_PARTIAL.json \
  CHIP_QUEUE_r05_SUMMARY.txt; do
  [ -e "$f" ] && git add "$f"
done
git diff --cached --quiet || git commit -m "Chip-queue artifacts (round 5): bench, TPU tier, perf probe, sweep, streaming, extended eval, parity embeds

No-Verification-Needed: artifact-only commit produced by the on-chip validation queue"
