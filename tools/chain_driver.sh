#!/bin/bash
# Unattended MLP tol-2 one-shot training chain (round 4, VERDICT item 3).
#
# Loop: wait for the in-flight segment -> uniform 12-clip gate eval at the
# tol-2 deployment box (tools/oneshot_eval.py, seed 900) -> if the gate
# (<8% diverse one-shot BER) is met or the chain stops descending, stop;
# else launch the next 3000-step segment warm-started from the last.
#
# Usage: bash tools/chain_driver.sh [first_seg_index] [max_segments]
# Logs:  /tmp/chain_driver.log, per-segment /tmp/train_tol2_segN.log,
#        per-segment gate JSON /tmp/gate_tol2_segN.json
set -u
cd "$(dirname "$0")/.."
KEY=aware_tpu/models/_key
SEG=${1:-1}
MAX=${2:-6}
GATE=8.0
prev_ber=100.0

while [ "$SEG" -le "$MAX" ]; do
  bundle="$KEY/amortized_v2_diverse_tol2_seg${SEG}.npz"
  log="/tmp/train_tol2_seg${SEG}.log"
  # wait for an in-flight trainer writing this segment, else launch one
  if pid=$(cat /tmp/train_mlp.pid 2>/dev/null) && ps -p "$pid" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M) seg${SEG}: waiting on trainer pid $pid"
    while ps -p "$pid" >/dev/null 2>&1; do sleep 60; done
  fi
  if [ ! -f "$bundle" ]; then
    prev_seg=$((SEG - 1))
    init="$KEY/amortized_v2_diverse_tol2_seg${prev_seg}.npz"
    [ -f "$init" ] || init="$KEY/amortized_v2_diverse_tol3_lp005b.npz"
    offset=$((40000 + 3000 * (SEG - 1)))
    echo "$(date -u +%H:%M) seg${SEG}: training from $(basename "$init") offset $offset"
    nohup python tools/train_amortized.py --cpu --diverse \
      --init "$init" --lambda-percept 0.05 --lr 3e-4 --tolerance-db 2.0 \
      --steps 3000 --batch 16 --step-offset "$offset" \
      --out "$(basename "$bundle")" > "$log" 2>&1 &
    echo $! > /tmp/train_mlp.pid
    wait "$(cat /tmp/train_mlp.pid)"
  fi
  if [ ! -f "$bundle" ]; then
    echo "$(date -u +%H:%M) seg${SEG}: trainer exited without bundle — abort"
    exit 1
  fi
  gate_json="/tmp/gate_tol2_seg${SEG}.json"
  python tools/oneshot_eval.py --cpu --bundle "$bundle" --family diverse \
    --clips 12 --tolerance-db 2.0 > "$gate_json" 2>/tmp/gate_tol2_seg${SEG}.err
  ber=$(python -c "import json;print(json.load(open('$gate_json'))['one_shot_ber'])" 2>/dev/null || echo 100)
  echo "$(date -u +%H:%M) seg${SEG}: gate BER ${ber}% (prev ${prev_ber}%)"
  met=$(python -c "print(int($ber < $GATE))")
  flat=$(python -c "print(int($ber > $prev_ber - 0.3))")
  if [ "$met" = "1" ]; then
    echo "$(date -u +%H:%M) GATE MET at seg${SEG}: ${ber}% (continuing while descending)"
  fi
  if [ "$flat" = "1" ] && [ "$SEG" -ge 2 ]; then
    echo "$(date -u +%H:%M) chain flat at seg${SEG} (${prev_ber} -> ${ber}) — stop"
    exit 2
  fi
  prev_ber=$ber
  SEG=$((SEG + 1))
done
echo "$(date -u +%H:%M) max segments reached"
exit 3
