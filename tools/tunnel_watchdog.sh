#!/bin/bash
# Probe the axon TPU tunnel until it answers, then launch the chip queue.
# Usage: bash tools/tunnel_watchdog.sh [probe_interval_s]
# Writes state to /tmp/tunnel_watchdog.state so a build session can poll it.
set -u
cd "$(dirname "$0")/.."
INTERVAL=${1:-180}
STATE=/tmp/tunnel_watchdog.state
echo "probing" > "$STATE"
n=0
while true; do
  n=$((n+1))
  if timeout 150 python -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()
y = np.asarray(jnp.ones((128,128)) @ jnp.ones((128,128)))
assert float(y[0,0]) == 128.0
print('tunnel OK', d)
" > /tmp/tunnel_probe.log 2>&1; then
    echo "up (probe $n, $(date -u +%H:%M:%S))" > "$STATE"
    echo "=== tunnel answered on probe $n; launching chip queue ==="
    bash tools/chip_queue.sh /tmp/chip_queue > /tmp/chip_queue_driver.log 2>&1
    echo "queue_done rc=$? ($(date -u +%H:%M:%S))" > "$STATE"
    exit 0
  fi
  echo "down (probe $n, $(date -u +%H:%M:%S))" > "$STATE"
  sleep "$INTERVAL"
done
