#!/bin/bash
# Watch the tunnel probe loop (scripts/tpu_probe.sh) and fire the queued TPU
# measurement session (scripts/tpu_session.sh) the moment the tunnel answers.
# If the probe loop died without success, take over probing at its cadence.
cd "$(dirname "$0")/.."
LOG=runs/tpu_probe.log

while true; do
  if grep -q SUCCESS "$LOG" 2>/dev/null; then
    echo "$(date -Is) watcher: tunnel alive, starting tpu_session" >> "$LOG"
    exec bash scripts/tpu_session.sh
  fi
  if ! pgrep -x -f "bash scripts/tpu_probe.sh" > /dev/null 2>&1 \
     && ! pgrep -f "tpu_probe.sh" > /dev/null 2>&1; then
    # probe loop exited without SUCCESS (200 probes exhausted): probe here.
    echo "$(date -Is) watcher probe start" >> "$LOG"
    timeout 180 python -u -c "
import jax, jax.numpy as jnp
print('TPU ALIVE', jax.devices())
print((jnp.ones((256,256)) @ jnp.ones((256,256))).block_until_ready().sum())
" >> "$LOG" 2>&1
    if [ $? -eq 0 ]; then
      echo "$(date -Is) SUCCESS (watcher)" >> "$LOG"
      exec bash scripts/tpu_session.sh
    fi
    echo "$(date -Is) watcher probe dead" >> "$LOG"
    sleep 120
  else
    sleep 60
  fi
done
