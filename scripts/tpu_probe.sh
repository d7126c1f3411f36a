#!/bin/bash
# Probe the axon TPU tunnel until it answers; log timestamps (VERDICT item 1:
# "if the tunnel stays dead, document the attempts with timestamps").
LOG=/root/repo/runs/tpu_probe.log
for i in $(seq 1 200); do
  echo "$(date -Is) probe $i start" >> "$LOG"
  timeout 180 python -u -c "
import time; t0=time.time()
import jax
ds = jax.devices()
import jax.numpy as jnp
y = (jnp.ones((256,256)) @ jnp.ones((256,256))).block_until_ready()
print('TPU ALIVE', ds, 'matmul ok in', round(time.time()-t0,1), 's')
" >> "$LOG" 2>&1
  rc=$?
  echo "$(date -Is) probe $i rc=$rc" >> "$LOG"
  if [ $rc -eq 0 ]; then echo "$(date -Is) SUCCESS" >> "$LOG"; exit 0; fi
  sleep 120
done
