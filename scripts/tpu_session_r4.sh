#!/bin/bash
# Round-4 one-shot TPU measurement session (VERDICT r3 item 3: refresh the
# whole hardware story at the final tip, in ONE session, dated after the
# last kernel commit).  Same fail-loud structure as tpu_session.sh.
#
# Steps:
#   0. gather feasibility: the LUT kernels lean on Mosaic's same-shape lane
#      DynamicGather; if its compile fails here, the session continues with
#      IVIT_LUT=0 (bit-identical tower fallback) and says so loudly.
#   1. compile-geometry guard (every fused kernel at every real geometry)
#   2. bitwise validation vs the round-4 CPU golden (LUT kernels included)
#   3. path compares (fused vs unfused) -> dispatch-table refresh evidence
#   4. BENCH_MATRIX_r4.json (--sol, 4 configs + ppoly row)
#   5. bench.py headline
#   6. SERVING_TPU.json (item 10)
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_session_r4.log
note() { echo "$(date -Is) $*" | tee -a "$LOG"; }
FAILED=""

wait_alive() {  # block until the tunnel answers (killed compiles wedge it
                # for tens of minutes — runs/tpu_probe_r4.log history)
    for i in $(seq 1 30); do
        timeout 150 python -c "
import jax, jax.numpy as jnp
(jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" \
            > /dev/null 2>&1 && return 0
        note "wait_alive: tunnel dead (try $i); sleeping 90"
        sleep 90
    done
    return 1
}

run_step() {  # name timeout_s cmd...
    local name=$1 to=$2; shift 2
    for attempt in 1 2; do
        note "START $name (attempt $attempt)"
        timeout -k 10 "$to" "$@" >> "$LOG" 2>&1
        rc=$?
        note "END $name rc=$rc"
        [ $rc -eq 0 ] && return 0
        wait_alive || note "wait_alive exhausted; pressing on"
    done
    FAILED="$FAILED $name"
    return 1
}

note "=== TPU session r4 begin ==="
run_step probe 420 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print((jnp.ones((256,256)) @ jnp.ones((256,256))).block_until_ready().sum())
" || { note "SESSION FAIL probe (TPU unreachable)"; exit 1; }

# 0. Mosaic dynamic-gather feasibility (the LUT kernels' core op)
if run_step gather_probe 600 python scripts/probe_gather.py; then
    note "gather OK: LUT kernels enabled"
else
    export IVIT_LUT=0
    note "gather FAILED: session continues with IVIT_LUT=0 (tower fallback)"
fi

run_step vmem_geometries 3600 python scripts/check_vmem_geometries.py

run_step validate_dump 4500 python scripts/tpu_validate.py dump --backend tpu --out runs/val_tpu_r4.pkl --stats-from runs/val_cpu_r4.pkl
run_step validate_compare 300 python scripts/tpu_validate.py compare runs/val_cpu_r4.pkl runs/val_tpu_r4.pkl

run_step validate_kernels 3600 python scripts/validate_kernels_tpu.py

if [ -n "$FAILED" ]; then
    note "SESSION FAIL$FAILED (validation red; benchmarks skipped)"
    exit 1
fi

# 3. fused-vs-unfused path compares (dispatch-table evidence, r3 item 2)
run_step path_tiny 2400 sh -c "python scripts/path_compare.py --model deit_tiny_patch16_224 --fam ivit --check > runs/path_compare_tiny_r4.log 2>&1"
run_step path_small 2400 sh -c "python scripts/path_compare.py --model deit_small_patch16_224 --fam ibert --check > runs/path_compare_small_r4.log 2>&1"
run_step path_swin 2400 sh -c "python scripts/swin_path_compare.py > runs/swin_path_compare_r4.log 2>&1"

# 4. full benchmark matrix with speed-of-light accounting (+ ppoly row)
run_step bench_matrix 7200 python scripts/bench_matrix.py --sol --out BENCH_MATRIX_r4.json

# 4b. per-GEMM-site SoL attribution (r3 item 8)
run_step sites_tiny 2400 sh -c "python scripts/kernel_microbench.py --model deit_tiny_patch16_224 --sites --attn-tiles 4 --mlp-tiles 512 > runs/sites_tiny_r4.log 2>&1"
run_step sites_small 2400 sh -c "python scripts/kernel_microbench.py --model deit_small_patch16_224 --sites --attn-tiles 2 --mlp-tiles 512 > runs/sites_small_r4.log 2>&1"

# 5. headline driver metric
run_step bench 1800 python bench.py

# 6. serving latency on the real chip (r3 item 10)
run_step serving 2400 python scripts/serving_bench.py --out SERVING_TPU.json

if [ -n "$FAILED" ]; then
    note "SESSION FAIL$FAILED"
    exit 1
fi
note "SESSION PASS"
