#!/bin/bash
# One-shot TPU measurement session (VERDICT round-1 items 1+2, round-2 item 7).
# Run when the axon tunnel is alive.  Tolerates tunnel wedges: every step
# under timeout, 20s sleep + one retry (CLAUDE.md doctrine).
# Produces: runs/val_tpu.pkl (+ bitwise compare vs the CPU golden),
# BENCH_MATRIX.json with SoL + fusion fields, and a bench.py line.
#
# FAILS LOUDLY (VERDICT r2 item 7): any red validation step marks the whole
# session FAILED, skips benchmarking (numbers for unvalidated kernels are
# meaningless), and exits nonzero.  The log's last line is an explicit
# "SESSION PASS" / "SESSION FAIL <step>" the driver bench can trust.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_session.log
note() { echo "$(date -Is) $*" | tee -a "$LOG"; }
FAILED=""

run_step() {  # name timeout_s cmd...
    local name=$1 to=$2; shift 2
    for attempt in 1 2; do
        note "START $name (attempt $attempt)"
        timeout "$to" "$@" >> "$LOG" 2>&1
        rc=$?
        note "END $name rc=$rc"
        [ $rc -eq 0 ] && return 0
        sleep 20
    done
    FAILED="$FAILED $name"
    return 1
}

note "=== TPU session begin ==="
run_step probe 420 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print((jnp.ones((256,256)) @ jnp.ones((256,256))).block_until_ready().sum())
" || { note "SESSION FAIL probe (TPU unreachable)"; exit 1; }

# 0. compile-geometry guard: every fused kernel must COMPILE at every real
#    model geometry (the scoped-VMEM OOM class that killed round 2's bench)
run_step vmem_geometries 3600 python scripts/check_vmem_geometries.py

# 1. bitwise numerics validation vs the checked-in CPU golden.  The TPU
#    dump loads the golden's quant_stats (--stats-from): calibration runs
#    float forwards that are not cross-backend bit-identical by nature; the
#    invariant under test is checkpoint-determines-the-network (same stats
#    -> identical sim/engine/kernel bits on every backend).
run_step validate_dump 3600 python scripts/tpu_validate.py dump --backend tpu --out runs/val_tpu.pkl --stats-from runs/val_cpu.pkl
run_step validate_compare 300 python scripts/tpu_validate.py compare runs/val_cpu.pkl runs/val_tpu.pkl

# 1b. per-kernel Mosaic hardware validation (both exp-quotient forms,
#     INT16-softmax kernels) — answers the "interpret-only" gap directly
run_step validate_kernels 3600 python scripts/validate_kernels_tpu.py

if [ -n "$FAILED" ]; then
    note "SESSION FAIL$FAILED (validation red; benchmarks skipped)"
    exit 1
fi

# 2. full benchmark matrix with speed-of-light accounting
run_step bench_matrix 5400 python scripts/bench_matrix.py --sol --out BENCH_MATRIX.json

# 3. headline driver metric
run_step bench 1800 python bench.py

if [ -n "$FAILED" ]; then
    note "SESSION FAIL$FAILED"
    exit 1
fi
note "SESSION PASS"
