#!/bin/bash
# Round-3 TPU work queue: waits for the tunneled TPU to come back, then
# front-loads every TPU-dependent VERDICT r2 item in one pass (the r2
# lesson: the tunnel can die for hours, so all TPU work runs the moment it
# is reachable, serialized, each step bounded by `timeout` and logged).
#
#   1. bench.py                -> artifacts/bench_r3_early.json  (next #1,#3)
#   2. decompose_bench.py      -> artifacts/decompose_r3.txt     (next #2)
#   3. short train + invert    -> artifacts/invert_check_r3.txt  (next #4)
#   4. pallas_elem A/B         -> artifacts/ab_pallas_elem_r3.txt (next #2)
#   5. 100k-step soak + report -> artifacts/soak_100k_r3_*       (next #8)
#
# Usage: nohup bash tools/r3_tpu_agenda.sh > /tmp/r3_agenda.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts

stamp() { date '+%H:%M:%S'; }
log() { echo "[$(stamp)] $*"; }

# ---- 0. wait for the tunnel (bounded probes, up to ~12 h) ----------------
# The probe REJECTS a CPU fallback (exit 3): if the TPU plugin errors fast,
# jax silently gives CpuDevice and the whole agenda (incl. the 100k soak)
# would burn hours measuring the host CPU as if it were the chip.
PROBE='import sys, jax
ds = jax.devices()
print(ds)
sys.exit(0 if ds and all("cpu" not in str(d).lower() for d in ds) else 3)'
log "waiting for TPU tunnel"
for i in $(seq 1 144); do
    if timeout 150 python -c "$PROBE" > /tmp/r3_probe.out 2>/dev/null; then
        log "tunnel UP: $(cat /tmp/r3_probe.out)"
        break
    fi
    log "probe $i failed (down or cpu-fallback); sleeping 300s"
    sleep 300
    if [ "$i" = 144 ]; then log "tunnel never came back; giving up"; exit 1; fi
done

# ---- 1. headline bench (outage-proof; own watchdog) -----------------------
log "STEP 1: bench.py"
IAF_BENCH_WATCHDOG_SECS=4200 timeout 4500 python bench.py \
    > artifacts/bench_r3_early.json 2> artifacts/bench_r3_early.log
log "bench done: $(cat artifacts/bench_r3_early.json)"

# ---- 2. step-time decomposition under FULL defaults -----------------------
log "STEP 2: decompose_bench (full defaults: bf16 + fused optimizer)"
timeout 7200 python tools/decompose_bench.py 4 \
    > artifacts/decompose_r3.txt 2> artifacts/decompose_r3.log
log "decompose done"; tail -6 artifacts/decompose_r3.txt || true

# ---- 3. inversion at the measured granularity ------------------------------
log "STEP 3: train 100 steps paper config, then invert_check"
HP="depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,z_size=32,h_size=160,depth_ar=2,dataset=synthetic,total_steps=100,ckpt_every=100,log_every=50,steps_per_dispatch=25,eval_every=0"
rm -rf /tmp/iaf_invert_r3
timeout 3600 python train.py --logdir /tmp/iaf_invert_r3 --hpconfig "$HP" \
    --mode train > artifacts/invert_train_r3.log 2>&1
timeout 3600 python train.py --logdir /tmp/iaf_invert_r3 \
    --mode invert_check > artifacts/invert_check_r3.txt 2>&1
log "invert_check done"; grep invert_check artifacts/invert_check_r3.txt || true

# ---- 4. isolated fused-likelihood-kernel A/B (VERDICT next #2) -------------
# kernels=pallas_elem runs ONLY the fused disc-logistic kernel (it disables
# the fused optimizer that base has on TPU), so the honest comparison is
# pallas_elem vs xla_opt; base rides along to re-verify the optimizer win
# under round-3 code. Interleaved rounds, best-of-N (shared-TPU method).
log "STEP 4: pallas_elem A/B (fused disc-logistic isolation)"
timeout 5400 python tools/ab_bench.py 4 base xla_opt pallas_elem \
    > artifacts/ab_pallas_elem_r3.txt 2> artifacts/ab_pallas_elem_r3.log
log "ab done: $(cat artifacts/ab_pallas_elem_r3.txt)"

# ---- 5. 100k-step soak under full defaults (VERDICT next #8) ---------------
# Multi-hour run on a tunnel that can die: retry with resume-from-latest-
# checkpoint (train.py restores automatically), but only after a QUICK
# probe confirms the tunnel is back — a dead tunnel makes train.py hang
# until its own timeout, so blind retries would burn 3x4h for nothing.
log "STEP 5: 100k-step soak"
SOAK="depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,z_size=32,h_size=160,depth_ar=2,dataset=synthetic,total_steps=100000,ckpt_every=20000,log_every=500,steps_per_dispatch=25,eval_every=5000,eval_batch_size=16,eval_k=64"
rm -rf /tmp/soak100k_r3
for attempt in 1 2 3; do
    if timeout 14400 python train.py --logdir /tmp/soak100k_r3 \
        --hpconfig "$SOAK" --mode train \
        >> artifacts/soak_100k_r3_train.log 2>&1; then
        log "soak finished on attempt $attempt"
        break
    fi
    log "soak attempt $attempt failed (crash/timeout); probing tunnel"
    if ! timeout 150 python -c "$PROBE" > /dev/null 2>&1; then
        log "tunnel is down; abandoning soak retries"
        break
    fi
    log "tunnel alive; resuming soak from the latest checkpoint"
done
cp /tmp/soak100k_r3/metrics.jsonl artifacts/soak_100k_r3_metrics.jsonl
python tools/long_run_report.py /tmp/soak100k_r3 \
    > artifacts/soak_100k_r3_report.txt 2>&1 \
    && log "soak report GREEN" || log "soak report FAILED"
tail -12 artifacts/soak_100k_r3_report.txt || true

log "AGENDA COMPLETE"
