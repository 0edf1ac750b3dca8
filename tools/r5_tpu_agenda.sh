#!/usr/bin/env bash
# Round-5 TPU work queue (outage-resilient, same pattern as r3/r4):
# waits for the shared tunnel with BOUNDED killable probes (an in-process
# jax.devices() on a dead tunnel blocks forever — the r2 failure mode),
# then runs, in order:
#   1. 20k-step soak at the FINAL r5 defaults (pure-XLA optimizer,
#      steps_per_dispatch=100) -> artifacts/soak_20k_r5_*
#   2. decomposition refresh at S=100 windows -> artifacts/decompose_r5b.txt
#   3. scaling-model refresh from the newest bench artifact
#      -> artifacts/scaling_model_r5b.json
#
# Usage: nohup bash tools/r5_tpu_agenda.sh > /tmp/r5_agenda.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts

log() { echo "[agenda $(date +%H:%M:%S)] $*"; }

PROBE='
import sys, jax
ds = jax.devices()
sys.exit(0 if ds and all("cpu" not in str(d).lower() for d in ds) else 3)
'

wait_for_tunnel() {
    # bounded probes forever (caller bounds total wall time via timeout/nohup)
    local n=0
    while true; do
        n=$((n + 1))
        if timeout 240 python -c "$PROBE" > /dev/null 2>&1; then
            log "tunnel is UP (probe $n)"
            return 0
        fi
        log "probe $n failed; sleeping 120s"
        sleep 120
    done
}

# ---- 1. 20k soak at final r5 defaults --------------------------------------
# ckpt_every=2500 (not 5000): the tunnel was FLAPPING this session (stalls
# mid-run), and a retry can only resume from the last checkpoint — 65 s of
# progress per checkpoint keeps retry loss small.
SOAK="depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,z_size=32,h_size=160,depth_ar=2,dataset=synthetic,total_steps=20000,ckpt_every=2500,log_every=500,steps_per_dispatch=100,eval_every=5000,eval_batch_size=16,eval_k=64"
if [ ! -f artifacts/soak_20k_r5_report.txt ] || ! grep -q "ok   finiteness" artifacts/soak_20k_r5_report.txt; then
    rm -rf /tmp/soak20k_r5
    for attempt in 1 2 3 4 5; do
        wait_for_tunnel
        log "STEP 1: 20k soak, attempt $attempt (resumes from latest ckpt if any)"
        if timeout 1800 python train.py --logdir /tmp/soak20k_r5 \
            --hpconfig "$SOAK" --mode train \
            >> artifacts/soak_20k_r5_train.log 2>&1; then
            log "soak finished on attempt $attempt"
            break
        fi
        log "soak attempt $attempt failed (crash/stall timeout)"
    done
    cp /tmp/soak20k_r5/metrics.jsonl artifacts/soak_20k_r5_metrics.jsonl \
        2>/dev/null || true
    python tools/long_run_report.py /tmp/soak20k_r5 \
        > artifacts/soak_20k_r5_report.txt 2>&1 \
        && log "soak report GREEN" || log "soak report FAILED"
    tail -12 artifacts/soak_20k_r5_report.txt || true
fi

# ---- 2. decomposition refresh at S=100 -------------------------------------
wait_for_tunnel
log "STEP 2: decomposition refresh (S=100 windows)"
timeout 3000 python tools/decompose_bench.py 3 \
    > artifacts/decompose_r5b.txt 2> artifacts/decompose_r5b.log \
    && log "decompose done" || log "decompose FAILED"
tail -8 artifacts/decompose_r5b.txt || true

# ---- 3. scaling-model refresh ----------------------------------------------
log "STEP 3: scaling model from newest bench artifact"
timeout 1800 python tools/scaling_model.py \
    > artifacts/scaling_model_r5b.json 2> artifacts/scaling_model_r5b.log \
    && log "scaling model done" || log "scaling model FAILED"

log "AGENDA COMPLETE"
