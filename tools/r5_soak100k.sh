#!/usr/bin/env bash
# 100k-step soak at the FINAL r5 defaults (pure-XLA optimizer, S=100
# dispatch) -> artifacts/soak_100k_r5_*. Outage-resilient: bounded
# killable tunnel probes between attempts, resume-from-checkpoint
# retries (the tunnel flaps on minutes timescales this session;
# ckpt_every=2500 caps retry loss at ~65 s of progress).
#
# Usage: nohup bash tools/r5_soak100k.sh > /tmp/r5_soak100k.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts

log() { echo "[soak100k $(date +%H:%M:%S)] $*"; }

PROBE='
import sys, jax
ds = jax.devices()
sys.exit(0 if ds and all("cpu" not in str(d).lower() for d in ds) else 3)
'

wait_for_tunnel() {
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

SOAK="depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,z_size=32,h_size=160,depth_ar=2,dataset=synthetic,total_steps=100000,ckpt_every=2500,log_every=500,steps_per_dispatch=100,eval_every=5000,eval_batch_size=16,eval_k=64"
rm -rf /tmp/soak100k_r5
for attempt in 1 2 3 4 5 6 7 8; do
    wait_for_tunnel
    log "attempt $attempt (resumes from latest ckpt if any)"
    if timeout 5400 python train.py --logdir /tmp/soak100k_r5 \
        --hpconfig "$SOAK" --mode train \
        >> artifacts/soak_100k_r5_train.log 2>&1; then
        log "soak finished on attempt $attempt"
        break
    fi
    log "attempt $attempt ended without finishing (crash/stall timeout)"
done
cp /tmp/soak100k_r5/metrics.jsonl artifacts/soak_100k_r5_metrics.jsonl \
    2>/dev/null || true
python tools/long_run_report.py /tmp/soak100k_r5 \
    > artifacts/soak_100k_r5_report.txt 2>&1 \
    && log "report GREEN" || log "report FAILED"
tail -12 artifacts/soak_100k_r5_report.txt || true
gzip -f artifacts/soak_100k_r5_metrics.jsonl 2>/dev/null || true
log "DONE"
