#!/bin/bash
# Round-4 TPU work queue (VERDICT r3 next #1): the tunnel is UP at round
# start, so this runs immediately — serialized (the chip is shared; parallel
# runs would corrupt each other's timings), each step bounded by `timeout`
# and logged. Run from a CLONE of the repo so concurrent source edits in the
# main tree cannot break a step mid-launch.
#
#   1. bench.py                -> artifacts/bench_r4_early.json
#   2. decompose_bench.py      -> artifacts/decompose_r4.txt
#   3. short train + invert    -> artifacts/invert_check_r4.txt
#   4. pallas_elem A/B         -> artifacts/ab_pallas_elem_r4.txt
#   5. on-TPU profiler trace   -> artifacts/tpu_trace_r4.txt (best effort)
#   6. 100k-step soak + report -> artifacts/soak_100k_r4_*
#
# Usage: nohup bash tools/r4_tpu_agenda.sh > /tmp/r4_agenda.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts

stamp() { date '+%H:%M:%S'; }
log() { echo "[$(stamp)] $*"; }

# Probe REJECTS a CPU fallback (exit 3) — see r3 agenda rationale.
PROBE='import sys, jax
ds = jax.devices()
print(ds)
sys.exit(0 if ds and all("cpu" not in str(d).lower() for d in ds) else 3)'

wait_for_tunnel() {
    for i in $(seq 1 72); do
        if timeout 150 python -c "$PROBE" > /tmp/r4_probe.out 2>/dev/null; then
            log "tunnel UP: $(cat /tmp/r4_probe.out)"
            return 0
        fi
        log "probe $i failed (down or cpu-fallback); sleeping 300s"
        sleep 300
    done
    log "tunnel never came back"
    return 1
}

wait_for_tunnel || exit 1

# ---- 1. headline bench (outage-proof; own watchdog) -----------------------
log "STEP 1: bench.py"
IAF_BENCH_WATCHDOG_SECS=4200 timeout 4500 python bench.py \
    > artifacts/bench_r4_early.json 2> artifacts/bench_r4_early.log
log "bench done: $(cat artifacts/bench_r4_early.json)"

# ---- 2. step-time decomposition under FULL defaults -----------------------
log "STEP 2: decompose_bench (full defaults: bf16 + fused optimizer)"
timeout 7200 python tools/decompose_bench.py 4 \
    > artifacts/decompose_r4.txt 2> artifacts/decompose_r4.log
log "decompose done"; tail -6 artifacts/decompose_r4.txt || true

# ---- 3. inversion at the measured granularity ------------------------------
log "STEP 3: train 100 steps paper config, then invert_check"
HP="depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,z_size=32,h_size=160,depth_ar=2,dataset=synthetic,total_steps=100,ckpt_every=100,log_every=50,steps_per_dispatch=25,eval_every=0"
rm -rf /tmp/iaf_invert_r4
timeout 3600 python train.py --logdir /tmp/iaf_invert_r4 --hpconfig "$HP" \
    --mode train > artifacts/invert_train_r4.log 2>&1
timeout 3600 python train.py --logdir /tmp/iaf_invert_r4 \
    --mode invert_check > artifacts/invert_check_r4.txt 2>&1
log "invert_check done"; grep invert_check artifacts/invert_check_r4.txt || true

# ---- 4. isolated fused-likelihood-kernel A/B (VERDICT r3 weak #3) ----------
# kernels=pallas_elem runs ONLY the fused elementwise kernels (it disables
# the fused optimizer that base has on TPU), so the honest comparison is
# pallas_elem vs xla_opt; base rides along to re-verify the optimizer win.
log "STEP 4: pallas_elem A/B (fused elementwise isolation)"
timeout 5400 python tools/ab_bench.py 4 base xla_opt pallas_elem \
    > artifacts/ab_pallas_elem_r4.txt 2> artifacts/ab_pallas_elem_r4.log
log "ab done: $(cat artifacts/ab_pallas_elem_r4.txt)"

# ---- 5. on-TPU profiler trace, best effort (VERDICT r3 next #8) ------------
# The axon tunnel historically exposed no profiler service; a cheap bounded
# attempt each round records whether that has changed.
log "STEP 5: on-TPU profiler trace attempt"
timeout 1200 python - > artifacts/tpu_trace_r4.txt 2>&1 <<'EOF'
import glob, os, sys
import numpy as np
import jax
from iaf_tpu.core.config import get_default_hparams
from iaf_tpu.data.datasets import synthetic_dataset
from iaf_tpu.parallel import train_step as ts
from iaf_tpu.parallel.mesh import make_mesh

cfg = get_default_hparams().parse(
    "depth=1,num_blocks=20,kl_min=0.25,batch_size=32,z_size=32,h_size=160,"
    "depth_ar=2,dataset=synthetic")
mesh = make_mesh(cfg)
ds = synthetic_dataset(cfg.image_size, cfg.channels, 64, 8, seed=0)
x = ds.train_x[:cfg.batch_size]
state = ts.init_train_state(cfg, jax.random.PRNGKey(0), x)
state = ts.place_state(state, mesh, cfg)
step = ts.make_train_step(cfg, mesh)
state, m = step(state, jax.random.PRNGKey(1), x)  # compile outside trace
_ = float(np.asarray(m["loss"]))
tdir = "/tmp/iaf_tpu_trace_r4"
with jax.profiler.trace(tdir):
    for i in range(3):
        state, m = step(state, jax.random.PRNGKey(2 + i), x)
    _ = float(np.asarray(m["loss"]))
pbs = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
print("xplane files:", pbs)
if not pbs:
    print("NO TRACE CAPTURED (profiler service still unavailable)")
    sys.exit(1)
os.system(f"python tools/xplane_summary.py {pbs[0]}")
EOF
log "trace attempt done"; tail -4 artifacts/tpu_trace_r4.txt || true

# ---- 6. 100k-step soak under full defaults (VERDICT r3 weak #4) ------------
# Retries resume from the latest checkpoint, but only after a quick probe
# confirms the tunnel is back (a dead tunnel makes train.py hang).
log "STEP 6: 100k-step soak"
SOAK="depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,z_size=32,h_size=160,depth_ar=2,dataset=synthetic,total_steps=100000,ckpt_every=20000,log_every=500,steps_per_dispatch=25,eval_every=5000,eval_batch_size=16,eval_k=64"
rm -rf /tmp/soak100k_r4
for attempt in 1 2 3; do
    if timeout 14400 python train.py --logdir /tmp/soak100k_r4 \
        --hpconfig "$SOAK" --mode train \
        >> artifacts/soak_100k_r4_train.log 2>&1; then
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
cp /tmp/soak100k_r4/metrics.jsonl artifacts/soak_100k_r4_metrics.jsonl
python tools/long_run_report.py /tmp/soak100k_r4 \
    > artifacts/soak_100k_r4_report.txt 2>&1 \
    && log "soak report GREEN" || log "soak report FAILED"
tail -12 artifacts/soak_100k_r4_report.txt || true

log "AGENDA COMPLETE"
