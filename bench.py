#!/usr/bin/env python
"""Benchmark: ELBO training steps/sec on the paper config, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference (openai/iaf) published no throughput numbers (BASELINE.md), so
``vs_baseline`` is measured against this repo's own recorded first-round
number in ``bench_baseline.json`` (value 1.0 on the run that creates it).

Extra context (eval samples/sec, config) goes to stderr so stdout stays a
single JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from iaf_tpu.core.config import get_default_hparams
    from iaf_tpu.data.datasets import synthetic_dataset
    from iaf_tpu.parallel import eval_step as ev
    from iaf_tpu.parallel import train_step as ts
    from iaf_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iaf_tpu.train_lib import setup_compilation_cache
    setup_compilation_cache()

    cfg = get_default_hparams().parse(
        "depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,"
        "z_size=32,h_size=160,depth_ar=2,dataset=synthetic")
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)

    mesh = make_mesh(cfg)
    ds = synthetic_dataset(cfg.image_size, cfg.channels,
                           n_train=cfg.batch_size * 4, n_test=64, seed=0)
    x = ds.train_x[: cfg.batch_size]

    t0 = time.time()
    state = ts.init_train_state(cfg, jax.random.PRNGKey(0), x)
    step = ts.make_train_step(cfg, mesh)
    xg = jax.device_put(x, NamedSharding(mesh, P("data")))
    state, metrics = step(state, jax.random.PRNGKey(1), xg)
    jax.block_until_ready(metrics["loss"])
    print(f"[bench] init+compile {time.time() - t0:.1f}s", file=sys.stderr)

    warmup, iters = 3, 20
    for i in range(warmup):
        state, metrics = step(state, jax.random.PRNGKey(2 + i), xg)
    jax.block_until_ready(metrics["loss"])
    t0 = time.time()
    for i in range(iters):
        state, metrics = step(state, jax.random.PRNGKey(100 + i), xg)
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0
    steps_per_sec = iters / dt
    print(f"[bench] {steps_per_sec:.3f} train steps/s "
          f"({steps_per_sec * cfg.batch_size:.1f} examples/s), "
          f"loss {float(metrics['loss']):.1f}", file=sys.stderr)

    # secondary: sharded IW eval samples/sec (stderr only)
    try:
        k = 64 * mesh.shape["data"]
        eval_fn = ev.make_eval_step(cfg, mesh, k=k)
        xe = ds.test_x[:8]
        nats = eval_fn(state.opt.ema, jax.random.PRNGKey(7), xe)
        jax.block_until_ready(nats)
        t0 = time.time()
        for i in range(5):
            nats = eval_fn(state.opt.ema, jax.random.PRNGKey(8 + i), xe)
        jax.block_until_ready(nats)
        ev_sps = 5 * 8 * k / (time.time() - t0)
        print(f"[bench] IW eval {ev_sps:.0f} importance-samples/s (k={k})",
              file=sys.stderr)
    except Exception as e:  # never let the secondary kill the metric
        print(f"[bench] eval bench skipped: {e}", file=sys.stderr)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    if os.path.isfile(base_path):
        with open(base_path) as f:
            base = json.load(f)["value"]
    else:
        with open(base_path, "w") as f:
            json.dump({"metric": "elbo_train_steps_per_sec",
                       "value": steps_per_sec,
                       "note": "first recorded run (round 1)"}, f)
        base = steps_per_sec

    print(json.dumps({
        "metric": "elbo_train_steps_per_sec",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s (paper config, global batch 32, 1 chip)",
        "vs_baseline": round(steps_per_sec / base, 4),
    }))


if __name__ == "__main__":
    main()
