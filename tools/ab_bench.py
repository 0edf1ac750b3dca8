#!/usr/bin/env python
"""Honest A/B harness for kernel/precision variants on the paper config.

Methodology matches bench.py: multi-step (lax.scan) chunks, several
pipelined dispatches, timing window closed by a blocking VALUE fetch
(block_until_ready on the axon remote tunnel returns before compute
finishes and once yielded a physically impossible 3890 steps/s).

Usage: python tools/ab_bench.py [variant ...]
Variants default to: f32 trim bf16 bf16_trim pallas pallas_bf16
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "f32": "",
    "trim": ",ar_row_trim=true",
    "bf16": ",compute_dtype=bfloat16",
    "bf16_trim": ",compute_dtype=bfloat16,ar_row_trim=true",
    "pallas": ",kernels=pallas",
    "pallas_bf16": ",kernels=pallas,compute_dtype=bfloat16",
}

BASE = ("depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,"
        "z_size=32,h_size=160,depth_ar=2,dataset=synthetic")


def measure(extra: str, S: int = 25, chunks: int = 3) -> float:
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iaf_tpu.core.config import get_default_hparams
    from iaf_tpu.data.datasets import synthetic_dataset
    from iaf_tpu.parallel import train_step as ts
    from iaf_tpu.parallel.mesh import make_mesh

    cfg = get_default_hparams().parse(BASE + extra)
    mesh = make_mesh(cfg)
    ds = synthetic_dataset(cfg.image_size, cfg.channels, n_train=128,
                           n_test=64, seed=0)
    x = ds.train_x[: cfg.batch_size]
    state = ts.init_train_state(cfg, jax.random.PRNGKey(0), x)
    chunk = ts.make_train_chunk(cfg, mesh, S)
    xs = jax.device_put(np.stack([x] * S),
                        NamedSharding(mesh, P(None, "data")))
    t0 = time.time()
    state, m = chunk(state, jax.random.PRNGKey(1), np.int32(0), xs)
    warm_loss = float(np.asarray(m["loss"])[-1])
    print(f"  compile+warmup {time.time() - t0:.1f}s loss {warm_loss:.1f}",
          file=sys.stderr)
    t0 = time.time()
    for i in range(chunks):
        state, m = chunk(state, jax.random.PRNGKey(2 + i),
                         np.int32((1 + i) * S), xs)
    loss = float(np.asarray(m["loss"])[-1])
    dt = time.time() - t0
    sps = chunks * S / dt
    print(f"  {sps:.2f} steps/s ({dt * 1000 / (chunks * S):.2f} ms/step) "
          f"loss {loss:.1f}", file=sys.stderr)
    return sps


def main() -> None:
    from iaf_tpu.train_lib import setup_compilation_cache
    setup_compilation_cache()
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for name in names:
        print(f"[ab] {name}", file=sys.stderr)
        try:
            results[name] = measure(VARIANTS[name])
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            results[name] = None
    print({k: (round(v, 2) if v else None) for k, v in results.items()})


if __name__ == "__main__":
    main()
