#!/usr/bin/env python
"""Data-parallel scaling-efficiency harness (SURVEY.md §7.10, north-star
"≥80% scaling" deliverable).

For n in 1, 2, 4, ..., device_count: build a data-axis mesh over the first n
devices, run the chunked train step with global batch n x batch_per_chip,
and report steps/s (value-fetch timed, best-of-R) plus efficiency vs n=1
(weak scaling: perfect = equal steps/s at every n).

On real TPU pods this measures ICI/DCN allreduce overhead. On a virtual
CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) the absolute
numbers are meaningless but the sweep validates the sharded program at
every mesh size. The harness prints which case it is.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = ("depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,"
        "z_size=32,h_size=160,depth_ar=2,dataset=synthetic")
S = 10
ROUNDS = 3


def measure(n: int, batch_per_chip: int, extra: str = "") -> float:
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from iaf_tpu.core.config import get_default_hparams
    from iaf_tpu.data.datasets import synthetic_dataset
    from iaf_tpu.parallel import train_step as ts

    cfg = get_default_hparams().parse(
        BASE + f",batch_size={n * batch_per_chip},mesh_data={n}" + extra)
    devices = np.array(jax.devices()[:n]).reshape(n, 1)
    mesh = Mesh(devices, ("data", "model"))
    ds = synthetic_dataset(cfg.image_size, cfg.channels,
                           n_train=max(128, cfg.batch_size), n_test=8, seed=0)
    x = ds.train_x[: cfg.batch_size]
    state = ts.init_train_state(cfg, jax.random.PRNGKey(0), x)
    state = ts.place_state(state, mesh, cfg)  # avoid 2nd-call recompile
    chunk = ts.make_train_chunk(cfg, mesh, S)
    xs = jax.device_put(np.stack([x] * S),
                        NamedSharding(mesh, P(None, "data")))
    state, m = chunk(state, jax.random.PRNGKey(1), np.int32(0), xs)
    _ = float(np.asarray(m["loss"])[-1])
    best = 0.0
    for r in range(ROUNDS):
        t0 = time.time()
        state, m = chunk(state, jax.random.PRNGKey(2 + r),
                         np.int32((1 + r) * S), xs)
        _ = float(np.asarray(m["loss"])[-1])
        best = max(best, S / (time.time() - t0))
    return best


def main() -> None:
    args = list(sys.argv[1:])
    if "--cpu" in args:
        # virtual-device sweep: the axon sitecustomize overrides
        # JAX_PLATFORMS, so the env var alone cannot switch platforms
        args.remove("--cpu")
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from iaf_tpu.train_lib import setup_compilation_cache
    setup_compilation_cache()
    extra = ""
    if "--hpconfig" in args:
        i = args.index("--hpconfig")
        extra = "," + args[i + 1]
        del args[i:i + 2]
    batch_per_chip = int(args[0]) if args else 32
    nd = jax.device_count()
    plat = jax.devices()[0].platform
    kind = ("REAL hardware scaling" if plat == "tpu"
            else f"{plat} devices — structural validation only")
    print(f"[scaling] {nd} device(s), {kind}", file=sys.stderr)
    sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= nd]
    base_sps = None
    for n in sizes:
        sps = measure(n, batch_per_chip, extra)
        base_sps = base_sps or sps
        eff = 100.0 * sps / base_sps
        print(f"[scaling] n={n}: {sps:.2f} steps/s "
              f"(global batch {n * batch_per_chip}), "
              f"weak-scaling efficiency {eff:.1f}%")


if __name__ == "__main__":
    main()
