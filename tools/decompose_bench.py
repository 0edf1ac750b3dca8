#!/usr/bin/env python
"""Step-time decomposition on the paper config: where do the milliseconds go?

The analytic roofline (tools/roofline.py) says the train step should take
~10.4 ms on a v5e at bf16 peak; measured is ~27 ms (37 steps/s). This
harness times ABLATED programs (same interleaved best-of-N, value-fetch
methodology as tools/ab_bench.py — the shared tunneled TPU swings >10x with
other tenants) to attribute the gap:

  full       fwd + bwd + Adamax/EMA update        (the bench.py program)
  no_opt     fwd + bwd only (grads computed, update skipped)
  fwd        forward/loss only, no grad
  no_ar      full step with ar_kind=dense (AR convs ablated; tiny
             per-position dense MADE heads keep flow+context semantics)
  diag       full step with flow=diag (no IAF machinery at all)

Derived attributions printed at the end:
  optimizer+EMA      = full - no_opt
  backward           = no_opt - fwd
  AR convs (fwd+bwd) = full - no_ar
  IAF chain overhead = no_ar - diag

Usage: python tools/decompose_bench.py [rounds] [--hpconfig k=v,...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = ("depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,"
        "z_size=32,h_size=160,depth_ar=2,dataset=synthetic")

# Steps fused per timed dispatch. Each window pays ONE ~29 ms value-fetch
# round trip (r5 sweep), which cancels in the derived DIFFERENCES below but
# inflates the absolute ms/step by ~RTT/S — S=100 keeps that under 0.3 ms.
S = 100


def build(extra: str, program: str):
    """Compile one ablated 25-step scan program; returns a timer closure.

    ``program``: "train" (fwd+bwd+opt), "grads" (fwd+bwd), "fwd" (loss only).
    """
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iaf_tpu.core.config import get_default_hparams
    from iaf_tpu.data.datasets import synthetic_dataset
    from iaf_tpu.parallel import train_step as ts
    from iaf_tpu.parallel.mesh import make_mesh

    cfg = get_default_hparams().parse(BASE + extra)
    mesh = make_mesh(cfg)
    ds = synthetic_dataset(cfg.image_size, cfg.channels, n_train=128,
                           n_test=32, seed=0)
    x = ds.train_x[: cfg.batch_size]
    state = ts.init_train_state(cfg, jax.random.PRNGKey(0), x)
    state = ts.place_state(state, mesh, cfg)  # avoid 2nd-call recompile
    xs_np = np.stack([x] * S)
    xs = jax.device_put(xs_np, NamedSharding(mesh, P(None, "data")))

    if program == "train":
        fn = ts.make_train_chunk(cfg, mesh, S)

        def call(i):
            nonlocal state
            state, m = fn(state, jax.random.PRNGKey(1 + i), np.int32(i * S),
                          xs)
            return m["loss"]
    else:
        loss_fn = partial(ts.loss_fn, cfg)

        if program == "grads":
            def body(params, key, b):
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, key, b)
                # fold grads into one scalar so nothing is dead-code-
                # eliminated (x0.0 would let XLA delete the whole backward)
                return loss + 1e-30 * sum(jnp.sum(jnp.abs(g))
                                          for g in jax.tree.leaves(grads))
        else:  # fwd
            def body(params, key, b):
                return loss_fn(params, key, b)[0]

        def chunk(params, base_key, batches):
            def step(c, b):
                l = body(params, jax.random.fold_in(base_key, c), b)
                return c + 1, l
            _, losses = jax.lax.scan(step, jnp.int32(0), batches)
            return losses

        jfn = jax.jit(chunk)

        def call(i):
            return jfn(state.params, jax.random.PRNGKey(1 + i), xs)

    holder = {"i": 0}

    def run_once() -> float:
        t0 = time.time()
        loss = call(holder["i"])
        _ = float(np.asarray(loss)[-1])
        holder["i"] += 1
        return (time.time() - t0) / S * 1e3  # ms/step

    t0 = time.time()
    run_once()  # compile + warmup
    print(f"  compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)
    return run_once


VARIANTS = [
    ("full", "", "train"),
    # r5: defaults ship the XLA optimizer (auto admits nothing), so
    # full_xla_opt == full; full_fused_opt re-adds the Pallas kernel to
    # keep bounding the optimizer story, and full - no_opt is the
    # optimizer tail under defaults (VERDICT r2 next #2).
    ("full_xla_opt", ",kernels=xla", "train"),
    ("full_fused_opt", ",kernels=pallas_opt", "train"),
    ("no_opt", "", "grads"),
    ("fwd", "", "fwd"),
    # AR-conv ablation: dense per-position MADE heads replace the masked
    # convs (depth_ar=0 with conv AR is rejected by config validation —
    # it would silently drop the context add; the tiny dense stack keeps
    # the flow + context semantics while removing ~all AR-conv FLOPs)
    ("no_ar", ",ar_kind=dense", "train"),
    ("diag", ",flow=diag", "train"),
]


def main() -> None:
    args = sys.argv[1:]
    if "--cpu" in args:  # JAX_PLATFORMS=cpu alone is overridden by the
        args.remove("--cpu")  # axon sitecustomize; force via jax.config
        import jax
        jax.config.update("jax_platforms", "cpu")
    from iaf_tpu.train_lib import setup_compilation_cache
    setup_compilation_cache()
    rounds = int(args.pop(0)) if args and args[0].isdigit() else 4
    extra_hp = ""
    if args and args[0] == "--hpconfig":
        extra_hp = "," + args[1]

    timers = {}
    for name, extra, program in VARIANTS:
        print(f"[decompose] compiling {name}", file=sys.stderr)
        try:
            timers[name] = build(extra + extra_hp, program)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {e}", file=sys.stderr)

    best: dict[str, float] = {}  # best = MIN ms/step (least contended)
    for r in range(rounds):
        for name, timer in timers.items():
            try:
                ms = timer()
            except Exception as e:
                print(f"[decompose] r{r} {name} failed: {e}", file=sys.stderr)
                continue
            best[name] = min(best.get(name, float("inf")), ms)
            print(f"[decompose] round {r} {name}: {ms:.2f} ms/step "
                  f"(best {best[name]:.2f})", file=sys.stderr)

    print({k: round(v, 2) for k, v in best.items()})
    if all(k in best for k in ("full", "no_opt", "fwd")):
        print(f"optimizer+EMA:      {best['full'] - best['no_opt']:+.2f} ms")
        print(f"backward:           {best['no_opt'] - best['fwd']:+.2f} ms")
        print(f"forward:            {best['fwd']:.2f} ms")
    if "full_xla_opt" in best and "full" in best:
        print(f"fused-opt saving:   "
              f"{best['full_xla_opt'] - best['full']:+.2f} ms")
    if "full_fused_opt" in best and "full" in best:
        print(f"pallas-opt delta:   "
              f"{best['full_fused_opt'] - best['full']:+.2f} ms")
    if "no_ar" in best and "full" in best:
        print(f"AR convs (fwd+bwd): {best['full'] - best['no_ar']:+.2f} ms")
    if "diag" in best and "no_ar" in best:
        print(f"IAF chain overhead: {best['no_ar'] - best['diag']:+.2f} ms")


if __name__ == "__main__":
    main()
