#!/usr/bin/env python
"""Honest A/B harness for kernel/precision variants on the paper config.

Methodology (see bench.py docstring): multi-step (lax.scan) chunks, timing
windows closed by a blocking VALUE fetch. Because the tunneled TPU is a
SHARED resource whose effective speed swings >10x with other tenants'
load (observed 29 ms/step and 530 ms/step for the identical program an
hour apart), variants are INTERLEAVED over several rounds and each
variant's best (least-contended) time is reported — sequential A/B is
meaningless here.

Usage: python tools/ab_bench.py [rounds] [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # "base" = CURRENT DEFAULTS. As of r5 that means bf16 compute, merged
    # AR heads, row trim, WN pre-fold, and kernels=auto admitting NOTHING
    # (the fused optimizer left auto in r5: plain XLA won 36.99 vs 36.70
    # at low contention, flipping its r2/r4 heavy-contention wins). The
    # counterfactual variants below REMOVE a win to re-verify it; the
    # historical additive variants (bf16, merge_heads, xla_opt) are now
    # no-ops vs base and kept only for running against older checkouts.
    "base": "",                        # current defaults (unrolled stacked)
    "f32": ",compute_dtype=float32",   # reference recipe (removes bf16 win)
    "xla_opt": ",kernels=xla",         # = base since r5 (auto admits nothing)
    "scan": ",scan_blocks=true",
    "scan_remat": ",scan_blocks=true,remat=true",
    "notrim": ",ar_row_trim=false",
    "bf16": ",compute_dtype=bfloat16",
    "merge_heads": ",merge_ar_heads=true",
    "merge_heads_bf16": ",merge_ar_heads=true,compute_dtype=bfloat16",
    "pallas": ",kernels=pallas",
    # fused disc-logistic elementwise kernel only (since r5 base has no
    # fused optimizer, so base is the right control)
    "pallas_elem": ",kernels=pallas_elem",
    "pallas_ar": ",kernels=pallas_ar",  # fused AR-stack kernel only
    # r4 live-tap-im2col AR-stack challenger: one [rows, 5*cin] matmul per
    # conv over the concatenated live taps (vs pallas_ar's 5 per-tap
    # matmuls; vs base's XLA dense conv with 9 taps)
    "pallas_ar_im2col": ",kernels=pallas_ar,ar_variant=im2col",
    "pallas_opt": ",kernels=pallas_opt",  # fused Adamax+Polyak kernel only
    # r5: adds default-layout boundary pinning (removes XLA's AUTO-layout
    # relayout copies around the Mosaic optimizer — LOST 36.07 vs 36.42:
    # AUTO's swapped layouts minimize tile padding, which matters more)
    "pin": ",pin_state_layouts=true",
    # r5: the fused optimizer under the layout-aware admission (skips the
    # swapped-layout leaf families) — beat fuse-everything 36.82 vs 36.48
    # but LOST to plain XLA 36.82 vs 37.09/36.99, so auto ships XLA
    "fused_hybrid": ",kernels=pallas_opt",
    # fuse ALL big leaves incl. swapped-layout families (the r2-r4 default)
    "nola": ",kernels=pallas_opt,fused_opt_layout_aware=false",
    # r4 batched weight-norm pre-fold (W = V/||V||*g over the whole stacked
    # block subtree at once; masks applied after — exact). Won its A/B
    # 35.97 vs 31.50 (+14%, 4/4 rounds) -> now IN base; "nofold" removes it.
    "fold": ",fold_wn=true",
    "nofold": ",fold_wn=false",
    # batch 64 at fixed examples/s: reported steps/s must be doubled to
    # compare against batch-32 variants (the harness reports raw steps/s)
    "batch64": ",batch_size=64",
    "batch128": ",batch_size=128",
    "scan_b128": ",scan_blocks=true,batch_size=128",
    "batch256": ",batch_size=256",  # reference effective batch (32 x 8 GPUs)
    "batch512": ",batch_size=512",  # saturation probe beyond 256
    "batch256_ga8": ",batch_size=256,grad_accum=8",  # memory-bounded form
    # NOT parity configs — roofline probes for the h=160 tile-fragmentation
    # theory (tools/roofline.py tile_ceiling): if conv time follows PADDED
    # channel tiles, h192 costs the same as h160 and h128 is ~2.2x faster;
    # if it follows logical FLOPs, h192 is ~1.4x slower and h128 ~1.5x
    # faster. The answer decides whether h=160 has recoverable headroom.
    "h128": ",h_size=128",
    "h192": ",h_size=192",
    # r5 dispatch-chunk-size probes: same program per step, only the number
    # of steps fused per lax.scan dispatch changes (this harness uses S=25;
    # bench.py moved to S=100 on this sweep's result). Measures how much
    # per-dispatch tunnel RTT + host bookkeeping remains unamortized per
    # window.
    "s10": ("", 10),
    "s50": ("", 50),
    "s100": ("", 100),
    "s200": ("", 200),
}

BASE = ("depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,"
        "z_size=32,h_size=160,depth_ar=2,dataset=synthetic")

S = 25


def build(extra: str, s: int = S):
    """Compile one variant; returns a stateful single-chunk timer."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iaf_tpu.core.config import get_default_hparams
    from iaf_tpu.data.datasets import synthetic_dataset
    from iaf_tpu.parallel import train_step as ts
    from iaf_tpu.parallel.mesh import make_mesh

    cfg = get_default_hparams().parse(BASE + extra)
    mesh = make_mesh(cfg)
    ds = synthetic_dataset(cfg.image_size, cfg.channels,
                           n_train=max(128, cfg.batch_size), n_test=64,
                           seed=0)
    x = ds.train_x[: cfg.batch_size]
    assert x.shape[0] == cfg.batch_size, (x.shape, cfg.batch_size)
    state = ts.init_train_state(cfg, jax.random.PRNGKey(0), x)
    state = ts.place_state(state, mesh, cfg)  # avoid 2nd-call recompile
    chunk = ts.make_train_chunk(cfg, mesh, s)
    xs = jax.device_put(np.stack([x] * s),
                        NamedSharding(mesh, P(None, "data")))
    holder = {"state": state, "i": 0}

    def run_once() -> float:
        t0 = time.time()
        holder["state"], m = chunk(holder["state"],
                                   jax.random.PRNGKey(1 + holder["i"]),
                                   np.int32(holder["i"] * s), xs)
        _ = float(np.asarray(m["loss"])[-1])
        holder["i"] += 1
        return s / (time.time() - t0)

    t0 = time.time()
    warm = run_once()  # compile + first execution
    print(f"  compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)
    return run_once


def main() -> None:
    from iaf_tpu.train_lib import setup_compilation_cache
    setup_compilation_cache()
    args = sys.argv[1:]
    rounds = int(args.pop(0)) if args and args[0].isdigit() else 4
    names = args or list(VARIANTS)

    timers = {}
    for name in names:
        print(f"[ab] compiling {name}", file=sys.stderr)
        spec = VARIANTS[name]
        extra, s = spec if isinstance(spec, tuple) else (spec, S)
        try:
            timers[name] = build(extra, s)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {e}", file=sys.stderr)

    best: dict[str, float] = {}
    for r in range(rounds):
        for name, timer in timers.items():
            try:
                sps = timer()
            except Exception as e:
                print(f"[ab] r{r} {name} failed: {e}", file=sys.stderr)
                continue
            best[name] = max(best.get(name, 0.0), sps)
            print(f"[ab] round {r} {name}: {sps:.2f} steps/s "
                  f"(best {best[name]:.2f})", file=sys.stderr)
    print({k: round(v, 2) for k, v in best.items()})


if __name__ == "__main__":
    main()
