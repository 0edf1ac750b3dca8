#!/usr/bin/env python
"""CLI driver, reference-compatible (``tf_train.py`` flags, SURVEY.md §2.1):

    python train.py --logdir /tmp/iaf --hpconfig depth=1,num_blocks=20,\
kl_min=0.25,learning_rate=0.002,batch_size=32 --mode train
    python train.py --logdir /tmp/iaf --mode eval_test
    python train.py --logdir /tmp/iaf --mode sample --num_samples 16

``--num_gpus`` is accepted for command-line parity with the reference but
ignored: device count comes from the mesh (all visible chips by default).
"""

from __future__ import annotations

import argparse

from iaf_tpu.core.config import resolve_config
from iaf_tpu import train_lib


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--logdir", type=str, default="/tmp/iaf_tpu")
    p.add_argument("--hpconfig", type=str, default="",
                   help="comma-separated k=v hyperparameter overrides")
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "eval_train", "eval_test", "eval_loop",
                            "sample", "recon", "invert_check", "export"])
    p.add_argument("--export_platforms", type=str, default="",
                   help="comma list (e.g. tpu,cpu) of lowering platforms "
                   "for --mode export; default: current backend")
    p.add_argument("--num_gpus", type=int, default=None,
                   help="reference-CLI parity; ignored (mesh uses all chips)")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--max_batches", type=int, default=None,
                   help="cap eval batches (eval_* modes); partial progress "
                   "of a full eval persists to the logdir either way")
    # --temperature accepts a single value or a comma list for a sweep
    p.add_argument("--temperature", type=str, default="1.0")
    p.add_argument("--profile_dir", type=str, default="",
                   help="enable jax.profiler traces into this dir")
    args = p.parse_args()

    # Saved hps.json in the logdir (written by train) is the base config, so
    # eval/sample/invert runs reproduce the trained architecture without
    # repeating --hpconfig; explicit --hpconfig still overrides.
    cfg = resolve_config(args.logdir, args.hpconfig, mode=args.mode)

    # Data-availability probe (real-data readiness): say up front whether
    # this run uses real archives or the synthetic fallback.
    if cfg.dataset in ("cifar10", "mnist"):
        from iaf_tpu.data.datasets import real_data_available
        found = real_data_available(cfg.dataset, cfg.data_dir)
        if found:
            print(f"[data] real {cfg.dataset} found at {found}")
        else:
            print(f"[data] no real {cfg.dataset} on disk (searched ./data, "
                  "$IAF_DATA_DIR, /root/data, /data, /datasets, ~/data) -> "
                  "synthetic fallback; quality gates need the real archives")

    tracing = False
    if args.profile_dir:
        import jax
        # start_trace hangs on tunneled/experimental backends (axon): the
        # remote device offers no profiler service. Trace only platforms
        # with known local profiler support; degrade with a warning else.
        if jax.default_backend() in ("tpu", "cpu", "gpu"):
            jax.profiler.start_trace(args.profile_dir)
            tracing = True
        else:
            print(f"[profile] backend {jax.default_backend()!r} has no "
                  "profiler service; skipping trace")
    try:
        if args.mode == "train":
            train_lib.train(cfg)
        elif args.mode in ("eval_train", "eval_test"):
            # killed long evals resume mid-split from this file (exact):
            train_lib.evaluate(
                cfg, mode=args.mode, max_batches=args.max_batches,
                progress_path=f"{args.logdir}/eval_progress_{args.mode}.json")
        elif args.mode == "eval_loop":
            train_lib.eval_loop(cfg, max_batches=args.max_batches)
        elif args.mode == "invert_check":
            train_lib.invert_check(cfg)
        elif args.mode == "recon":
            train_lib.reconstruct(cfg, num=args.num_samples,
                                  out_path=f"{args.logdir}/recons.npy")
        elif args.mode == "sample":
            train_lib.sample(cfg, num=args.num_samples,
                             temperature=[float(t) for t in
                                          args.temperature.split(",")],
                             out_path=f"{args.logdir}/samples.npy")
        elif args.mode == "export":
            train_lib.export_saved(
                cfg, num_samples=args.num_samples,
                platforms=(args.export_platforms.split(",")
                           if args.export_platforms else None))
    finally:
        if tracing:
            import jax
            jax.profiler.stop_trace()


if __name__ == "__main__":
    main()
