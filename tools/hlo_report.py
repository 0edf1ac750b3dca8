#!/usr/bin/env python
"""Compiled-program attribution without a profiler service (SURVEY §5.1).

The axon-tunneled TPU offers no xprof endpoint, so runtime traces cannot be
captured on this rig (PARITY.md "Known gaps"); attribution has rested on
the ablation harness (tools/decompose_bench.py) alone. This tool extracts
the COMPILER's view instead: it lowers + compiles the train step (and the
k-chunked eval step with ``--eval``) for the current backend — from
abstract ShapeDtypeStructs, so nothing executes and no init pass runs —
and reports:

  * XLA cost analysis: FLOPs, bytes accessed, transcendentals — checked
    against the analytic roofline (tools/roofline.py) so either model
    being wrong shows up as a ratio far from 1;
  * memory analysis: argument/output/temp/peak bytes (HBM plan on TPU);
  * optimized-HLO composition: fusion count, custom calls (= Pallas
    kernels on TPU), collectives (all-reduce etc.), total instructions.

One JSON line on stdout (plus a readable breakdown on stderr); diffable
round over round. Works on CPU (``--cpu``) for structure/FLOPs and on TPU
for the real memory plan + Mosaic custom calls.

Usage: python tools/hlo_report.py [--cpu] [--eval] [--hpconfig k=v,...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = ("depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32,"
        "z_size=32,h_size=160,depth_ar=2,dataset=synthetic")


def hlo_stats(text: str) -> dict:
    """Composition counts over optimized HLO text."""
    return {
        "instructions": len(re.findall(r"^\s+\S+ = ", text, re.M)),
        "fusions": len(re.findall(r"^\s+\S+ = \S* fusion\(", text, re.M)),
        "custom_calls": len(re.findall(r"custom-call", text)),
        "collectives": len(re.findall(
            r"all-reduce|all-gather|reduce-scatter|collective-permute",
            text)),
        "convolutions": len(re.findall(r"= \S* convolution\(", text)),
        "hlo_bytes": len(text),
    }


def analyze(name: str, jfn, args, out: dict) -> None:
    lowered = jfn.lower(*args)
    compiled = lowered.compile()
    rec: dict = {}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        rec["xla_flops"] = float(ca.get("flops", float("nan")))
        rec["xla_bytes_accessed"] = float(ca.get("bytes accessed",
                                                 float("nan")))
        rec["xla_transcendentals"] = float(ca.get("transcendentals", 0.0))
    except Exception as e:
        print(f"[hlo] {name}: cost_analysis unavailable: {e}",
              file=sys.stderr)
    try:
        ma = compiled.memory_analysis()
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                rec[k] = int(v)
        peak = getattr(ma, "peak_memory_in_bytes", None)
        if peak:
            rec["peak_memory_in_bytes"] = int(peak)
    except Exception as e:
        print(f"[hlo] {name}: memory_analysis unavailable: {e}",
              file=sys.stderr)
    try:
        rec.update(hlo_stats(compiled.as_text()))
    except Exception as e:
        print(f"[hlo] {name}: as_text unavailable: {e}", file=sys.stderr)
    out[name] = rec
    pretty = {k: (round(v / 1e9, 3) if "flops" in k or "bytes" in k else v)
              for k, v in rec.items()}
    print(f"[hlo] {name} (GF/GB where applicable): {pretty}",
          file=sys.stderr)


def main() -> None:
    args = sys.argv[1:]
    if "--cpu" in args:
        args.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
    want_eval = "--eval" in args
    if want_eval:
        args.remove("--eval")
    extra = ""
    if args and args[0] == "--hpconfig":
        extra = "," + args[1]

    import jax

    from iaf_tpu.core.config import get_default_hparams
    from iaf_tpu.parallel import train_step as ts
    from iaf_tpu.parallel.mesh import make_mesh

    cfg = get_default_hparams().parse(BASE + extra)
    mesh = make_mesh(cfg)

    # Abstract state: eval_shape of the real init — nothing executes.
    batch_sds = jax.ShapeDtypeStruct(
        (cfg.batch_size, cfg.image_size, cfg.image_size, cfg.channels),
        jax.numpy.uint8)
    key_sds = jax.ShapeDtypeStruct((2,), jax.numpy.uint32)
    state_sds = jax.eval_shape(
        lambda k, b: ts.init_train_state(cfg, k, b), key_sds, batch_sds)

    out: dict = {"backend": jax.default_backend(),
                 "devices": len(jax.devices()),
                 "config": BASE + extra}
    analyze("train_step", ts.make_train_step(cfg, mesh),
            (state_sds, key_sds, batch_sds), out)

    if want_eval:
        from iaf_tpu.parallel import eval_step as ev
        k = max(mesh.shape["data"], cfg.eval_k_chunk * mesh.shape["data"])
        eval_fn = ev.make_eval_step(cfg, mesh, k=k)
        ebatch = jax.ShapeDtypeStruct(
            (cfg.eval_batch_size, cfg.image_size, cfg.image_size,
             cfg.channels), jax.numpy.uint8)
        params_sds = state_sds.opt.ema
        analyze(f"eval_step_k{k}", eval_fn, (params_sds, key_sds, ebatch),
                out)

    # sanity ratio vs the analytic roofline model
    try:
        from tools.roofline import train_step_flops
        analytic = train_step_flops(cfg)["flops_step"]
        xf = out["train_step"].get("xla_flops")
        if xf and xf == xf:
            out["xla_vs_analytic_flops"] = round(xf / analytic, 3)
    except Exception as e:
        print(f"[hlo] roofline compare skipped: {e}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
