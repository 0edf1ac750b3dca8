#!/usr/bin/env python
"""Analytic roofline for the CVAE train step (SURVEY.md §4.8).

Computes MXU FLOPs per training step from the config (conv/matmul MACs x 2,
backward counted as 2x forward: dW + dx), then — given a measured steps/s —
reports achieved TFLOP/s against the chip's peak.

Usage:
  python tools/roofline.py [steps_per_sec] [--hpconfig k=v,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iaf_tpu.core.config import Config, get_default_hparams  # noqa: E402

# v5e ("TPU v5 lite") peak; bf16 systolic MACs. f32 convs lower to multi-pass
# bf16 (precision-dependent), so achieved/peak is an UPPER bound estimate.
V5E_PEAK_TFLOPS = 197.0


def conv_macs(out_px: int, kh: int, kw: int, cin: int, cout: int) -> int:
    return out_px * kh * kw * cin * cout


def train_step_flops(cfg: Config) -> dict[str, float]:
    """MXU FLOPs per train step, by component (forward; total x3 for bwd)."""
    hw = cfg.image_size // 2          # post-stem spatial size
    px = hw * hw
    ks = cfg.kernel_size
    zs, hs, ah = cfg.z_size, cfg.h_size, cfg.ar_hidden
    n_layers = cfg.num_blocks * cfg.depth

    stem = conv_macs(px, cfg.stem_kernel_size, cfg.stem_kernel_size,
                     cfg.channels, hs)
    deconv = conv_macs(px, cfg.stem_kernel_size, cfg.stem_kernel_size,
                       hs, cfg.channels)

    per_layer = (
        conv_macs(px, ks, ks, hs, 2 * zs + 2 * hs)        # up_conv1
        + conv_macs(px, ks, ks, hs, hs)                   # up_conv3
        + conv_macs(px, ks, ks, hs, 4 * zs + 2 * hs)      # down_conv1
        + conv_macs(px, ks, ks, zs + hs, hs)              # down_conv2
    )
    ar = 0
    if cfg.flow == "iaf" and cfg.depth_ar > 0:
        widths = [zs] + [ah] * cfg.depth_ar
        ar = sum(conv_macs(px, ks, ks, a, b)
                 for a, b in zip(widths[:-1], widths[1:]))
        ar += 2 * conv_macs(px, ks, ks, ah, zs)           # (m, s) heads

    macs_fwd = (stem + deconv + n_layers * (per_layer + ar)) * cfg.batch_size
    flops_fwd = 2.0 * macs_fwd
    return {
        "flops_fwd": flops_fwd,
        "flops_step": 3.0 * flops_fwd,   # fwd + dW + dx
        "ar_fraction_fwd": (2.0 * n_layers * ar * cfg.batch_size) / flops_fwd,
    }


def _pad(n: int, to: int = 128) -> int:
    return ((n + to - 1) // to) * to


def tile_ceiling(cfg: Config) -> dict[str, Any]:
    """MXU tile-fragmentation ceiling: the max fraction of peak FLOP/s this
    *model shape* can use, independent of software quality.

    The v5e MXU consumes operands in 128-lane tiles; a conv whose channel
    dims are not multiples of 128 is zero-padded up by XLA, and the padded
    MACs run at full rate but do no useful work. Per conv the attainable
    utilization is (cin/pad(cin)) * (cout/pad(cout)) (the huge M = B*H*W
    axis pads negligibly). The paper config's h_size=160 pads to 256 on
    BOTH sides of the trunk convs -> (160/256)^2 = 39% — the dominant,
    *architectural* reason measured efficiency sits near 40% of peak. The
    ceiling below weights each conv by its FLOPs (bwd passes share the same
    per-conv factor: dx contracts cout->cin, dW produces cin x cout).
    """
    hw = cfg.image_size // 2
    px = hw * hw
    ks = cfg.kernel_size
    zs, hs, ah = cfg.z_size, cfg.h_size, cfg.ar_hidden
    n_layers = cfg.num_blocks * cfg.depth
    ar_kh = 2 if cfg.ar_row_trim else ks  # trimmed AR convs have 2 live rows

    convs = [  # (name, count, kh, kw, cin, cout)
        ("stem", 1, cfg.stem_kernel_size, cfg.stem_kernel_size,
         cfg.channels, hs),
        ("deconv", 1, cfg.stem_kernel_size, cfg.stem_kernel_size,
         hs, cfg.channels),
        ("up_conv1", n_layers, ks, ks, hs, 2 * zs + 2 * hs),
        ("up_conv3", n_layers, ks, ks, hs, hs),
        ("down_conv1", n_layers, ks, ks, hs, 4 * zs + 2 * hs),
        ("down_conv2", n_layers, ks, ks, zs + hs, hs),
    ]
    if cfg.flow == "iaf" and cfg.depth_ar > 0:
        widths = [zs] + [ah] * cfg.depth_ar
        for i, (a, b) in enumerate(zip(widths[:-1], widths[1:])):
            convs.append((f"ar_hidden_{i}", n_layers, ar_kh, ks, a, b))
        convs.append(("ar_heads", n_layers, ar_kh, ks, ah, 2 * zs))

    rows, logical, padded = [], 0.0, 0.0
    for name, count, kh, kw, cin, cout in convs:
        lg = count * conv_macs(px, kh, kw, cin, cout)
        pd = count * conv_macs(px, kh, kw, _pad(cin), _pad(cout))
        rows.append((name, lg / pd, lg))
        logical += lg
        padded += pd
    return {"ceiling": logical / padded, "per_conv": rows,
            "logical_macs_fwd": logical * cfg.batch_size}


def main() -> None:
    sps = None
    spec = ""
    args = list(sys.argv[1:])
    if args and not args[0].startswith("--"):
        sps = float(args.pop(0))
    if args[:1] == ["--hpconfig"]:
        spec = args[1]
    cfg = get_default_hparams().parse(
        "depth=1,num_blocks=20,kl_min=0.25,batch_size=32,z_size=32,"
        "h_size=160,depth_ar=2").parse(spec)
    r = train_step_flops(cfg)
    print(f"config: {cfg.num_blocks * cfg.depth} layers, h={cfg.h_size}, "
          f"z={cfg.z_size}, depth_ar={cfg.depth_ar}, B={cfg.batch_size}")
    print(f"forward FLOPs/step:  {r['flops_fwd']:.3e}")
    print(f"train   FLOPs/step:  {r['flops_step']:.3e} (fwd + dW + dx)")
    print(f"AR-conv share of forward: {100 * r['ar_fraction_fwd']:.1f}%")
    tc = tile_ceiling(cfg)
    print(f"\nMXU 128-lane tile-fragmentation ceiling: "
          f"{100 * tc['ceiling']:.1f}% of peak "
          f"= {tc['ceiling'] * V5E_PEAK_TFLOPS:.1f} TFLOP/s attainable")
    for name, util, lg in sorted(tc["per_conv"], key=lambda t: -t[2]):
        print(f"  {name:12s} util ceiling {100 * util:5.1f}%  "
              f"({100 * lg / tc['logical_macs_fwd'] * cfg.batch_size:.1f}% "
              f"of fwd FLOPs)")
    if sps:
        achieved = r["flops_step"] * sps / 1e12
        print(f"\nat {sps:.2f} steps/s: {achieved:.1f} TFLOP/s "
              f"= {100 * achieved / V5E_PEAK_TFLOPS:.1f}% of v5e bf16 peak, "
              f"{100 * achieved / (tc['ceiling'] * V5E_PEAK_TFLOPS):.1f}% "
              f"of the shape's tile ceiling")


if __name__ == "__main__":
    main()
