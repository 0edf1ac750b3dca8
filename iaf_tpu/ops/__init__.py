"""Pallas kernels for the hot ops, each with an XLA twin used as fallback
and correctness oracle (SURVEY.md §7.4)."""

import jax

from iaf_tpu.ops.ar_stack import (  # noqa: F401
    ar_stack_fused,
    ar_stack_xla,
)
from iaf_tpu.ops.fused import (  # noqa: F401
    disc_logistic_logp,
    disc_logistic_xla,
    iaf_update,
    iaf_update_xla,
)
from iaf_tpu.ops.masked_conv import (  # noqa: F401
    fold_mask,
    masked_conv2d,
    xla_conv2d_same,
)

# Op classes that have WON an honest interleaved A/B against their XLA twin
# on TPU (tools/ab_bench.py; value-fetch timed). Only these are admitted by
# kernels="auto".
#
# - "optimizer" (ops/fused_adamax.py, single-HBM-pass Adamax+Polyak with
#   input_output_aliases): WON 33.51 vs 33.16 steps/s, ahead in 6/6
#   interleaved rounds (r2); trajectory bit-exact vs the XLA update on TPU.
#   The aliasing is load-bearing: without it XLA copies all four state
#   buffers into the custom call and the same kernel LOSES 27.3 vs 33.1.
# - conv kernels stay OUT: the naive per-image im2col conv lost (28.3 vs
#   35.0 steps/s, r1) and the fused whole-chain AR-stack kernel with static
#   zero-tap skipping ALSO lost (24.52 vs 33.24, r2) — XLA's conv emitter
#   flattens the tap x cin contraction into near-fully-utilized MXU tiles,
#   which beats per-tap matmuls even though the per-tap form skips 4/9 taps
#   outright (see PARITY.md "Pallas verdict").
_AUTO_WINS: frozenset[str] = frozenset({"optimizer"})


def use_pallas(kernels: str, op: str = "elementwise") -> bool:
    """Resolve the config ``kernels`` switch per op class
    (op in {"conv", "ar_stack", "optimizer", "elementwise"} — "optimizer"
    is the one class "auto" currently admits on TPU).

    "pallas" forces everything; "xla" disables everything. "auto" admits an
    op class only once it has measured FASTER than its XLA twin on TPU in an
    HONEST A/B (tools/ab_bench.py: value-fetch timed, contention-interleaved
    — earlier dispatch-latency-bound timings were invalid). As of the last
    sweep (paper config, v5e), auto admits the fused optimizer kernel
    (won 33.51 vs 33.16 r2; re-verified 33.65 vs 33.14 r4, bit-exact) and
    rejects the conv kernels — XLA's tuned convs beat ALL THREE Pallas
    challengers (naive im2col r1 28.3; fused zero-tap per-tap AR-stack r2
    24.51; live-tap-im2col AR-stack r4 24.73, vs XLA 33.66) — and the
    elementwise class: the fused disc-logistic alone lost by ~0.5%
    (32.96 vs 33.14), and with the fused IAF-update kernel wired in,
    pallas_elem measured 24.51 vs xla_opt 33.28 (r4): each pallas_call in
    the 20-layer flow is a fusion barrier forcing z/m/s/logqs HBM round
    trips XLA would otherwise fuse away. Kernels enter or leave auto only
    behind a measured A/B.
    """
    if kernels == "pallas":
        return True
    if kernels == "pallas_ar":  # isolate the fused AR-stack kernel in A/Bs
        return op == "ar_stack"
    if kernels == "pallas_opt":  # isolate the fused optimizer kernel
        return op == "optimizer"
    if kernels == "pallas_elem":  # isolate the fused elementwise kernels
        return op == "elementwise"  # (disc_logistic likelihood)
    if kernels == "auto":
        return op in _AUTO_WINS and jax.default_backend() == "tpu"
    return False
