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
# kernels="auto". As of r5 the set is EMPTY — every kernel class measured
# slower than XLA's compiled form in its latest controlled A/B:
#
# - "optimizer" (ops/fused_adamax.py, single-HBM-pass Adamax+Polyak with
#   input_output_aliases): won its r2 A/B (33.51 vs 33.16) and the r4
#   re-verify (33.65 vs 33.14) under heavy shared-chip contention, but the
#   r5 re-measure at low contention flipped it: plain XLA 36.99/37.09 vs
#   fused 36.70/36.82, ahead in ~14/16 interleaved rounds over two
#   sessions — consistent with the r4b ablation (full_xla_opt 27.16 ms vs
#   full 27.62 ms). XLA splits the update into schedulable fusions that
#   overlap the backward's DMA tail; the monolithic custom call cannot,
#   and Mosaic's default-layout requirement forces relayout copies on the
#   swapped-layout leaf families (see optim._auto_prefers_swapped).
#   Trajectories are bit-exact either way (tests/test_kernels.py).
# - conv kernels stay OUT: the naive per-image im2col conv lost (28.3 vs
#   35.0 steps/s, r1), the fused whole-chain AR-stack kernel with static
#   zero-tap skipping lost (24.52 vs 33.24, r2), and the live-tap-im2col
#   variant lost (24.73 vs 33.66, r4) — XLA's conv emitter flattens the
#   tap x cin contraction into near-fully-utilized MXU tiles, which beats
#   per-tap matmuls even though the per-tap form skips 4/9 taps outright
#   (see PARITY.md "Pallas verdict").
# - "elementwise" lost r4 (fused disc-logistic 32.96 vs 33.14; full
#   pallas_elem 24.51: every pallas_call is a fusion barrier).
_AUTO_WINS: frozenset[str] = frozenset()


def use_pallas(kernels: str, op: str = "elementwise") -> bool:
    """Resolve the config ``kernels`` switch per op class
    (op in {"conv", "ar_stack", "optimizer", "elementwise"}).

    "pallas" forces everything; "xla" disables everything. "auto" admits an
    op class only once it has measured FASTER than its XLA twin on TPU in an
    HONEST A/B (tools/ab_bench.py: value-fetch timed, contention-interleaved
    — earlier dispatch-latency-bound timings were invalid). As of the r5
    sweep (paper config, v5e) auto admits NOTHING: every Pallas challenger
    lost its latest controlled A/B to XLA's compiled form — the conv
    kernels (naive im2col r1 28.3; fused zero-tap per-tap AR-stack r2
    24.51; live-tap-im2col AR-stack r4 24.73, vs XLA 33.66), the
    elementwise class (fused disc-logistic alone 32.96 vs 33.14; full
    pallas_elem 24.51: each pallas_call in the 20-layer flow is a fusion
    barrier forcing z/m/s/logqs HBM round trips XLA fuses away), and — new
    in r5 — the fused optimizer (36.70/36.82 vs plain XLA 36.99/37.09 at
    low contention, flipping its r2/r4 heavy-contention wins; see the
    ``_AUTO_WINS`` note). Kernels enter or leave auto only behind a
    measured A/B; every kernel stays reachable via the isolation switches
    below as tested evidence.
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
