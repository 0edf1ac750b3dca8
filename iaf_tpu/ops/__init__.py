"""Pallas kernels for the hot ops, each with an XLA twin used as fallback
and correctness oracle (SURVEY.md §7.4)."""

import jax

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


def use_pallas(kernels: str, op: str = "elementwise") -> bool:
    """Resolve the config ``kernels`` switch per op class.

    "pallas" forces everything; "xla" disables everything. "auto" admits an
    op class only once it has measured FASTER than its XLA twin on TPU in an
    HONEST A/B (tools/ab_bench.py: value-fetch timed, contention-interleaved
    — earlier dispatch-latency-bound timings were invalid). As of the last
    sweep (paper config, v5e), auto selects XLA everywhere: XLA 35.0 vs
    Pallas-conv 28.3 steps/s — XLA's tuned convs beat the im2col kernel, and
    the fused elementwise kernels don't pay for their call overhead on this
    conv-dominated model. The Pallas kernels
    stay available and tested and re-enter auto only behind a winning A/B.
    """
    del op
    if kernels == "pallas":
        return True
    return False
