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
    op class only once it has measured FASTER than its XLA twin on TPU.
    A/B on v5e, paper config train steps/s: XLA 169.9; Pallas im2col masked
    conv 98.9 (per-example grid loses to XLA's tuned conv); Pallas fused
    disc-logistic 134.8 (tiny per-example programs + broken epilogue fusion).
    So auto currently selects XLA everywhere; the Pallas kernels stay
    available and tested, and re-enter auto only behind a winning A/B
    (next: a blocked, pipelined fused AR-chain kernel).
    """
    del op
    if kernels == "pallas":
        return True
    return False
