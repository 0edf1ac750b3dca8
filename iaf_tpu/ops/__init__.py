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


def use_pallas(kernels: str) -> bool:
    """Resolve the config ``kernels`` switch: auto = Pallas only on TPU."""
    if kernels == "pallas":
        return True
    if kernels == "xla":
        return False
    return jax.default_backend() == "tpu"
