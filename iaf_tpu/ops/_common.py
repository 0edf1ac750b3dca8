"""Shared helpers for the Pallas kernels (single definition so the
interpret-mode policy can never drift between kernels)."""

from __future__ import annotations

import jax


def use_interpret() -> bool:
    """Run pallas_call in interpret mode off-TPU (CPU tests, goldens);
    compile through Mosaic on a real TPU backend."""
    return jax.default_backend() != "tpu"
