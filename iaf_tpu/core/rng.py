"""RNG key discipline.

The reference used TF's stateful global PRNG (and numpy for init); we use
explicit threefry key threading: every stochastic site derives its key by
folding a stable hash of its name path into the step key. This makes runs
reproducible across shardings and process counts (the key stream is a pure
function of (seed, step, site path), never of device layout).
"""

from __future__ import annotations

import zlib

import jax


def stable_hash(name: str) -> int:
    """Deterministic 32-bit hash of a site path (crc32: stable across runs,
    processes and Python versions, unlike ``hash``)."""
    return zlib.crc32(name.encode("utf-8"))


def fold_name(key: jax.Array, name: str) -> jax.Array:
    """Derive a per-site key from ``key`` and a string path."""
    return jax.random.fold_in(key, stable_hash(name))


def step_key(base: jax.Array, step) -> jax.Array:
    """Per-step key: fold the step counter into the run key."""
    return jax.random.fold_in(base, step)
