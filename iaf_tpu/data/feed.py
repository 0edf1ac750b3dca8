"""Per-host sharded input feed: numpy on host -> globally-sharded device
arrays.

Replaces the reference's TF input-queue runners (``tf_utils/data_utils.py``,
SURVEY.md §2.1 "CPU input pipeline -> sharded device feed"). Each process
draws only its own shard of every global batch — a pure function of
``(process_index, process_count)`` so multi-host logic is unit-testable on a
single host (SURVEY.md §4.6) — and ``jax.make_array_from_process_local_data``
assembles the global array with the target NamedSharding.
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def host_shard_indices(n: int, process_index: int, process_count: int,
                       rng: np.random.RandomState) -> np.ndarray:
    """One epoch's sample indices for this host: a globally-agreed
    permutation (same seed on every host), statically split by process."""
    perm = rng.permutation(n)
    per = n // process_count
    return perm[process_index * per:(process_index + 1) * per]


def batch_iterator(images: np.ndarray, global_batch: int, seed: int,
                   process_index: int | None = None,
                   process_count: int | None = None) -> Iterator[np.ndarray]:
    """Infinite iterator of this host's [global_batch / nprocs, ...] slices.
    Epoch permutations are derived from (seed, epoch) so every host agrees."""
    pidx = jax.process_index() if process_index is None else process_index
    pcnt = jax.process_count() if process_count is None else process_count
    assert global_batch % pcnt == 0, (global_batch, pcnt)
    local_batch = global_batch // pcnt
    epoch = 0
    while True:
        rng = np.random.RandomState((seed * 1_000_003 + epoch) % (2**31 - 1))
        idx = host_shard_indices(len(images), pidx, pcnt, rng)
        for start in range(0, len(idx) - local_batch + 1, local_batch):
            yield images[idx[start:start + local_batch]]
        epoch += 1


def make_global_batch(local_batch: np.ndarray, mesh: jax.sharding.Mesh,
                      axis: str = "data") -> jax.Array:
    """Assemble a globally batch-sharded array from this host's slice."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def make_global_chunk(local_batches: np.ndarray, mesh: jax.sharding.Mesh,
                      axis: str = "data") -> jax.Array:
    """Assemble a [steps, global_batch, ...] array (multi-step dispatch):
    replicated over the leading steps axis, batch-sharded on ``axis``."""
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.make_array_from_process_local_data(sharding, local_batches)


def dynamic_binarize(batch: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """MNIST dynamic binarization (Theano ``train.py`` parity): sample each
    pixel Bernoulli(intensity/255) fresh every epoch, returned as uint8*255
    so the model-side /256 preprocessing still applies."""
    p = batch.astype(np.float32) / 255.0
    return (rng.uniform(size=batch.shape) < p).astype(np.uint8) * 255
