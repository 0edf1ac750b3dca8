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
                   process_count: int | None = None,
                   start_step: int = 0) -> Iterator[np.ndarray]:
    """Infinite iterator of this host's [global_batch / nprocs, ...] slices.
    Epoch permutations are derived from (seed, epoch) so every host agrees.

    ``start_step`` fast-forwards the data order on checkpoint resume: the
    stream is a pure function of (seed, step), so a resumed run continues
    with the batches an uninterrupted run would have seen instead of
    replaying epoch 0 (the bit-exact-resume discipline extended to data
    order)."""
    pidx = jax.process_index() if process_index is None else process_index
    pcnt = jax.process_count() if process_count is None else process_count
    assert global_batch % pcnt == 0, (global_batch, pcnt)
    local_batch = global_batch // pcnt
    per_host = len(images) // pcnt
    if local_batch > per_host:
        # would otherwise spin forever yielding nothing (every epoch's
        # start range is empty)
        raise ValueError(
            f"per-host batch {local_batch} exceeds the per-host dataset "
            f"size {per_host} ({len(images)} examples / {pcnt} hosts)")
    batches_per_epoch = max(1, per_host // local_batch)
    epoch = start_step // batches_per_epoch
    skip = start_step % batches_per_epoch
    while True:
        rng = np.random.RandomState((seed * 1_000_003 + epoch) % (2**31 - 1))
        idx = host_shard_indices(len(images), pidx, pcnt, rng)
        starts = range(0, len(idx) - local_batch + 1, local_batch)
        for start in list(starts)[skip:]:
            yield images[idx[start:start + local_batch]]
        skip = 0
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


class ChunkPrefetcher:
    """Double-buffered input assembly (the reference's TF queue-runner
    overlap, SURVEY.md §2.1): a background thread stacks the next dispatch's
    ``steps_per_dispatch`` local batches and places them on the mesh while
    the device executes the current chunk. Yields ``(n_steps, global_array)``
    — a [S, B, ...] chunk when S > 1, a [B, ...] batch when S == 1 — and
    sizes the final tail chunk so exactly ``total_steps - start_step`` steps
    are produced."""

    def __init__(self, data_iter, mesh, steps_per_dispatch: int,
                 total_steps: int, start_step: int = 0, first_local=None,
                 depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err: BaseException | None = None
        self._stop = threading.Event()
        self._done = False  # terminal: repeated __next__ keeps raising
        S = max(1, steps_per_dispatch)

        def put(item) -> bool:
            # Bounded put that also watches the stop event: an aborting
            # consumer (exception in the train loop) sets it via close(),
            # and the worker must not stay blocked on a full queue holding
            # device-placed chunks for the life of the process (ADVICE r2).
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                step = start_step
                first = first_local
                while step < total_steps and not self._stop.is_set():
                    n = min(S, total_steps - step)
                    locals_ = []
                    for _ in range(n):
                        if first is not None:
                            locals_.append(first)
                            first = None
                        else:
                            locals_.append(next(data_iter))
                    if S > 1:
                        chunk = make_global_chunk(np.stack(locals_), mesh)
                    else:
                        chunk = make_global_batch(locals_[0], mesh)
                    if not put((n, chunk)):
                        return
                    step += n
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                put(None)

        self._t = threading.Thread(target=worker, daemon=True,
                                   name="iaf-input-prefetch")
        self._t.start()

    def close(self) -> None:
        """Release the worker thread and its queued device chunks. Safe to
        call repeatedly; called from train()'s finally so an aborted run
        (fault injection, any train-loop exception) does not strand the
        thread blocked on the bounded queue."""
        self._stop.set()
        # Drain so a put()-blocked worker wakes promptly, then join.
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._t.join(timeout=5.0)
        if self._t.is_alive():
            # e.g. blocked inside a device transfer on a dead tunnel: the
            # daemon thread cannot be killed, but its survival must be
            # VISIBLE, not silently reported as a clean shutdown (ADVICE r3)
            print("[feed] WARNING: prefetch worker still alive after 5s "
                  "join (likely stuck in a device transfer); it remains a "
                  "daemon thread and will not block process exit")
        self._done = True

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:  # terminal state: never block on q.get() again
            raise StopIteration
        item = self._q.get()
        if item is None:
            self._done = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def dynamic_binarize(batch: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """MNIST dynamic binarization (Theano ``train.py`` parity): sample each
    pixel Bernoulli(intensity/255) fresh every epoch, returned as uint8*255
    so the model-side /256 preprocessing still applies."""
    p = batch.astype(np.float32) / 255.0
    return (rng.uniform(size=batch.shape) < p).astype(np.uint8) * 255


def binarize_rng(seed: int, step: int) -> np.random.RandomState:
    """Per-step binarization RNG: pure function of (seed, step) so resumed
    runs binarize identically to uninterrupted ones."""
    return np.random.RandomState((seed * 9_176_471 + 17 + step) % (2**31 - 1))


def binarized_iterator(it: Iterator[np.ndarray], seed: int,
                       start_step: int = 0) -> Iterator[np.ndarray]:
    """Dynamic binarization keyed by (seed, step); resume-consistent."""
    step = start_step
    for b in it:
        yield dynamic_binarize(b, binarize_rng(seed, step))
        step += 1
