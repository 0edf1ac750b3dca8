"""Checkpoint / resume.

Reference parity: ``tf.train.Saver`` via Supervisor (periodic, raw + EMA
shadow vars; eval restores EMA) and ``tf_utils/common.py —
CheckpointLoader`` (eval process polls the train logdir for new
checkpoints). (SURVEY.md §5.3/§5.4.)

TPU-native: the full ``{step, params, ema, adamax m/u, rng}`` pytree is
written as one ``.npz`` with path-flattened keys, atomically (tmp+rename)
from process 0 after a global barrier; resume restores exact optimizer slots
(the Adamax ``u`` infinity-norm accumulator is state, not derivable) and
re-shards via ``device_put`` with the target sharding.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np

_SEP = "//"


def flatten_pytree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{_SEP}{k}" if prefix else k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{_SEP}{i}" if prefix else str(i)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_pytree(flat: dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for key, val in flat.items():
        node = root
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def _barrier(name: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def save(logdir: str, step: int, tree: Any, keep: int = 5) -> str:
    """Atomic checkpoint write from process 0 with an all-host barrier.

    ``keep`` retains only the newest N checkpoints (``tf.train.Saver``'s
    ``max_to_keep=5`` default); 0 keeps everything.
    """
    path = os.path.join(logdir, f"ckpt-{step:09d}.npz")
    _barrier(f"ckpt_pre_{step}")
    if jax.process_index() == 0:
        os.makedirs(logdir, exist_ok=True)
        flat = flatten_pytree(jax.device_get(tree))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.rename(tmp, path)
        if keep:
            ckpts = sorted(p for p in os.listdir(logdir)
                           if re.fullmatch(r"ckpt-\d+\.npz", p))
            for old in ckpts[:-keep]:
                os.remove(os.path.join(logdir, old))
    _barrier(f"ckpt_post_{step}")
    return path


def latest_checkpoint(logdir: str) -> str | None:
    """Newest complete checkpoint in ``logdir`` (CheckpointLoader-style
    polling primitive for a concurrent eval process)."""
    if not os.path.isdir(logdir):
        return None
    ckpts = sorted(p for p in os.listdir(logdir)
                   if re.fullmatch(r"ckpt-\d+\.npz", p))
    return os.path.join(logdir, ckpts[-1]) if ckpts else None


def restore(path: str, shardings: Any | None = None) -> Any:
    """Load a checkpoint pytree; optionally place each leaf with the target
    sharding (single-host <-> multi-host re-sharding)."""
    with np.load(path) as f:
        flat = {k: f[k] for k in f.files}
    tree = unflatten_pytree(flat)
    if shardings is not None:
        tree = jax.tree.map(
            lambda leaf, sh: jax.device_put(leaf, sh), tree, shardings)
    return tree


class CheckpointLoader:
    """Polls a logdir for new checkpoints (``tf_utils/common.py`` parity):
    lets a separate eval process track a live training run."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        self._seen: str | None = None

    def maybe_load(self) -> tuple[str, Any] | None:
        path = latest_checkpoint(self.logdir)
        if path is None or path == self._seen:
            return None
        self._seen = path
        return path, restore(path)
