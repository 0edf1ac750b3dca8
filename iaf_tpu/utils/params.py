"""Parameter-tree introspection.

Reference parity: ``tf_utils/common.py — find_trainable_variables`` (the
reference greps the TF graph's trainable collection; here the params pytree
IS the collection, so these are pure-tree utilities).
"""

from __future__ import annotations

import jax
import numpy as np


def find_trainable_variables(params, prefix: str = "") -> list[tuple[str, tuple]]:
    """Flat (path, shape) list, optionally filtered by path prefix."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name.startswith(prefix):
            out.append((name, tuple(np.shape(leaf))))
    return out


def param_count(params) -> int:
    return sum(int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(params))


def describe(params, max_rows: int = 0) -> str:
    """Human-readable parameter summary (total + optional per-leaf rows)."""
    rows = find_trainable_variables(params)
    total = param_count(params)
    lines = [f"{total:,} parameters in {len(rows)} arrays"]
    if max_rows:
        for name, shape in rows[:max_rows]:
            lines.append(f"  {name}: {shape}")
        if len(rows) > max_rows:
            lines.append(f"  ... ({len(rows) - max_rows} more)")
    return "\n".join(lines)
