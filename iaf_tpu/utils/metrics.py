"""Metrics / observability: JSONL metrics file + stdout step logs.

Reference parity: ``tf.summary`` scalars + TensorBoard (SURVEY.md §5.5).
First-class metrics here include per-layer KL (free-bits collapse
diagnosis), steps/s and scaling-efficiency counters (north-star
deliverables).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricsLogger:
    def __init__(self, logdir: str, filename: str = "metrics.jsonl",
                 enabled: bool = True):
        self.enabled = enabled
        self.path = os.path.join(logdir, filename)
        if enabled:
            os.makedirs(logdir, exist_ok=True)
            self._f = open(self.path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, **metrics: Any) -> None:
        if not self.enabled:
            return
        rec = {"step": int(step), "wall": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        if self.enabled:
            self._f.close()


def img_tile(images, pad: int = 1):
    """Tile [N,H,W,C] uint8 images into one grid image
    (``tf_utils/common.py — img_tile`` parity)."""
    import numpy as np

    images = np.asarray(images)
    n, h, w, c = images.shape
    side = int(np.ceil(np.sqrt(n)))
    grid = np.zeros((side * (h + pad) - pad, side * (w + pad) - pad, c),
                    images.dtype)
    for i in range(n):
        r, col = divmod(i, side)
        grid[r * (h + pad):r * (h + pad) + h,
             col * (w + pad):col * (w + pad) + w] = images[i]
    return grid
