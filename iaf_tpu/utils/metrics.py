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
                 enabled: bool = True, tensorboard: bool = False):
        self.enabled = enabled
        self.path = os.path.join(logdir, filename)
        self._tb = None
        if enabled:
            os.makedirs(logdir, exist_ok=True)
            self._f = open(self.path, "a", buffering=1)
            if tensorboard:
                try:  # torch's TB writer: no TF dependency
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(log_dir=os.path.join(logdir, "tb"))
                except Exception as e:
                    print(f"[metrics] tensorboard writer unavailable: {e}")
        self._t0 = time.time()

    def log(self, step: int, **metrics: Any) -> None:
        if not self.enabled:
            return
        import numpy as _np

        rec = {"step": int(step), "wall": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                arr = _np.asarray(v)
                if arr.size == 1:  # scalar (incl. shape-(1,...) wrappers)
                    rec[k] = float(arr.reshape(()))
                else:  # vector metrics (e.g. per-layer KL)
                    rec[k] = [round(float(e), 6) for e in arr.ravel()]
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k in ("step", "wall"):
                    continue
                if isinstance(v, float):
                    self._tb.add_scalar(k, v, rec["step"])
                elif isinstance(v, list):  # per-layer vectors
                    for i, e in enumerate(v):
                        self._tb.add_scalar(f"{k}/{i}", e, rec["step"])

    def log_image(self, tag: str, image, step: int) -> None:
        """HWC uint8 image tile (sample/recon; ``img_tile`` summaries in the
        reference train loop): saved as logdir/images/<tag>_<step>.png (plus
        the raw .npy) and mirrored to TB when enabled."""
        if not self.enabled:
            return
        import numpy as np
        image = np.asarray(image)
        img_dir = os.path.join(os.path.dirname(self.path), "images")
        os.makedirs(img_dir, exist_ok=True)
        np.save(os.path.join(img_dir, f"{tag}_{step:08d}.npy"), image)
        try:  # directly viewable tile (the reference's TB image summaries)
            from PIL import Image
            arr = image[..., 0] if image.ndim == 3 and image.shape[-1] == 1 \
                else image
            Image.fromarray(arr).save(
                os.path.join(img_dir, f"{tag}_{step:08d}.png"))
        except Exception:  # PIL absent or exotic shape: npy is authoritative
            pass
        if self._tb is not None:
            self._tb.add_image(tag, image, step, dataformats="HWC")

    def close(self) -> None:
        if self.enabled:
            self._f.close()
            if self._tb is not None:
                self._tb.close()


def img_stretch(images):
    """Stretch float imagery to [0, 1] per batch
    (``tf_utils/common.py — img_stretch`` parity)."""
    import numpy as np

    images = np.asarray(images, np.float32)
    lo, hi = images.min(), images.max()
    return (images - lo) / max(hi - lo, 1e-12)


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
