"""MADE autoregressive mask builders.

Reference parity: ``tf_utils/layers.py — get_linear_ar_mask,
get_conv_ar_mask`` and the Theano original ``graphy/nodes/ar.py``.
(Reference mount empty at survey time; symbols cited per SURVEY.md §2.1.)

Masks are built in numpy at trace time and baked into the compiled program
as constants ("masked-weight generation -> static mask kernels" per the
north star): no per-step re-masking FLOPs ever reach the device. The AR
ordering is: latent channels are ordered 0..z-1 within a pixel, and pixels
are raster-ordered; output unit for channel i at pixel p may depend on
(a) any channel at a pixel strictly before p in raster order, and
(b) channels j < i at p itself (j <= i when ``zerodiagonal=False``... note
    the convention: zerodiagonal=True forbids j == i).
"""

from __future__ import annotations

import numpy as np


def get_linear_ar_mask(n_in: int, n_out: int, zerodiagonal: bool = False) -> np.ndarray:
    """[n_in, n_out] 0/1 mask making a dense layer autoregressive over
    channel order, with input/output channels assigned to ``min(n_in, n_out)``
    equal groups (MADE with evenly-strided degrees)."""
    assert n_in % n_out == 0 or n_out % n_in == 0, (n_in, n_out)
    mask = np.ones((n_in, n_out), dtype=np.float32)
    if n_out >= n_in:
        k = n_out // n_in
        for i in range(n_in):
            mask[i + 1 :, i * k : (i + 1) * k] = 0.0
            if zerodiagonal:
                mask[i : i + 1, i * k : (i + 1) * k] = 0.0
    else:
        k = n_in // n_out
        for i in range(n_out):
            mask[(i + 1) * k :, i : i + 1] = 0.0
            if zerodiagonal:
                mask[i * k : (i + 1) * k, i : i + 1] = 0.0
    return mask


def get_conv_ar_mask(
    h: int, w: int, n_in: int, n_out: int, zerodiagonal: bool = False
) -> np.ndarray:
    """[h, w, n_in, n_out] 0/1 mask for a conv kernel (HWIO layout):
    spatial taps strictly before the center in raster order pass everything,
    taps after the center pass nothing, and the center tap gets the linear
    channel-AR mask."""
    l = (h - 1) // 2
    m = (w - 1) // 2
    mask = np.ones((h, w, n_in, n_out), dtype=np.float32)
    mask[:l, :, :, :] = 1.0  # rows above center: before in raster order
    mask[l + 1 :, :, :, :] = 0.0  # rows below center: after
    mask[l, m + 1 :, :, :] = 0.0  # same row, right of center: after
    mask[l, m, :, :] = get_linear_ar_mask(n_in, n_out, zerodiagonal)
    return mask
