"""Pallas masked-AR-conv kernel (TPU MXU path).

North-star obligation (BASELINE.json): "masked-weight generation -> static
Pallas mask kernels, per-example AR conv -> batched MXU matmuls". The MADE
mask is folded into the weight-normalized weights ONCE at trace time (an
O(kh*kw*cin*cout) elementwise multiply on the weights, zero per-pixel
re-masking FLOPs); the kernel then performs the conv as a blocked
im2col -> 128x128-systolic matmul entirely in VMEM.

Layout: x [B, H, W, Cin] f32, w [kh, kw, Cin, Cout] (already masked), SAME
padding, stride 1 (the AR convs of the IAF chain are always stride-1 3x3;
strided stem convs use plain XLA convs — SURVEY.md §2.3).

Gradient: ``masked_conv2d`` is a ``jax.custom_vjp`` whose backward is the
VJP of the XLA twin (identical math — ``conv_general_dilated`` with the same
masked weights), so training gets exact grads with XLA's MXU conv kernels
while the forward uses the fused Pallas path. The XLA twin doubles as the
correctness oracle in tests (SURVEY.md §4.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iaf_tpu.ops._common import use_interpret


def xla_conv2d_same(x: jax.Array, w: jax.Array) -> jax.Array:
    """The XLA twin: stride-1 SAME conv, NHWC/HWIO."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_kernel(x_ref, w_ref, o_ref, *, kh: int, kw: int):
    """One grid program = one batch element. Builds the im2col patch matrix
    from (kh*kw) shifted views of the padded input and runs one MXU matmul.
    """
    xp = x_ref[0]                      # [H+kh-1, W+kw-1, Cin] (pre-padded)
    H = o_ref.shape[1]
    W = o_ref.shape[2]
    cin = xp.shape[-1]
    patches = [
        xp[dy:dy + H, dx:dx + W, :].reshape(H * W, cin)
        for dy in range(kh) for dx in range(kw)
    ]
    mat = jnp.concatenate(patches, axis=1)          # [H*W, kh*kw*Cin]
    wmat = w_ref[:]                                 # [kh*kw*Cin, Cout]
    out = jnp.dot(mat, wmat, preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(H, W, -1)


def _pallas_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    b, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xpad = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    wmat = w.reshape(kh * kw * cin, cout)
    kern = functools.partial(_conv_kernel, kh=kh, kw=kw)
    flops = 2 * b * h * wd * kh * kw * cin * cout
    return pl.pallas_call(
        kern,
        name="masked_conv_im2col",  # xprof attribution (SURVEY §5.1)
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + kh - 1, wd + kw - 1, cin),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (x.size + wmat.size + b * h * wd * cout),
            transcendentals=0),
        interpret=use_interpret(),
    )(xpad, wmat)


@jax.custom_vjp
def masked_conv2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-1 SAME conv with (pre-masked) weights: Pallas forward, XLA-VJP
    backward. ``w`` must already include the AR mask and weight-norm scale."""
    return _pallas_conv(x, w)


def _fwd(x, w):
    return _pallas_conv(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # The Pallas forward always emits f32 (MXU-accumulated), so the incoming
    # cotangent is f32 even for bf16 x/w; match the twin's output dtype or
    # jax.vjp rejects the cotangent (bf16 inputs arrive via fold_wn's
    # fold-time cast on the kernels=pallas path).
    # Known rounding mismatch for bf16 x/w: this backward is the VJP of the
    # XLA twin, whose PRIMAL output is bf16-rounded before the f32 cast,
    # while the Pallas forward emits unrounded f32 accumulations — the
    # gradients correspond to a function that differs from the forward by
    # one bf16 output rounding. Inside the bf16 noise floor; NOT exact.
    _, vjp = jax.vjp(
        lambda xx, ww: xla_conv2d_same(xx, ww).astype(jnp.float32), x, w)
    return vjp(g)


masked_conv2d.defvjp(_fwd, _bwd)


def fold_mask(V: jax.Array, g: jax.Array, mask: np.ndarray | None) -> jax.Array:
    """Weight-norm direction * gain * static mask, computed once per step on
    the [kh,kw,cin,cout] weights (negligible next to the conv itself)."""
    vn = V * jax.lax.rsqrt(jnp.sum(jnp.square(V), axis=(0, 1, 2),
                                   keepdims=True) + 1e-12)
    if mask is not None:
        vn = vn * jnp.asarray(mask, V.dtype)
    return vn * g
