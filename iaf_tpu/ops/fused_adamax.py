"""Fused single-pass Adamax + Polyak update kernel.

Motivation (measured, r2): with the per-layer params stacked into ~25 large
leaves, the optimizer/EMA tail still costs 4.18 ms/step on the paper config
(tools/decompose_bench.py, bf16 defaults) — ~1.8x the one-pass HBM bound of
~2.3 ms (read p,g,m,u,ema once: 1.04 GB; write p,m,u,ema once: 0.83 GB at
819 GB/s). That factor matches XLA emitting the four output computations as
separate fusions, each re-reading its inputs. This kernel does the whole
update — m' = b1*m + (1-b1)*g; u' = max(b2*u, |g|); p' = p - lr*m'/(u'+eps);
ema' = d*ema + (1-d)*p' — in ONE pass per leaf: 5 reads + 4 writes, nothing
touched twice. Elementwise, VPU-only, no backward needed (the optimizer is
outside autodiff).

Reference parity: the math is identical to ``optim.apply_updates``
(``tf_utils/adamax.py — AdamaxOptimizer._apply_dense`` + post-update
``tf.train.ExponentialMovingAverage``); this file only changes memory
scheduling. The XLA twin (``optim.apply_updates`` with ``fused=False``) is
the correctness oracle in ``tests/test_kernels.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iaf_tpu.ops._common import use_interpret


def _kernel(lr_ref, p_ref, g_ref, m_ref, u_ref, e_ref,
            po_ref, mo_ref, uo_ref, eo_ref, *, b1, b2, eps, d):
    g = g_ref[:]
    m_t = b1 * m_ref[:] + (1.0 - b1) * g
    u_t = jnp.maximum(b2 * u_ref[:], jnp.abs(g))
    p_t = p_ref[:] - lr_ref[0, 0] * m_t / (u_t + eps)
    mo_ref[:] = m_t
    uo_ref[:] = u_t
    po_ref[:] = p_t
    eo_ref[:] = d * e_ref[:] + (1.0 - d) * p_t


def adamax_polyak_leaf(p, g, m, u, e, lr_t, *,
                       beta1: float, beta2: float, eps: float,
                       polyak_decay: float):
    """One-leaf fused update. Returns (p', m', u', ema').

    ``lr_t`` may be a python float or a traced scalar (bias-corrected lr).
    Any leaf shape is accepted; internally collapsed to 2D with the
    original last axis as the lane dimension.
    """
    # Block rows from the VMEM budget in LANE-PADDED bytes: Mosaic pads the
    # lane dim to 128, and the pipeline double-buffers all 9 operand/result
    # streams, so per-buffer blocks must stay well under 16MB/(9*2).
    per_buf_bytes = 512 * 1024

    def plan(cols: int) -> bool:
        return ((cols + 127) // 128) * 128 * 4 <= per_buf_bytes

    shape = p.shape
    if p.ndim >= 2 and plan(shape[-1]):
        cols = shape[-1]
        p2 = p.reshape(-1, cols)
    else:
        # 1-D/scalar leaves, or a last axis too wide for even one row per
        # block: flatten and pick the widest 128-multiple column count
        # that divides the size (cols=size for tiny leaves)
        n = max(1, p.size)
        cols = n
        for c in (2048, 1024, 512, 256, 128):
            if n % c == 0:
                cols = c
                break
        if not plan(cols):  # huge prime-ish flat leaf: stay on XLA
            m_t = beta1 * m + (1.0 - beta1) * g
            u_t = jnp.maximum(beta2 * u, jnp.abs(g))
            p_t = p - lr_t * m_t / (u_t + eps)
            return p_t, m_t, u_t, polyak_decay * e + (1 - polyak_decay) * p_t
        p2 = p.reshape(-1, cols)
    rows = p2.shape[0]
    padded_cols = ((cols + 127) // 128) * 128
    br = max(1, min(rows, per_buf_bytes // (padded_cols * 4)))
    if br >= 8:
        br -= br % 8
    grid = (rows + br - 1) // br

    lr_arr = jnp.asarray(lr_t, jnp.float32).reshape(1, 1)
    blk = pl.BlockSpec((br, cols), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, b1=beta1, b2=beta2, eps=eps,
                             d=polyak_decay)
    outs = pl.pallas_call(
        kern,
        name="adamax_polyak_fused",
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [blk] * 5,
        out_specs=(blk, blk, blk, blk),
        out_shape=tuple(jax.ShapeDtypeStruct(p2.shape, jnp.float32)
                        for _ in range(4)),
        # True in-place update: p/m/u/ema inputs alias the outputs, so XLA
        # neither copies the state buffers into the custom call (the first
        # measured attempt without aliasing showed %copy ops on every
        # operand — 27.3 vs 33.1 steps/s) nor allocates fresh results.
        input_output_aliases={1: 0, 3: 1, 4: 2, 5: 3},
        interpret=use_interpret(),
    )(lr_arr, p2.astype(jnp.float32), g.reshape(p2.shape),
      m.reshape(p2.shape), u.reshape(p2.shape), e.reshape(p2.shape))
    return tuple(o.reshape(shape) for o in outs)
