"""Sequential AR flow inversion (scan-based device loops).

The reference NEVER inverts the IAF (sampling draws from the diagonal prior;
SURVEY.md §3.3), so this is a new capability required by the north star
("sequential AR sample inversion -> scan-based device loop",
BASELINE.json config 5). It enables evaluating q at external points /
density-direction use of the flow.

Forward (division form):  z' = (z - m(z)) * exp(-s(z))
Inverse:                   z_t = z'_t * exp(s_t(z_{<t})) + m_t(z_{<t})
computed sequentially over the raster-then-channel AR order. Two devices
loops are provided:

  * ``invert_ar_exact``  — one ``lax.fori_loop`` step per AR position
    (D = H*W*C steps). Always exact; O(D) AR-net evaluations. Test-grade
    and small-shape grade.
  * ``invert_ar_jacobi`` — blockwise fixed-point iteration: each step
    re-evaluates the AR net on the full tensor and applies the inverse
    update everywhere at once. After k steps every position whose longest
    dependency chain is <= k is exact, so ``iters`` >= the AR DAG depth
    gives the exact inverse with far fewer, fully-MXU-shaped evaluations
    (the blockwise analogue of blockwise attention for AR inversion,
    SURVEY.md §5.7).

``ar_fn(z) -> (m, s)`` must already include the model's 0.1 scaling and
context conditioning (see ``iaf_tpu.models.cvae.iaf_flow``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

ArFn = Callable[[jax.Array], tuple[jax.Array, jax.Array]]


def _ar_position_index(shape) -> jax.Array:
    """[H,W,C] int32 raster-then-channel AR order index."""
    _, H, W, C = shape
    h = jax.lax.broadcasted_iota(jnp.int32, (H, W, C), 0)
    w = jax.lax.broadcasted_iota(jnp.int32, (H, W, C), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (H, W, C), 2)
    return (h * W + w) * C + c


def _inverse_update(z_prime, m, s, gate_bias, form: str):
    if form == "division":
        return z_prime * jnp.exp(s) + m
    if form == "gate":
        g = jax.nn.sigmoid(s + gate_bias)
        return (z_prime - (1.0 - g) * m) / g
    raise ValueError(form)


def invert_ar_exact(ar_fn: ArFn, z_prime: jax.Array, form: str = "division",
                    gate_bias: float = 0.0) -> jax.Array:
    """Exact sequential inversion: one AR position per loop step."""
    pos = _ar_position_index(z_prime.shape)
    D = z_prime.shape[1] * z_prime.shape[2] * z_prime.shape[3]

    def body(t, z):
        m, s = ar_fn(z)
        z_new = _inverse_update(z_prime, m, s, gate_bias, form)
        return jnp.where(pos[None] == t, z_new, z)

    return jax.lax.fori_loop(0, D, body, jnp.zeros_like(z_prime))


def invert_ar_jacobi(ar_fn: ArFn, z_prime: jax.Array, iters: int,
                     form: str = "division", gate_bias: float = 0.0) -> jax.Array:
    """Blockwise fixed-point inversion; exact once ``iters`` >= AR DAG depth."""
    def body(_, z):
        m, s = ar_fn(z)
        return _inverse_update(z_prime, m, s, gate_bias, form)

    return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(z_prime))
