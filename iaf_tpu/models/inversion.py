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
  * ``invert_ar_fixed_point`` — the production form (VERDICT r2 next #4):
    the same Jacobi sweep under a ``lax.while_loop`` that STOPS once
    successive iterates move less than ``tol``. The IAF update is
    near-identity by construction (the model scales m and s by 0.1,
    ``tf_train.py IAFLayer`` parity), so the fixed-point iteration
    contracts geometrically and converges in far fewer sweeps than the
    worst-case DAG depth D; this returns the actual iteration count so
    drivers can REPORT the measured convergence depth instead of paying
    ``iters = D`` every time. Returns ``(z, n_iters)``.

Why there is no finer "row-blocked scan" variant for the conv AR path:
each Jacobi sweep's cost is one AR-net evaluation, and the AR net is a
CONVOLUTION over the whole feature map — restricting the *update* to a
raster block would not shrink the conv evaluation, so a sequential scan
over row blocks with inner Jacobi does strictly more AR-net evaluations
than the global early-exit sweep for the same accuracy. (For the dense
MNIST path the per-position exact loop is already cheap: D = z_size.)

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


def invert_ar_fixed_point(ar_fn: ArFn, z_prime: jax.Array,
                          tol: float = 1e-6, max_iters: int | None = None,
                          form: str = "division", gate_bias: float = 0.0,
                          ) -> tuple[jax.Array, jax.Array]:
    """Early-exit Jacobi inversion: sweep until the max-abs change between
    successive iterates drops below ``tol`` (or ``max_iters``, default the
    exactness bound D = H*W*C). Returns ``(z, n_iters)`` — ``n_iters`` is
    the measured convergence depth, typically << D for the 0.1-scaled IAF
    update (report it; VERDICT r2 next #4)."""
    D = z_prime.shape[1] * z_prime.shape[2] * z_prime.shape[3]
    limit = D if max_iters is None else max_iters

    def cond(carry):
        _, delta, i = carry
        return jnp.logical_and(i < limit, delta > tol)

    def body(carry):
        z, _, i = carry
        m, s = ar_fn(z)
        z_new = _inverse_update(z_prime, m, s, gate_bias, form)
        # f32 carry slot regardless of z's dtype (while_loop needs a
        # dtype-stable carry). The SUBTRACTION must also be f32: computed
        # in bf16 it carries bf16 resolution, so a tol below ~1e-2 would
        # only be reachable once iterates are bit-identical and the early
        # exit would silently degrade to near-exact convergence (ADVICE r3).
        delta = jnp.max(jnp.abs(z_new.astype(jnp.float32)
                                - z.astype(jnp.float32)))
        return z_new, delta, i + 1

    init = (jnp.zeros_like(z_prime),
            jnp.asarray(jnp.inf, jnp.float32), jnp.int32(0))
    z, _, iters = jax.lax.while_loop(cond, body, init)
    return z, iters
