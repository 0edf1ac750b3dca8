"""Adamax + Polyak (EMA) parameter averaging, reimplemented device-side.

Reference parity: ``tf_utils/adamax.py — class AdamaxOptimizer``
(``_create_slots``, ``_apply_dense``: m <- b1*m + (1-b1)*g;
u <- max(b2*u, |g|); theta <- theta - lr * m / (u + eps), with NO bias
correction) and ``tf_train.py``'s ``tf.train.ExponentialMovingAverage``
Polyak shadow. (Reference mount empty at survey time; SURVEY.md §2.1.)

TPU-native: one jitted pytree-mapped update (the train step donates params /
opt state / ema so XLA updates in place); optional bias correction and global
grad clipping are config-gated extensions, both OFF by default for parity.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


# Leaves below this element count stay on the XLA update even when
# ``fused=True``: their HBM traffic is negligible and narrow lane dims
# waste VMEM in Pallas (tests lower it to force the kernel on tiny trees).
FUSED_MIN_SIZE = 1 << 18


def _auto_prefers_swapped(shape) -> bool:
    """True when XLA's AUTO layout assignment stores this leaf with its
    last two dims swapped (cin-minor, for the stacked conv weights).

    TPU tiled layouts physically pad the minor-most dim to 128 lanes and
    the second-minor to 8 sublanes; AUTO picks the orientation with fewer
    padded bytes. Verified against the r5 optimized-HLO audit: on the
    paper config AUTO swaps exactly the [.,192,160] (1.33x vs 1.6x) and
    [.,160,64] (1.6x vs 2.0x) families and keeps [.,160,384] / [.,160,448]
    / square leaves default. A Mosaic kernel only consumes DEFAULT
    layouts, so routing a swapped-layout leaf through the fused update
    forces XLA to relayout-copy p/m/u/ema in AND out every step (donation
    aliasing included) — measured net loss (pin_state_layouts A/B). Such
    leaves take the XLA elementwise update, which reads/writes the native
    layout copy-free."""
    if len(shape) < 2:
        return False
    pad = lambda s, t: -(-s // t) * t  # noqa: E731
    default = pad(shape[-2], 8) * pad(shape[-1], 128)
    swapped = pad(shape[-1], 8) * pad(shape[-2], 128)
    return swapped < default


class AdamaxState(NamedTuple):
    step: jax.Array   # int32 scalar
    m: Any            # first-moment pytree
    u: Any            # exponentially-weighted infinity norm pytree
    ema: Any          # Polyak-averaged params pytree


def init_state(params) -> AdamaxState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamaxState(
        step=jnp.zeros((), jnp.int32),
        m=zeros,
        u=jax.tree.map(jnp.zeros_like, params),
        # jnp.copy, not identity: the EMA shadow must not alias the params
        # buffers or donating both to the train step double-donates.
        ema=jax.tree.map(jnp.copy, params),
    )


def apply_updates(
    params, grads, state: AdamaxState, *,
    lr: float, beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8,
    polyak_decay: float = 0.999, bias_correction: bool = False,
    grad_clip: float = 0.0, fused: bool = False, layout_aware: bool = True,
) -> tuple[Any, AdamaxState]:
    """One fused Adamax + Polyak step. Returns (new_params, new_state).

    ``fused=True`` routes each leaf through the single-HBM-pass Pallas
    kernel (``ops/fused_adamax.py``) instead of the XLA elementwise update
    — identical math, one read+write of every buffer. ``layout_aware``
    (default ON) keeps leaves whose AUTO device layout is NOT the default
    (``_auto_prefers_swapped``) on the XLA update, avoiding the per-step
    relayout copies the default-layout-only Mosaic kernel would force.
    """
    step = state.step + 1
    if grad_clip > 0.0:
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                             for g in jax.tree.leaves(grads)))
        scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)

    if bias_correction:
        # Paper-exact Adamax (Kingma & Ba 2015 Alg. 2): lr / (1 - b1^t).
        lr_t = lr / (1.0 - beta1 ** step.astype(jnp.float32))
    else:
        lr_t = lr  # upstream adamax.py applies none

    def upd(p, g, m, u):
        m_t = beta1 * m + (1.0 - beta1) * g
        u_t = jnp.maximum(beta2 * u, jnp.abs(g))
        p_t = p - lr_t * m_t / (u_t + eps)
        return p_t, m_t, u_t

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_u = treedef.flatten_up_to(state.u)
    flat_e = treedef.flatten_up_to(state.ema)

    new_p, new_m, new_u, new_e = [], [], [], []
    for p, g, m, u, e in zip(flat_p, flat_g, flat_m, flat_u, flat_e):
        if (fused and p.size >= FUSED_MIN_SIZE
                and not (layout_aware and _auto_prefers_swapped(p.shape))):
            from iaf_tpu.ops.fused_adamax import adamax_polyak_leaf
            p_t, m_t, u_t, e_t = adamax_polyak_leaf(
                p, g, m, u, e, lr_t, beta1=beta1, beta2=beta2, eps=eps,
                polyak_decay=polyak_decay)
        else:
            p_t, m_t, u_t = upd(p, g, m, u)
            # Polyak shadow tracks the *post-update* params, like
            # tf.train.ExponentialMovingAverage applied after apply_gradients.
            e_t = polyak_decay * e + (1.0 - polyak_decay) * p_t
        new_p.append(p_t)
        new_m.append(m_t)
        new_u.append(u_t)
        new_e.append(e_t)

    unflatten = treedef.unflatten
    return unflatten(new_p), AdamaxState(
        step=step, m=unflatten(new_m), u=unflatten(new_u),
        ema=unflatten(new_e))
