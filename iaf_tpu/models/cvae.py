"""ResNet VAE with deep IAF posteriors (the flagship CIFAR-10 model).

Reference parity: ``tf_train.py — class CVAE1 (__init__, _forward)`` and
``class IAFLayer (up, down)``. (Reference mount empty at survey time;
symbols cited per SURVEY.md §2.1/§3.1.)

Architecture (NHWC, TPU-preferred layout):
  x/256 - 0.5 -> stride-2 weight-norm stem conv -> ``num_blocks`` x ``depth``
  IAF layers bottom-up (posterior stats + context) then top-down from a
  learned ``h_top`` bias (prior stats, posterior sample, IAF step, free-bits
  KL, residual decode) -> stride-2 deconv -> discretized-logistic likelihood
  with scalar learned ``dec_log_stdv``.

TPU-native layer stacking: all ``num_blocks * depth`` stochastic layers are
shape-identical (the trunk stays [B, H/2, W/2, h_size] throughout — the
reference's per-layer Python loop in ``CVAE1._forward`` builds L copies of
the same graph). Here the per-layer parameters live as ONE subtree
``params["blocks"]`` whose every leaf has leading dim L, so the
optimizer/EMA update touches ~25 large stacked arrays instead of 428 tiny
per-layer leaves (HBM-bound instead of overhead-bound) in EITHER execution
form. The execution form is selectable: ``scan_blocks=true`` ``lax.scan``s
a single compiled layer body over the stack (~L-fold less program to
compile, pairs with ``remat`` for ~L-fold less activation memory);
``scan_blocks=false`` (the default) unrolls a Python loop over per-layer
trees produced by ONE custom-vjp unstack of the stacked subtree (backward
= a single stack per leaf, not L pad+add scatters), after an optional
batched weight-norm pre-fold (``fold_wn``, default ON — see
``nn.layers.fold_wn_tree``); per-layer stats stay a plain Python list so
no [L, B, H, W, C] buffers are ever materialized. Both forms run identical
math with identical RNG keys and trajectories (tests/test_scan_blocks.py).
Measured on TPU (interleaved A/Bs, paper config): scan 23.6 vs unroll 31.0
steps/s (r2 — the scan carry serializes layers and blocks XLA's
cross-layer fusion/overlap), and the r4 fold/unstack/list form 36.3 vs
31.7 over the sliced-stacked unrolled form; so the folded unrolled loop is
the perf default and scan is the compile-time/memory option.

Everything is a pure function over a nested params pytree threaded by
``iaf_tpu.nn.layers.Ctx``; ``init_params`` performs the weight-norm
data-dependent initialization (SURVEY.md §3.5) with the per-layer init
bodies ALWAYS scanned regardless of ``scan_blocks`` (init is a one-time
pass; one compiled layer body cuts first-run compile ~L-fold, and the
scanned init matches a hand-unrolled loop to float reduction order —
tests/test_scan_blocks.py::test_init_parity).

RNG discipline: every layer gets a base key ``fold_name(step_key,
"block_i/layer_j")`` (stacked and fed through the scan), and per-site keys
fold the site name into that base — the key stream stays a pure function of
(seed, step, site path), independent of device layout and of
scan-vs-unrolled execution.

Flow parameterizations (config ``flow_update``):
  * "division" (TF stack):    z <- (z - 0.1*m) / exp(0.1*s),  logq += 0.1*s
  * "gate" (Theano stack):    g = sigmoid(s + forget_bias)
                              z <- g*z + (1-g)*m,             logq += log g
Both accumulate the running log-det-Jacobian into the posterior log-density.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from iaf_tpu.core.config import Config
from iaf_tpu.core.rng import fold_name
from iaf_tpu.distributions import (
    DiagonalGaussian,
    compute_lowerbound,
    discretized_logistic,
)
from iaf_tpu.nn import layers as L
from iaf_tpu.nn.layers import Ctx
from iaf_tpu.parallel.mesh import constrain

# Activation sharding at block boundaries: batch over "data", channels over
# the reserved "model" axis (no-op unless a mesh with model>1 is active).
_ACT_SPEC = ("data", None, None, "model")

LOG2 = 0.6931471805599453


class LayerStats(NamedTuple):
    """Bottom-up posterior statistics stashed by ``up`` for ``down``."""
    qz_mean: jax.Array
    qz_logsd: jax.Array
    up_context: jax.Array


class ModelOut(NamedTuple):
    loss: jax.Array          # scalar training objective (mean nats/example)
    elbo_nats: jax.Array     # per-example -log p(x) bound (k-sample IW)
    bits_per_dim: jax.Array  # scalar mean bits/dim over the batch
    kl_obj: jax.Array        # scalar mean free-bits KL (training side)
    kl_cost: jax.Array       # scalar mean raw KL (eval side)
    log_pxz: jax.Array       # scalar mean reconstruction term
    log_w: jax.Array         # per-sample log importance weights [B*k]
    x_out: jax.Array         # decoded means in [-0.5, 0.5) domain
    kl_per_layer: jax.Array  # [n_layers] mean raw KL per stochastic layer
                             # (free-bits collapse diagnostic, SURVEY §5.5)


def _split(x: jax.Array, sizes) -> list[jax.Array]:
    out, start = [], 0
    for s in sizes:
        out.append(x[..., start:start + s])
        start += s
    return out


def _layer_names(cfg: Config):
    return [f"block_{i}/layer_{j}"
            for i in range(cfg.num_blocks) for j in range(cfg.depth)]


def _layer_keys(cfg: Config, rng: jax.Array) -> jax.Array:
    """Stacked per-layer base keys [L, ...]: fold each layer's stable name
    into the step key OUTSIDE the scan (string folding is trace-static)."""
    return jnp.stack([fold_name(rng, name) for name in _layer_names(cfg)])


def _stack_trees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _slice_tree(tree, i):
    return jax.tree.map(lambda a: a[i], tree)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _unstack_tree(tree, n: int):
    """Split a stacked [L, ...] tree into L per-layer trees, ONCE.

    The backward pass is a single ``stack`` (one concatenate per leaf)
    instead of XLA's default gradient for L independent slices — a chain of
    L pad+add fusions that each rewrite the full [L, ...] buffer (measured
    at ~0.9 ms/step of the paper config's unrolled backward, r4 TPU trace).
    Exact: the slices are disjoint and cover the stack."""
    return tuple(_slice_tree(tree, i) for i in range(n))


def _unstack_fwd(tree, n: int):
    return _unstack_tree(tree, n), None


def _unstack_bwd(n: int, _res, cts):
    return (_stack_trees(list(cts)),)


_unstack_tree.defvjp(_unstack_fwd, _unstack_bwd)


def top_layer_params(params):
    """The topmost (first-decoded) stochastic layer's param slice."""
    return _slice_tree(params["blocks"], -1)


# ---------------------------------------------------------------------------
# IAFLayer
# ---------------------------------------------------------------------------

def iaf_layer_up(cfg: Config, ctx: Ctx, h: jax.Array) -> tuple[jax.Array, LayerStats]:
    """Bottom-up pass of one stochastic layer (``IAFLayer.up``)."""
    zs, hs = cfg.z_size, cfg.h_size
    ks = (cfg.kernel_size, cfg.kernel_size)
    x = L.elu(h)
    x = L.conv2d(ctx, "up_conv1", x, 2 * zs + 2 * hs, filter_size=ks,
                 init_scale=cfg.stat_init_scale)
    qz_mean, qz_logsd, up_context, hidden = _split(x, [zs, zs, hs, hs])
    hidden = L.elu(hidden)
    hidden = L.conv2d(ctx, "up_conv3", hidden, hs, filter_size=ks)
    return h + 0.1 * hidden, LayerStats(qz_mean, qz_logsd, up_context)


def iaf_flow(cfg: Config, ctx: Ctx, z: jax.Array, context: jax.Array,
             logqs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One IAF step: masked AR net -> (m, s) heads -> invertible update with
    running log-det-Jacobian folded into ``logqs`` (elementwise)."""
    from iaf_tpu.ops import use_pallas
    n_h = [cfg.ar_hidden] * cfg.depth_ar
    if cfg.ar_kind == "conv":
        with jax.named_scope("ar_stack"):
            m, s = L.ar_multiconv2d(
                ctx, "ar1", z, context, n_h, [cfg.z_size, cfg.z_size],
                filter_size=(cfg.kernel_size, cfg.kernel_size),
                pallas=(not ctx.init) and use_pallas(cfg.kernels, "ar_stack"),
                pallas_conv=(not ctx.init) and use_pallas(cfg.kernels,
                                                          "conv"),
                trim_rows=cfg.ar_row_trim,
                merge_heads=cfg.merge_ar_heads,
                pallas_variant=cfg.ar_variant)
    else:  # dense MADE over the channel vector at each position
        m, s = L.ar_multidense(ctx, "ar1", z, context, n_h,
                               [cfg.z_size, cfg.z_size])
    m = m * 0.1
    s = s * 0.1
    if cfg.flow_update == "division":
        if (not ctx.init) and use_pallas(cfg.kernels, "elementwise"):
            # fused (z-m)*exp(-s) + elementwise log-det-J accumulation in
            # one VMEM pass (ops/fused.py — north-star "per-example AR
            # transform" obligation; logqs stays elementwise so the
            # free-bits objective downstream keeps its per-channel KL)
            from iaf_tpu.ops import iaf_update
            z, logqs = iaf_update(z, m, s, logqs)
        else:
            z = (z - m) * jnp.exp(-s)
            logqs = logqs + s
    elif cfg.flow_update == "gate":
        # z' = g*z + (1-g)*m with g in (0,1): |det dz'/dz| = prod g, so the
        # change of variables gives log q(z') = log q(z) - sum log g
        # (arXiv:1606.04934 eq. 13's running -sum log sigma term).
        gate = jax.nn.sigmoid(s + cfg.gate_forget_bias)
        z = gate * z + (1.0 - gate) * m
        logqs = logqs - jax.nn.log_sigmoid(s + cfg.gate_forget_bias)
    else:
        raise ValueError(f"unknown flow_update {cfg.flow_update!r}")
    return z, logqs


def iaf_layer_down(
    cfg: Config, ctx: Ctx, h: jax.Array, stats: LayerStats | None,
    mode: str,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Top-down pass of one stochastic layer (``IAFLayer.down``).

    Returns (new h, kl_obj per example, kl_cost per example). In
    ``mode == "sample"`` the latent is drawn from the prior and both KL
    outputs are zero.
    """
    zs, hs = cfg.z_size, cfg.h_size
    ks = (cfg.kernel_size, cfg.kernel_size)
    x = L.elu(h)
    x = L.conv2d(ctx, "down_conv1", x, 4 * zs + 2 * hs, filter_size=ks,
                 init_scale=cfg.stat_init_scale)
    pz_mean, pz_logsd, rz_mean, rz_logsd, down_context, h_det = _split(
        x, [zs, zs, zs, zs, hs, hs])
    prior = DiagonalGaussian(pz_mean, 2.0 * pz_logsd)

    batch = h.shape[0]
    if mode == "sample":
        z = prior.sample(ctx.key("z_prior"))
        kl_obj = kl_cost = jnp.zeros((batch,), h.dtype)
    else:
        assert stats is not None
        posterior = DiagonalGaussian(stats.qz_mean + rz_mean,
                                     2.0 * (stats.qz_logsd + rz_logsd))
        z = posterior.sample(ctx.key("z_post"))
        logqs = posterior.logps(z)
        if cfg.flow == "iaf":
            context = stats.up_context + down_context
            z, logqs = iaf_flow(cfg, ctx, z, context, logqs)
        logps = prior.logps(z)
        kl_cost = logqs - logps  # elementwise [B,H,W,zs]

        if cfg.kl_min > 0:
            # Free bits (paper §3.3; ``IAFLayer.down`` in tf_train.py):
            # per-channel KL summed over spatial dims, averaged over the
            # batch, clamped at kl_min — enters ONLY the training objective.
            kl_ave = jnp.mean(jnp.sum(kl_cost, axis=(1, 2)), axis=0,
                              keepdims=True)                    # [1, zs]
            kl_ave = jnp.maximum(kl_ave, cfg.kl_min)
            kl_obj = jnp.sum(jnp.broadcast_to(kl_ave, (batch, zs)), axis=1)
        else:
            kl_obj = jnp.sum(kl_cost, axis=(1, 2, 3))
        kl_cost = jnp.sum(kl_cost, axis=(1, 2, 3))

    hidden = jnp.concatenate([z, h_det], axis=-1)
    hidden = L.elu(hidden)
    hidden = L.conv2d(ctx, "down_conv2", hidden, hs, filter_size=ks)
    return h + 0.1 * hidden, kl_obj, kl_cost


# ---------------------------------------------------------------------------
# Stacked-block execution: scan (default) and unrolled parity twin
# ---------------------------------------------------------------------------

def _layer_param_list(cfg: Config, blocks, compute_dtype):
    """Per-layer param trees for the unrolled form: one custom-vjp unstack
    of the stacked subtree (single-concat backward), optionally after the
    batched weight-norm fold (``fold_wn`` — all L layers' V-norms in one
    reduction per leaf type instead of L tiny ones, see
    ``nn.layers.fold_wn_tree``). ``compute_dtype`` must be the dtype the
    consuming pass actually runs with (NOT read from cfg: the
    inversion-probe path runs f32 regardless of ``cfg.compute_dtype``, and
    a pre-cast W would make its convs mixed-dtype)."""
    if cfg.fold_wn:
        blocks = L.fold_wn_tree(blocks, compute_dtype=compute_dtype)
    return _unstack_tree(blocks, cfg.num_blocks * cfg.depth)


def _run_up(cfg: Config, blocks, keys, h, compute_dtype):
    """All bottom-up layer passes. Returns (h, per-layer LayerStats): a
    stacked [L, ...] tree in scan mode, a plain list in unrolled mode (so
    the unrolled program never materializes [L, B, H, W, C] stat buffers —
    their stack/slice pairs cost ~2 ms/step in the r4 TPU trace)."""

    def body(carry, inp):
        lp, key = inp
        lctx = Ctx(params=lp, rng=key, compute_dtype=compute_dtype)
        with jax.named_scope("iaf_up"):
            h2, st = iaf_layer_up(cfg, lctx, carry)
        return constrain(h2, _ACT_SPEC), st

    if cfg.scan_blocks:
        fn = jax.checkpoint(body) if cfg.remat else body
        return jax.lax.scan(fn, h, (blocks, keys))
    if not isinstance(blocks, (list, tuple)):
        blocks = _layer_param_list(cfg, blocks, compute_dtype)
    sts = []
    for i, lp in enumerate(blocks):
        h, st = body(h, (lp, keys[i]))
        sts.append(st)
    return h, sts


def _run_down(cfg: Config, blocks, keys, stats, h, mode, compute_dtype):
    """All top-down layer passes (layer L-1 first). Returns
    (h, kl_obj [L, B], kl_cost [L, B]) with layer index in bottom-up order.
    ``stats`` matches ``_run_up``'s output form (stacked in scan mode, a
    list in unrolled mode)."""

    def body(carry, inp):
        lp, key, st = inp
        lctx = Ctx(params=lp, rng=key, compute_dtype=compute_dtype)
        with jax.named_scope("iaf_down"):
            h2, kl_obj, kl_cost = iaf_layer_down(cfg, lctx, carry, st, mode)
        return constrain(h2, _ACT_SPEC), (kl_obj, kl_cost)

    if cfg.scan_blocks:
        fn = jax.checkpoint(body) if cfg.remat else body
        return jax.lax.scan(fn, h, (blocks, keys, stats), reverse=True)
    n = cfg.num_blocks * cfg.depth
    if not isinstance(blocks, (list, tuple)):
        blocks = _layer_param_list(cfg, blocks, compute_dtype)
    if not isinstance(stats, list):
        # stacked [L, ...] LayerStats: stats[i] would index the NamedTuple
        # FIELDS, not layer i — slice the leaves instead
        stats = [_slice_tree(stats, i) for i in range(n)]
    objs, costs = [None] * n, [None] * n
    for i in reversed(range(n)):
        h, (objs[i], costs[i]) = body(h, (blocks[i], keys[i], stats[i]))
    return h, (jnp.stack(objs), jnp.stack(costs))


# ---------------------------------------------------------------------------
# CVAE
# ---------------------------------------------------------------------------

def cvae_forward(cfg: Config, ctx: Ctx, x: jax.Array, mode: str = "train",
                 k: int | None = None) -> ModelOut:
    """Full forward pass (apply mode; init is ``init_params``).

    ``x`` is uint8/float imagery in [0, 256); ``k`` importance samples
    replicate the batch (eval path, ``CVAE1._forward`` tile-by-k). ``mode``
    is one of "train" | "eval" (generative sampling is ``cvae_sample``).
    """
    assert not ctx.init, "init goes through init_params"
    assert mode in ("train", "eval"), mode
    k = cfg.k if k is None else k
    sks = (cfg.stem_kernel_size, cfg.stem_kernel_size)
    x = x.astype(jnp.float32) / 256.0 - 0.5
    if k > 1:
        x = jnp.repeat(x, k, axis=0)

    h = L.conv2d(ctx, "x_enc", x, cfg.h_size, filter_size=sks, stride=(2, 2))
    h = constrain(h, _ACT_SPEC)

    blocks = ctx.root["blocks"]
    keys = _layer_keys(cfg, ctx.rng)
    if not cfg.scan_blocks:
        # unstack (and optionally weight-norm-fold) ONCE; up and down share
        # the per-layer trees so the stacked tree has a single-stack backward
        blocks = _layer_param_list(cfg, blocks, ctx.compute_dtype)
    h, stats = _run_up(cfg, blocks, keys, h, ctx.compute_dtype)

    # Top-down from a learned per-channel bias (``h_top`` in tf_train.py).
    h_top = ctx.param("h_top", (cfg.h_size,), L.normal_init(0.05))
    dec_hw = cfg.image_size // 2
    batch = x.shape[0]
    h = jnp.broadcast_to(h_top, (batch, dec_hw, dec_hw, cfg.h_size))

    h, (kl_objs, kl_costs) = _run_down(cfg, blocks, keys, stats, h, mode,
                                       ctx.compute_dtype)
    kl_obj_total = jnp.sum(kl_objs, axis=0)    # [B]
    kl_cost_total = jnp.sum(kl_costs, axis=0)  # [B]
    kl_per_layer = jnp.mean(kl_costs, axis=1)  # [L], bottom-up order

    h = L.elu(h)
    x_out = L.deconv2d(ctx, "x_dec", h, cfg.channels, filter_size=sks,
                       stride=(2, 2))

    dec_log_stdv = ctx.param("dec_log_stdv", (), L.zeros_init)
    from iaf_tpu.ops import disc_logistic_logp, use_pallas
    if use_pallas(cfg.kernels):
        log_pxz = disc_logistic_logp(x_out, dec_log_stdv, x)
    else:
        log_pxz = discretized_logistic(x_out, dec_log_stdv, sample=x)

    # Training objective: free-bits KL; reported bound: raw KL (k-sample IW).
    loss = jnp.mean(kl_obj_total - log_pxz)
    elbo_nats = compute_lowerbound(log_pxz, kl_cost_total, k)  # [B]
    bits_per_dim = jnp.mean(elbo_nats) / (LOG2 * cfg.num_pixels)
    return ModelOut(
        loss=loss,
        elbo_nats=elbo_nats,
        bits_per_dim=bits_per_dim,
        kl_obj=jnp.mean(kl_obj_total),
        kl_cost=jnp.mean(kl_cost_total),
        log_pxz=jnp.mean(log_pxz),
        log_w=log_pxz - kl_cost_total,
        x_out=x_out,
        kl_per_layer=kl_per_layer,
    )


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def init_params(cfg: Config, rng: jax.Array, sample_batch: jax.Array):
    """Weight-norm data-dependent init: run the forward sequencing in init
    mode on a real batch; ``g``/``b`` of every weight-norm layer are
    calibrated from the activation statistics (SURVEY.md §3.5). Pure and
    jittable; the per-layer init bodies are ALWAYS scanned (init is a
    one-time pass — compiling ONE layer body instead of L cuts the
    dominant share of first-run compile, and the scanned init agrees with
    the unrolled form to float reduction order, ~1e-5, far inside the
    golden-test envelopes)."""
    ctx = Ctx(params={}, rng=rng, init=True)
    sks = (cfg.stem_kernel_size, cfg.stem_kernel_size)
    x = sample_batch.astype(jnp.float32) / 256.0 - 0.5
    h = L.conv2d(ctx, "x_enc", x, cfg.h_size, filter_size=sks, stride=(2, 2))

    keys = _layer_keys(cfg, rng)

    def up_body(carry, key):
        lctx = Ctx(params={}, rng=key, init=True)
        h2, st = iaf_layer_up(cfg, lctx, carry)
        return h2, (lctx.root, st)

    h, (up_p, stats) = jax.lax.scan(up_body, h, keys)

    h_top = ctx.param("h_top", (cfg.h_size,), L.normal_init(0.05))
    dec_hw = cfg.image_size // 2
    h = jnp.broadcast_to(h_top, (x.shape[0], dec_hw, dec_hw, cfg.h_size))

    def down_body(carry, inp):
        key, st = inp
        lctx = Ctx(params={}, rng=key, init=True)
        h2, _, _ = iaf_layer_down(cfg, lctx, carry, st, mode="train")
        return h2, lctx.root

    h, down_p = jax.lax.scan(down_body, h, (keys, stats), reverse=True)

    # up/down param groups are disjoint module names within one layer scope
    ctx.root["blocks"] = {**up_p, **down_p}

    h = L.elu(h)
    L.deconv2d(ctx, "x_dec", h, cfg.channels, filter_size=sks, stride=(2, 2))
    ctx.param("dec_log_stdv", (), L.zeros_init)
    return ctx.root


def apply_fn(cfg: Config, params, rng: jax.Array, x: jax.Array,
             mode: str = "train", k: int | None = None) -> ModelOut:
    ctx = Ctx(params=params, rng=rng, init=False,
              compute_dtype=_compute_dtype(cfg))
    return cvae_forward(cfg, ctx, x, mode=mode, k=k)


def posterior_flow_probe(cfg: Config, params, rng: jax.Array, x: jax.Array):
    """Extract the topmost stochastic layer's pre-flow posterior sample,
    flow context, and a bound ``ar_fn`` for real data ``x``.

    Supports the inversion/density driver (``invert_check`` mode): the
    reference never inverts its IAF (SURVEY.md §3.3), so evaluating the flow
    in the density direction at external points is a new capability wired
    through ``iaf_tpu.models.inversion``. Returns ``(z, context, ar_fn)``
    where ``ar_fn(z) -> (m, s)`` includes the model's 0.1 head scaling.
    """
    ctx = Ctx(params=params, rng=rng)
    sks = (cfg.stem_kernel_size, cfg.stem_kernel_size)
    ks = (cfg.kernel_size, cfg.kernel_size)
    zs, hs = cfg.z_size, cfg.h_size
    xf = x.astype(jnp.float32) / 256.0 - 0.5
    h = L.conv2d(ctx, "x_enc", xf, hs, filter_size=sks, stride=(2, 2))

    keys = _layer_keys(cfg, rng)
    blocks = params["blocks"]
    if not cfg.scan_blocks:
        # diagnostic path: pre-unstack WITHOUT the weight-norm fold so the
        # whole probe (up pass, down slice, ar_fn) runs uniformly on the
        # raw f32 V/g/b params
        blocks = _unstack_tree(blocks, cfg.num_blocks * cfg.depth)
    h, stats = _run_up(cfg, blocks, keys, h, None)
    # first layer decoded top-down (list in unrolled form, stacked in scan)
    top_stats = (stats[-1] if isinstance(stats, list)
                 else _slice_tree(stats, -1))
    top = Ctx(params=top_layer_params(params), rng=keys[-1])

    h_top = ctx.param("h_top", (hs,), L.normal_init(0.05))
    dec_hw = cfg.image_size // 2
    h = jnp.broadcast_to(h_top, (xf.shape[0], dec_hw, dec_hw, hs))
    xd = L.elu(h)
    xd = L.conv2d(top, "down_conv1", xd, 4 * zs + 2 * hs, filter_size=ks,
                  init_scale=cfg.stat_init_scale)
    _, _, rz_mean, rz_logsd, down_context, _ = _split(
        xd, [zs, zs, zs, zs, hs, hs])
    posterior = DiagonalGaussian(top_stats.qz_mean + rz_mean,
                                 2.0 * (top_stats.qz_logsd + rz_logsd))
    z = posterior.sample(top.key("z_post"))
    context = top_stats.up_context + down_context
    n_h = [cfg.ar_hidden] * cfg.depth_ar

    def ar_fn(zq):
        m, s = L.ar_multiconv2d(Ctx(params=top_layer_params(params)), "ar1",
                                zq, context, n_h, [zs, zs], filter_size=ks,
                                trim_rows=cfg.ar_row_trim,
                                merge_heads=cfg.merge_ar_heads)
        return m * 0.1, s * 0.1

    return z, context, ar_fn


def cvae_sample(cfg: Config, params, rng: jax.Array, num: int,
                temperature: float = 1.0) -> jax.Array:
    """Generative sampling (``mode="sample"`` branch of ``CVAE1._forward``):
    skip the up pass, draw each z from its prior (scaled by ``temperature``),
    decode. Returns images in [0, 256). Scans the stacked layer params like
    the training forward (one compiled decode body)."""
    zs, hs = cfg.z_size, cfg.h_size
    ks = (cfg.kernel_size, cfg.kernel_size)
    sks = (cfg.stem_kernel_size, cfg.stem_kernel_size)
    ctx = Ctx(params=params, rng=rng, init=False)
    keys = _layer_keys(cfg, rng)
    blocks = params["blocks"]
    h_top = ctx.param("h_top", (hs,), L.normal_init(0.05))
    dec_hw = cfg.image_size // 2
    h = jnp.broadcast_to(h_top, (num, dec_hw, dec_hw, hs))

    def body(carry, inp):
        lp, key = inp
        sub = Ctx(params=lp, rng=key)
        x = L.elu(carry)
        x = L.conv2d(sub, "down_conv1", x, 4 * zs + 2 * hs, filter_size=ks)
        pz_mean, pz_logsd, _, _, _, h_det = _split(x, [zs, zs, zs, zs, hs, hs])
        eps = jax.random.normal(sub.key("z_prior"), pz_mean.shape)
        z = pz_mean + temperature * jnp.exp(pz_logsd) * eps
        hidden = jnp.concatenate([z, h_det], axis=-1)
        hidden = L.elu(hidden)
        hidden = L.conv2d(sub, "down_conv2", hidden, hs, filter_size=ks)
        return carry + 0.1 * hidden, None

    h, _ = jax.lax.scan(body, h, (blocks, keys), reverse=True)
    h = L.elu(h)
    x_out = L.deconv2d(ctx, "x_dec", h, cfg.channels, filter_size=sks,
                       stride=(2, 2))
    return jnp.clip((x_out + 0.5) * 256.0, 0.0, 255.0)
