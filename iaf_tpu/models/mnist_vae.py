"""Vector-latent VAE with dense-MADE IAF posterior (the MNIST model family).

Reference parity: the Theano stack — ``models/cvae1.py`` constructor +
``graphy/nodes/ar.py`` masked dense AR layers + ``train.py`` epoch driver
(SURVEY.md §2.2): conv encoder to a latent *vector* z, a chain of
``flow_depth`` MADE-dense IAF steps (ordering reversed between steps, the
standard deep-IAF construction from arXiv:1606.04934 §4), Bernoulli
likelihood on dynamically-binarized MNIST, free-bits KL per z-dimension,
Adamax + Polyak. Paper targets: ~79.1 nats NLL with deep IAF, ~81.1 diag
(BASELINE.md).

Same functional Ctx/params design as ``cvae.py``; supports both the
"division" and "gate" (sigmoid-forget, Theano-native) flow updates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from iaf_tpu.core.config import Config
from iaf_tpu.distributions import (
    DiagonalGaussian,
    bernoulli_logp,
    compute_lowerbound,
)
from iaf_tpu.nn import layers as L
from iaf_tpu.nn.layers import Ctx

LOG2 = 0.6931471805599453


class MnistOut(NamedTuple):
    loss: jax.Array
    elbo_nats: jax.Array      # per-example negative bound [B]
    nll_nats: jax.Array       # scalar mean (the paper's reported metric)
    kl_obj: jax.Array
    kl_cost: jax.Array
    log_pxz: jax.Array
    log_w: jax.Array
    logits: jax.Array


def _encoder(cfg: Config, ctx: Ctx, x: jax.Array):
    hs = cfg.h_size
    h = L.conv2d(ctx, "enc1", x, hs, filter_size=(5, 5), stride=(2, 2))
    h = L.elu(h)
    h = L.conv2d(ctx, "enc2", h, 2 * hs, filter_size=(5, 5), stride=(2, 2))
    h = L.elu(h)
    h = h.reshape(h.shape[0], -1)
    stats = L.dense(ctx, "enc_out", h, 2 * cfg.z_size,
                    init_scale=cfg.stat_init_scale)
    context = L.dense(ctx, "enc_context", h, cfg.ar_hidden)
    qz_mean = stats[:, : cfg.z_size]
    qz_logsd = stats[:, cfg.z_size:]
    return qz_mean, qz_logsd, context


def _decoder(cfg: Config, ctx: Ctx, z: jax.Array):
    hs = cfg.h_size
    hw = cfg.image_size // 4  # two stride-2 deconvs back to image_size
    h = L.dense(ctx, "dec_in", z, hw * hw * 2 * hs)
    h = L.elu(h).reshape(-1, hw, hw, 2 * hs)
    h = L.deconv2d(ctx, "dec1", h, hs, filter_size=(5, 5), stride=(2, 2))
    h = L.elu(h)
    logits = L.deconv2d(ctx, "dec2", h, cfg.channels, filter_size=(5, 5),
                        stride=(2, 2))
    return logits


def _iaf_chain(cfg: Config, ctx: Ctx, z: jax.Array, context: jax.Array,
               logqs: jax.Array):
    """``flow_depth`` MADE-dense IAF steps with ordering reversed between
    steps (deep IAF, arXiv:1606.04934 §4)."""
    n_h = [cfg.ar_hidden] * max(cfg.depth_ar, 1)
    for t in range(cfg.flow_depth):
        sub = ctx.scope(f"flow_{t}")
        m, s = L.ar_multidense(sub, "made", z, context, n_h,
                               [cfg.z_size, cfg.z_size])
        m = 0.1 * m
        s = 0.1 * s
        if cfg.flow_update == "division":
            z = (z - m) * jnp.exp(-s)
            logqs = logqs + s
        else:  # gate (Theano-native)
            gate = jax.nn.sigmoid(s + cfg.gate_forget_bias)
            z = gate * z + (1.0 - gate) * m
            logqs = logqs - jax.nn.log_sigmoid(s + cfg.gate_forget_bias)
        # reverse the AR ordering between successive steps
        if t + 1 < cfg.flow_depth:
            z = jnp.flip(z, axis=-1)
            logqs = jnp.flip(logqs, axis=-1)
    return z, logqs


def forward(cfg: Config, ctx: Ctx, x: jax.Array, mode: str = "train",
            k: int | None = None) -> MnistOut:
    """``x`` uint8/float in [0, 256); Bernoulli on x > 127.5 (the feed does
    dynamic binarization; this threshold is exact on already-binary 0/255)."""
    k = cfg.k if k is None else k
    x = x.astype(jnp.float32) / 255.0
    if k > 1:
        x = jnp.repeat(x, k, axis=0)
    x_in = x - 0.5  # centered encoder input

    qz_mean, qz_logsd, context = _encoder(cfg, ctx, x_in)
    posterior = DiagonalGaussian(qz_mean, 2.0 * qz_logsd)
    z = posterior.sample(ctx.key("z"))
    logqs = posterior.logps(z)
    if cfg.flow == "iaf" and cfg.flow_depth > 0:
        z, logqs = _iaf_chain(cfg, ctx, z, context, logqs)
    # standard N(0, I) prior on the vector latent
    logps = -0.5 * (jnp.log(2 * jnp.pi) + jnp.square(z))
    kl_cost = logqs - logps  # [B, z]

    if cfg.kl_min > 0:
        kl_ave = jnp.mean(kl_cost, axis=0, keepdims=True)
        kl_ave = jnp.maximum(kl_ave, cfg.kl_min)
        kl_obj = jnp.sum(jnp.broadcast_to(kl_ave, kl_cost.shape), axis=1)
    else:
        kl_obj = jnp.sum(kl_cost, axis=1)
    kl_cost = jnp.sum(kl_cost, axis=1)

    logits = _decoder(cfg, ctx, z)
    log_pxz = bernoulli_logp(logits, x)

    loss = jnp.mean(kl_obj - log_pxz)
    elbo_nats = compute_lowerbound(log_pxz, kl_cost, k)
    return MnistOut(
        loss=loss,
        elbo_nats=elbo_nats,
        nll_nats=jnp.mean(elbo_nats),
        kl_obj=jnp.mean(kl_obj),
        kl_cost=jnp.mean(kl_cost),
        log_pxz=jnp.mean(log_pxz),
        log_w=log_pxz - kl_cost,
        logits=logits,
    )


def init_params(cfg: Config, rng: jax.Array, sample_batch: jax.Array):
    ctx = Ctx(params={}, rng=rng, init=True)
    forward(cfg, ctx, sample_batch, mode="train")
    return ctx.root


def apply_fn(cfg: Config, params, rng: jax.Array, x: jax.Array,
             mode: str = "train", k: int | None = None) -> MnistOut:
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    return forward(cfg, Ctx(params=params, rng=rng, compute_dtype=dt), x,
                   mode=mode, k=k)


def sample(cfg: Config, params, rng: jax.Array, num: int,
           temperature: float = 1.0) -> jax.Array:
    """Decode z ~ N(0, T^2 I) to Bernoulli means in [0, 255]."""
    ctx = Ctx(params=params, rng=rng)
    z = temperature * jax.random.normal(ctx.key("z_prior"),
                                        (num, cfg.z_size))
    logits = _decoder(cfg, ctx, z)
    return jax.nn.sigmoid(logits) * 255.0


def mnist_config(**overrides) -> Config:
    base = Config(
        dataset="mnist", image_size=28, channels=1, z_size=64, h_size=64,
        ar_hidden_size=640, depth_ar=2, flow_depth=2, flow="iaf",
        flow_update="division", ar_kind="dense", likelihood="bernoulli",
        binarize=True, kl_min=0.25, learning_rate=0.002, batch_size=100,
        eval_k=4096,
    )
    return base.replace(**overrides)
