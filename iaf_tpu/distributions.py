"""Distributions and variational objectives.

Reference parity: ``tf_utils/distributions.py`` — ``DiagonalGaussian``,
``discretized_logistic``, ``logsumexp``, ``compute_lowerbound`` — and the
Theano mirror ``graphy/nodes/rand.py``. (Reference mount empty at survey
time; symbols cited per SURVEY.md §0/§2.1.)

Pure jnp; everything here traces into the jitted train/eval step. The
distributed (sharded-k) importance-weighted bound lives in
``iaf_tpu.parallel.eval_step``; this module is the single-device math.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

_LOG2PI = math.log(2.0 * math.pi)


@dataclass(frozen=True)
class DiagonalGaussian:
    """N(mean, exp(logvar)) with per-element diagonal covariance.

    Matches ``tf_utils/distributions.py — class DiagonalGaussian``: the
    constructor takes *logvar* (callers pass ``2 * logsd``), ``sample`` is a
    reparameterized draw, ``logps(x)`` the elementwise log-density.
    """

    mean: jax.Array
    logvar: jax.Array

    def sample(self, key: jax.Array) -> jax.Array:
        noise = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + jnp.exp(0.5 * self.logvar) * noise

    def logps(self, x: jax.Array) -> jax.Array:
        return -0.5 * (
            _LOG2PI + self.logvar + jnp.square(x - self.mean) * jnp.exp(-self.logvar)
        )


def gaussian_diag_logps(mean, logvar, x):
    """Functional form of ``DiagonalGaussian.logps``."""
    return -0.5 * (_LOG2PI + logvar + jnp.square(x - mean) * jnp.exp(-logvar))


def discretized_logistic(mean, logscale, sample, binsize: float = 1.0 / 256.0):
    """Log-likelihood of ``sample`` under a logistic density discretized into
    ``binsize`` bins, summed over all but the batch dim.

    Matches ``tf_utils/distributions.py — discretized_logistic``:
      scale = exp(logscale)
      x = (floor(sample / binsize) * binsize - mean) / scale
      logp = log( sigmoid(x + binsize / scale) - sigmoid(x) + 1e-7 )
    ``logscale`` is the scalar learned ``dec_log_stdv``. The ``floor`` snaps
    the (already /256-scaled, mean-shifted) sample to its bin's left edge so
    the probability mass is bin-exact.
    """
    scale = jnp.exp(logscale)
    x = (jnp.floor(sample / binsize) * binsize - mean) / scale
    logp = jnp.log(
        jax.nn.sigmoid(x + binsize / scale) - jax.nn.sigmoid(x) + 1e-7
    )
    return jnp.sum(logp.reshape(logp.shape[0], -1), axis=1)


def logsumexp(x: jax.Array) -> jax.Array:
    """Stable logsumexp over the last axis (reference helper parity)."""
    m = jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    return jnp.squeeze(m, -1) + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1))


def compute_lowerbound(log_pxz, sum_kl_costs, k: int = 1):
    """Negative k-sample importance-weighted bound per example.

    Matches ``tf_utils/distributions.py — compute_lowerbound``: for k == 1
    returns the plain negative ELBO ``sum_kl_costs - log_pxz``; for k > 1
    reshapes to ``[B, k]`` and returns ``-(logsumexp(log_pxz - kl) - log k)``.
    """
    if k == 1:
        return sum_kl_costs - log_pxz
    log_w = jnp.reshape(log_pxz - sum_kl_costs, (-1, k))
    return -(logsumexp(log_w) - math.log(float(k)))


def bernoulli_logp(logits, sample):
    """Bernoulli log-likelihood summed over all but batch (MNIST path;
    ``graphy/nodes/rand.py`` bernoulli node parity)."""
    logp = -jnp.logaddexp(0.0, jnp.where(sample > 0.5, -logits, logits))
    return jnp.sum(logp.reshape(logp.shape[0], -1), axis=1)
