"""Distribution golden tests (SURVEY.md §4.3) against scipy."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from iaf_tpu.distributions import (
    DiagonalGaussian,
    bernoulli_logp,
    compute_lowerbound,
    discretized_logistic,
    gaussian_diag_logps,
    logsumexp,
)


def test_gaussian_logps_vs_scipy():
    rng = np.random.RandomState(0)
    mean = rng.randn(5, 7).astype(np.float32)
    logvar = rng.randn(5, 7).astype(np.float32)
    x = rng.randn(5, 7).astype(np.float32)
    got = np.asarray(gaussian_diag_logps(mean, logvar, x))
    want = scipy.stats.norm.logpdf(x, loc=mean, scale=np.exp(0.5 * logvar))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    d = DiagonalGaussian(jnp.asarray(mean), jnp.asarray(logvar))
    np.testing.assert_allclose(np.asarray(d.logps(jnp.asarray(x))), want,
                               rtol=1e-5)


def test_gaussian_sample_moments():
    d = DiagonalGaussian(jnp.full((200_000,), 1.5), jnp.full((200_000,), -0.6))
    s = np.asarray(d.sample(jax.random.PRNGKey(0)))
    assert abs(s.mean() - 1.5) < 5e-3
    assert abs(s.std() - math.exp(-0.3)) < 5e-3


def test_discretized_logistic_vs_exact_cdf_difference():
    """logp must equal log(CDF(bin right edge) - CDF(bin left edge)) with the
    sample snapped to its bin, CDF = logistic."""
    binsize = 1.0 / 256.0
    rng = np.random.RandomState(1)
    mean = (0.2 * rng.randn(4, 3, 3, 2)).astype(np.float32)
    logscale = np.float32(-3.0)
    # samples already in the model's [-0.5, 0.5) domain, on the bin grid
    sample = (np.floor(rng.uniform(-0.5, 0.5, (4, 3, 3, 2)) / binsize)
              * binsize).astype(np.float32)
    got = np.asarray(discretized_logistic(mean, logscale, sample, binsize))
    scale = math.exp(-3.0)
    lo = scipy.stats.logistic.cdf(sample, loc=mean, scale=scale)
    hi = scipy.stats.logistic.cdf(sample + binsize, loc=mean, scale=scale)
    want = np.log(hi - lo + 1e-7).reshape(4, -1).sum(axis=1)
    # f32 sigmoid-difference vs scipy f64: ~1e-3 relative is expected
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_discretized_logistic_clip_boundary_finite():
    # extreme means / tiny scales must stay finite thanks to the +1e-7
    mean = jnp.full((2, 2, 2, 1), 100.0)
    out = discretized_logistic(mean, jnp.float32(-10.0),
                               jnp.zeros((2, 2, 2, 1)))
    assert np.isfinite(np.asarray(out)).all()


def test_logsumexp_matches_scipy():
    x = np.random.RandomState(2).randn(6, 50).astype(np.float32) * 10
    np.testing.assert_allclose(np.asarray(logsumexp(jnp.asarray(x))),
                               scipy.special.logsumexp(x, axis=-1), rtol=1e-5)


def test_compute_lowerbound_k1_is_plain_elbo():
    log_pxz = jnp.asarray([1.0, -2.0, 3.0])
    kl = jnp.asarray([0.5, 0.1, 2.0])
    np.testing.assert_allclose(np.asarray(compute_lowerbound(log_pxz, kl, 1)),
                               np.asarray(kl - log_pxz))


def test_compute_lowerbound_monotone_in_k():
    """IW bound tightens (negative bound decreases in expectation) as k grows."""
    rng = np.random.RandomState(3)
    B, kmax = 64, 64
    log_w = rng.randn(B * kmax).astype(np.float32) - 1.0
    log_pxz = jnp.asarray(log_w)
    kl = jnp.zeros_like(log_pxz)
    vals = []
    for k in (1, 4, 16, 64):
        v = compute_lowerbound(log_pxz, kl, k)
        vals.append(float(np.asarray(v).mean()))
    assert vals[0] > vals[1] > vals[2] > vals[3]


def test_bernoulli_logp():
    logits = jnp.asarray([[2.0, -1.0, 0.0]])
    x = jnp.asarray([[1.0, 0.0, 1.0]])
    got = float(bernoulli_logp(logits, x)[0])
    p = 1 / (1 + np.exp(-np.array([2.0, -1.0, 0.0])))
    want = math.log(p[0]) + math.log(1 - p[1]) + math.log(p[2])
    assert abs(got - want) < 1e-5
