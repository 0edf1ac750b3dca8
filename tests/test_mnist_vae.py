"""MNIST vector-latent dense-MADE IAF model tests (SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iaf_tpu import optim
from iaf_tpu.models import mnist_vae


def tiny_cfg(**kw):
    return mnist_vae.mnist_config(
        image_size=8, z_size=4, h_size=8, ar_hidden_size=16, depth_ar=1,
        flow_depth=2, kl_min=0.0, **kw)


def fake_binary_batch(cfg, n=6, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, cfg.image_size, cfg.image_size, 1) > 0.7).astype(
        np.uint8) * 255


def test_forward_shapes_and_finite():
    cfg = tiny_cfg()
    x = fake_binary_batch(cfg)
    params = mnist_vae.init_params(cfg, jax.random.PRNGKey(0), x)
    out = mnist_vae.apply_fn(cfg, params, jax.random.PRNGKey(1), x)
    assert out.elbo_nats.shape == (6,)
    assert out.logits.shape == (6, 8, 8, 1)
    assert np.isfinite(float(out.loss))


@pytest.mark.parametrize("update", ["division", "gate"])
def test_logdet_matches_slogdet_vector_chain(update):
    """Full flow_depth=2 chain with ordering reversal: accumulated logq
    delta == -log|det J| of the composite transform."""
    cfg = tiny_cfg(flow_update=update)
    # init on a decent batch: the data-dependent g = 1/std calibration is
    # garbage on 2 samples (std of 2 points can be ~0 -> huge g -> exp(s)
    # overflow in the division flow)
    x = fake_binary_batch(cfg, n=16)
    params = mnist_vae.init_params(cfg, jax.random.PRNGKey(0), x)
    from iaf_tpu.nn.layers import Ctx

    # Probe IN distribution: the MADE layers' data-dependent init calibrated
    # (g, b) against real encoder contexts and real posterior samples (step
    # t's weights against step t-1's output scale), so an arbitrary z/zero
    # context can push 0.1*s past exp() overflow on this tiny config. Use
    # the model's own posterior sample + context, like forward() does.
    from iaf_tpu.distributions import DiagonalGaussian
    qz_mean, qz_logsd, ctx_enc = mnist_vae._encoder(
        cfg, Ctx(params=params), x.astype(jnp.float32) / 255.0 - 0.5)
    posterior = DiagonalGaussian(qz_mean[:1], 2.0 * qz_logsd[:1])
    context = ctx_enc[:1]
    z0 = posterior.sample(jax.random.PRNGKey(5))

    def chain(z):
        zo, logq = mnist_vae._iaf_chain(
            cfg, Ctx(params=params), z, context, jnp.zeros_like(z))
        return zo, logq

    def flat(zf):
        return chain(zf[None])[0].reshape(-1)

    jac = np.asarray(jax.jacfwd(flat)(z0[0]))
    sign, logdet = np.linalg.slogdet(jac)
    assert sign > 0
    _, logq = chain(z0)
    np.testing.assert_allclose(float(jnp.sum(logq)), -logdet,
                               rtol=1e-4, atol=1e-5)


def test_training_reduces_loss():
    cfg = tiny_cfg(learning_rate=0.005)
    x = fake_binary_batch(cfg, n=16)
    params = mnist_vae.init_params(cfg, jax.random.PRNGKey(0), x)
    state = optim.init_state(params)

    @jax.jit
    def step(params, state, key):
        loss, grads = jax.value_and_grad(
            lambda p: mnist_vae.apply_fn(cfg, p, key, x).loss)(params)
        params, state = optim.apply_updates(params, grads, state,
                                            lr=cfg.learning_rate)
        return params, state, loss

    losses = []
    for i in range(40):
        params, state, loss = step(params, state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_iw_eval_tightens():
    cfg = tiny_cfg()
    x = fake_binary_batch(cfg, n=4)
    params = mnist_vae.init_params(cfg, jax.random.PRNGKey(0), x)
    n1 = np.mean([float(jnp.mean(mnist_vae.apply_fn(
        cfg, params, jax.random.PRNGKey(i), x, k=1).elbo_nats))
        for i in range(6)])
    n16 = np.mean([float(jnp.mean(mnist_vae.apply_fn(
        cfg, params, jax.random.PRNGKey(i), x, k=16).elbo_nats))
        for i in range(6)])
    assert n16 < n1


def test_sample_shape_range():
    cfg = tiny_cfg()
    x = fake_binary_batch(cfg)
    params = mnist_vae.init_params(cfg, jax.random.PRNGKey(0), x)
    imgs = np.asarray(mnist_vae.sample(cfg, params, jax.random.PRNGKey(3), 5))
    assert imgs.shape == (5, 8, 8, 1)
    assert imgs.min() >= 0 and imgs.max() <= 255
