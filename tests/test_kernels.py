"""Pallas kernel tests vs XLA twins (interpret mode on CPU; SURVEY.md §7.4):
golden cross-checks, gradient correctness, autoregressivity preserved."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iaf_tpu.nn.masks import get_conv_ar_mask
from iaf_tpu.ops import (
    disc_logistic_logp,
    disc_logistic_xla,
    fold_mask,
    iaf_update,
    iaf_update_xla,
    masked_conv2d,
    use_pallas,
    xla_conv2d_same,
)


def test_use_pallas_switch():
    assert use_pallas("pallas") is True
    assert use_pallas("xla") is False
    # "auto" admits an op class only behind a WINNING measured A/B vs the
    # XLA twin (ops/__init__.py policy); as of the last sweep XLA wins
    # everywhere, so auto is False on every backend (including TPU).
    assert use_pallas("auto") is False


@pytest.mark.parametrize("shape,cout,k", [((2, 8, 8, 4), 8, 3),
                                          ((3, 5, 7, 2), 4, 3),
                                          ((1, 4, 4, 8), 8, 5)])
def test_masked_conv_matches_xla(shape, cout, k):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape)
    mask = get_conv_ar_mask(k, k, shape[-1], cout, True)
    w = jax.random.normal(jax.random.PRNGKey(1),
                          (k, k, shape[-1], cout)) * mask
    got = masked_conv2d(x, w)
    want = xla_conv2d_same(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_masked_conv_grads_match_xla():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, 3))
    mask = get_conv_ar_mask(3, 3, 3, 3, False)
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 3)) * mask

    def loss_pl(x, w):
        return jnp.sum(jnp.tanh(masked_conv2d(x, w)))

    def loss_xla(x, w):
        return jnp.sum(jnp.tanh(xla_conv2d_same(x, w)))

    gx1, gw1 = jax.grad(loss_pl, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-5, atol=1e-5)


def test_fold_mask_matches_layer_weights():
    V = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 4, 4))
    g = jnp.asarray([1.0, 2.0, 0.5, 1.5])
    mask = get_conv_ar_mask(3, 3, 4, 4, True)
    W = fold_mask(V, g, mask)
    vn = V * jax.lax.rsqrt(jnp.sum(V**2, axis=(0, 1, 2), keepdims=True)
                           + 1e-12)
    np.testing.assert_allclose(np.asarray(W), np.asarray(vn * mask * g),
                               rtol=1e-6)
    # masked positions stay exactly zero
    assert float(jnp.max(jnp.abs(W * (1 - mask)))) == 0.0


def test_iaf_update_matches_xla_and_grads():
    shape = (3, 4, 4, 2)
    z = jax.random.normal(jax.random.PRNGKey(5), shape)
    m = 0.1 * jax.random.normal(jax.random.PRNGKey(6), shape)
    s = 0.1 * jax.random.normal(jax.random.PRNGKey(7), shape)
    z1, d1 = iaf_update(z, m, s)
    z2, d2 = iaf_update_xla(z, m, s)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)

    def f1(z, m, s):
        zz, dd = iaf_update(z, m, s)
        return jnp.sum(zz**2) + jnp.sum(dd * 3.0)

    def f2(z, m, s):
        zz, dd = iaf_update_xla(z, m, s)
        return jnp.sum(zz**2) + jnp.sum(dd * 3.0)

    g1 = jax.grad(f1, argnums=(0, 1, 2))(z, m, s)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(z, m, s)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_disc_logistic_matches_xla_and_grads():
    shape = (4, 4, 4, 3)
    mean = 0.2 * jax.random.normal(jax.random.PRNGKey(8), shape)
    sample = jnp.asarray(
        np.floor(np.random.RandomState(0).uniform(-0.5, 0.5, shape) * 256)
        / 256.0, jnp.float32)
    logscale = jnp.asarray(-2.5)
    got = disc_logistic_logp(mean, logscale, sample)
    want = disc_logistic_xla(mean, logscale, sample)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def f1(mean, logscale):
        return jnp.sum(disc_logistic_logp(mean, logscale, sample))

    def f2(mean, logscale):
        return jnp.sum(disc_logistic_xla(mean, logscale, sample))

    g1 = jax.grad(f1, argnums=(0, 1))(mean, logscale)
    g2 = jax.grad(f2, argnums=(0, 1))(mean, logscale)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_model_forward_same_with_pallas_kernels():
    """Full model forward: kernels=pallas (interpret) ≡ kernels=xla."""
    from iaf_tpu.core.config import Config
    from iaf_tpu.models import cvae

    base = dict(dataset="synthetic", image_size=8, channels=3, z_size=2,
                h_size=8, depth=1, num_blocks=1, depth_ar=1, ar_hidden_size=8,
                kl_min=0.0, seed=0)
    x = np.random.RandomState(0).randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    cfg_x = Config(**base, kernels="xla")
    cfg_p = Config(**base, kernels="pallas")
    params = cvae.init_params(cfg_x, jax.random.PRNGKey(0), x)
    out_x = cvae.apply_fn(cfg_x, params, jax.random.PRNGKey(1), x)
    out_p = cvae.apply_fn(cfg_p, params, jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(float(out_x.loss), float(out_p.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_x.elbo_nats),
                               np.asarray(out_p.elbo_nats), rtol=1e-5)
