"""Model-level tests: init/apply consistency, free-bits semantics, sampling,
and a short c1-style training run that must reduce the loss (SURVEY.md §4.4,
§4.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iaf_tpu import optim
from iaf_tpu.core.config import Config
from iaf_tpu.models import cvae


def tiny_cfg(**kw):
    base = dict(dataset="synthetic", image_size=8, channels=3, z_size=2,
                h_size=8, depth=1, num_blocks=2, depth_ar=1, ar_hidden_size=8,
                kl_min=0.1, batch_size=4, seed=0)
    base.update(kw)
    return Config(**base)


def fake_batch(cfg, n=4, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (n, cfg.image_size, cfg.image_size,
                                cfg.channels)).astype(np.uint8)


def test_init_and_forward_shapes():
    cfg = tiny_cfg()
    x = fake_batch(cfg)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    out = cvae.apply_fn(cfg, params, jax.random.PRNGKey(1), x)
    assert out.loss.shape == ()
    assert out.elbo_nats.shape == (4,)
    assert out.x_out.shape == (4, 8, 8, 3)
    assert np.isfinite(float(out.loss))
    assert np.isfinite(np.asarray(out.elbo_nats)).all()
    # stacked per-layer params: every leaf carries leading dim L
    n_layers = cfg.num_blocks * cfg.depth
    assert "blocks" in params
    for leaf in jax.tree.leaves(params["blocks"]):
        assert leaf.shape[0] == n_layers, leaf.shape
    assert "dec_log_stdv" in params and "h_top" in params


def test_forward_deterministic_given_key():
    cfg = tiny_cfg()
    x = fake_batch(cfg)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    o1 = cvae.apply_fn(cfg, params, jax.random.PRNGKey(5), x)
    o2 = cvae.apply_fn(cfg, params, jax.random.PRNGKey(5), x)
    np.testing.assert_array_equal(np.asarray(o1.elbo_nats),
                                  np.asarray(o2.elbo_nats))
    o3 = cvae.apply_fn(cfg, params, jax.random.PRNGKey(6), x)
    assert not np.array_equal(np.asarray(o1.elbo_nats),
                              np.asarray(o3.elbo_nats))


def test_free_bits_clamps_only_training_objective():
    """With kl_min far above the actual KL the clamp must bind: kl_obj ==
    kl_min * z_size * n_layers exactly, while kl_cost stays raw
    (SURVEY.md §4.4). With kl_min=0 the two coincide in batch mean."""
    big = 1e12
    cfg = tiny_cfg(kl_min=big, flow="diag")
    x = fake_batch(cfg)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    out = cvae.apply_fn(cfg, params, jax.random.PRNGKey(1), x)
    n_layers = cfg.num_blocks * cfg.depth
    np.testing.assert_allclose(float(out.kl_obj),
                               big * cfg.z_size * n_layers, rtol=1e-6)
    assert float(out.kl_cost) < big  # raw KL untouched by the clamp

    # unclamped: batch-mean kl_obj == batch-mean kl_cost
    cfg0 = tiny_cfg(kl_min=0.0, flow="diag")
    params0 = cvae.init_params(cfg0, jax.random.PRNGKey(0), x)
    out0 = cvae.apply_fn(cfg0, params0, jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(float(out0.kl_obj), float(out0.kl_cost),
                               rtol=1e-6)


def test_free_bits_gradient_path():
    """When per-channel KL < kl_min, the clamp is active -> d kl_obj / d
    params ~ 0 through the KL term; with kl_min=0 gradients flow."""
    cfg = tiny_cfg(kl_min=1e15)  # clamp certainly active at random init
    x = fake_batch(cfg)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)

    def kl_obj_of(p):
        return cvae.apply_fn(cfg, p, jax.random.PRNGKey(1), x).kl_obj

    g = jax.grad(kl_obj_of)(params)
    leaves = jax.tree.leaves(g)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total < 1e-5, "clamped free-bits KL must not produce grads"


@pytest.mark.parametrize("flow", ["diag", "iaf"])
def test_short_training_reduces_loss(flow):
    cfg = tiny_cfg(flow=flow, kl_min=0.0, learning_rate=0.01)
    x = fake_batch(cfg, n=8)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    state = optim.init_state(params)

    @jax.jit
    def step(params, state, key):
        def loss_fn(p):
            return cvae.apply_fn(cfg, p, key, x).loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, state = optim.apply_updates(
            params, grads, state, lr=cfg.learning_rate)
        return params, state, loss

    losses = []
    for i in range(30):
        params, state, loss = step(params, state, jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 1.0, losses


def test_eval_k_reduces_bound():
    cfg = tiny_cfg(kl_min=0.0)
    x = fake_batch(cfg, n=4)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    nats_k1 = []
    nats_k16 = []
    for i in range(8):
        key = jax.random.PRNGKey(i)
        nats_k1.append(np.asarray(
            cvae.apply_fn(cfg, params, key, x, mode="eval", k=1).elbo_nats))
        nats_k16.append(np.asarray(
            cvae.apply_fn(cfg, params, key, x, mode="eval", k=16).elbo_nats))
    assert np.mean(nats_k16) < np.mean(nats_k1)


def test_sampling_path():
    cfg = tiny_cfg()
    x = fake_batch(cfg)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    imgs = cvae.cvae_sample(cfg, params, jax.random.PRNGKey(2), num=3,
                            temperature=0.8)
    assert imgs.shape == (3, 8, 8, 3)
    arr = np.asarray(imgs)
    assert (arr >= 0).all() and (arr <= 255).all()
    imgs2 = cvae.cvae_sample(cfg, params, jax.random.PRNGKey(2), num=3,
                             temperature=0.8)
    np.testing.assert_array_equal(np.asarray(imgs2), arr)


def test_gate_flow_trains():
    cfg = tiny_cfg(flow_update="gate", kl_min=0.0)
    x = fake_batch(cfg)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    out = cvae.apply_fn(cfg, params, jax.random.PRNGKey(1), x)
    assert np.isfinite(float(out.loss))


def test_dense_ar_kind():
    cfg = tiny_cfg(ar_kind="dense")
    x = fake_batch(cfg)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    out = cvae.apply_fn(cfg, params, jax.random.PRNGKey(1), x)
    assert np.isfinite(float(out.loss))
