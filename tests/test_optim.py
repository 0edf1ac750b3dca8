"""Adamax + Polyak vs a numpy oracle (SURVEY.md §4.5)."""

import jax.numpy as jnp
import numpy as np

from iaf_tpu import optim


def numpy_adamax_polyak(params, grads_seq, lr, b1, b2, eps, decay):
    p = {k: v.copy() for k, v in params.items()}
    m = {k: np.zeros_like(v) for k, v in params.items()}
    u = {k: np.zeros_like(v) for k, v in params.items()}
    e = {k: v.copy() for k, v in params.items()}
    for grads in grads_seq:
        for k in p:
            g = grads[k]
            m[k] = b1 * m[k] + (1 - b1) * g
            u[k] = np.maximum(b2 * u[k], np.abs(g))
            p[k] = p[k] - lr * m[k] / (u[k] + eps)
            e[k] = decay * e[k] + (1 - decay) * p[k]
    return p, m, u, e


def test_adamax_polyak_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    params = {"a": rng.randn(3, 4).astype(np.float32),
              "b": rng.randn(5).astype(np.float32)}
    grads_seq = [{k: rng.randn(*v.shape).astype(np.float32)
                  for k, v in params.items()} for _ in range(7)]
    lr, b1, b2, eps, decay = 0.01, 0.9, 0.999, 1e-8, 0.95

    jp = {k: jnp.asarray(v) for k, v in params.items()}
    state = optim.init_state(jp)
    for grads in grads_seq:
        jg = {k: jnp.asarray(v) for k, v in grads.items()}
        jp, state = optim.apply_updates(
            jp, jg, state, lr=lr, beta1=b1, beta2=b2, eps=eps,
            polyak_decay=decay)

    p, m, u, e = numpy_adamax_polyak(params, grads_seq, lr, b1, b2, eps, decay)
    for k in params:
        np.testing.assert_allclose(np.asarray(jp[k]), p[k], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.m[k]), m[k], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.u[k]), u[k], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.ema[k]), e[k], rtol=1e-5, atol=1e-6)
    assert int(state.step) == len(grads_seq)


def test_bias_correction_scales_lr():
    p = {"w": jnp.ones((2,))}
    g = {"w": jnp.ones((2,))}
    s0 = optim.init_state(p)
    p_nc, _ = optim.apply_updates(p, g, s0, lr=0.1, bias_correction=False)
    p_bc, _ = optim.apply_updates(p, g, optim.init_state(p), lr=0.1,
                                  bias_correction=True)
    # step 1: m = 0.1*g -> update 0.1*lr*g/(|g|+eps) without correction,
    # lr/(1-0.9) = 10x with correction
    d_nc = float(1.0 - p_nc["w"][0])
    d_bc = float(1.0 - p_bc["w"][0])
    np.testing.assert_allclose(d_bc / d_nc, 10.0, rtol=1e-4)


def test_grad_clip_global_norm():
    p = {"w": jnp.zeros((2,))}
    g = {"w": jnp.asarray([3.0, 4.0])}  # norm 5
    _, _ = optim.apply_updates(p, g, optim.init_state(p), lr=1.0, grad_clip=1.0)
    # With clip=1, effective grad = g/5; u = |g|/5, update = lr*(1-b1)*m/(u+eps)
    p2, st = optim.apply_updates(p, g, optim.init_state(p), lr=1.0,
                                 grad_clip=1.0)
    np.testing.assert_allclose(np.asarray(st.u["w"]), np.asarray([0.6, 0.8]),
                               rtol=1e-5)
