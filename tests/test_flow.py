"""Flow correctness (SURVEY.md §4.2): log-det-Jacobian vs autodiff slogdet,
inverse ∘ forward = identity, both parameterizations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iaf_tpu.core.config import Config
from iaf_tpu.models.cvae import iaf_flow
from iaf_tpu.models.inversion import (invert_ar_exact,
                                      invert_ar_fixed_point,
                                      invert_ar_jacobi)
from iaf_tpu.nn import layers as L
from iaf_tpu.nn.layers import Ctx

H = W = 3
C = 2
D = H * W * C


def make_flow(flow_update: str, seed=0):
    cfg = Config(z_size=C, h_size=4, depth_ar=2, ar_hidden_size=4,
                 flow_update=flow_update, kernel_size=3)
    context = 0.3 * jax.random.normal(jax.random.PRNGKey(seed + 100),
                                      (1, H, W, 4))
    z0 = jax.random.normal(jax.random.PRNGKey(seed + 1), (1, H, W, C))
    ctx = Ctx(params={}, rng=jax.random.PRNGKey(seed), init=True)
    iaf_flow(cfg, ctx, z0, context, jnp.zeros_like(z0))
    params = ctx.root

    def fwd(z):
        z_out, logq = iaf_flow(cfg, Ctx(params=params), z, context,
                               jnp.zeros_like(z))
        return z_out, logq

    def ar_fn(z):
        m, s = L.ar_multiconv2d(Ctx(params=params), "ar1", z, context,
                                [4, 4], [C, C],
                                trim_rows=cfg.ar_row_trim,
                                merge_heads=cfg.merge_ar_heads)
        return m * 0.1, s * 0.1

    return cfg, fwd, ar_fn


@pytest.mark.parametrize("form", ["division", "gate"])
def test_logdet_matches_slogdet(form):
    _, fwd, _ = make_flow(form)
    z0 = jax.random.normal(jax.random.PRNGKey(7), (1, H, W, C))

    def f_flat(zf):
        z = zf.reshape(1, H, W, C)
        z_out, _ = fwd(z)
        return z_out.reshape(-1)

    jac = jax.jacfwd(f_flat)(z0.reshape(-1))
    sign, logdet = np.linalg.slogdet(np.asarray(jac))
    assert sign > 0
    _, logq_delta = fwd(z0)
    # log q(z') = log q(z) + accumulated term; the accumulated term equals
    # -log|det dz'/dz|
    got = float(jnp.sum(logq_delta))
    np.testing.assert_allclose(got, -logdet, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("form", ["division", "gate"])
def test_exact_inversion_roundtrip(form):
    cfg, fwd, ar_fn = make_flow(form)
    z0 = jax.random.normal(jax.random.PRNGKey(9), (1, H, W, C))
    z_prime, _ = fwd(z0)
    z_rec = invert_ar_exact(ar_fn, z_prime, form=form,
                            gate_bias=cfg.gate_forget_bias)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z0), atol=1e-4)


@pytest.mark.parametrize("form", ["division", "gate"])
def test_jacobi_inversion_roundtrip(form):
    cfg, fwd, ar_fn = make_flow(form)
    z0 = jax.random.normal(jax.random.PRNGKey(11), (1, H, W, C))
    z_prime, _ = fwd(z0)
    z_rec = invert_ar_jacobi(ar_fn, z_prime, iters=D, form=form,
                             gate_bias=cfg.gate_forget_bias)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z0), atol=1e-4)


@pytest.mark.parametrize("form", ["division", "gate"])
def test_fixed_point_inversion_early_exit(form):
    """The early-exit Jacobi loop must (a) invert to the same tolerance as
    the exact loop and (b) actually converge in fewer sweeps than the DAG
    depth bound D — the measured convergence-depth property invert_check
    reports (VERDICT r2 next #4)."""
    cfg, fwd, ar_fn = make_flow(form)
    z0 = jax.random.normal(jax.random.PRNGKey(13), (1, H, W, C))
    z_prime, _ = fwd(z0)
    z_rec, iters = invert_ar_fixed_point(ar_fn, z_prime, tol=1e-6, form=form,
                                         gate_bias=cfg.gate_forget_bias)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z0), atol=1e-4)
    iters = int(np.asarray(iters))
    assert 0 < iters < D, (iters, D)  # early exit really fired
    # jittable end-to-end (while_loop with dynamic trip count)
    z_rec2, iters2 = jax.jit(
        lambda zp: invert_ar_fixed_point(ar_fn, zp, tol=1e-6, form=form,
                                         gate_bias=cfg.gate_forget_bias)
    )(z_prime)
    np.testing.assert_allclose(np.asarray(z_rec2), np.asarray(z0), atol=1e-4)
    # jit fusion can move the delta across the tol boundary by one sweep
    assert abs(int(np.asarray(iters2)) - iters) <= 1, (iters2, iters)


def test_gate_update_definition():
    """Gate form: z' = σ(s+b)·z + (1−σ(s+b))·m and logq -= log σ(s+b)."""
    cfg = Config(z_size=C, h_size=4, depth_ar=1, ar_hidden_size=4,
                 flow_update="gate", gate_forget_bias=1.5)
    context = jnp.zeros((1, H, W, 4))
    z0 = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, C))
    ctx = Ctx(params={}, rng=jax.random.PRNGKey(2), init=True)
    z_out, logq = iaf_flow(cfg, ctx, z0, context, jnp.zeros_like(z0))
    params = ctx.root
    m, s = L.ar_multiconv2d(Ctx(params=params), "ar1", z0, context, [4], [C, C],
                            trim_rows=cfg.ar_row_trim,
                            merge_heads=cfg.merge_ar_heads)
    m, s = m * 0.1, s * 0.1
    g = jax.nn.sigmoid(s + 1.5)
    np.testing.assert_allclose(np.asarray(z_out),
                               np.asarray(g * z0 + (1 - g) * m), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logq),
                               np.asarray(-jnp.log(g)), atol=1e-5)
