"""Weight-norm layer + data-dependent init tests (SURVEY.md §3.5, §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from iaf_tpu.nn import layers as L
from iaf_tpu.nn.layers import Ctx
from iaf_tpu.nn.masks import get_conv_ar_mask


def _init_apply(fn, x, seed=0):
    """Run fn in init mode, then in apply mode with the created params."""
    ctx = Ctx(params={}, rng=jax.random.PRNGKey(seed), init=True)
    y_init = fn(ctx, x)
    params = ctx.root
    y_apply = fn(Ctx(params=params, rng=jax.random.PRNGKey(seed)), x)
    return params, y_init, y_apply


def test_conv2d_data_dependent_init_normalizes():
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 8, 4)) * 3.0 + 1.0
    fn = lambda ctx, x: L.conv2d(ctx, "c", x, 6, filter_size=(3, 3))
    params, y_init, y_apply = _init_apply(fn, x)
    # init output is per-channel standardized
    m = np.asarray(jnp.mean(y_init, axis=(0, 1, 2)))
    s = np.asarray(jnp.std(y_init, axis=(0, 1, 2)))
    np.testing.assert_allclose(m, 0.0, atol=1e-4)
    np.testing.assert_allclose(s, 1.0, atol=1e-3)
    # apply with calibrated params reproduces the init output
    np.testing.assert_allclose(np.asarray(y_apply), np.asarray(y_init),
                               atol=1e-4)
    assert set(params["c"].keys()) == {"V", "g", "b"}


def test_conv2d_init_scale():
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 8, 8, 4))
    fn = lambda ctx, x: L.conv2d(ctx, "c", x, 6, init_scale=0.1)
    _, y_init, _ = _init_apply(fn, x)
    s = np.asarray(jnp.std(y_init, axis=(0, 1, 2)))
    np.testing.assert_allclose(s, 0.1, atol=1e-3)


def test_deconv2d_shape_and_init():
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 4, 4, 5))
    fn = lambda ctx, x: L.deconv2d(ctx, "d", x, 3, filter_size=(5, 5),
                                   stride=(2, 2))
    _, y_init, y_apply = _init_apply(fn, x)
    assert y_init.shape == (8, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(y_apply), np.asarray(y_init),
                               atol=1e-4)
    s = np.asarray(jnp.std(y_init, axis=(0, 1, 2)))
    np.testing.assert_allclose(s, 1.0, atol=1e-3)


def test_dense_init_and_apply_consistency():
    x = jax.random.normal(jax.random.PRNGKey(4), (32, 7))
    fn = lambda ctx, x: L.dense(ctx, "fc", x, 11)
    _, y_init, y_apply = _init_apply(fn, x)
    np.testing.assert_allclose(np.asarray(y_apply), np.asarray(y_init),
                               atol=1e-4)


def test_masked_conv_equals_xla_conv_with_masked_weights():
    """ar_conv2d output == plain conv with mask ⊙ W (golden cross-check)."""
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 6, 6, 4))
    ctx = Ctx(params={}, rng=jax.random.PRNGKey(6), init=True)
    y = L.ar_conv2d(ctx, "arc", x, 4, zerodiagonal=True)
    params = ctx.root
    y2 = L.ar_conv2d(Ctx(params=params), "arc", x, 4, zerodiagonal=True)
    # manual: normalize V, mask, scale by g, conv, + b
    V = params["arc"]["V"]
    g = params["arc"]["g"]
    b = params["arc"]["b"]
    mask = jnp.asarray(get_conv_ar_mask(3, 3, 4, 4, True))
    vn = V * jax.lax.rsqrt(jnp.sum(V**2, axis=(0, 1, 2), keepdims=True) + 1e-12)
    W = vn * mask * g
    want = jax.lax.conv_general_dilated(
        x, W, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(y2), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-4)


def test_masked_conv_row_trim_5x5():
    """The static kernel-row trim (zero rows below center dropped, asymmetric
    padding, opt-in via trim_rows) must match the full-kernel masked conv."""
    x = jax.random.normal(jax.random.PRNGKey(15), (2, 7, 9, 3))
    ctx = Ctx(params={}, rng=jax.random.PRNGKey(16), init=True)
    L.ar_conv2d(ctx, "arc5", x, 6, filter_size=(5, 5), zerodiagonal=False,
                trim_rows=True)
    params = ctx.root
    y = L.ar_conv2d(Ctx(params=params), "arc5", x, 6, filter_size=(5, 5),
                    zerodiagonal=False, trim_rows=True)
    V, g, b = params["arc5"]["V"], params["arc5"]["g"], params["arc5"]["b"]
    mask = jnp.asarray(get_conv_ar_mask(5, 5, 3, 6, False))
    vn = V * jax.lax.rsqrt(jnp.sum(V**2, axis=(0, 1, 2), keepdims=True) + 1e-12)
    want = jax.lax.conv_general_dilated(
        x, vn * mask * g, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-5)


def test_ar_multiconv2d_autoregressive_end_to_end():
    """Jacobian of each (m, s) head w.r.t. z must be strictly lower-triangular
    in raster-then-channel AR order (zero diagonal end to end)."""
    H = W = 3
    C = 2
    context = jnp.zeros((1, H, W, 4))
    ctx = Ctx(params={}, rng=jax.random.PRNGKey(7), init=True)
    z0 = jax.random.normal(jax.random.PRNGKey(8), (1, H, W, C))
    L.ar_multiconv2d(ctx, "ar", z0, context, [4, 4], [C, C])
    params = ctx.root

    def f(z):
        outs = L.ar_multiconv2d(Ctx(params=params), "ar", z[None], context,
                                [4, 4], [C, C])
        return jnp.stack([o[0] for o in outs])  # [2, H, W, C]

    jac = np.asarray(jax.jacfwd(f)(z0[0]))  # [2,H,W,C, H,W,C]
    D = H * W * C
    jac2 = jac.reshape(2, D, D)
    for head in range(2):
        upper = np.triu(np.abs(jac2[head]) > 1e-8, k=0)  # incl. diagonal
        assert not upper.any(), f"head {head} violates strict AR"


def test_param_reuse_forbidden_in_apply():
    x = jnp.ones((2, 4, 4, 3))
    ctx = Ctx(params={}, rng=jax.random.PRNGKey(0))
    try:
        L.conv2d(ctx, "nope", x, 4)
    except KeyError:
        return
    raise AssertionError("apply mode should fail on missing params")


def test_ar_multiconv2d_merged_heads_autoregressive():
    """merge_heads=True must produce heads with the same strict-AR jacobian
    structure as the separate-conv path (identical masks, one conv)."""
    H = W = 3
    C = 2
    context = jnp.zeros((1, H, W, 4))
    ctx = Ctx(params={}, rng=jax.random.PRNGKey(7), init=True)
    z0 = jax.random.normal(jax.random.PRNGKey(8), (1, H, W, C))
    L.ar_multiconv2d(ctx, "ar", z0, context, [4, 4], [C, C],
                     merge_heads=True)
    params = ctx.root

    def f(z):
        outs = L.ar_multiconv2d(Ctx(params=params), "ar", z[None], context,
                                [4, 4], [C, C], merge_heads=True)
        return jnp.stack([o[0] for o in outs])

    jac = np.asarray(jax.jacfwd(f)(z0[0]))
    D = H * W * C
    jac2 = jac.reshape(2, D, D)
    for head in range(2):
        upper = np.triu(np.abs(jac2[head]) > 1e-8, k=0)
        assert not upper.any(), f"merged head {head} violates strict AR"
    # and the heads are not degenerate (nonzero lower-triangular deps)
    assert np.abs(np.tril(jac2[0], k=-1)).sum() > 0
