"""Mask property tests (SURVEY.md §4.1): autoregressivity verified by
jacobian on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iaf_tpu.nn.masks import get_conv_ar_mask, get_linear_ar_mask


def ar_order_index(h, w, c, H, W, C):
    """Raster-then-channel AR position of element (h, w, c)."""
    return (h * W + w) * C + c


@pytest.mark.parametrize("n_in,n_out", [(4, 4), (4, 8), (8, 4), (3, 6)])
@pytest.mark.parametrize("zerodiag", [True, False])
def test_linear_mask_autoregressive(n_in, n_out, zerodiag):
    mask = get_linear_ar_mask(n_in, n_out, zerodiag)
    # group of input i is i; group of output j is j // (n_out//n_in) etc.
    if n_out >= n_in:
        k = n_out // n_in
        out_group = lambda j: j // k
    else:
        k = n_in // n_out
        out_group = lambda j: j
    if n_out >= n_in:
        in_group = lambda i: i
    else:
        in_group = lambda i: i // k
    for i in range(n_in):
        for j in range(n_out):
            if zerodiag:
                allowed = in_group(i) < out_group(j)
            else:
                allowed = in_group(i) <= out_group(j)
            assert mask[i, j] == (1.0 if allowed else 0.0), (i, j)


@pytest.mark.parametrize("zerodiag", [True, False])
def test_conv_mask_autoregressive_jacobian(zerodiag):
    """End-to-end: out[p] must not depend on in[q] for q >= p (or q > p when
    the diagonal is allowed) in raster-then-channel order."""
    H = W = 4
    C = 3
    mask = jnp.asarray(get_conv_ar_mask(3, 3, C, C, zerodiag))
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, C, C)) * mask

    def f(x):
        return jax.lax.conv_general_dilated(
            x[None], w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    x = jax.random.normal(jax.random.PRNGKey(1), (H, W, C))
    jac = jax.jacfwd(f)(x)  # [H,W,C, H,W,C]
    jac = np.asarray(jac)
    for oh in range(H):
        for ow in range(W):
            for oc in range(C):
                o = ar_order_index(oh, ow, oc, H, W, C)
                for ih in range(H):
                    for iw in range(W):
                        for ic in range(C):
                            i = ar_order_index(ih, iw, ic, H, W, C)
                            dep = abs(jac[oh, ow, oc, ih, iw, ic]) > 1e-8
                            if zerodiag:
                                bad = dep and i >= o
                            else:
                                # same-channel-group diagonal allowed at the
                                # same pixel only
                                bad = dep and (i > o or
                                               (i == o and False))
                            assert not bad, (
                                f"out {(oh,ow,oc)} depends on in {(ih,iw,ic)}")


def test_conv_mask_center_is_linear_mask():
    m = get_conv_ar_mask(3, 3, 4, 8, True)
    np.testing.assert_array_equal(m[1, 1], get_linear_ar_mask(4, 8, True))
    # strictly-before taps pass everything, after taps nothing
    assert m[0].min() == 1.0
    assert m[2].max() == 0.0
    assert m[1, 0].min() == 1.0
    assert m[1, 2].max() == 0.0
