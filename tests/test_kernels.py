"""Pallas kernel tests vs XLA twins (interpret mode on CPU; SURVEY.md §7.4):
golden cross-checks, gradient correctness, autoregressivity preserved."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iaf_tpu.nn.masks import get_conv_ar_mask
from iaf_tpu.ops import (
    ar_stack_fused,
    ar_stack_xla,
    disc_logistic_logp,
    disc_logistic_xla,
    fold_mask,
    iaf_update,
    iaf_update_xla,
    masked_conv2d,
    use_pallas,
    xla_conv2d_same,
)
from iaf_tpu.ops.ar_stack import nonzero_taps


def test_use_pallas_switch():
    assert use_pallas("pallas") is True
    assert use_pallas("xla") is False
    # "auto" admits an op class only behind a WINNING measured A/B vs the
    # XLA twin (ops/__init__.py _AUTO_WINS) and only on a real TPU backend;
    # as of r5 every class lost its latest controlled A/B (the fused
    # optimizer's r2/r4 heavy-contention wins flipped at low contention),
    # so auto admits nothing anywhere.
    assert use_pallas("auto", "conv") is False
    assert use_pallas("auto", "ar_stack") is False
    assert use_pallas("auto", "optimizer") is False
    # isolation switches for A/B harnesses
    assert use_pallas("pallas_ar", "ar_stack") is True
    assert use_pallas("pallas_ar", "conv") is False
    assert use_pallas("pallas_opt", "optimizer") is True
    assert use_pallas("pallas_opt", "conv") is False
    assert use_pallas("pallas_elem", "elementwise") is True
    assert use_pallas("pallas_elem", "optimizer") is False


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
    lq = jax.random.normal(jax.random.PRNGKey(8), shape)
    z1, l1 = iaf_update(z, m, s, lq)
    z2, l2 = iaf_update_xla(z, m, s, lq)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)

    def f1(z, m, s, lq):
        zz, ll = iaf_update(z, m, s, lq)
        return jnp.sum(zz**2) + jnp.sum(jnp.tanh(ll) * 3.0)

    def f2(z, m, s, lq):
        zz, ll = iaf_update_xla(z, m, s, lq)
        return jnp.sum(zz**2) + jnp.sum(jnp.tanh(ll) * 3.0)

    g1 = jax.grad(f1, argnums=(0, 1, 2, 3))(z, m, s, lq)
    g2 = jax.grad(f2, argnums=(0, 1, 2, 3))(z, m, s, lq)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_iaf_update_kernel_reachable_from_model():
    """kernels=pallas_elem must actually route ``cvae.iaf_flow`` through the
    fused IAF-update kernel (VERDICT r3 weak #2: a tested-but-unreachable
    kernel discharges nothing) — and the model output must match kernels=xla
    exactly, INCLUDING the free-bits objective (kl_min>0 exercises the
    elementwise logqs the old per-example-sum kernel could not feed)."""
    from iaf_tpu.core.config import Config
    from iaf_tpu.models import cvae

    base = dict(dataset="synthetic", image_size=8, channels=3, z_size=2,
                h_size=8, depth=1, num_blocks=1, depth_ar=1, ar_hidden_size=8,
                kl_min=0.25, seed=0, compute_dtype="float32")
    x = np.random.RandomState(2).randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    cfg_x = Config(**base, kernels="xla")
    cfg_p = Config(**base, kernels="pallas_elem")
    params = cvae.init_params(cfg_x, jax.random.PRNGKey(0), x)

    # the kernel is IN the traced program (jaxpr keeps the pallas_call name
    # even in interpret mode, where the lowered HLO would inline it)
    jaxpr = str(jax.make_jaxpr(
        lambda p, k, xx: cvae.apply_fn(cfg_p, p, k, xx).loss
    )(params, jax.random.PRNGKey(1), x))
    assert "iaf_update_fused" in jaxpr
    assert "disc_logistic_fused" in jaxpr

    out_x = cvae.apply_fn(cfg_x, params, jax.random.PRNGKey(1), x)
    out_p = cvae.apply_fn(cfg_p, params, jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(float(out_x.loss), float(out_p.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(out_x.kl_obj), float(out_p.kl_obj),
                               rtol=1e-5)
    # gradients flow through the custom_vjp identically
    gfn = lambda c: jax.grad(  # noqa: E731
        lambda p: cvae.apply_fn(c, p, jax.random.PRNGKey(1), x).loss)(params)
    for a, b in zip(jax.tree.leaves(gfn(cfg_x)), jax.tree.leaves(gfn(cfg_p))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


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


def _ar_chain_wb(key, zs, ah, n_out, depth_ar):
    """Random pre-masked weights/biases/masks for a fused AR chain."""
    ks = jax.random.split(key, 2 * (depth_ar + 1))
    ws, bs, masks = [], [], []
    prev = zs
    for i in range(depth_ar):
        mask = get_conv_ar_mask(3, 3, prev, ah, zerodiagonal=(i == 0))
        ws.append(jax.random.normal(ks[2 * i], (3, 3, prev, ah)) * 0.2 * mask)
        bs.append(0.1 * jax.random.normal(ks[2 * i + 1], (ah,)))
        masks.append(mask)
        prev = ah
    mask = np.concatenate(
        [get_conv_ar_mask(3, 3, prev, n, False) for n in n_out], axis=-1)
    ws.append(jax.random.normal(ks[-2], (3, 3, prev, sum(n_out))) * 0.2 * mask)
    bs.append(0.1 * jax.random.normal(ks[-1], (sum(n_out),)))
    masks.append(mask)
    return ws, bs, masks


def test_conv_ar_mask_kills_four_of_nine_taps():
    """The structural fact the fused kernel exploits: a 3x3 conv AR mask has
    exactly 5 spatially-nonzero taps (row 0 + left-of-center + center)."""
    mask = get_conv_ar_mask(3, 3, 8, 8, True)
    assert nonzero_taps(mask) == ((0, 0), (0, 1), (0, 2), (1, 0), (1, 1))


@pytest.mark.parametrize("tap_concat", [False, True])
@pytest.mark.parametrize("depth_ar,bb", [(1, 2), (2, 2), (2, 3), (3, 1)])
def test_ar_stack_fused_matches_xla(depth_ar, bb, tap_concat):
    zs, ah = 4, 8
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 6, zs))
    context = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 6, ah))
    ws, bs, masks = _ar_chain_wb(jax.random.PRNGKey(2), zs, ah, [zs, zs],
                                 depth_ar)
    wb = [t for pair in zip(ws, bs) for t in pair]
    got = ar_stack_fused(z, context, ws, bs, masks, batch_block=bb,
                         tap_concat=tap_concat)
    want = ar_stack_xla(z, context, *wb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_ar_stack_fused_bf16_matches_bf16_twin():
    """The kernel's bfloat16 compute branch vs the twin's matching
    compute_dtype cast: same casts, f32 accumulation, loose tolerance for
    accumulation-order differences."""
    zs, ah = 4, 8
    z = jax.random.normal(jax.random.PRNGKey(8), (4, 6, 6, zs))
    context = jax.random.normal(jax.random.PRNGKey(9), (4, 6, 6, ah))
    ws, bs, masks = _ar_chain_wb(jax.random.PRNGKey(10), zs, ah, [zs, zs], 2)
    wb = [t for pair in zip(ws, bs) for t in pair]
    got = ar_stack_fused(z, context, ws, bs, masks, batch_block=2,
                         compute_dtype="bfloat16")
    want = ar_stack_xla(z, context, *wb, compute_dtype="bfloat16")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # and the bf16 twin itself stays close to the f32 chain
    want32 = ar_stack_xla(z, context, *wb)
    np.testing.assert_allclose(np.asarray(want), np.asarray(want32),
                               rtol=1e-1, atol=1e-1)


@pytest.mark.parametrize("tap_concat", [False, True])
def test_ar_stack_fused_grads_match_xla(tap_concat):
    zs, ah = 2, 4
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 5, zs))
    context = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 5, ah))
    ws, bs, masks = _ar_chain_wb(jax.random.PRNGKey(5), zs, ah, [zs, zs], 2)
    wb = [t for pair in zip(ws, bs) for t in pair]

    def loss_pl(z, context, *wb_):
        ws_, bs_ = list(wb_[0::2]), list(wb_[1::2])
        return jnp.sum(jnp.tanh(
            ar_stack_fused(z, context, ws_, bs_, masks, batch_block=2,
                           tap_concat=tap_concat)))

    def loss_xla(z, context, *wb_):
        return jnp.sum(jnp.tanh(ar_stack_xla(z, context, *wb_)))

    g1 = jax.grad(loss_pl, argnums=tuple(range(2 + len(wb))))(z, context, *wb)
    g2 = jax.grad(loss_xla, argnums=tuple(range(2 + len(wb))))(z, context, *wb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ar_stack_fused_is_autoregressive():
    """End-to-end jacobian of the fused chain: output (m-head) element i may
    not depend on z elements at raster-order positions >= i (strict: the
    first hidden layer is zerodiagonal)."""
    zs, ah = 2, 4
    H = W = 3
    context = jnp.zeros((1, H, W, ah))
    ws, bs, masks = _ar_chain_wb(jax.random.PRNGKey(6), zs, ah, [zs], 1)

    def f(zflat):
        z = zflat.reshape(1, H, W, zs)
        out = ar_stack_fused(z, context, ws, bs, masks, batch_block=1)
        return out.reshape(-1)

    z0 = jax.random.normal(jax.random.PRNGKey(7), (H * W * zs,))
    J = jax.jacrev(f)(z0)  # [out_i, in_j]; AR order = flattened raster
    n = H * W * zs
    for i in range(n):
        assert np.allclose(np.asarray(J[i, i:]), 0.0, atol=1e-6), i


@pytest.mark.parametrize("shape", [(4, 2, 2, 3, 40), (20, 384), (7,), ()])
def test_fused_adamax_leaf_matches_xla(shape):
    """Single-pass fused Adamax+Polyak kernel == the plain XLA update
    (optim.apply_updates math) on representative leaf shapes: stacked 5D
    conv weights, 2D bias stacks, 1D vectors, and the dec_log_stdv scalar."""
    from iaf_tpu.ops.fused_adamax import adamax_polyak_leaf

    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    p, g, m, u, e = (jax.random.normal(k, shape) for k in ks)
    u = jnp.abs(u)
    b1, b2, eps, d, lr = 0.9, 0.999, 1e-8, 0.999, 0.002

    got = adamax_polyak_leaf(p, g, m, u, e, lr, beta1=b1, beta2=b2,
                             eps=eps, polyak_decay=d)
    m_t = b1 * m + (1 - b1) * g
    u_t = jnp.maximum(b2 * u, jnp.abs(g))
    p_t = p - lr * m_t / (u_t + eps)
    e_t = d * e + (1 - d) * p_t
    for a, b in zip(got, (p_t, m_t, u_t, e_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_adamax_full_step_matches():
    """optim.apply_updates(fused=True) == (fused=False) on a real param
    tree, including the traced bias-corrected lr."""
    from iaf_tpu import optim

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    # "w" is above the fused-path size threshold (2^18 elements) and runs
    # the Pallas kernel; "b"/"s" exercise the small-leaf XLA fallback.
    params = {"w": jax.random.normal(ks[0], (8, 3, 3, 64, 64)),
              "b": jax.random.normal(ks[1], (8, 64)),
              "s": jax.random.normal(ks[2], ())}
    grads = jax.tree.map(lambda a: jax.random.normal(ks[3], a.shape), params)
    kw = dict(lr=0.002, beta1=0.9, beta2=0.999, eps=1e-8,
              polyak_decay=0.999, bias_correction=True)
    st1 = optim.init_state(params)
    st2 = optim.init_state(params)
    for _ in range(3):
        p1, st1 = optim.apply_updates(params, grads, st1, fused=False, **kw)
        p2, st2 = optim.apply_updates(params, grads, st2, fused=True, **kw)
    for a, b in zip(jax.tree.leaves((p1, st1.m, st1.u, st1.ema)),
                    jax.tree.leaves((p2, st2.m, st2.u, st2.ema))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_layout_aware_fused_admission(monkeypatch):
    """Leaves whose AUTO device layout swaps the last two dims (tile-padding
    minimization — optim._auto_prefers_swapped) must SKIP the Pallas kernel
    under layout_aware=True (default) and take the XLA update copy-free;
    default-layout leaves still run the kernel. Math identical either way
    (covered by test_fused_adamax_full_step_matches)."""
    from iaf_tpu import optim
    import iaf_tpu.ops.fused_adamax as fa

    # criterion reproduces the r5 TPU HLO audit's AUTO choices exactly
    assert optim._auto_prefers_swapped((20, 3, 3, 192, 160))
    assert optim._auto_prefers_swapped((20, 3, 3, 160, 64))
    assert not optim._auto_prefers_swapped((20, 3, 3, 160, 384))
    assert not optim._auto_prefers_swapped((20, 3, 3, 160, 448))
    assert not optim._auto_prefers_swapped((20, 3, 3, 160, 160))
    assert not optim._auto_prefers_swapped((160,))

    calls: list = []
    real = fa.adamax_polyak_leaf

    def spy(p, *a, **kw):
        calls.append(p.shape)
        return real(p, *a, **kw)

    monkeypatch.setattr(fa, "adamax_polyak_leaf", spy)
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    params = {"swapped": jax.random.normal(ks[0], (16, 192, 160)),  # 2^18+
              "default": jax.random.normal(ks[1], (8, 160, 384))}
    grads = jax.tree.map(jnp.ones_like, params)
    st = optim.init_state(params)
    optim.apply_updates(params, grads, st, lr=0.002, fused=True,
                        layout_aware=True)
    assert calls == [(8, 160, 384)], calls
    calls.clear()
    st = optim.init_state(params)
    optim.apply_updates(params, grads, st, lr=0.002, fused=True,
                        layout_aware=False)
    assert sorted(calls) == [(8, 160, 384), (16, 192, 160)], calls


def test_model_forward_same_with_pallas_kernels():
    """Full model forward: kernels=pallas (interpret) ≡ kernels=xla."""
    from iaf_tpu.core.config import Config
    from iaf_tpu.models import cvae

    # f32 pinned: pallas-vs-xla is an exact-math claim at tight tolerance
    base = dict(dataset="synthetic", image_size=8, channels=3, z_size=2,
                h_size=8, depth=1, num_blocks=1, depth_ar=1, ar_hidden_size=8,
                kl_min=0.0, seed=0, compute_dtype="float32")
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


def test_model_forward_pallas_unmerged_heads():
    """Same model-level pallas ≡ xla claim with merge_ar_heads=false: the
    fused AR wrapper then concatenates the separate m/s head scopes itself
    (_ar_multiconv2d_fused else-branch) and must stay exact."""
    from iaf_tpu.core.config import Config
    from iaf_tpu.models import cvae

    base = dict(dataset="synthetic", image_size=8, channels=3, z_size=2,
                h_size=8, depth=1, num_blocks=1, depth_ar=2, ar_hidden_size=8,
                kl_min=0.0, seed=0, compute_dtype="float32",
                merge_ar_heads=False)
    x = np.random.RandomState(1).randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    cfg_x = Config(**base, kernels="xla")
    cfg_p = Config(**base, kernels="pallas")
    params = cvae.init_params(cfg_x, jax.random.PRNGKey(0), x)
    out_x = cvae.apply_fn(cfg_x, params, jax.random.PRNGKey(1), x)
    out_p = cvae.apply_fn(cfg_p, params, jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(float(out_x.loss), float(out_p.loss),
                               rtol=1e-5)


def test_masked_conv2d_bf16_grad_matches_twin():
    """bf16 x/w (the kernels=pallas + fold_wn fold-time-cast path): the
    custom VJP must accept the f32 cotangent of the Pallas forward (which
    always emits f32) and agree with the XLA twin's gradients."""
    import jax.numpy as jnp
    from iaf_tpu.ops.masked_conv import masked_conv2d, xla_conv2d_same

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, 5), jnp.bfloat16)

    gx, gw = jax.grad(lambda a, b: masked_conv2d(a, b).sum(), (0, 1))(x, w)
    tx, tw = jax.grad(
        lambda a, b: xla_conv2d_same(a, b).astype(jnp.float32).sum(),
        (0, 1))(x, w)
    assert gx.dtype == x.dtype and gw.dtype == w.dtype
    np.testing.assert_allclose(np.asarray(gx, np.float32),
                               np.asarray(tx, np.float32), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gw, np.float32),
                               np.asarray(tw, np.float32), rtol=1e-2)
