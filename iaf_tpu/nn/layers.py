"""Weight-normalized layers with data-dependent init, and masked AR layers.

Reference parity: ``tf_utils/layers.py`` — ``conv2d``, ``deconv2d``, ``nin``,
``ar_conv2d``, ``ar_multiconv2d``, weight-norm data-dependent init
(Salimans & Kingma 2016) — and the Theano mirrors in ``graphy/nodes/conv.py``
/ ``graphy/nodes/ar.py``. (Reference mount empty at survey time; symbols
cited per SURVEY.md §2.1, §3.5.)

TPU-native design: instead of TF variable scopes + an ``init`` graph, a
``Ctx`` object threads a nested params pytree and an RNG key through a single
pure forward function. The same forward code runs in two modes:

  * init mode  — parameters are created on first use; weight-norm layers run
    the conv with l2-normalized V, measure per-channel activation moments of
    the *actual sample batch*, and calibrate ``g`` and ``b`` from them
    (SURVEY.md §3.5: "without this, the 3.11 target is at risk"). The whole
    init pass is jittable: ``init_params = jit(lambda rng, x: ...)``.
  * apply mode — parameters are read; missing parameters are an error.

RNG keys are derived from the step key by folding a stable hash of the layer
path, so the key stream is independent of device layout (SURVEY.md §5.2).

Masks are numpy constants folded into the weights at trace time; the hot
masked-conv path has a Pallas kernel in ``iaf_tpu.ops`` with this module's
XLA formulation as its correctness oracle.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from iaf_tpu.core.rng import fold_name
from iaf_tpu.nn.masks import get_conv_ar_mask, get_linear_ar_mask

Params = dict[str, Any]

_CONV_DN = ("NHWC", "HWIO", "NHWC")


class Ctx:
    """Threads params + rng through a pure forward pass.

    All ``Ctx`` objects of one pass share the same root params dict; ``scope``
    only extends the name path. In init mode the root dict is mutated while
    tracing (fine under jit: it becomes part of the returned pytree).
    """

    __slots__ = ("root", "rng", "init", "path", "compute_dtype")

    def __init__(self, params: Params | None = None, rng: jax.Array | None = None,
                 init: bool = False, path: str = "",
                 compute_dtype: jnp.dtype | None = None):
        self.root: Params = {} if params is None else params
        self.rng = rng
        self.init = init
        self.path = path
        # matmul/conv input dtype (bf16 MXU path); accumulation stays f32
        self.compute_dtype = compute_dtype

    def scope(self, name: str) -> "Ctx":
        c = Ctx.__new__(Ctx)
        c.root, c.rng, c.init = self.root, self.rng, self.init
        c.compute_dtype = self.compute_dtype
        c.path = f"{self.path}/{name}" if self.path else name
        return c

    # -- params ------------------------------------------------------------
    def _node(self, create: bool) -> Params:
        node = self.root
        for part in self.path.split("/") if self.path else []:
            if part not in node:
                if not create:
                    raise KeyError(f"missing param scope {self.path!r}")
                node[part] = {}
            node = node[part]
        return node

    def param(self, name: str, shape: Sequence[int],
              init_fn: Callable[[jax.Array, Sequence[int]], jax.Array]) -> jax.Array:
        if self.init:
            node = self._node(create=True)
            if name not in node:
                node[name] = init_fn(self.key(name), shape)
            return node[name]
        node = self._node(create=False)
        if name not in node:
            raise KeyError(f"missing param {self.path}/{name}")
        return node[name]

    def set_param(self, name: str, value: jax.Array) -> None:
        assert self.init, "set_param is init-mode only (data-dependent init)"
        self._node(create=True)[name] = value

    def get(self, name: str) -> jax.Array:
        """Read an existing param without declaring shape/init (apply mode)."""
        node = self._node(create=False)
        if name not in node:
            raise KeyError(f"missing param {self.path}/{name}")
        return node[name]

    def has(self, name: str) -> bool:
        try:
            node = self._node(create=False)
        except KeyError:
            return False
        return name in node

    # -- rng ---------------------------------------------------------------
    def key(self, name: str) -> jax.Array:
        if self.rng is None:
            raise ValueError(f"Ctx has no rng but {self.path}/{name} asked for one")
        path = f"{self.path}/{name}" if self.path else name
        return fold_name(self.rng, path)


def normal_init(stddev: float):
    def init(key, shape):
        return stddev * jax.random.normal(key, tuple(shape), jnp.float32)
    return init


def zeros_init(key, shape):
    return jnp.zeros(tuple(shape), jnp.float32)


def ones_init(key, shape):
    return jnp.ones(tuple(shape), jnp.float32)


def elu(x):
    # NOTE(r5): a custom_jvp expressing elu' through the saved OUTPUT
    # (min(out+1, 1)) was tried to delete the expm1 recompute from the
    # backward conv fusions — XLA rematerializes the derivative from the
    # saved pre-activation inside the fusion either way (verified in the
    # optimized TPU HLO), so it changed nothing and was reverted.
    return jax.nn.elu(x)


# ---------------------------------------------------------------------------
# Weight-normalized conv / deconv / dense with data-dependent init
# ---------------------------------------------------------------------------

def _wn_direction(V: jax.Array, axes: tuple[int, ...], mask=None) -> jax.Array:
    """l2-normalize V over ``axes`` (per output unit), then apply the AR mask.
    Mask-after-normalize matches the reference's ``ar_conv2d`` ordering."""
    v = V * jax.lax.rsqrt(jnp.sum(jnp.square(V), axis=axes, keepdims=True) + 1e-12)
    if mask is not None:
        v = v * mask
    return v


def fold_wn_tree(params: Params, compute_dtype=None) -> Params:
    """Pre-fold weight normalization over a STACKED param subtree.

    Every ``{"V", "g", "b"}`` scope (leaves with leading layer dim L) is
    replaced by ``{"W": V/||V|| * g, "b": b}`` with the per-output-unit
    l2 norm computed over the non-leading, non-output axes — one batched
    reduction per leaf type for all L layers instead of L tiny ones (the
    r4 TPU trace put the per-layer weight-norm reductions at ~10% of step
    time on the paper config). ``conv2d``/``_folded_conv_wb`` consume the
    folded form directly; AR masks still apply downstream, which is exact
    because masks are 0/1 so ``(v*mask)*g == (v*g)*mask`` bitwise.

    ``compute_dtype`` casts W at fold time instead of at each conv — the
    same cast the conv would do (bit-identical: the later mask multiply
    is by exact 0/1), but the stacked-leaf layout copies and per-layer
    slice DMAs then move half the bytes. ``b`` stays f32 (the bias add is
    post-conv f32 math).

    Apply-mode only: data-dependent init calibrates g/b and must see the
    raw V (SURVEY.md §3.5)."""
    def fold(node):
        if isinstance(node, dict):
            if "V" in node:
                V, g, b = node["V"], node["g"], node["b"]
                # _wn_direction is THE weight-norm formula (shared with the
                # per-layer path so the two can never desync numerically);
                # axes skip the leading L dim and the trailing output dim
                v = _wn_direction(V, tuple(range(1, V.ndim - 1)))
                gexp = g.reshape(
                    (g.shape[0],) + (1,) * (V.ndim - 2) + (g.shape[1],))
                W = v * gexp
                if compute_dtype is not None:
                    W = W.astype(compute_dtype)
                return {"W": W, "b": b}
            return {k: fold(v) for k, v in node.items()}
        return node
    return fold(params)


def _data_dep_out(ctx: Ctx, x_init: jax.Array, axes: tuple[int, ...],
                  init_scale: float) -> jax.Array:
    """Calibrate g,b from activation moments of the init batch and return the
    normalized activations (SURVEY.md §3.5)."""
    m = jnp.mean(x_init, axis=axes)
    v = jnp.var(x_init, axis=axes)
    # The 1e3 cap guards degenerate zero-variance channels (an all-zero
    # input, or a fully-masked first AR channel group): without it g blows
    # up to 1/sqrt(1e-10) = 1e5 and the first optimizer steps NaN out.
    scale = jnp.minimum(init_scale * jax.lax.rsqrt(v + 1e-10), 1e3)
    ctx.set_param("g", scale)
    ctx.set_param("b", -m * scale)
    return (x_init - m) * scale


def _mask_row_extent(mask: np.ndarray) -> int | None:
    """Last kernel row with any nonzero mask entry, or None if trimming is
    pointless. An AR raster mask zeroes every row below the center tap, so a
    (h, w) masked conv is exactly a (l+1, w) conv with asymmetric padding —
    summing the explicitly-zero taps wastes MXU FLOPs XLA cannot eliminate.

    Honest A/B on a v5e chip (tools/ab_bench.py, value-fetch timed and
    contention-interleaved): the trimmed (2,3) kernel with padding
    ((1,0),(1,1)) runs the paper config at 36.8 steps/s vs 35.0 for the full
    masked 3x3 (+5%), consistent with the AR convs' ~18% share of model
    FLOPs (tools/roofline.py) times the 1/3 tap saving. Default ON via
    ``ar_row_trim``; an earlier dispatch-latency-polluted measurement that
    suggested the opposite is void."""
    nz = np.flatnonzero(mask.reshape(mask.shape[0], -1).any(axis=1))
    if nz.size == 0 or nz[-1] == mask.shape[0] - 1:
        return None
    return int(nz[-1])


def conv2d(ctx: Ctx, name: str, x: jax.Array, num_filters: int,
           filter_size=(3, 3), stride=(1, 1), pad: str = "SAME",
           init_scale: float = 1.0, mask: np.ndarray | None = None,
           pallas: bool = False, trim_rows: bool = False) -> jax.Array:
    """Weight-normalized 2-D conv, NHWC. ``mask`` (HWIO 0/1) makes it an AR
    conv (``tf_utils/layers.py — conv2d / ar_conv2d``). ``pallas`` routes
    stride-1 SAME convs through the Pallas im2col->MXU kernel."""
    sub = ctx.scope(name)
    n_in = x.shape[-1]
    vshape = (filter_size[0], filter_size[1], n_in, num_filters)
    folded = (not ctx.init) and sub.has("W")  # fold_wn_tree'd params
    V = None if folded else sub.param("V", vshape, normal_init(0.05))
    mask_c = None if mask is None else jnp.asarray(mask, jnp.float32)
    # static kernel-row trim for AR masks (zero rows below center)
    trim_row = None
    if (trim_rows and mask is not None and pad == "SAME"
            and tuple(stride) == (1, 1) and filter_size[0] % 2 == 1):
        trim_row = _mask_row_extent(mask)

    def run(kernel):
        xc, kc = x, kernel
        if ctx.compute_dtype is not None and not ctx.init:
            # run entirely in bf16 and cast back: MXU accumulates f32
            # internally, and keeping primal/cotangent dtypes uniform avoids
            # mixed-dtype conv VJP failures
            xc = xc.astype(ctx.compute_dtype)
            kc = kc.astype(ctx.compute_dtype)
        padding = pad
        if trim_row is not None:
            l = (filter_size[0] - 1) // 2
            m = (filter_size[1] - 1) // 2
            kc = kc[: trim_row + 1]
            padding = ((l, trim_row - l), (m, m))
        out = jax.lax.conv_general_dilated(
            xc, kc, window_strides=tuple(stride), padding=padding,
            dimension_numbers=_CONV_DN)
        return out.astype(jnp.float32)

    if ctx.init:
        x_init = run(_wn_direction(V, (0, 1, 2), mask_c))
        return _data_dep_out(sub, x_init, (0, 1, 2), init_scale)
    if folded:
        b = sub.get("b")
        W = sub.get("W")
        if mask_c is not None:
            W = W * mask_c.astype(W.dtype)  # 0/1 mask: exact in any dtype
    else:
        g = sub.param("g", (num_filters,), ones_init)
        b = sub.param("b", (num_filters,), zeros_init)
        W = _wn_direction(V, (0, 1, 2), mask_c) * g
    if pallas and tuple(stride) == (1, 1) and pad == "SAME":
        from iaf_tpu.ops import masked_conv2d
        # keep x/W dtypes uniform (a fold_wn'd W arrives pre-cast to the
        # compute dtype; mixed-dtype conv VJPs fail)
        return masked_conv2d(x.astype(W.dtype), W) + b
    return run(W) + b


def deconv2d(ctx: Ctx, name: str, x: jax.Array, num_filters: int,
             filter_size=(3, 3), stride=(2, 2), pad: str = "SAME",
             init_scale: float = 1.0) -> jax.Array:
    """Weight-normalized transposed conv (``tf_utils/layers.py — deconv2d``)."""
    sub = ctx.scope(name)
    n_in = x.shape[-1]
    vshape = (filter_size[0], filter_size[1], n_in, num_filters)
    V = sub.param("V", vshape, normal_init(0.05))

    def run(kernel):
        xc, kc = x, kernel
        if ctx.compute_dtype is not None and not ctx.init:
            xc = xc.astype(ctx.compute_dtype)
            kc = kc.astype(ctx.compute_dtype)
        out = jax.lax.conv_transpose(
            xc, kc, strides=tuple(stride), padding=pad,
            dimension_numbers=_CONV_DN)
        return out.astype(jnp.float32)

    if ctx.init:
        x_init = run(_wn_direction(V, (0, 1, 2)))
        return _data_dep_out(sub, x_init, (0, 1, 2), init_scale)
    g = sub.param("g", (num_filters,), ones_init)
    b = sub.param("b", (num_filters,), zeros_init)
    return run(_wn_direction(V, (0, 1, 2)) * g) + b


def dense(ctx: Ctx, name: str, x: jax.Array, n_out: int,
          init_scale: float = 1.0, mask: np.ndarray | None = None) -> jax.Array:
    """Weight-normalized dense layer over the last axis; ``mask`` ([in,out])
    makes it a MADE AR layer (``graphy/nodes/ar.py`` dense path)."""
    sub = ctx.scope(name)
    n_in = x.shape[-1]
    folded = (not ctx.init) and sub.has("W")  # fold_wn_tree'd params
    V = None if folded else sub.param("V", (n_in, n_out), normal_init(0.05))
    mask_c = None if mask is None else jnp.asarray(mask, jnp.float32)

    def run(kernel):
        xc, kc = x, kernel
        if ctx.compute_dtype is not None and not ctx.init:
            xc = xc.astype(ctx.compute_dtype)
            kc = kc.astype(ctx.compute_dtype)
        return jnp.matmul(xc, kc,
                          preferred_element_type=jnp.float32).astype(
                              jnp.float32)

    if ctx.init:
        x_init = run(_wn_direction(V, (0,), mask_c))
        red = tuple(range(x_init.ndim - 1))
        return _data_dep_out(sub, x_init, red, init_scale)
    if folded:
        b = sub.get("b")
        W = sub.get("W")
        if mask_c is not None:
            W = W * mask_c.astype(W.dtype)  # 0/1 mask: exact in any dtype
        return run(W) + b
    g = sub.param("g", (n_out,), ones_init)
    b = sub.param("b", (n_out,), zeros_init)
    return run(_wn_direction(V, (0,), mask_c) * g) + b


def nin(ctx: Ctx, name: str, x: jax.Array, n_out: int,
        init_scale: float = 1.0) -> jax.Array:
    """1x1 'network-in-network' conv as a dense over channels
    (``tf_utils/layers.py — nin``)."""
    return dense(ctx, name, x, n_out, init_scale=init_scale)


# ---------------------------------------------------------------------------
# Autoregressive stacks
# ---------------------------------------------------------------------------

def _folded_conv_wb(ctx: Ctx, name: str, n_in: int, n_out: int,
                    filter_size, mask: np.ndarray):
    """The fully-folded dense weights (wn-direction * mask * g) and bias of a
    conv scope, for kernels that consume weights directly (apply mode only —
    init calibration always runs the plain conv path)."""
    sub = ctx.scope(name)
    if sub.has("W"):  # fold_wn_tree'd params: W = V/||V|| * g already
        W = sub.get("W")
        return W * jnp.asarray(mask, W.dtype), sub.get("b")
    V = sub.param("V", (filter_size[0], filter_size[1], n_in, n_out),
                  normal_init(0.05))
    g = sub.param("g", (n_out,), ones_init)
    b = sub.param("b", (n_out,), zeros_init)
    return _wn_direction(V, (0, 1, 2), jnp.asarray(mask, V.dtype)) * g, b


def ar_conv2d(ctx: Ctx, name: str, x: jax.Array, num_filters: int,
              filter_size=(3, 3), stride=(1, 1), zerodiagonal: bool = True,
              init_scale: float = 1.0, pallas: bool = False,
              trim_rows: bool = False) -> jax.Array:
    """Masked AR conv (``tf_utils/layers.py — ar_conv2d``). Raster-order
    spatial causality + channel-order MADE mask at the center tap."""
    mask = get_conv_ar_mask(filter_size[0], filter_size[1], x.shape[-1],
                            num_filters, zerodiagonal)
    return conv2d(ctx, name, x, num_filters, filter_size=filter_size,
                  stride=stride, init_scale=init_scale, mask=mask,
                  pallas=pallas, trim_rows=trim_rows)


def ar_multiconv2d(ctx: Ctx, name: str, x: jax.Array, context: jax.Array,
                   n_h: Sequence[int], n_out: Sequence[int],
                   filter_size=(3, 3), nl=elu,
                   pallas: bool = False,
                   pallas_conv: bool = False,
                   trim_rows: bool = False,
                   merge_heads: bool = False,
                   pallas_variant: str = "pertap") -> list[jax.Array]:
    """Small masked-conv net computing the IAF (m, s) heads
    (``tf_utils/layers.py — ar_multiconv2d``).

    First hidden layer has ``zerodiagonal=True`` so every output depends only
    on strictly-preceding inputs end-to-end; later layers may use the
    diagonal. ``context`` is added after the first layer.

    ``merge_heads`` computes all heads in ONE conv over the concatenated
    per-head masks and splits the result — mathematically identical
    (weight-norm g/b and the masks are per-output-channel), but a single
    n_out-total conv wastes fewer padded MXU lanes than len(n_out) narrow
    convs (each z_size-wide head pads its output dim to the 128-lane tile).

    ``pallas`` (apply mode, 3x3, uniform hidden widths) runs the WHOLE chain
    as one fused Pallas kernel (``ops/ar_stack.py``): per-nonzero-tap MXU
    matmuls (the 4 masked-out taps of the 3x3 AR mask are never computed),
    intermediates in VMEM, context add + ELU fused in. Same params, same
    math; heads are computed concatenated and split regardless of
    ``merge_heads``'s param layout. ``pallas_conv`` separately routes the
    UNFUSED path's individual convs through the per-conv im2col kernel —
    deliberately a different switch, so an A/B of the fused chain
    (``kernels=pallas_ar``) can never silently fall through to the
    per-conv kernel when the fused gate (3x3, uniform widths) fails.
    """
    sub = ctx.scope(name)
    # the fused kernel hardcodes ELU; a caller asking for another nl must
    # fall through to the unfused path rather than silently get ELU
    if (pallas and not ctx.init and nl is elu
            and tuple(filter_size) == (3, 3)
            and len(n_h) >= 1 and len(set(n_h)) == 1):
        return _ar_multiconv2d_fused(sub, x, context, n_h, n_out,
                                     merge_heads,
                                     compute_dtype=ctx.compute_dtype,
                                     variant=pallas_variant)
    h = x
    for i, size in enumerate(n_h):
        h = ar_conv2d(sub, f"layer_{i}", h, size, filter_size=filter_size,
                      zerodiagonal=(i == 0), pallas=pallas_conv,
                      trim_rows=trim_rows)
        if i == 0:
            h = h + context
        h = nl(h)
    # NOTE: the reference scales these heads by 0.1 *in the model*
    # (``IAFLayer.down — arw_mean, arw_logsd = x[0]*0.1, x[1]*0.1``), so the
    # heads themselves use the default init scale.
    if merge_heads:
        mask = np.concatenate(
            [get_conv_ar_mask(filter_size[0], filter_size[1], h.shape[-1],
                              size, False) for size in n_out], axis=-1)
        out = conv2d(sub, "layer_out", h, sum(n_out),
                     filter_size=filter_size, mask=mask, pallas=pallas_conv,
                     trim_rows=trim_rows)
        outs, start = [], 0
        for size in n_out:
            outs.append(out[..., start:start + size])
            start += size
        return outs
    return [
        ar_conv2d(sub, f"layer_out_{i}", h, size, filter_size=filter_size,
                  zerodiagonal=False, pallas=pallas_conv, trim_rows=trim_rows)
        for i, size in enumerate(n_out)
    ]


def _ar_multiconv2d_fused(sub: Ctx, x: jax.Array, context: jax.Array,
                          n_h: Sequence[int], n_out: Sequence[int],
                          merge_heads: bool, compute_dtype=None,
                          variant: str = "pertap"):
    """Fold every conv's weights and hand the whole chain to the fused
    Pallas kernel. Reads the SAME param scopes as the unfused path, so the
    kernel choice never changes the checkpoint format."""
    from iaf_tpu.ops.ar_stack import ar_stack_fused
    from iaf_tpu.nn.masks import get_conv_ar_mask

    ws, bs, masks = [], [], []
    prev = x.shape[-1]
    for i, size in enumerate(n_h):
        mask = get_conv_ar_mask(3, 3, prev, size, zerodiagonal=(i == 0))
        W, b = _folded_conv_wb(sub, f"layer_{i}", prev, size, (3, 3), mask)
        ws.append(W)
        bs.append(b)
        masks.append(mask)
        prev = size
    if merge_heads:
        mask = np.concatenate(
            [get_conv_ar_mask(3, 3, prev, size, False) for size in n_out],
            axis=-1)
        W, b = _folded_conv_wb(sub, "layer_out", prev, sum(n_out), (3, 3),
                               mask)
    else:
        head_masks = [get_conv_ar_mask(3, 3, prev, size, False)
                      for size in n_out]
        parts = [_folded_conv_wb(sub, f"layer_out_{i}", prev, size, (3, 3), m)
                 for i, (size, m) in enumerate(zip(n_out, head_masks))]
        W = jnp.concatenate([w for w, _ in parts], axis=-1)
        b = jnp.concatenate([bb for _, bb in parts], axis=-1)
        mask = np.concatenate(head_masks, axis=-1)
    ws.append(W)
    bs.append(b)
    masks.append(mask)

    cd = ("bfloat16" if compute_dtype is not None
          and jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16) else None)
    out = ar_stack_fused(x, context, ws, bs, masks, compute_dtype=cd,
                         tap_concat=(variant == "im2col"))
    outs, start = [], 0
    for size in n_out:
        outs.append(out[..., start:start + size])
        start += size
    return outs


def ar_multidense(ctx: Ctx, name: str, x: jax.Array, context: jax.Array | None,
                  n_h: Sequence[int], n_out: Sequence[int], nl=elu) -> list[jax.Array]:
    """Dense MADE stack for vector latents (Theano MNIST path,
    ``graphy/nodes/ar.py`` masked MLP)."""
    sub = ctx.scope(name)
    n_z = x.shape[-1]
    h = x
    n_prev = n_z
    for i, size in enumerate(n_h):
        mask = get_linear_ar_mask(n_prev, size, zerodiagonal=(i == 0))
        h = dense(sub, f"layer_{i}", h, size, mask=mask)
        if i == 0 and context is not None:
            h = h + context
        h = nl(h)
        n_prev = size
    outs = []
    for i, size in enumerate(n_out):
        mask = get_linear_ar_mask(n_prev, size, zerodiagonal=False)
        outs.append(dense(sub, f"layer_out_{i}", h, size, mask=mask))
    return outs
