"""The compiled data-parallel training step.

Replaces the reference's in-graph tower replication + ``average_grads`` +
per-step ``sess.run`` hop (``tf_train.py``/``tf_utils/common.py``,
SURVEY.md §3.1) with ONE jitted SPMD program: the global batch is sharded
over the mesh's ``data`` axis, parameters and optimizer state are
replicated, and XLA inserts the gradient allreduce over ICI/DCN during
sharding propagation. Params/opt-state buffers are donated so Adamax+Polyak
update in place.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental.layout import Format, Layout, with_layout_constraint
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iaf_tpu import optim
from iaf_tpu.core.config import Config
from iaf_tpu.models import get_model
from iaf_tpu.parallel.mesh import DATA_AXIS, activation_sharding


class TrainState(NamedTuple):
    params: Any
    opt: optim.AdamaxState


def loss_fn(cfg: Config, params, rng, batch):
    out = get_model(cfg).apply_fn(cfg, params, rng, batch, mode="train")
    return out.loss, out


def _out_metrics(loss, out):
    metrics = {
        "loss": loss,
        "kl_obj": out.kl_obj,
        "kl_cost": out.kl_cost,
        "log_pxz": out.log_pxz,
    }
    # family-specific headline metric (bits/dim for images, nats for MNIST)
    if hasattr(out, "bits_per_dim"):
        metrics["bits_per_dim"] = out.bits_per_dim
    else:
        metrics["nll_nats"] = out.nll_nats
    if hasattr(out, "kl_per_layer"):
        metrics["kl_per_layer"] = out.kl_per_layer
    return metrics


def _grads_and_metrics(cfg: Config, params, rng, batch):
    """Mean gradients + metrics over the global batch, optionally
    accumulated over ``cfg.grad_accum`` sequential micro-batches (lax.scan):
    activation memory shrinks A-fold, so paper-scale global batches fit a
    single chip. Equal micro sizes make the mean-of-means exact."""
    A = max(1, cfg.grad_accum)
    if A == 1:
        (loss, out), grads = jax.value_and_grad(
            partial(loss_fn, cfg), has_aux=True)(params, rng, batch)
        return grads, _out_metrics(loss, out)

    B = batch.shape[0]
    assert B % A == 0, (B, A)
    micro = batch.reshape(A, B // A, *batch.shape[1:])
    from iaf_tpu.parallel.mesh import constrain
    micro = constrain(micro, (None, DATA_AXIS) + (None,) * (batch.ndim - 1))

    def micro_step(a, mb):
        (loss, out), grads = jax.value_and_grad(
            partial(loss_fn, cfg), has_aux=True)(
                params, jax.random.fold_in(rng, a), mb)
        return grads, _out_metrics(loss, out)

    def body(acc, inp):
        a, mb = inp
        g, m = micro_step(a, mb)
        g_acc, m_acc = acc
        return (jax.tree.map(jnp.add, g_acc, g),
                {k: m_acc[k] + m[k] for k in m_acc}), None

    # first micro-batch initializes the accumulator (no shape gymnastics)
    init = micro_step(jnp.int32(0), micro[0])
    (g_sum, m_sum), _ = jax.lax.scan(
        body, init, (jnp.arange(1, A, dtype=jnp.int32), micro[1:]))
    grads = jax.tree.map(lambda g: g / A, g_sum)
    metrics = {k: v / A for k, v in m_sum.items()}
    return grads, metrics


def train_step(cfg: Config, state: TrainState, rng, batch):
    # named scopes structure xprof traces (fwd+bwd vs optimizer/EMA)
    with jax.named_scope("grads"):
        grads, metrics = _grads_and_metrics(cfg, state.params, rng, batch)
    with jax.named_scope("adamax_polyak"):
        from iaf_tpu.ops import use_pallas
        params, opt = optim.apply_updates(
            state.params, grads, state.opt,
            lr=cfg.learning_rate, beta1=cfg.beta1, beta2=cfg.beta2,
            eps=cfg.adamax_eps, polyak_decay=cfg.polyak_decay,
            bias_correction=cfg.bias_correction, grad_clip=cfg.grad_clip,
            fused=use_pallas(cfg.kernels, "optimizer"),
            layout_aware=cfg.fused_opt_layout_aware)
    return TrainState(params, opt), metrics


_FORMAT_CACHE: dict = {}


def _state_boundary_sharding(cfg: Config, mesh: Mesh):
    """Replicated sharding for the train state at the jit boundary — with
    every leaf's device layout PINNED to the default (row-major
    major_to_minor) layout when ``cfg.pin_state_layouts``.

    Left to AUTO layout assignment, XLA gives several stacked
    [L,kh,kw,cin,cout] state leaves a cin-minor boundary layout (propagated
    from the conv weights' preference), then relayouts them to the default
    layout every step to feed the fused optimizer (a Mosaic kernel, which
    only consumes default layouts) — and relayouts the results BACK to
    satisfy donation aliasing. On the paper config that is 10 full-leaf
    f32 copies per step (r5 optimized-HLO audit: down_conv2/V and
    ar1/layer_out/V families, params + m/u/ema, in and out). Pinning the
    boundary deletes all of them; the conv side pays at most one bf16
    transpose of the folded W instead. The leaf structure comes from an
    abstract ``eval_shape`` of init (nothing executes), cached per config.
    """
    repl = NamedSharding(mesh, P())
    if not cfg.pin_state_layouts:
        return repl
    key = (cfg, mesh.shape_tuple, str(mesh.devices.ravel()[0].platform))
    if key not in _FORMAT_CACHE:
        batch_dtype = (jnp.float32 if cfg.likelihood == "bernoulli"
                       else jnp.uint8)
        batch_sds = jax.ShapeDtypeStruct(
            (cfg.batch_size, cfg.image_size, cfg.image_size, cfg.channels),
            batch_dtype)
        key_sds = jax.ShapeDtypeStruct((2,), jnp.uint32)
        state_sds = jax.eval_shape(
            lambda k, b: init_train_state(cfg, k, b), key_sds, batch_sds)
        _FORMAT_CACHE[key] = jax.tree.map(
            lambda x: Format(Layout(tuple(range(x.ndim))), repl), state_sds)
    return _FORMAT_CACHE[key]


def make_train_step(cfg: Config, mesh: Mesh):
    """Compile the train step with data-sharded batch and replicated,
    donated params/opt state (default-layout-pinned at the boundary, see
    ``_state_boundary_sharding``)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    state_fmt = _state_boundary_sharding(cfg, mesh)

    def step(state, rng, batch):
        with activation_sharding(mesh):
            return train_step(cfg, state, rng, batch)

    return jax.jit(
        step,
        in_shardings=(state_fmt, repl, data),
        out_shardings=(state_fmt, repl),
        donate_argnums=(0,),
    )


def make_train_chunk(cfg: Config, mesh: Mesh, steps: int):
    """Compile ``steps`` training steps into ONE program via ``lax.scan``.

    Collapses the per-step host->device dispatch hop (the analogue of the
    reference's per-step ``sess.run``): on a remote-tunneled TPU each
    dispatch costs a network round trip, which dominates step time for this
    small model. Key discipline preserves EXACT parity with single-step
    training: step i inside the chunk uses ``fold_in(base_key,
    start_step + i)``, the same key the unchunked loop would use, so chunked
    and unchunked trajectories are identical (and resume works at any chunk
    boundary).

    Signature: ``chunk(state, base_key, start_step, batches[S, B, ...]) ->
    (state, metrics stacked [S, ...])``.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, DATA_AXIS))
    state_fmt = _state_boundary_sharding(cfg, mesh)

    def chunk(state, base_key, start_step, batches):
        with activation_sharding(mesh):
            def body(carry, inp):
                i, batch = inp
                key = jax.random.fold_in(base_key, start_step + i)
                new_state, metrics = train_step(cfg, carry, key, batch)
                if cfg.pin_state_layouts:
                    # pin the scan CARRY to the default layout too — the jit
                    # boundary Format does not reach inside the loop, and an
                    # AUTO carry re-introduces the per-iteration relayout
                    # round-trip the boundary pinning removes
                    new_state = with_layout_constraint(
                        new_state,
                        jax.tree.map(
                            lambda x: Layout(tuple(range(x.ndim))),
                            new_state))
                return new_state, metrics

            return jax.lax.scan(
                body, state, (jnp.arange(steps, dtype=jnp.int32), batches))

    return jax.jit(
        chunk,
        in_shardings=(state_fmt, repl, repl, data),
        out_shardings=(state_fmt, repl),
        donate_argnums=(0,),
    )


def init_train_state(cfg: Config, rng, sample_batch) -> TrainState:
    # Jitted: eager data-dependent init dispatches hundreds of small ops,
    # which costs ~10 min over a remote-tunneled TPU; one compiled (and
    # persistently cached) program runs in seconds.
    init = jax.jit(partial(get_model(cfg).init_params, cfg))
    params = init(rng, jnp.asarray(sample_batch))
    return TrainState(params=params, opt=optim.init_state(params))


def place_state(state: TrainState, mesh: Mesh,
                cfg: Config | None = None) -> TrainState:
    """Commit the state to the mesh with the replicated sharding (and, when
    ``cfg.pin_state_layouts``, the default-layout Format) the jitted
    step/chunk expects as INPUT. Freshly-initialized (or npz-restored) state
    is host-resident/uncommitted, so the first jitted call compiles for that
    layout and the second call — whose input is the first call's
    mesh-sharded OUTPUT — triggers a full recompile (minutes on a remote
    TPU). Placing the state first makes call 0 hit the same executable as
    every later call. Pass the same ``cfg`` the step was made with: a
    layout-pinned step REJECTS (rather than relayouts) mismatched input
    layouts, and init's own jitted output can carry an AUTO layout."""
    if cfg is not None and cfg.pin_state_layouts:
        repl = NamedSharding(mesh, P())
        fmt = jax.tree.map(
            lambda x: Format(Layout(tuple(range(jnp.ndim(x)))), repl), state)
        return jax.device_put(state, fmt)
    return jax.device_put(state, NamedSharding(mesh, P()))
