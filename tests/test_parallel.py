"""Multi-device tests on the 8 fake CPU devices (SURVEY.md §4.6): mesh
building, data-parallel gradient equivalence, sharded IW logsumexp, and the
per-host data sharding function."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from iaf_tpu.core.config import Config
from iaf_tpu.data import feed
from iaf_tpu.models import cvae
from iaf_tpu.parallel import eval_step as ev
from iaf_tpu.parallel import train_step as ts
from iaf_tpu.parallel.mesh import make_mesh


def tiny_cfg(**kw):
    # compute_dtype pinned f32: these tests assert STRUCTURAL equivalences
    # (sharded == single-device, chunked == unchunked, streamed == one-shot)
    # at tight tolerance; the bf16 perf default amplifies XLA op-ordering
    # noise past those tolerances without bearing on the structural claim
    # (bf16 quality is gated by test_golden.py::test_bf16_compute_tracks_f32)
    base = dict(dataset="synthetic", image_size=8, channels=3, z_size=2,
                h_size=8, depth=1, num_blocks=1, depth_ar=1, ar_hidden_size=8,
                kl_min=0.0, batch_size=8, learning_rate=0.01, seed=0,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


def fake_batch(cfg, n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (n, cfg.image_size, cfg.image_size,
                                cfg.channels)).astype(np.uint8)


def test_mesh_shapes():
    cfg = tiny_cfg()
    mesh = make_mesh(cfg)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(cfg.replace(mesh_model=2))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_data_parallel_grads_match_single_device():
    """psum-averaged DP grads == single-device grads on the full batch
    (SURVEY.md §4.6, atol 1e-5)."""
    cfg = tiny_cfg()
    mesh = make_mesh(cfg)
    x = fake_batch(cfg, 8)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    state = ts.TrainState(params, __import__("iaf_tpu.optim",
                                             fromlist=["optim"]).init_state(params))
    key = jax.random.PRNGKey(3)

    def grads_of(p, batch):
        def loss_fn(q):
            return cvae.apply_fn(cfg, q, key, batch).loss
        return jax.grad(loss_fn)(p)

    # single device
    g_single = grads_of(params, jnp.asarray(x))
    # sharded over 8 devices
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    g_dp = jax.jit(grads_of,
                   in_shardings=(NamedSharding(mesh, P()),
                                 NamedSharding(mesh, P("data"))),
                   out_shardings=NamedSharding(mesh, P()))(params, xs)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
        # identical math, different reduction order across shards
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def test_train_step_runs_and_improves():
    cfg = tiny_cfg()
    mesh = make_mesh(cfg)
    x = fake_batch(cfg, 8)
    state = ts.init_train_state(cfg, jax.random.PRNGKey(0), x)
    state = ts.place_state(state, mesh, cfg)
    step = ts.make_train_step(cfg, mesh)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    losses = []
    for i in range(20):
        state, metrics = step(state, jax.random.PRNGKey(i), xg)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # EMA shadow must differ from raw params after steps
    diff = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(state.opt.ema)))
    assert diff > 0


def test_sharded_iw_eval_matches_unsharded():
    """Sharded k logsumexp == single-device bound with the same total k and
    matched per-shard sample keys (SURVEY.md §4.6)."""
    cfg = tiny_cfg()
    mesh = make_mesh(cfg)
    x = fake_batch(cfg, 2, seed=7)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    k = 32
    evf = ev.make_eval_step(cfg, mesh, k=k)
    bound_sharded = np.asarray(evf(params, jax.random.PRNGKey(9),
                                   jnp.asarray(x)))
    assert bound_sharded.shape == (2,)

    # Unsharded oracle: replicate each shard's sampling (fold_in shard id,
    # then chunk id, k_chunk samples per chunk) and combine all k log-weights
    # on one device.
    k_local = k // 8
    k_chunk = min(k_local, cfg.eval_k_chunk)
    log_ws = []
    for shard in range(8):
        key_s = jax.random.fold_in(jax.random.PRNGKey(9), shard)
        for c in range(k_local // k_chunk):
            out = cvae.apply_fn(cfg, params, jax.random.fold_in(key_s, c),
                                jnp.asarray(x), mode="eval", k=k_chunk)
            log_ws.append(np.asarray(out.log_w).reshape(2, k_chunk))
    log_w = np.concatenate(log_ws, axis=1)  # [2, k]
    m = log_w.max(axis=1, keepdims=True)
    want = -(np.log(np.exp(log_w - m).sum(axis=1)) + m[:, 0] - np.log(k))
    np.testing.assert_allclose(bound_sharded, want, rtol=1e-5, atol=1e-5)


def test_streamed_k_chunks_match_single_chunk_bound():
    """eval_k_chunk streaming (online logsumexp scan) must agree with the
    one-chunk path given the same per-chunk keys."""
    cfg = tiny_cfg()
    mesh = make_mesh(cfg)
    x = fake_batch(cfg, 2, seed=11)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    k = 32  # k_local = 4 per shard
    streamed = ev.make_eval_step(cfg.replace(eval_k_chunk=2), mesh, k=k)
    got = np.asarray(streamed(params, jax.random.PRNGKey(5), jnp.asarray(x)))
    # oracle with identical key schedule: 2 chunks of 2 per shard
    log_ws = []
    for shard in range(8):
        key_s = jax.random.fold_in(jax.random.PRNGKey(5), shard)
        for c in range(2):
            out = cvae.apply_fn(cfg, params, jax.random.fold_in(key_s, c),
                                jnp.asarray(x), mode="eval", k=2)
            log_ws.append(np.asarray(out.log_w).reshape(2, 2))
    log_w = np.concatenate(log_ws, axis=1)
    m = log_w.max(axis=1, keepdims=True)
    want = -(np.log(np.exp(log_w - m).sum(axis=1)) + m[:, 0] - np.log(k))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_iw_bound_beats_elbo_on_same_params():
    cfg = tiny_cfg()
    mesh = make_mesh(cfg)
    x = fake_batch(cfg, 2, seed=3)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    evf_k = ev.make_eval_step(cfg, mesh, k=64)
    bound_k = float(np.mean(np.asarray(
        evf_k(params, jax.random.PRNGKey(1), jnp.asarray(x)))))
    elbo_f = ev.make_batch_sharded_elbo(cfg, mesh, k=1)
    x8 = np.repeat(np.asarray(x), 4, axis=0)  # batch divisible by 8
    elbo = float(np.mean(np.asarray(
        elbo_f(params, jax.random.PRNGKey(1), jnp.asarray(x8)))))
    assert bound_k < elbo + 0.5  # IW bound is tighter (allow MC slack)


def test_host_shard_indices_partition():
    rng_mk = lambda: np.random.RandomState(42)
    all_idx = [feed.host_shard_indices(64, p, 4, rng_mk()) for p in range(4)]
    flat = np.concatenate(all_idx)
    assert len(flat) == 64
    assert len(np.unique(flat)) == 64  # disjoint cover


def test_batch_iterator_shapes_and_determinism():
    imgs = np.arange(32 * 4 * 4 * 3, dtype=np.uint8).reshape(32, 4, 4, 3)
    it1 = feed.batch_iterator(imgs, global_batch=8, seed=1,
                              process_index=0, process_count=2)
    it2 = feed.batch_iterator(imgs, global_batch=8, seed=1,
                              process_index=0, process_count=2)
    b1, b2 = next(it1), next(it2)
    assert b1.shape == (4, 4, 4, 3)
    np.testing.assert_array_equal(b1, b2)
    # different processes see disjoint halves in epoch 0
    it3 = feed.batch_iterator(imgs, global_batch=8, seed=1,
                              process_index=1, process_count=2)
    b3 = next(it3)
    assert not np.array_equal(b1, b3)


def test_grad_accum_matches_micro_oracle():
    """grad_accum=A: accumulated mean grads == the mean of per-micro-batch
    grads computed with the same folded keys (and sharding still works)."""
    import jax
    from functools import partial
    from iaf_tpu.parallel.train_step import loss_fn, _grads_and_metrics

    cfg = tiny_cfg().replace(grad_accum=2)
    x = fake_batch(cfg, 8, seed=21)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    rng = jax.random.PRNGKey(3)
    grads, metrics = jax.jit(
        lambda p, r, b: _grads_and_metrics(cfg, p, r, b))(
            params, rng, jnp.asarray(x))

    gsum = None
    losses = []
    for a in range(2):
        mb = jnp.asarray(x)[a * 4:(a + 1) * 4]
        (loss, out), g = jax.value_and_grad(
            partial(loss_fn, cfg), has_aux=True)(
                params, jax.random.fold_in(rng, a), mb)
        losses.append(float(loss))
        gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
    want = jax.tree.map(lambda g: g / 2, gsum)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(want)):
        # scan-fused vs unrolled reduction orders: loose float tolerance
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses),
                               rtol=1e-5)


def test_grad_accum_trains_end_to_end(tmp_path):
    from iaf_tpu import train_lib
    from iaf_tpu.core.config import Config
    cfg = Config(dataset="synthetic", image_size=8, channels=3, z_size=2,
                 h_size=8, depth=1, num_blocks=1, depth_ar=1,
                 ar_hidden_size=8, kl_min=0.0, learning_rate=0.005,
                 batch_size=16, grad_accum=2, total_steps=4, ckpt_every=4,
                 log_every=4, logdir=str(tmp_path))
    state = train_lib.train(cfg)
    assert state is not None


def test_place_state_prevents_second_call_recompile():
    """Without place_state, call 0 (host-resident state) and call 1 (mesh-
    sharded output state) compile twice; with it, one executable serves all
    calls. Guards minutes of remote-TPU compile time per train/bench run."""
    import jax
    from iaf_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg().replace(steps_per_dispatch=2)
    x = fake_batch(cfg, 8, seed=5)
    mesh = make_mesh(cfg)
    state = ts.init_train_state(cfg, jax.random.PRNGKey(0), x)
    state = ts.place_state(state, mesh, cfg)
    chunk = ts.make_train_chunk(cfg, mesh, 2)
    xs = np.stack([x, x])
    for i in range(3):
        state, _ = chunk(state, jax.random.PRNGKey(1), np.int32(2 * i), xs)
    assert chunk._cache_size() == 1


def test_fused_optimizer_kernel_under_sharded_jit(monkeypatch):
    """The fused Adamax+Polyak Pallas kernel (kernels=pallas_opt) must
    compile and run inside the sharded train step on a multi-device mesh
    (interpret mode here; the TPU A/B covers Mosaic) and match the XLA
    optimizer path exactly — the kernel only reschedules memory traffic."""
    import iaf_tpu.optim as _optim
    monkeypatch.setattr(_optim, "FUSED_MIN_SIZE", 0)  # tiny tree: force it
    cfg_x = tiny_cfg(batch_size=8)
    cfg_p = tiny_cfg(batch_size=8, kernels="pallas_opt")
    x = fake_batch(cfg_x, 8)
    losses = {}
    for name, cfg in (("xla", cfg_x), ("pallas", cfg_p)):
        mesh = make_mesh(cfg)
        params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
        import iaf_tpu.optim as optim
        state = ts.TrainState(params, optim.init_state(params))
        state = ts.place_state(state, mesh, cfg)
        step_fn = ts.make_train_step(cfg, mesh)
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
        ls = []
        for i in range(3):
            state, m = step_fn(state, jax.random.PRNGKey(7 + i), xs)
            ls.append(float(np.asarray(m["loss"])))
        losses[name] = ls
    np.testing.assert_allclose(losses["xla"], losses["pallas"],
                               rtol=1e-6, atol=1e-6)


def test_fused_optimizer_trajectory_bit_exact(monkeypatch):
    """VERDICT r2 next #7: the fused-optimizer bit-exactness claim (PARITY
    "Pallas verdict": 'trajectory bit-exact vs the XLA update on real TPU')
    as a regression test, interpret mode: a 10-step trajectory with
    kernels=pallas_opt must be BIT-IDENTICAL — params, m, u, ema, and every
    logged loss — to kernels=xla. The kernel claims to reschedule memory
    traffic only; any arithmetic reassociation shows up here."""
    import iaf_tpu.optim as _optim
    monkeypatch.setattr(_optim, "FUSED_MIN_SIZE", 0)  # tiny tree: force it
    finals = {}
    for name, kernels in (("xla", "xla"), ("pallas", "pallas_opt")):
        cfg = tiny_cfg(batch_size=8, kernels=kernels)
        x = fake_batch(cfg, 8)
        mesh = make_mesh(cfg)
        params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
        import iaf_tpu.optim as optim
        state = ts.TrainState(params, optim.init_state(params))
        state = ts.place_state(state, mesh, cfg)
        step_fn = ts.make_train_step(cfg, mesh)
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
        losses = []
        for i in range(10):
            state, m = step_fn(state, jax.random.PRNGKey(7 + i), xs)
            losses.append(np.asarray(m["loss"]).tobytes())
        finals[name] = (state, losses)
    st_x, losses_x = finals["xla"]
    st_p, losses_p = finals["pallas"]
    assert losses_x == losses_p  # bytes, not allclose
    for a, b in zip(jax.tree.leaves((st_x.params, st_x.opt.m, st_x.opt.u,
                                     st_x.opt.ema)),
                    jax.tree.leaves((st_p.params, st_p.opt.m, st_p.opt.u,
                                     st_p.opt.ema))):
        assert np.asarray(a).tobytes() == np.asarray(b).tobytes()


def test_distributed_iw_bound_matches_logsumexp():
    """The non-streamed distributed-logsumexp building block (eval_step.
    distributed_iw_bound — the make_eval_step scan combines (max, sumexp)
    pairs instead, so this helper needs its own oracle): sharding the k
    axis over the mesh must reproduce the unsharded bound exactly."""
    import math

    from iaf_tpu.parallel.eval_step import distributed_iw_bound

    B, K = 4, 32
    log_w = jax.random.normal(jax.random.PRNGKey(0), (B, K)) * 3.0
    mesh = make_mesh(Config(dataset="synthetic"))
    n = mesh.shape["data"]

    def local(lw):
        return distributed_iw_bound(lw, K)

    # shard k across the data axis: each shard holds K/n columns
    got = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P(None, "data"), out_specs=P(),
        check_vma=False))(log_w)
    want = -(jax.scipy.special.logsumexp(log_w, axis=1) - math.log(K))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
