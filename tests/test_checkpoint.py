"""Checkpoint/resume tests (SURVEY.md §5.4): exact optimizer slot restore and
resume-equivalence of the loss trajectory (fault-injection philosophy §5.3)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from iaf_tpu import optim
from iaf_tpu.core import checkpoint as ckpt
from iaf_tpu.core.config import Config
from iaf_tpu.models import cvae


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.ones((2, 3)), "c": np.zeros(4)},
            "d": [np.full(2, 7.0), {"e": np.asarray(1.5)}]}
    flat = ckpt.flatten_pytree(tree)
    back = ckpt.unflatten_pytree(flat)
    assert isinstance(back["d"], list)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["d"][1]["e"], tree["d"][1]["e"])


def test_save_restore_latest(tmp_path):
    logdir = str(tmp_path)
    t1 = {"step": np.asarray(1), "w": np.ones(3)}
    t2 = {"step": np.asarray(2), "w": np.full(3, 2.0)}
    ckpt.save(logdir, 1, t1)
    ckpt.save(logdir, 2, t2)
    latest = ckpt.latest_checkpoint(logdir)
    assert latest.endswith("ckpt-000000002.npz")
    got = ckpt.restore(latest)
    np.testing.assert_array_equal(got["w"], t2["w"])
    loader = ckpt.CheckpointLoader(logdir)
    first = loader.maybe_load()
    assert first is not None and first[0] == latest
    assert loader.maybe_load() is None  # no new ckpt
    ckpt.save(logdir, 3, t1)
    assert loader.maybe_load() is not None


def test_resume_equivalence():
    """Train 6 steps straight vs 3 + checkpoint + restore + 3: identical
    params (same keys), per SURVEY.md §5.3 resume-equivalence."""
    cfg = Config(dataset="synthetic", image_size=8, channels=3, z_size=2,
                 h_size=8, depth=1, num_blocks=1, depth_ar=1,
                 ar_hidden_size=8, kl_min=0.0, learning_rate=0.01)
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (4, 8, 8, 3)).astype(np.uint8)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)

    @jax.jit
    def step(params, state, key):
        def loss_fn(p):
            return cvae.apply_fn(cfg, p, key, x).loss
        grads = jax.grad(loss_fn)(params)
        return optim.apply_updates(params, grads, state, lr=0.01)

    # straight
    p1, s1 = params, optim.init_state(params)
    for i in range(6):
        p1, s1 = step(p1, s1, jax.random.PRNGKey(i))

    # interrupted at 3
    p2, s2 = params, optim.init_state(params)
    for i in range(3):
        p2, s2 = step(p2, s2, jax.random.PRNGKey(i))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        ckpt.save(d, 3, {"params": p2, "opt": s2._asdict()})
        got = ckpt.restore(ckpt.latest_checkpoint(d))
    p2 = got["params"]
    od = got["opt"]
    s2 = optim.AdamaxState(step=jnp.asarray(od["step"]), m=od["m"],
                           u=od["u"], ema=od["ema"])
    for i in range(3, 6):
        p2, s2 = step(p2, s2, jax.random.PRNGKey(i))

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.ema), jax.tree.leaves(s2.ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_save_retention_keeps_newest(tmp_path):
    """keep=N retains only the newest N checkpoints (Saver max_to_keep)."""
    import os
    from iaf_tpu.core import checkpoint as ckpt
    for step in range(1, 8):
        ckpt.save(str(tmp_path), step, {"x": np.full((2,), step)}, keep=3)
    files = sorted(p for p in os.listdir(str(tmp_path)) if p.endswith(".npz"))
    assert files == [f"ckpt-{s:09d}.npz" for s in (5, 6, 7)], files
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest.endswith("ckpt-000000007.npz")
    # keep=0 disables pruning
    ckpt.save(str(tmp_path), 8, {"x": np.zeros(2)}, keep=0)
    assert len([p for p in os.listdir(str(tmp_path))
                if p.endswith(".npz")]) == 4


def test_resume_across_mesh_change(tmp_path):
    """A checkpoint written on a 1-device mesh must restore onto an
    8-device mesh (single-host run promoted to a pod slice — SURVEY §5.4
    "loader maps single-host <-> multi-host shardings") with the SAME loss
    trajectory as an uninterrupted single-device run (DP is mesh-invariant,
    tests/test_parallel.py)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from iaf_tpu import train_lib
    from iaf_tpu.parallel import train_step as ts
    from iaf_tpu.parallel.mesh import make_mesh

    cfg = Config(dataset="synthetic", image_size=8, channels=3, z_size=2,
                 h_size=8, depth=1, num_blocks=1, depth_ar=1,
                 ar_hidden_size=8, kl_min=0.25, batch_size=8,
                 learning_rate=0.01, seed=0, compute_dtype="float32")
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (8, 8, 8, 3)).astype(np.uint8)
    keys = [jax.random.PRNGKey(50 + i) for i in range(5)]

    def run(mesh, state, steps, key_seq):
        step_fn = ts.make_train_step(cfg, mesh)
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
        losses = []
        for k in key_seq:
            state, m = step_fn(state, k, xs)
            losses.append(float(np.asarray(m["loss"])))
        return state, losses

    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                 ("data", "model"))
    mesh8 = make_mesh(cfg)
    assert mesh8.shape["data"] == 8

    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)

    def fresh_state():
        # the train step donates its state buffers, so each arm needs its
        # own copy of the initial params
        p = jax.tree.map(jnp.copy, params)
        return ts.TrainState(p, optim.init_state(p))

    # reference: 5 uninterrupted steps on the 1-device mesh
    st = ts.place_state(fresh_state(), mesh1, cfg)
    _, ref_losses = run(mesh1, st, 5, keys)

    # test: 2 steps on mesh1 -> checkpoint -> restore onto mesh8 -> 3 steps
    st = ts.place_state(fresh_state(), mesh1, cfg)
    st, head = run(mesh1, st, 2, keys[:2])
    path = ckpt.save(str(tmp_path), 2,
                     train_lib.state_to_tree(2, st, jax.random.PRNGKey(9)))
    step, st8, _ = train_lib.tree_to_state(ckpt.restore(path))
    assert step == 2
    st8 = ts.place_state(st8, mesh8, cfg)
    _, tail = run(mesh8, st8, 3, keys[2:])

    np.testing.assert_allclose(head + tail, ref_losses, rtol=1e-5)
