"""Portable inference export (``jax.export`` StableHLO artifacts).

The loaded artifact must be bit-identical to the in-process jitted
function and must not need any iaf_tpu model code to call (the serving
contract of ``iaf_tpu/core/export.py``; a capability beyond the
reference, whose Saver checkpoints only load back into its own graph
runtime — SURVEY.md §5.4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from iaf_tpu.core.config import Config
from iaf_tpu.core.export import (build_inference_fns, export_artifacts,
                                 load_exported)
from iaf_tpu.models import cvae, mnist_vae


def _cifar_cfg(tmp_path):
    return Config(dataset="synthetic", image_size=8, channels=3, z_size=2,
                  h_size=8, depth=1, num_blocks=2, depth_ar=1,
                  ar_hidden_size=8, kl_min=0.25, batch_size=8,
                  eval_batch_size=4, logdir=str(tmp_path))


def test_export_roundtrip_bit_exact_cifar(tmp_path):
    cfg = _cifar_cfg(tmp_path)
    x = np.random.RandomState(0).randint(
        0, 256, (8, 8, 8, 3)).astype(np.uint8)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)

    paths = export_artifacts(cfg, params, str(tmp_path / "export"),
                             num_samples=4, k=2)
    sample_fn, elbo_fn = build_inference_fns(cfg, params, num_samples=4, k=2)

    key = jax.random.PRNGKey(3)
    t = jnp.float32(0.8)
    want = np.asarray(jax.jit(sample_fn)(key, t))
    got = np.asarray(load_exported(paths["sample"])(key, t))
    assert np.array_equal(got, want)  # bit-exact, same backend

    xb = x[: cfg.eval_batch_size]
    want = np.asarray(jax.jit(elbo_fn)(key, xb))
    got = np.asarray(load_exported(paths["elbo"])(key, xb))
    assert got.shape == (cfg.eval_batch_size,)
    assert np.array_equal(got, want)


def test_export_checks_input_shapes(tmp_path):
    cfg = _cifar_cfg(tmp_path)
    x = np.random.RandomState(0).randint(
        0, 256, (8, 8, 8, 3)).astype(np.uint8)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    paths = export_artifacts(cfg, params, str(tmp_path / "export"),
                             num_samples=4, k=1)
    fn = load_exported(paths["elbo"])
    try:
        fn(jax.random.PRNGKey(0), x[:3])  # wrong batch for the artifact
        raised = False
    except Exception:
        raised = True
    assert raised, "exported artifact must enforce its static signature"


def test_export_multi_platform_lowering(tmp_path):
    """--export_platforms tpu,cpu: one artifact lowered for both backends
    must still load and run on the current (cpu) backend."""
    cfg = _cifar_cfg(tmp_path)
    x = np.random.RandomState(0).randint(
        0, 256, (8, 8, 8, 3)).astype(np.uint8)
    params = cvae.init_params(cfg, jax.random.PRNGKey(0), x)
    paths = export_artifacts(cfg, params, str(tmp_path / "export"),
                             num_samples=2, platforms=["cpu", "tpu"])
    out = load_exported(paths["sample"])(jax.random.PRNGKey(0),
                                         jnp.float32(1.0))
    assert np.asarray(out).shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_export_roundtrip_mnist_family(tmp_path):
    cfg = mnist_vae.mnist_config(
        dataset="synthetic", z_size=4, h_size=8, ar_hidden_size=8,
        flow_depth=1, depth_ar=1, batch_size=8, eval_batch_size=4,
        logdir=str(tmp_path))
    x = (np.random.RandomState(0).rand(8, 28, 28, 1) > 0.5).astype(np.uint8)
    params = mnist_vae.init_params(cfg, jax.random.PRNGKey(0), x)

    paths = export_artifacts(cfg, params, str(tmp_path / "export"),
                             num_samples=2, k=1)
    sample_fn, elbo_fn = build_inference_fns(cfg, params, num_samples=2, k=1)
    key = jax.random.PRNGKey(11)
    want = np.asarray(jax.jit(sample_fn)(key, jnp.float32(1.0)))
    got = np.asarray(load_exported(paths["sample"])(key, jnp.float32(1.0)))
    assert np.array_equal(got, want)
    xb = x[: cfg.eval_batch_size]
    want = np.asarray(jax.jit(elbo_fn)(key, xb))
    got = np.asarray(load_exported(paths["elbo"])(key, xb))
    assert np.array_equal(got, want)


def test_export_saved_from_checkpoint(tmp_path):
    """Driver path: train writes a checkpoint; export_saved serializes the
    EMA weights from it."""
    from iaf_tpu import train_lib

    cfg = _cifar_cfg(tmp_path).replace(
        learning_rate=0.005, total_steps=4, ckpt_every=4, log_every=4,
        eval_k=4)
    ds_rng = np.random.RandomState(1)

    def it():
        while True:
            yield ds_rng.randint(0, 256, (8, 8, 8, 3)).astype(np.uint8)

    train_lib.train(cfg, data_iter=it())
    paths = train_lib.export_saved(cfg, num_samples=2)
    for p in paths.values():
        fn = load_exported(p)
        assert callable(fn)
    out = load_exported(paths["sample"])(jax.random.PRNGKey(0),
                                         jnp.float32(1.0))
    assert np.isfinite(np.asarray(out)).all()
