"""Golden-scalar regression tests (SURVEY.md §4.7 config c1): frozen loss
values from fixed seeds guard silent numerics drift (free-bits formula, init
calibration, flow logdet accounting). Tolerances are loose enough to survive
XLA version changes but catch structural regressions."""

import jax
import numpy as np

from iaf_tpu import train_lib
from iaf_tpu.core.config import Config


def _run(cfg, steps):
    from iaf_tpu.data.datasets import synthetic_dataset
    ds = synthetic_dataset(cfg.image_size, cfg.channels, n_train=64,
                           n_test=32, seed=0)
    def fixed_batch():
        while True:
            yield ds.train_x[:cfg.batch_size]
    it = fixed_batch()
    state = train_lib.train(cfg, max_steps=steps, data_iter=it)
    from iaf_tpu.models import cvae
    out = cvae.apply_fn(cfg, state.params, jax.random.PRNGKey(99),
                        ds.train_x[:cfg.batch_size], mode="eval")
    return float(out.loss), float(out.bits_per_dim)


def test_c1_diag_vae_golden(tmp_path):
    """Config c1: diagonal-Gaussian VAE (flow=diag), fixed seed/data."""
    cfg = Config(dataset="synthetic", image_size=8, channels=3, z_size=2,
                 h_size=8, depth=1, num_blocks=2, depth_ar=0, flow="diag",
                 kl_min=0.0, learning_rate=0.005, batch_size=8,
                 total_steps=30, ckpt_every=1000, log_every=1000, seed=7,
                 compute_dtype="float32",  # frozen values are f32 numerics
                 logdir=str(tmp_path))
    loss, bpd = _run(cfg, 30)
    # frozen 2026-08-17 (jax 0.8.x, CPU): loss 1316.12, bits/dim 9.8894
    assert np.isfinite(loss)
    assert abs(loss - 1316.12) / 1316.12 < 0.03, loss
    assert abs(bpd - 9.8894) / 9.8894 < 0.03, bpd


def test_c2_shallow_iaf_golden(tmp_path):
    """Config c2: shallow IAF; guards the flow's logdet accounting."""
    cfg = Config(dataset="synthetic", image_size=8, channels=3, z_size=2,
                 h_size=8, depth=1, num_blocks=1, depth_ar=1,
                 ar_hidden_size=8, kl_min=0.25, learning_rate=0.005,
                 batch_size=8, total_steps=30, ckpt_every=1000,
                 log_every=1000, seed=7, compute_dtype="float32",
                 logdir=str(tmp_path))
    loss, bpd = _run(cfg, 30)
    # frozen 2026-08-17 (jax 0.8.x, CPU): loss 1314.75, bits/dim 9.8791
    assert np.isfinite(loss)
    assert abs(loss - 1314.75) / 1314.75 < 0.03, loss
    assert abs(bpd - 9.8791) / 9.8791 < 0.03, bpd


def test_c2_long_horizon_golden(tmp_path):
    """300-step golden at 1% tolerance (VERDICT r2 next #7: the 30-step
    goldens at 3% catch structural breaks but not slow numeric drift — a
    subtly wrong init scale surfaces over hundreds of steps). f32, fixed
    batch, chunked dispatch (trajectory-identical to unchunked, tested in
    test_train_lib)."""
    cfg = Config(dataset="synthetic", image_size=8, channels=3, z_size=2,
                 h_size=8, depth=1, num_blocks=1, depth_ar=1,
                 ar_hidden_size=8, kl_min=0.25, learning_rate=0.005,
                 batch_size=8, total_steps=300, ckpt_every=100000,
                 log_every=100000, seed=7, compute_dtype="float32",
                 steps_per_dispatch=25, logdir=str(tmp_path))
    loss, bpd = _run(cfg, 300)
    # frozen 2026-08-18 (jax 0.8.x, CPU): loss 1062.5403, bits/dim 7.98154
    assert np.isfinite(loss)
    assert abs(loss - 1062.5403) / 1062.5403 < 0.01, loss
    assert abs(bpd - 7.98154) / 7.98154 < 0.01, bpd


def test_mnist_long_horizon_golden(tmp_path):
    """300-step MNIST-family golden at 1% (dense-MADE IAF, Bernoulli,
    dynamic binarization) — the Theano-stack counterpart of the c2 long
    golden."""
    from iaf_tpu.data import feed
    from iaf_tpu.data.datasets import synthetic_dataset
    from iaf_tpu.models import mnist_vae
    from iaf_tpu.models.mnist_vae import mnist_config

    cfg = mnist_config(image_size=8, z_size=4, h_size=8, ar_hidden_size=16,
                       depth_ar=1, flow_depth=1, kl_min=0.0,
                       learning_rate=0.005, batch_size=8, total_steps=300,
                       ckpt_every=100000, log_every=100000,
                       dataset="synthetic", channels=1, binarize=True,
                       seed=7, compute_dtype="float32",
                       steps_per_dispatch=25, logdir=str(tmp_path))
    ds = synthetic_dataset(cfg.image_size, cfg.channels, n_train=64,
                           n_test=32, seed=3)

    def fixed_batch():
        while True:
            yield ds.train_x[:cfg.batch_size]

    it = feed.binarized_iterator(fixed_batch(), cfg.seed)
    state = train_lib.train(cfg, max_steps=300, data_iter=it)
    xe = feed.dynamic_binarize(ds.test_x[:cfg.batch_size],
                               feed.binarize_rng(cfg.seed, -1))
    out = mnist_vae.apply_fn(cfg, state.params, jax.random.PRNGKey(99), xe,
                             mode="eval", k=1)
    nll = float(np.mean(np.asarray(out.loss)))
    # frozen 2026-08-18 (jax 0.8.x, CPU): eval NLL 45.5849 nats
    assert np.isfinite(nll)
    assert abs(nll - 45.5849) / 45.5849 < 0.01, nll


def test_bf16_compute_tracks_f32(tmp_path):
    """bf16 conv compute (params and elementwise numerics stay f32) must
    track the f32 training trajectory within tolerance on the shallow-IAF
    config — the quality gate behind the compute_dtype=bfloat16 perf default
    (measured +7% steps/s on TPU, tools/ab_bench.py r2: 33.15 vs 30.94)."""
    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = Config(dataset="synthetic", image_size=8, channels=3, z_size=2,
                     h_size=8, depth=1, num_blocks=2, depth_ar=1,
                     ar_hidden_size=8, kl_min=0.25, learning_rate=0.005,
                     batch_size=8, total_steps=30, ckpt_every=1000,
                     log_every=1000, seed=7, compute_dtype=dtype,
                     logdir=str(tmp_path / dtype))
        results[dtype] = _run(cfg, 30)
    loss32, bpd32 = results["float32"]
    loss16, bpd16 = results["bfloat16"]
    assert abs(loss16 - loss32) / abs(loss32) < 0.02, (loss16, loss32)
    assert abs(bpd16 - bpd32) / abs(bpd32) < 0.02, (bpd16, bpd32)
