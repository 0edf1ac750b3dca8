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
