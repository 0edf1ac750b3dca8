"""Real-data readiness (VERDICT round-1 item #6): these tests are skipped in
zero-egress images with no data on disk, and run the full quality ladder the
day CIFAR-10 / MNIST archives appear at any conventional mount point
(./data, $IAF_DATA_DIR, /root/data, /data, /datasets, ~/data).

Paper reproduction commands (BASELINE.md targets):

  CIFAR-10 (~3.11 bits/dim, reference README command, global batch = the
  reference's 32-per-GPU x its 8 GPUs):
    python train.py --logdir /tmp/iaf_cifar --mode train --hpconfig \
      depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=256
    python train.py --logdir /tmp/iaf_cifar --mode eval_test

  MNIST (~79.1 nats, Theano-stack config):
    python train.py --logdir /tmp/iaf_mnist --mode train --hpconfig \
      likelihood=bernoulli,dataset=mnist,binarize=true,image_size=28,channels=1
    python train.py --logdir /tmp/iaf_mnist --mode eval_test

The env-gated IAF_PAPER_RUN=1 test below executes that recipe end-to-end and
asserts the paper numbers (long: days of TPU time)."""

import os

import numpy as np
import pytest

from iaf_tpu import train_lib
from iaf_tpu.core.config import Config
from iaf_tpu.data.datasets import load_dataset, real_data_available

CIFAR_DIR = real_data_available("cifar10")
MNIST_DIR = real_data_available("mnist")


@pytest.mark.skipif(CIFAR_DIR is None, reason="no real CIFAR-10 on disk")
def test_cifar10_loads():
    ds, is_real = load_dataset("cifar10", CIFAR_DIR)
    assert is_real
    assert ds.train_x.shape == (50000, 32, 32, 3)
    assert ds.test_x.shape == (10000, 32, 32, 3)
    assert ds.train_x.dtype == np.uint8
    assert 0 <= int(ds.train_x.min()) and int(ds.train_x.max()) == 255
    assert len(np.unique(ds.train_y)) == 10


@pytest.mark.skipif(MNIST_DIR is None, reason="no real MNIST on disk")
def test_mnist_loads():
    ds, is_real = load_dataset("mnist", MNIST_DIR)
    assert is_real
    assert ds.train_x.shape == (60000, 28, 28, 1)
    assert ds.test_x.shape == (10000, 28, 28, 1)


@pytest.mark.skipif(CIFAR_DIR is None, reason="no real CIFAR-10 on disk")
def test_cifar10_short_ladder(tmp_path):
    """Short end-to-end run on REAL data: train a shallow config, IW-eval,
    sample. Guards the full pipeline (not the paper number)."""
    cfg = Config(dataset="cifar10", data_dir=CIFAR_DIR, z_size=8, h_size=32,
                 depth=1, num_blocks=2, depth_ar=1, ar_hidden_size=32,
                 kl_min=0.25, batch_size=16, total_steps=20, ckpt_every=20,
                 log_every=10, eval_batch_size=8, eval_k=16, eval_k_chunk=8,
                 logdir=str(tmp_path))
    train_lib.train(cfg)
    bpd = train_lib.evaluate(cfg, k=16, max_batches=2)
    assert np.isfinite(bpd) and bpd < 20.0, bpd
    imgs = train_lib.sample(cfg, num=4)
    assert imgs.shape == (4, 32, 32, 3)


@pytest.mark.skipif(not os.environ.get("IAF_PAPER_RUN"),
                    reason="set IAF_PAPER_RUN=1 (and have real data + days "
                           "of TPU time) to run the paper quality gate")
def test_paper_quality_gates(tmp_path):
    """BASELINE config c3: the full paper recipe to ~3.11 bits/dim (and the
    MNIST ~79.1-nat gate when MNIST is present)."""
    assert CIFAR_DIR is not None, "IAF_PAPER_RUN needs real CIFAR-10"
    cfg = Config(dataset="cifar10", data_dir=CIFAR_DIR, depth=1,
                 num_blocks=20, kl_min=0.25, learning_rate=0.002,
                 batch_size=256, total_steps=1_000_000, ckpt_every=5000,
                 log_every=500, eval_k=4096, logdir=str(tmp_path / "cifar"))
    train_lib.train(cfg)
    bpd = train_lib.evaluate(cfg, mode="eval_test")
    assert bpd <= 3.16, f"paper gate: expected ~3.11 bits/dim, got {bpd}"
    if MNIST_DIR is not None:
        mcfg = Config(dataset="mnist", data_dir=MNIST_DIR,
                      likelihood="bernoulli", binarize=True, image_size=28,
                      channels=1, total_steps=200_000,
                      logdir=str(tmp_path / "mnist"))
        train_lib.train(mcfg)
        nats = train_lib.evaluate(mcfg, mode="eval_test")
        assert nats <= 80.0, f"expected ~79.1 nats, got {nats}"
