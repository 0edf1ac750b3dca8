"""Real-archive loader tests with synthetic fake archives (the build image
has zero egress, so these prove the drop-real-data-in path actually works:
CIFAR python tarball parsing and MNIST idx/idx.gz parsing)."""

import gzip
import os
import pickle
import tarfile

import numpy as np

from iaf_tpu.data.datasets import load_cifar10, load_dataset, load_mnist


def _fake_cifar_tarball(data_dir, n_per_batch=10):
    os.makedirs(data_dir, exist_ok=True)
    inner = "cifar-10-batches-py"
    rng = np.random.RandomState(0)
    stage = os.path.join(data_dir, "_stage", inner)
    os.makedirs(stage, exist_ok=True)
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        d = {
            b"data": rng.randint(0, 256, (n_per_batch, 3072), dtype=np.uint8),
            b"labels": rng.randint(0, 10, n_per_batch).tolist(),
        }
        with open(os.path.join(stage, name), "wb") as f:
            pickle.dump(d, f)
    tgz = os.path.join(data_dir, "cifar-10-python.tar.gz")
    with tarfile.open(tgz, "w:gz") as f:
        f.add(stage, arcname=inner)
    import shutil
    shutil.rmtree(os.path.join(data_dir, "_stage"))


def _idx_images(path, n, gz=False):
    rng = np.random.RandomState(1)
    header = (2051).to_bytes(4, "big") + n.to_bytes(4, "big") \
        + (28).to_bytes(4, "big") + (28).to_bytes(4, "big")
    payload = header + rng.randint(0, 256, n * 28 * 28, dtype=np.uint8).tobytes()
    op = gzip.open if gz else open
    with op(path, "wb") as f:
        f.write(payload)


def _idx_labels(path, n, gz=False):
    rng = np.random.RandomState(2)
    payload = (2049).to_bytes(4, "big") + n.to_bytes(4, "big") \
        + rng.randint(0, 10, n, dtype=np.uint8).tobytes()
    op = gzip.open if gz else open
    with op(path, "wb") as f:
        f.write(payload)


def test_cifar_tarball_roundtrip(tmp_path):
    d = str(tmp_path)
    _fake_cifar_tarball(d, n_per_batch=10)
    ds = load_cifar10(d)
    assert ds is not None
    assert ds.train_x.shape == (50, 32, 32, 3)
    assert ds.train_x.dtype == np.uint8
    assert ds.test_x.shape == (10, 32, 32, 3)
    assert ds.train_y.shape == (50,) and ds.train_y.dtype == np.int32
    # extraction is cached: second load must work from the extracted dir
    ds2 = load_cifar10(d)
    np.testing.assert_array_equal(ds.train_x, ds2.train_x)
    # and load_dataset reports it as real data
    ds3, is_real = load_dataset("cifar10", d)
    assert is_real and ds3.train_x.shape == (50, 32, 32, 3)


def test_mnist_idx_plain_and_gz(tmp_path):
    for gz in (False, True):
        d = str(tmp_path / ("gz" if gz else "plain"))
        os.makedirs(d, exist_ok=True)
        sfx = ".gz" if gz else ""
        _idx_images(os.path.join(d, "train-images-idx3-ubyte" + sfx), 30, gz)
        _idx_labels(os.path.join(d, "train-labels-idx1-ubyte" + sfx), 30, gz)
        _idx_images(os.path.join(d, "t10k-images-idx3-ubyte" + sfx), 12, gz)
        _idx_labels(os.path.join(d, "t10k-labels-idx1-ubyte" + sfx), 12, gz)
        ds = load_mnist(d)
        assert ds is not None, f"gz={gz}"
        assert ds.train_x.shape == (30, 28, 28, 1)
        assert ds.test_x.shape == (12, 28, 28, 1)
        assert ds.test_y.shape == (12,)


def test_missing_archives_fall_back_to_synthetic(tmp_path):
    ds, is_real = load_dataset("cifar10", str(tmp_path / "nope"))
    assert not is_real
    assert ds.train_x.shape[1:] == (32, 32, 3)
