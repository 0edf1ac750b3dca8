"""Datasets: CIFAR-10 / MNIST loaders plus a deterministic synthetic set.

Reference parity: ``tf_utils/data_utils.py`` (CIFAR-10 download/extract to
numpy + TF input queues) and the Theano-side MNIST loader with dynamic
binarization (SURVEY.md §2.1/§2.2). TPU-native replacement: plain numpy
arrays on the host, a per-host sharded iterator (each process sees only its
``process_index`` slice), and ``jax.device_put`` with a batch sharding in
``iaf_tpu.data.feed``.

The build environment has zero egress, so ``load_dataset`` falls back to a
deterministic synthetic dataset with CIFAR-like statistics when the real
archives are absent (download is attempted once if a URL is reachable).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tarfile
import urllib.request
from typing import NamedTuple

import numpy as np

CIFAR_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"


class Dataset(NamedTuple):
    train_x: np.ndarray  # uint8 [N, H, W, C]
    train_y: np.ndarray  # int32 [N]
    test_x: np.ndarray
    test_y: np.ndarray


def _try_download(url: str, dest: str) -> bool:
    try:
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        urllib.request.urlretrieve(url, dest)  # noqa: S310
        return True
    except Exception:
        return False


def load_cifar10(data_dir: str) -> Dataset | None:
    """CIFAR-10 from the python-version tarball (download if reachable)."""
    tgz = os.path.join(data_dir, "cifar-10-python.tar.gz")
    extracted = os.path.join(data_dir, "cifar-10-batches-py")
    if not os.path.isdir(extracted):
        if not os.path.isfile(tgz) and not _try_download(CIFAR_URL, tgz):
            return None
        try:
            with tarfile.open(tgz, "r:gz") as f:
                f.extractall(data_dir, filter="data")
        except OSError:
            # read-only data mount (e.g. /datasets): extract into a
            # DETERMINISTIC writable location derived from the archive path
            # (ADVICE r2: a CWD-relative dir would silently depend on the
            # process working directory and re-extract per CWD).
            # Hardening (ADVICE r3): the path is uid-scoped (another local
            # user squatting the shared name can only make us raise, never
            # feed us data to pickle.load), extraction goes into a private
            # 0700 mkdtemp that is atomically renamed into place, and
            # completeness is a marker file — a crashed partial extraction
            # can never be mistaken for a finished one.
            import shutil
            import tempfile
            tag = hashlib.sha256(os.path.abspath(tgz).encode()).hexdigest()[:12]
            alt = os.path.join(tempfile.gettempdir(),
                               f"iaf_tpu_cifar10_{os.getuid()}_{tag}")
            extracted = os.path.join(alt, "cifar-10-batches-py")
            marker = os.path.join(alt, ".extract_complete")
            if not os.path.isfile(marker):
                tmp = tempfile.mkdtemp(
                    prefix=f"iaf_tpu_cifar10_{os.getuid()}_extract_")
                with tarfile.open(tgz, "r:gz") as f:
                    f.extractall(tmp, filter="data")
                with open(os.path.join(tmp, ".extract_complete"), "w") as mf:
                    mf.write("ok\n")
                try:
                    os.rename(tmp, alt)  # atomic publish
                except OSError:
                    # somebody else (or a squatter) holds ``alt``: keep ours
                    # out of the way and only trust a COMPLETE extraction
                    shutil.rmtree(tmp, ignore_errors=True)
                    if not os.path.isfile(marker):
                        raise

    def _batch(name):
        with open(os.path.join(extracted, name), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return x.astype(np.uint8), np.asarray(d[b"labels"], np.int32)

    xs, ys = zip(*[_batch(f"data_batch_{i}") for i in range(1, 6)])
    test_x, test_y = _batch("test_batch")
    return Dataset(np.concatenate(xs), np.concatenate(ys), test_x, test_y)


def load_mnist(data_dir: str) -> Dataset | None:
    """MNIST from idx files (plain or .gz) if present (zero-egress: no hard
    dependency)."""
    names = ["train-images-idx3-ubyte", "train-labels-idx1-ubyte",
             "t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"]

    def _find(name):
        for suffix in ("", ".gz"):
            p = os.path.join(data_dir, name + suffix)
            if os.path.isfile(p):
                return p
        return None

    paths = [_find(n) for n in names]
    if not all(paths):
        return None

    def _read(p):
        if p.endswith(".gz"):
            import gzip
            with gzip.open(p, "rb") as f:
                return f.read()
        with open(p, "rb") as f:
            return f.read()

    def _images(p):
        raw = _read(p)
        n = int.from_bytes(raw[4:8], "big")
        return np.frombuffer(raw, np.uint8, offset=16).reshape(n, 28, 28, 1)

    def _labels(p):
        raw = _read(p)
        return np.frombuffer(raw, np.uint8, offset=8).astype(np.int32)

    return Dataset(_images(paths[0]), _labels(paths[1]),
                   _images(paths[2]), _labels(paths[3]))


def synthetic_dataset(image_size: int, channels: int, n_train: int = 4096,
                      n_test: int = 1024, seed: int = 0) -> Dataset:
    """Deterministic CIFAR-shaped synthetic data: smooth random low-frequency
    fields quantized to uint8, so bits/dim and throughput are meaningful
    without network access."""
    rng = np.random.RandomState(seed)

    def make(n):
        base = rng.randn(n, 4, 4, channels).astype(np.float32)
        # bilinear upsample to image_size for spatial correlation
        img = base
        while img.shape[1] < image_size:
            h = img.shape[1] * 2
            idx = np.linspace(0, img.shape[1] - 1, h).astype(np.float32)
            lo = np.floor(idx).astype(np.int32)
            hi = np.minimum(lo + 1, img.shape[1] - 1)
            w = (idx - lo)[None, :, None, None]
            img = img[:, lo] * (1 - w) + img[:, hi] * w
            w2 = (idx - lo)[None, None, :, None]
            img = img[:, :, lo] * (1 - w2) + img[:, :, hi] * w2
        img = img[:, :image_size, :image_size]
        img = (img - img.min()) / (img.max() - img.min() + 1e-9)
        noise = rng.uniform(0, 16, img.shape)
        return np.clip(img * 239 + noise, 0, 255).astype(np.uint8)

    return Dataset(make(n_train), np.zeros(n_train, np.int32),
                   make(n_test), np.zeros(n_test, np.int32))


def _candidate_dirs(data_dir: str) -> list[str]:
    """Where real archives might be mounted (data-availability probe,
    VERDICT round-1 item #6): the configured dir first, then conventional
    mount points, so the paper reproduction starts working the moment data
    appears without any config change."""
    cands = [data_dir, os.environ.get("IAF_DATA_DIR"), "/root/data", "/data",
             "/datasets", os.path.expanduser("~/data")]
    seen, out = set(), []
    for d in cands:
        if d and d not in seen:
            seen.add(d)
            out.append(d)
    return out


def real_data_available(name: str, data_dir: str = "./data") -> str | None:
    """Directory holding the real ``name`` archives, or None. Pure probe —
    never downloads (zero-egress safe); use at driver/bench/test start."""
    mnist_names = ["train-images-idx3-ubyte", "train-labels-idx1-ubyte",
                   "t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"]
    for d in _candidate_dirs(data_dir):
        if not os.path.isdir(d):
            continue
        if name == "cifar10":
            if (os.path.isdir(os.path.join(d, "cifar-10-batches-py"))
                    or os.path.isfile(
                        os.path.join(d, "cifar-10-python.tar.gz"))):
                return d
        elif name == "mnist":
            # per-file plain-or-.gz, matching load_mnist's _find (a mixed
            # directory must not silently fall back to synthetic)
            if all(any(os.path.isfile(os.path.join(d, n + s))
                       for s in ("", ".gz")) for n in mnist_names):
                return d
    return None


def load_dataset(name: str, data_dir: str, image_size: int = 32,
                 channels: int = 3) -> tuple[Dataset, bool]:
    """Returns (dataset, is_real). Probes the conventional mount points for
    real archives first, then attempts one download into ``data_dir``, then
    falls back to synthetic (zero-egress environments)."""
    if name == "cifar10":
        found = real_data_available(name, data_dir)
        ds = load_cifar10(found or data_dir)
        if ds is not None:
            return ds, True
    elif name == "mnist":
        found = real_data_available(name, data_dir)
        ds = load_mnist(found or data_dir)
        if ds is not None:
            return ds, True
    elif name != "synthetic":
        raise ValueError(f"unknown dataset {name!r}")
    return synthetic_dataset(image_size, channels), False


def fingerprint(arr: np.ndarray) -> str:
    return hashlib.sha256(arr.tobytes()).hexdigest()[:16]
