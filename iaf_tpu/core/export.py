"""Portable inference export via ``jax.export`` (StableHLO serialization).

The reference's only trained artifact is a TF-1 checkpoint usable solely
inside its own graph runtime (``tf_train.py`` + Saver; SURVEY.md §5.4) —
it has no serving handoff. The TPU-native equivalent is ``jax.export``:
``--mode export`` serializes the trained model's two inference surfaces

  ``sample.jaxexp``  f(key, temperature)  -> images in [0, 256) float
  ``elbo.jaxexp``    f(key, batch_uint8)  -> per-example nats (k-IW bound)

as self-contained StableHLO artifacts with the (EMA) weights baked in as
constants: a serving process needs jax plus the artifact bytes — none of
this package's model code — and the loaded function is bit-identical to
the in-process jitted one (``tests/test_export.py``). Pass
``platforms=["tpu", "cpu"]`` to emit one artifact servable on both.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp

from iaf_tpu.core.config import Config


def build_inference_fns(cfg: Config, params, num_samples: int = 16,
                        k: int = 1):
    """``(sample_fn(key, temperature), elbo_fn(key, x_uint8))`` with
    ``params`` closed over (so an export bakes the weights in as
    constants). ``k`` is the importance-sample count of the scoring bound
    (k=1 = plain ELBO); ``num_samples`` is the static sample batch."""
    if cfg.likelihood == "bernoulli":
        from iaf_tpu.models import mnist_vae as model
        sample = model.sample
    else:
        from iaf_tpu.models import cvae as model
        sample = model.cvae_sample

    def sample_fn(key, temperature):
        return sample(cfg, params, key, num_samples, temperature)

    def elbo_fn(key, x):
        out = model.apply_fn(cfg, params, key, x, mode="eval", k=k)
        return out.elbo_nats

    return sample_fn, elbo_fn


def export_artifacts(cfg: Config, params, out_dir: str,
                     num_samples: int = 16, k: int = 1,
                     batch_size: int | None = None,
                     platforms: Sequence[str] | None = None) -> dict:
    """Serialize the inference surfaces to ``out_dir``; returns
    ``{name: path}``. Shapes are static (num_samples for sampling;
    ``batch_size`` or ``cfg.eval_batch_size`` for scoring) — the serving
    contract of a compiled artifact."""
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    sample_fn, elbo_fn = build_inference_fns(cfg, params, num_samples, k)
    b = batch_size or cfg.eval_batch_size
    key = jax.random.PRNGKey(0)
    x_spec = jnp.zeros((b, cfg.image_size, cfg.image_size, cfg.channels),
                       jnp.uint8)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    paths = {}
    for name, fn, args in (("sample", sample_fn, (key, jnp.float32(1.0))),
                           ("elbo", elbo_fn, (key, x_spec))):
        exp = jexport.export(jax.jit(fn), **kwargs)(*args)
        path = os.path.join(out_dir, f"{name}.jaxexp")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        paths[name] = path
    return paths


def load_exported(path: str):
    """Deserialize a ``.jaxexp`` artifact into a callable (jittable,
    shape-checked against the exported signature). Needs only jax — no
    iaf_tpu model code."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read()).call
