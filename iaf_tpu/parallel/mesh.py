"""Device mesh construction and the activation-sharding context.

Reference: the only parallelism in ``openai/iaf`` is single-host in-graph
multi-GPU data parallelism (``tf_train.py`` tower loop, SURVEY.md §2.4).
TPU-native replacement: one global ``jax.sharding.Mesh`` over all chips with
a ``data`` axis (gradient allreduce rides ICI/DCN via XLA collectives) and a
reserved ``model`` axis for tensor-sharded activations/params (off by
default; cheap future-proofing per SURVEY.md §2.4).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iaf_tpu.core.config import Config

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: Config, devices: Sequence[jax.Device] | None = None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    model = max(1, cfg.mesh_model)
    data = cfg.mesh_data or (len(devices) // model)
    assert data * model <= len(devices), (data, model, len(devices))
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


# ---------------------------------------------------------------------------
# Activation-sharding context: lets the pure model apply
# with_sharding_constraint without depending on a mesh object.
# ---------------------------------------------------------------------------

_ACTIVE_MESH: contextvars.ContextVar[Mesh | None] = contextvars.ContextVar(
    "iaf_tpu_active_mesh", default=None)


@contextlib.contextmanager
def activation_sharding(mesh: Mesh):
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.reset(token)


def constrain(x: jax.Array, spec: Sequence[str | None]) -> jax.Array:
    """Apply a sharding constraint if an activation mesh is active and the
    referenced axes have size > 1; otherwise a no-op (keeps the model pure
    and CPU-testable)."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None:
        return x
    used = [a for a in spec if a is not None]
    if all(mesh.shape.get(a, 1) == 1 for a in used):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
