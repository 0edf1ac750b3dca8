"""Sharded importance-weighted evaluation over collectives.

The reference evaluates the k-sample IW bound on one device by multiplying
the batch by k (``tf_train.py evaluate()`` + ``compute_lowerbound``,
SURVEY.md §3.2). Here the k axis — the actually-long axis in this workload
(k = 4096, SURVEY.md §5.7) — is sharded across the mesh's ``data`` axis via
``shard_map``: every device draws its own k/N importance samples for the
full (replicated) eval batch, and the per-example bound is combined with a
numerically-stable *distributed* logsumexp (``pmax`` of the local maxima,
local sum-exp, ``psum``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iaf_tpu.core.config import Config
from iaf_tpu.models import get_model
from iaf_tpu.parallel.mesh import DATA_AXIS


def distributed_iw_bound(log_w_local: jax.Array, k_total: int,
                         axis_name: str = DATA_AXIS) -> jax.Array:
    """Per-example negative IW bound from shard-local log weights.

    ``log_w_local``: [B, k_local] on each mesh shard (different samples per
    shard). Returns [B]: -(logsumexp over all k_total samples - log k_total),
    computed as pmax -> local sumexp -> psum -> log (SURVEY.md §2.4 "sharded
    evaluation" row).
    """
    local_max = jnp.max(log_w_local, axis=1)                      # [B]
    global_max = jax.lax.pmax(local_max, axis_name)               # [B]
    local_sum = jnp.sum(
        jnp.exp(log_w_local - global_max[:, None]), axis=1)       # [B]
    global_sum = jax.lax.psum(local_sum, axis_name)               # [B]
    return -(jnp.log(global_sum) + global_max - math.log(float(k_total)))


def make_eval_step(cfg: Config, mesh: Mesh, k: int | None = None):
    """Compile the sharded IW eval step.

    Returns f(params, rng, batch) -> per-example negative IW bound in nats
    [B]. ``batch`` is replicated (every shard sees all B examples and
    contributes k/N importance samples).
    """
    k = cfg.eval_k if k is None else k
    n_shards = mesh.shape[DATA_AXIS]
    assert k % n_shards == 0, (k, n_shards)
    k_local = k // n_shards

    def local_eval(params, rng, batch):
        # distinct importance samples per shard
        shard = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(rng, shard)
        out = get_model(cfg).apply_fn(cfg, params, rng, batch, mode="eval", k=k_local)
        log_w = out.log_w.reshape(-1, k_local)                    # [B, k_local]
        return distributed_iw_bound(log_w, k)

    shmapped = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(shmapped)


def make_batch_sharded_elbo(cfg: Config, mesh: Mesh, k: int = 1):
    """Plain batch-data-parallel eval (k small, batch sharded): used for
    fast train-set monitoring. Returns f(params, rng, batch) -> [B] nats."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    def step(params, rng, batch):
        out = get_model(cfg).apply_fn(cfg, params, rng, batch, mode="eval", k=k)
        return out.elbo_nats

    return jax.jit(step, in_shardings=(repl, repl, data), out_shardings=data)
