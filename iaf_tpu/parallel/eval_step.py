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

    The shard-local k is STREAMED in chunks of ``cfg.eval_k_chunk`` with an
    online (running max / rescaled sum-exp) logsumexp inside ``lax.scan``:
    k=4096 would otherwise put B*4096 model replicas in HBM at once. The
    cross-shard combine stays pmax -> psum on the (max, sumexp) pair.
    """
    k = cfg.eval_k if k is None else k
    n_shards = mesh.shape[DATA_AXIS]
    assert k % n_shards == 0, (k, n_shards)
    k_local = k // n_shards
    k_chunk = min(k_local, max(1, cfg.eval_k_chunk))
    while k_local % k_chunk:  # round down to a divisor of the local k
        k_chunk -= 1
    n_chunks = k_local // k_chunk

    def local_eval(params, rng, batch):
        # distinct importance samples per shard (and per chunk, below)
        shard = jax.lax.axis_index(DATA_AXIS)
        rng_shard = jax.random.fold_in(rng, shard)
        batch_n = batch.shape[0]

        def body(carry, i):
            m_run, s_run = carry                              # [B], [B]
            out = get_model(cfg).apply_fn(
                cfg, params, jax.random.fold_in(rng_shard, i), batch,
                mode="eval", k=k_chunk)
            log_w = out.log_w.reshape(batch_n, k_chunk)       # [B, k_chunk]
            m_new = jnp.maximum(m_run, jnp.max(log_w, axis=1))
            s_run = (s_run * jnp.exp(m_run - m_new)
                     + jnp.sum(jnp.exp(log_w - m_new[:, None]), axis=1))
            return (m_new, s_run), None

        init = (jnp.full((batch_n,), -jnp.inf, jnp.float32),
                jnp.zeros((batch_n,), jnp.float32))
        (m_loc, s_loc), _ = jax.lax.scan(
            body, init, jnp.arange(n_chunks, dtype=jnp.int32))

        # distributed combine of the (max, sumexp) pairs
        m_glob = jax.lax.pmax(m_loc, DATA_AXIS)
        s_glob = jax.lax.psum(s_loc * jnp.exp(m_loc - m_glob), DATA_AXIS)
        return -(jnp.log(s_glob) + m_glob - math.log(float(k)))

    shmapped = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(shmapped)


def make_batch_sharded_elbo(cfg: Config, mesh: Mesh, k: int = 1):
    """Plain batch-data-parallel eval (k small, batch sharded): the driver's
    eval path when k does not divide the mesh's data axis — in practice the
    k=1 plain-ELBO monitoring mode (``train_lib.make_eval_setup`` picks it;
    the k-sharded path requires k % n_shards == 0). Returns
    f(params, rng, batch) -> [B] nats."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    def step(params, rng, batch):
        out = get_model(cfg).apply_fn(cfg, params, rng, batch, mode="eval", k=k)
        return out.elbo_nats

    return jax.jit(step, in_shardings=(repl, repl, data), out_shardings=data)
