"""Sharded embedding engine: row-sharded tables with explicit exchange.

The build-side equivalent of every ``torch.nn.Embedding`` in the reference zoo
(SURVEY §2.10 item 1): tables split by row over the mesh ``model`` axis, with
two exchange strategies usable inside ``shard_map``:

* ``masked_psum_lookup`` — every model-shard gathers the ids it owns (masked)
  and the partial vectors are ``psum``'d over the model axis. Moves
  ``B x E`` per link via the reduction; the standard choice for small/medium
  model axes (Megatron-style vocab-parallel embedding).
* ``all_to_all_lookup`` — ids are routed to their owner shard via
  ``all_to_all``, owners gather locally, vectors return via the reverse
  ``all_to_all``. Moves ``B x E / m`` per hop; wins for large model axes /
  giant tables (the BASELINE.json "all-to-all exchange" configuration).

Both are pure and differentiable (psum/all_to_all transpose correctly), so
sparse-table gradients flow back to the owning shard automatically.

Static-shape discipline: the all_to_all path uses a fixed per-destination
capacity (= local batch size) so nothing is data-dependent — padding slots
carry id 0 and are masked out of the return scatter.
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from pytorchrec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def masked_psum_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                       axis_name: str = MODEL_AXIS) -> jnp.ndarray:
    """Per-shard body: gather owned rows, zero others, psum over the axis.

    ``table_shard``: [V/m, E] (this shard's rows, contiguous row range).
    ``ids``: [...] global row ids (replicated along the model axis).
    Returns [..., E] full vectors (replicated along the model axis).
    """
    shard_index = jax.lax.axis_index(axis_name)
    rows = table_shard.shape[0]
    offset = shard_index * rows
    local = ids - offset
    in_range = (local >= 0) & (local < rows)
    safe = jnp.clip(local, 0, rows - 1)
    vectors = jnp.where(in_range[..., None], table_shard[safe], 0.0)
    return jax.lax.psum(vectors, axis_name)


def all_to_all_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                      axis_name: str = MODEL_AXIS) -> jnp.ndarray:
    """Per-shard body: route ids to owners, gather, route vectors back.

    ``ids`` must be 1-D here ([B_local]); callers flatten/unflatten.
    """
    m = jax.lax.axis_size(axis_name)
    rows = table_shard.shape[0]
    (b,) = ids.shape

    owner = jnp.clip(ids // rows, 0, m - 1)  # [B]
    # stable bucket order: sort ids by owner; fixed capacity b per bucket
    order = jnp.argsort(owner, stable=True)
    sorted_ids = ids[order]
    sorted_owner = owner[order]
    # position of each id within its owner bucket
    one_hot = sorted_owner[:, None] == jnp.arange(m)[None, :]  # [B, m]
    pos_in_bucket = jnp.cumsum(one_hot, axis=0)[jnp.arange(b), sorted_owner] - 1
    counts = jnp.sum(one_hot, axis=0)  # [m]

    # send matrix [m, b]: bucket d holds the ids owned by shard d (padded 0)
    send = jnp.zeros((m, b), dtype=ids.dtype)
    send = send.at[sorted_owner, pos_in_bucket].set(sorted_ids)

    # exchange: receive the ids every shard wants from *us*
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)  # [m, b]
    shard_index = jax.lax.axis_index(axis_name)
    local = jnp.clip(recv - shard_index * rows, 0, rows - 1)
    gathered = table_shard[local]  # [m, b, E]

    # send vectors back along the reverse route
    back = jax.lax.all_to_all(gathered, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)  # [m, b, E]
    # unscatter: row i of the original order lives at [owner_i, pos_i]
    sorted_vectors = back[sorted_owner, pos_in_bucket]  # [B, E]
    inverse = jnp.argsort(order, stable=True)
    return sorted_vectors[inverse]


def make_sharded_lookup(mesh: Mesh, strategy: str = "psum"):
    """Build a jitted full-array lookup: (table [V,E] row-sharded, ids [B]
    data-sharded) -> vectors [B,E] data-sharded.

    The shard_map wiring handles the (data, model) grid: ids are replicated
    along model, tables along data.
    """
    body = masked_psum_lookup if strategy == "psum" else all_to_all_lookup

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(PartitionSpec(MODEL_AXIS, None), PartitionSpec(DATA_AXIS)),
        out_specs=PartitionSpec(DATA_AXIS, None),
        # the result is value-replicated along 'model' (psum reduces over it;
        # all_to_all round-trips symmetrically) but the replication is not
        # statically inferable for the all_to_all route
        check_vma=False,
    )
    def lookup(table_shard, ids_local):
        return body(table_shard, ids_local, MODEL_AXIS)

    return jax.jit(lookup)
