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
sparse-table gradients flow back to the owning shard automatically — but the
production trainer (training/sharded_sparse_trainer.py) keeps the backward
EXPLICIT instead: it treats the looked-up rows as a differentiable input,
routes the resulting row gradients to their owner shards with
``all_to_all_rowgrad`` below, and applies row-sparse optimizer updates on the
owning shard. That preserves lazy-sparse update semantics (only touched rows
move through HBM) which autodiff through the lookup would destroy (its
transpose materializes a dense [V/m, E] gradient).

Static-shape discipline: the all_to_all path uses a fixed per-destination
capacity (= local batch size) so nothing is data-dependent — padding slots
carry a sentinel id routed out of range and masked/dropped downstream.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple


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


class _Routing(NamedTuple):
    """Owner-bucketed routing plan for a flat id vector (static shapes).

    ``send_slot[i] = (owner_i, pos_i)``: the position of original id ``i`` in
    the [m, b] send matrix; ``order``/``inverse`` are the stable owner sort.
    """

    owner: jnp.ndarray          # [b] owner shard per original id
    order: jnp.ndarray          # [b] stable sort by owner
    inverse: jnp.ndarray        # [b] inverse permutation
    sorted_owner: jnp.ndarray   # [b]
    pos_in_bucket: jnp.ndarray  # [b] position within the owner's bucket


def _route_by_owner(ids: jnp.ndarray, rows_per_shard: int, m: int) -> _Routing:
    (b,) = ids.shape
    owner = jnp.clip(ids // rows_per_shard, 0, m - 1)  # [b]
    order = jnp.argsort(owner, stable=True)
    sorted_owner = owner[order]
    one_hot = sorted_owner[:, None] == jnp.arange(m)[None, :]  # [b, m]
    pos_in_bucket = jnp.cumsum(one_hot, axis=0)[jnp.arange(b), sorted_owner] - 1
    inverse = jnp.argsort(order, stable=True)
    return _Routing(owner=owner, order=order, inverse=inverse,
                    sorted_owner=sorted_owner, pos_in_bucket=pos_in_bucket)


def all_to_all_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                      axis_name: str = MODEL_AXIS) -> jnp.ndarray:
    """Per-shard body: route ids to owners, gather, route vectors back.

    ``ids`` must be 1-D here ([B_local]); callers flatten/unflatten.
    """
    m = jax.lax.axis_size(axis_name)
    rows = table_shard.shape[0]
    (b,) = ids.shape
    r = _route_by_owner(ids, rows, m)
    sorted_ids = ids[r.order]

    # send matrix [m, b]: bucket d holds the ids owned by shard d (padded 0)
    send = jnp.zeros((m, b), dtype=ids.dtype)
    send = send.at[r.sorted_owner, r.pos_in_bucket].set(sorted_ids)

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
    sorted_vectors = back[r.sorted_owner, r.pos_in_bucket]  # [B, E]
    return sorted_vectors[r.inverse]


def _exchange_rowgrads(my_ids: jnp.ndarray, my_grads: jnp.ndarray,
                       rows_per_shard: int, axis_name) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Route this shard's (ids, grads) chunk to owner shards over
    ``axis_name`` (a name or tuple of names — tuples route over the
    flattened grid). Padding/buckets carry the out-of-range sentinel
    ``n_shards * rows_per_shard`` so scatters drop them."""
    n_shards = jax.lax.axis_size(axis_name)
    k = my_ids.shape[0]
    sentinel = jnp.asarray(n_shards * rows_per_shard, my_ids.dtype)
    r = _route_by_owner(my_ids, rows_per_shard, n_shards)
    sorted_ids = my_ids[r.order]
    sorted_grads = my_grads[r.order]

    send_ids = jnp.full((n_shards, k), sentinel, dtype=my_ids.dtype)
    send_ids = send_ids.at[r.sorted_owner, r.pos_in_bucket].set(sorted_ids)
    send_grads = jnp.zeros((n_shards, k, my_grads.shape[-1]), my_grads.dtype)
    send_grads = send_grads.at[r.sorted_owner, r.pos_in_bucket].set(sorted_grads)

    recv_ids = jax.lax.all_to_all(send_ids, axis_name, split_axis=0,
                                  concat_axis=0, tiled=False)
    recv_grads = jax.lax.all_to_all(send_grads, axis_name, split_axis=0,
                                    concat_axis=0, tiled=False)
    return recv_ids.reshape(n_shards * k), recv_grads.reshape(n_shards * k, -1)


def all_to_all_rowgrad(ids: jnp.ndarray, row_grads: jnp.ndarray,
                       rows_per_shard: int,
                       axis_name: str = MODEL_AXIS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Route per-occurrence row gradients to their owner shards.

    Per-shard body (inside shard_map). ``ids [n]`` / ``row_grads [n, E]`` are
    the local batch's occurrence list, REPLICATED over the model axis (every
    model shard computed the same forward on the same data slice). Each shard
    routes only its 1/m chunk so every occurrence crosses the interconnect
    exactly once — naive routing would deliver m duplicate copies per owner
    (and m× the traffic).

    Returns ``(recv_ids [n_p], recv_grads [n_p, E])`` (``n_p`` = n rounded up
    to a multiple of m) where every received id is owned by this shard —
    except padding slots, which carry the OUT-OF-RANGE sentinel
    ``m * rows_per_shard`` (and zero grads) so downstream scatter updates
    drop them (``mode='drop'``) instead of aliasing a real row (the bug class
    fixed in the quantized trainer).
    """
    m = jax.lax.axis_size(axis_name)
    (n,) = ids.shape
    sentinel = jnp.asarray(m * rows_per_shard, ids.dtype)
    pad = (-n) % m
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), sentinel, ids.dtype)])
        row_grads = jnp.concatenate(
            [row_grads, jnp.zeros((pad, row_grads.shape[-1]), row_grads.dtype)]
        )
    k = ids.shape[0] // m  # this shard's chunk size
    shard_index = jax.lax.axis_index(axis_name)
    my_ids = jax.lax.dynamic_slice_in_dim(ids, shard_index * k, k)
    my_grads = jax.lax.dynamic_slice_in_dim(row_grads, shard_index * k, k)
    # sentinel padding ids clip to owner m-1 and stay sentinel on arrival —
    # dropped downstream like the bucket padding
    return _exchange_rowgrads(my_ids, my_grads, rows_per_shard, axis_name)


# ---------------------------------------------------------------------------
# 2-D (data x model grid) sparse parallelism — FUTURE #1 / arXiv 2508.03854
# ---------------------------------------------------------------------------
#
# Tables are row-sharded over the FLATTENED (data, model) grid: every row has
# exactly ONE owner device among all d*m. Compared to 1-D model-axis sharding
# (where each row is replicated d times across the data axis):
#   * per-device table + moment HBM drops d-fold;
#   * the backward needs NO data-axis all_gather of row grads and no
#     replicated-update discipline — each owner applies its rows once;
#   * the exchange rides the full grid's links instead of m-1 of them.
# The price is a longer routing axis (d*m buckets of worst-case capacity).


def grid_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                axes: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS)) -> jnp.ndarray:
    """Per-device body: grid-sharded table lookup.

    ``table_shard``: [V/(d*m), E] — this device's rows of the grid layout.
    ``ids``: [b] local batch ids (data-sharded, REPLICATED over the model
    axis — the model-parallel replicas of one data shard hold the same ids).
    Returns [b, E] vectors, replicated over the model axis again.

    Each model replica routes only its 1/m chunk over the combined axis (so
    every id crosses the interconnect once), then the chunks are
    re-assembled with a model-axis all_gather.
    """
    model_axis = axes[-1]
    m = jax.lax.axis_size(model_axis)
    (b,) = ids.shape
    pad = (-b) % m
    if pad:
        # out-of-range ids clip to the last shard and get dropped on return
        ids = jnp.concatenate(
            [ids, jnp.zeros((pad,), ids.dtype)]
        )
    k = ids.shape[0] // m
    mi = jax.lax.axis_index(model_axis)
    my_ids = jax.lax.dynamic_slice_in_dim(ids, mi * k, k)
    vectors = all_to_all_lookup(table_shard, my_ids, axes)  # [k, E]
    full = jax.lax.all_gather(vectors, model_axis, tiled=True)  # [b+pad, E]
    return full[:b]


def grid_rowgrad(ids: jnp.ndarray, row_grads: jnp.ndarray,
                 rows_per_shard: int,
                 axes: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Route per-occurrence row grads to their unique grid owner.

    ``ids [n]`` / ``row_grads [n, E]`` are this data shard's occurrence
    list, replicated over the model axis; each model replica routes its
    1/m chunk over the COMBINED axis. Returns ``(recv_ids, recv_grads)``
    ([d*m*ceil(n/m)] worst-case capacity) where every non-sentinel id is
    owned by this device — apply the sparse update locally, no data-axis
    gather needed.
    """
    model_axis = axes[-1]
    m = jax.lax.axis_size(model_axis)
    dm = jax.lax.axis_size(axes)
    (n,) = ids.shape
    sentinel = jnp.asarray(dm * rows_per_shard, ids.dtype)
    pad = (-n) % m
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), sentinel, ids.dtype)])
        row_grads = jnp.concatenate(
            [row_grads, jnp.zeros((pad, row_grads.shape[-1]), row_grads.dtype)]
        )
    k = ids.shape[0] // m
    mi = jax.lax.axis_index(model_axis)
    my_ids = jax.lax.dynamic_slice_in_dim(ids, mi * k, k)
    my_grads = jax.lax.dynamic_slice_in_dim(row_grads, mi * k, k)
    return _exchange_rowgrads(my_ids, my_grads, rows_per_shard, axes)


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
