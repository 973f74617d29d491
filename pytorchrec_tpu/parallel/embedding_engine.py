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

Capacity factors (FUTURE #1's remaining lead): the worst-case send matrix
``[m, b]`` pads every bucket to the FULL id count, so exchange bytes are
``m x`` the useful payload. Passing ``capacity=c`` (sized by
``bucket_capacity``; c ~= 2·b/m for hashed/uniform id streams) shrinks the
buckets to ``[m, c]`` — an ``m/2 x`` traffic cut — while staying EXACT:

* lookup — ids that overflow their bucket are resolved by a second,
  worst-case-capacity exchange round guarded by ``lax.cond`` on a psum'd
  overflow flag (every shard in the axis group agrees, so the collective
  branch is taken by all or none; with a 2x factor on hashed streams the
  Chernoff tail makes it fire ~never);
* rowgrad — overflowed (id, grad) entries ride a same-guarded
  ``all_gather`` appendix that owners filter locally; the appendix slots
  are sentinel-padded so downstream dedup/scatter drops them.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple


import jax
import jax.numpy as jnp
import numpy as np
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
    owner = jnp.clip(ids // rows_per_shard, 0, m - 1)  # [b]
    return _route_owners(owner, m)


def _route_owners(owner: jnp.ndarray, m: int) -> _Routing:
    """Routing plan from a precomputed per-entry destination vector [b]."""
    (b,) = owner.shape
    order = jnp.argsort(owner, stable=True)
    sorted_owner = owner[order]
    one_hot = sorted_owner[:, None] == jnp.arange(m)[None, :]  # [b, m]
    pos_in_bucket = jnp.cumsum(one_hot, axis=0)[jnp.arange(b), sorted_owner] - 1
    inverse = jnp.argsort(order, stable=True)
    return _Routing(owner=owner, order=order, inverse=inverse,
                    sorted_owner=sorted_owner, pos_in_bucket=pos_in_bucket)


def bucket_capacity(n: int, n_shards: int, factor: float = 2.0) -> int:
    """Per-destination bucket capacity for ``n`` ids over ``n_shards``.

    ``factor`` multiplies the uniform expectation ``n / n_shards``; 2.0 puts
    hashed/uniform streams past the Chernoff tail (P[bucket > 2u] <= 0.68^u).
    Skewed (Zipfian) streams should shed their head via the hot/cold layout
    first — the capacity path is for the quasi-uniform tail."""
    return max(1, min(n, int(np.ceil(n / n_shards * factor))))


def _resolve_capacity(capacity, n: int, n_shards: int) -> Optional[int]:
    """``capacity`` as int = absolute bucket size; float = factor over the
    uniform expectation ``n / n_shards`` (via ``bucket_capacity``)."""
    if capacity is None:
        return None
    if isinstance(capacity, float):
        return bucket_capacity(n, n_shards, capacity)
    return int(capacity)


def all_to_all_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                      axis_name: str = MODEL_AXIS,
                      capacity: Optional[int] = None,
                      out_cols: Optional[int] = None,
                      valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-shard body: route ids to owners, gather, route vectors back.

    ``ids`` must be 1-D here ([B_local]); callers flatten/unflatten.
    ``capacity``: per-destination bucket size — int = absolute, float =
    factor over the uniform expectation ``b/m`` (default None = worst case
    ``b``). With a bounded capacity the result is still exact — overflowed
    ids are resolved by a psum fallback round taken only on steps where any
    shard in the axis group overflowed (see module docstring).

    ``out_cols``: return only the first ``out_cols`` columns of each row.
    For PACKED [V/m, W] table||moments||staging leaves
    (ops/sparse_update.py::pack_table) the owner gathers the full fast-width
    row (W >= 64 is the vectorized-emitter regime — a narrow [n, E] gather
    would be ~100 ns/row SLOWER) and slices to the embedding columns before
    the return exchange, so ICI traffic stays at E, not W.

    ``valid``: optional [b] bool mask — False slots route to a VIRTUAL
    bucket (occupying no real bucket slot, shipping no bytes, never counting
    as overflow) and return zero vectors. This is what lets
    ``two_hop_lookup`` dedup duplicate requests between hops: duplicates are
    marked invalid and re-expanded locally from their segment's survivor.
    """
    m = jax.lax.axis_size(axis_name)
    rows = table_shard.shape[0]
    (b,) = ids.shape
    capacity = _resolve_capacity(capacity, b, m)
    c = b if capacity is None else min(capacity, b)
    if valid is None:
        r = _route_by_owner(ids, rows, m)
        slot_ok = jnp.ones((b,), bool)
    else:
        owner = jnp.clip(ids // rows, 0, m - 1)
        owner = jnp.where(valid, owner, m)  # virtual bucket, dropped
        r = _route_owners(owner, m + 1)
        slot_ok = r.sorted_owner < m
    sorted_ids = ids[r.order]
    fits = (r.pos_in_bucket < c) & slot_ok
    pos = jnp.where(fits, r.pos_in_bucket, c)  # overflow/invalid -> dropped

    # send matrix [m, c]: bucket d holds the ids owned by shard d (padded 0)
    send = jnp.zeros((m, c), dtype=ids.dtype)
    send = send.at[r.sorted_owner, pos].set(
        jnp.where(fits, sorted_ids, 0), mode="drop")

    # exchange: receive the ids every shard wants from *us*
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)  # [m, c]
    shard_index = jax.lax.axis_index(axis_name)
    local = jnp.clip(recv - shard_index * rows, 0, rows - 1)
    gathered = table_shard[local]  # [m, c, E or W]
    if out_cols is not None:
        gathered = gathered[..., :out_cols]

    # send vectors back along the reverse route
    back = jax.lax.all_to_all(gathered, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)  # [m, c, E]
    # unscatter: row i of the original order lives at [owner_i, pos_i]
    sorted_vectors = back[jnp.minimum(r.sorted_owner, m - 1),
                          jnp.minimum(pos, c - 1)]  # [b, E]
    if valid is not None:
        # dtype-safe zero: quantized tables route uint8 byte rows through
        # this path, and a python 0.0 would silently promote them to f32
        sorted_vectors = jnp.where(slot_ok[:, None], sorted_vectors,
                                   jnp.zeros((), sorted_vectors.dtype))
    vectors = sorted_vectors[r.inverse]
    if capacity is None or c == b:
        return vectors

    # exact overflow fallback: one worst-case-capacity round, taken by the
    # whole axis group or not at all (the flag is psum'd, so it agrees
    # everywhere). A full a2a round — NOT masked_psum_lookup — because the
    # fallback must not assume ids are replicated across the group (they are
    # per-data-shard in the grid layout).
    need = ((~fits) & slot_ok)[r.inverse]
    any_over = jax.lax.psum(jnp.sum(need.astype(jnp.int32)), axis_name) > 0

    def fallback(_):
        return all_to_all_lookup(table_shard, ids, axis_name, capacity=None,
                                 out_cols=out_cols, valid=valid)

    over = jax.lax.cond(any_over, fallback,
                        lambda _: jnp.zeros_like(vectors), None)
    return jnp.where(need[:, None], over, vectors)


def _exchange_rowgrads(my_ids: jnp.ndarray, my_grads: jnp.ndarray,
                       rows_per_shard: int, axis_name,
                       capacity: Optional[int] = None,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Route this shard's (ids, grads) chunk to owner shards over
    ``axis_name`` (a name or tuple of names — tuples route over the
    flattened grid). Padding/buckets carry the out-of-range sentinel
    ``n_shards * rows_per_shard`` so scatters drop them.

    ``capacity``: per-destination bucket size (default = worst case ``k``).
    Bounded capacity stays exact: overflowed entries ride an all_gather
    appendix (guarded by a psum'd flag, so the whole group takes it or no
    one does) that owners filter locally; appendix slots for entries owned
    elsewhere carry the sentinel. The returned length grows from
    ``n_shards*c`` to ``n_shards*c + n_shards*k`` when capacity is set."""
    n_shards = jax.lax.axis_size(axis_name)
    k = my_ids.shape[0]
    capacity = _resolve_capacity(capacity, k, n_shards)
    c = k if capacity is None else min(capacity, k)
    sentinel = jnp.asarray(n_shards * rows_per_shard, my_ids.dtype)
    # sentinel entries route to a VIRTUAL bucket (owner n_shards, dropped by
    # the OOB scatter) so they neither consume real bucket positions nor
    # count as overflow: callers like two_hop_rowgrad pass vectors where
    # most slots are sentinel padding, which would otherwise flood the last
    # destination's bucket
    owner = jnp.clip(my_ids // rows_per_shard, 0, n_shards - 1)
    owner = jnp.where(my_ids < sentinel, owner, n_shards)
    r = _route_owners(owner, n_shards + 1)
    sorted_ids = my_ids[r.order]
    sorted_grads = my_grads[r.order]
    valid = r.sorted_owner < n_shards
    fits = (r.pos_in_bucket < c) & valid
    pos = jnp.where(fits, r.pos_in_bucket, c)  # overflow/sentinel -> dropped

    send_ids = jnp.full((n_shards, c), sentinel, dtype=my_ids.dtype)
    send_ids = send_ids.at[r.sorted_owner, pos].set(
        jnp.where(fits, sorted_ids, sentinel), mode="drop")
    zero = jnp.zeros((), my_grads.dtype)  # dtype-safe (u8 qgrad payloads)
    send_grads = jnp.zeros((n_shards, c, my_grads.shape[-1]), my_grads.dtype)
    send_grads = send_grads.at[r.sorted_owner, pos].set(
        jnp.where(fits[:, None], sorted_grads, zero), mode="drop")

    recv_ids = jax.lax.all_to_all(send_ids, axis_name, split_axis=0,
                                  concat_axis=0, tiled=False)
    recv_grads = jax.lax.all_to_all(send_grads, axis_name, split_axis=0,
                                    concat_axis=0, tiled=False)
    out_ids = recv_ids.reshape(n_shards * c)
    out_grads = recv_grads.reshape(n_shards * c, -1)
    if capacity is None or c == k:
        return out_ids, out_grads

    # exact overflow appendix (rare; see bucket_capacity) — sentinel
    # entries are not overflow, they are dropped by design
    any_over = jax.lax.psum(
        jnp.sum(((~fits) & valid).astype(jnp.int32)), axis_name) > 0
    ov_ids = jnp.where(fits, sentinel, sorted_ids)
    ov_grads = jnp.where(fits[:, None], zero, sorted_grads)
    me = jax.lax.axis_index(axis_name)

    def gathered(_):
        gi = jax.lax.all_gather(ov_ids, axis_name, tiled=True)
        gg = jax.lax.all_gather(ov_grads, axis_name, tiled=True)
        mine = (jnp.clip(gi // rows_per_shard, 0, n_shards - 1) == me) & (
            gi < sentinel)
        return (jnp.where(mine, gi, sentinel),
                jnp.where(mine[:, None], gg, zero))

    def empty(_):
        return (jnp.full((n_shards * k,), sentinel, my_ids.dtype),
                jnp.zeros((n_shards * k, my_grads.shape[-1]), my_grads.dtype))

    app_ids, app_grads = jax.lax.cond(any_over, gathered, empty, None)
    return (jnp.concatenate([out_ids, app_ids]),
            jnp.concatenate([out_grads, app_grads]))


def all_to_all_rowgrad(ids: jnp.ndarray, row_grads: jnp.ndarray,
                       rows_per_shard: int,
                       axis_name: str = MODEL_AXIS,
                       capacity: Optional[int] = None,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
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
    return _exchange_rowgrads(my_ids, my_grads, rows_per_shard, axis_name,
                              capacity=capacity)


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
                axes: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
                capacity: Optional[int] = None,
                out_cols: Optional[int] = None) -> jnp.ndarray:
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
    vectors = all_to_all_lookup(table_shard, my_ids, axes,
                                capacity=capacity, out_cols=out_cols)  # [k, E]
    full = jax.lax.all_gather(vectors, model_axis, tiled=True)  # [b+pad, E]
    return full[:b]


def grid_rowgrad(ids: jnp.ndarray, row_grads: jnp.ndarray,
                 rows_per_shard: int,
                 axes: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
                 capacity: Optional[int] = None,
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
    return _exchange_rowgrads(my_ids, my_grads, rows_per_shard, axes,
                              capacity=capacity)


def two_hop_rowgrad(ids: jnp.ndarray, row_grads: jnp.ndarray,
                    rows_per_shard: int,
                    axes: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
                    capacity2: Optional[int] = None,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hierarchical 2-hop row-grad exchange for the (data x model) grid
    layout — FUTURE #1's remaining lead.

    Same contract as ``grid_rowgrad`` (this data shard's occurrence list in,
    sentinel-padded owner-local (ids, grads) out), but routed in two hops
    matched to the pod's physical hierarchy, where the ``model`` axis rides
    fast intra-host ICI and the ``data`` axis rides slow inter-host DCN:

    1. **fast hop (ICI)**: each entry goes to the local device whose fast
       coordinate equals the final owner's (``owner % m``) — an all_to_all
       that never leaves the host group;
    2. **combine**: the hop-1 landing zone now holds every occurrence of an
       id this fast lane will forward, from the WHOLE fast group — duplicate
       ids are segment-summed here, BEFORE the expensive hop (one summed
       grad row crosses DCN instead of one per occurrence);
    3. **slow hop (DCN)**: an all_to_all over the data axis routes the
       combined entries to the owner's group; arrival lane is preserved, so
       every non-sentinel entry lands exactly on its owner device.

    vs the flat ``grid_rowgrad`` all_to_all over ``d*m`` devices: DCN
    messages shrink from ``(d-1)*m`` per device to ``d-1`` (m-fold
    aggregation — DCN is latency-dominated at rec-model message sizes), and
    intra-group duplicate ids (hot fields, small vocabs, Zipf tails that
    escape the hot/cold fragment) cross DCN once instead of once per
    occurrence. ``scripts/two_hop_traffic.py`` quantifies both effects.

    ``capacity2``: per-destination bucket size for the slow hop (int =
    absolute, float = factor over the uniform expectation of REAL entries
    per slow-hop bucket, ``k/d`` — see below); stays EXACT via the same
    psum-guarded all_gather appendix as ``_exchange_rowgrads``. The fast
    hop uses the worst-case bucket (= the chunk size k), which costs
    nothing across DCN.

    Float-capacity resolution (ADVICE r2): the hop-2 vector is ``m*k``
    SLOTS long but carries only ~``k`` real entries — each lane lands m
    buckets whose expected fill is ``k/m`` (the rest is sentinel padding
    that routes to the virtual bucket and occupies no real slot). A float
    factor must therefore resolve against ``k/d`` per destination, not the
    ``m*k/d`` the inner exchange would compute from its input length —
    that would over-provision (and ship across DCN) ``m``-fold.
    """
    slow_axis, fast_axis = axes
    m = jax.lax.axis_size(fast_axis)
    d = jax.lax.axis_size(slow_axis)
    (n,) = ids.shape
    sentinel = jnp.asarray(d * m * rows_per_shard, ids.dtype)
    pad = (-n) % m
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), sentinel, ids.dtype)])
        row_grads = jnp.concatenate(
            [row_grads, jnp.zeros((pad, row_grads.shape[-1]), row_grads.dtype)]
        )
    k = ids.shape[0] // m
    mi = jax.lax.axis_index(fast_axis)
    my_ids = jax.lax.dynamic_slice_in_dim(ids, mi * k, k)
    my_grads = jax.lax.dynamic_slice_in_dim(row_grads, mi * k, k)

    # hop 1 (fast axis): bucket by the final owner's fast coordinate.
    # Worst-case capacity k => exact by construction (a bucket can at most
    # hold the whole chunk).
    owner = jnp.clip(my_ids // rows_per_shard, 0, d * m - 1)
    lane = owner % m
    r = _route_owners(lane, m)
    send_ids = jnp.full((m, k), sentinel, dtype=my_ids.dtype)
    send_ids = send_ids.at[r.sorted_owner, r.pos_in_bucket].set(
        my_ids[r.order], mode="drop")
    send_grads = jnp.zeros((m, k, my_grads.shape[-1]), my_grads.dtype)
    send_grads = send_grads.at[r.sorted_owner, r.pos_in_bucket].set(
        my_grads[r.order], mode="drop")
    recv_ids = jax.lax.all_to_all(send_ids, fast_axis, split_axis=0,
                                  concat_axis=0, tiled=False)
    recv_grads = jax.lax.all_to_all(send_grads, fast_axis, split_axis=0,
                                    concat_axis=0, tiled=False)
    ids1 = recv_ids.reshape(m * k)
    grads1 = recv_grads.reshape(m * k, -1)

    # combine duplicates before crossing the slow axis: sort by id,
    # segment-sum the grads, keep each segment's total at its LAST slot,
    # sentinel out the rest (sentinel padding sorts to the end and its
    # zero-grad sum lands on a sentinel slot — dropped downstream)
    from pytorchrec_tpu.ops.sparse_update import segmented_sum_scan

    sorted_ids1, order1 = jax.lax.sort(
        (ids1, jnp.arange(m * k, dtype=jnp.int32)), num_keys=1)
    g_sorted = grads1[order1]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids1[1:] != sorted_ids1[:-1]])
    is_last = jnp.concatenate(
        [sorted_ids1[1:] != sorted_ids1[:-1], jnp.ones((1,), bool)])
    g_total = segmented_sum_scan(g_sorted, is_start)
    keep = is_last & (sorted_ids1 < sentinel)
    ids2 = jnp.where(keep, sorted_ids1, sentinel)
    grads2 = jnp.where(keep[:, None], g_total, 0.0)

    # hop 2 (slow axis): group-granular routing — the owner's group owns the
    # contiguous row range [g*m*rps, (g+1)*m*rps), so the 1-D exchange with
    # rows_per_shard*m routes by group; arrival lane == mi by hop-1
    # invariant, so arrivals are owned by THIS device exactly.
    if isinstance(capacity2, float):
        # resolve against the real-entry expectation k/d (docstring above),
        # NOT the m*k slot count the inner resolver would use
        capacity2 = _resolve_capacity(capacity2, k, d)
    return _exchange_rowgrads(ids2, grads2, rows_per_shard * m, slow_axis,
                              capacity=capacity2)


def two_hop_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                   axes: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
                   capacity2: Optional[int] = None,
                   out_cols: Optional[int] = None) -> jnp.ndarray:
    """Hierarchical 2-hop grid lookup — the forward twin of
    ``two_hop_rowgrad`` (same contract as ``grid_lookup``: grid-sharded
    [V/(d*m), E or W] shard + [b] data-local ids in, [b, E] vectors out,
    replicated over the model axis).

    Route matched to pod physics (``model`` = fast ICI, ``data`` = slow DCN):

    1. **fast hop (ICI)**: each model replica routes its 1/m request chunk
       to the local device whose fast coordinate equals the final owner's
       (``owner % m``) — worst-case buckets, never leaves the host group;
    2. **request dedup**: the landing zone holds every request this lane
       will forward from the WHOLE fast group — duplicates are collapsed to
       their segment-first slot (marked ``valid``), so each distinct id
       crosses DCN once no matter how many replicas/batch rows want it;
    3. **slow hop (DCN)**: because every request here satisfies
       ``owner % m == mi``, mapping ids to the lane-local space
       ``lid = (id // (m*rps))*rps + id % rps`` turns the slow hop into a
       plain 1-D ``all_to_all_lookup`` over ``data`` — reusing its bounded
       -capacity + psum-guarded exact-overflow machinery verbatim;
    4. vectors ride back: slow-hop return (built into the 1-D lookup),
       local duplicate re-expansion (segment-first gather), fast-hop return,
       model-axis all_gather to reassemble the [b, E] result.

    vs the flat ``grid_lookup``: DCN messages drop from ``(d-1)*m`` to
    ``d-1`` per device per direction, and duplicated ids ship their E-wide
    vector across DCN once instead of once per occurrence (the Zipf head
    collapses inside each host). ``scripts/two_hop_traffic.py --lookup``
    quantifies both.

    ``capacity2``: slow-hop bucket size (int absolute; float = factor over
    the REAL-request expectation ``k/d`` — the hop-2 vector is m*k slots
    but carries ~k real requests, same resolution rule as
    ``two_hop_rowgrad``). ``out_cols``: slice packed [*, W] rows to E at
    the owner, before the DCN return.
    """
    slow_axis, fast_axis = axes
    m = jax.lax.axis_size(fast_axis)
    d = jax.lax.axis_size(slow_axis)
    rps = table_shard.shape[0]
    (b,) = ids.shape
    pad = (-b) % m
    if pad:
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
    k = ids.shape[0] // m
    mi = jax.lax.axis_index(fast_axis)
    my_ids = jax.lax.dynamic_slice_in_dim(ids, mi * k, k)

    # hop 1 (fast axis): bucket by the final owner's fast coordinate;
    # worst-case capacity k => exact by construction. Unused bucket slots
    # carry id 0 — they dedup into (at most) one slow-hop request and their
    # returned vectors land only in slots the unscatter never reads.
    lane = (my_ids // rps) % m
    r = _route_owners(lane, m)
    send = jnp.zeros((m, k), dtype=my_ids.dtype)
    send = send.at[r.sorted_owner, r.pos_in_bucket].set(
        my_ids[r.order], mode="drop")
    recv = jax.lax.all_to_all(send, fast_axis, split_axis=0, concat_axis=0,
                              tiled=False)  # [m, k]
    req = recv.reshape(m * k)

    # dedup between hops: sort, mark segment firsts; only firsts occupy
    # slow-hop bucket slots (all_to_all_lookup's `valid` routing)
    iota = jnp.arange(m * k, dtype=jnp.int32)
    sorted_req, order1 = jax.lax.sort((req, iota), num_keys=1)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_req[1:] != sorted_req[:-1]])

    # lane-local id space (owner % m == mi by the hop-1 invariant)
    lids = (sorted_req // (m * rps)) * rps + (sorted_req % rps)
    if isinstance(capacity2, float):
        capacity2 = _resolve_capacity(capacity2, k, d)
    vecs = all_to_all_lookup(table_shard, lids, slow_axis,
                             capacity=capacity2, out_cols=out_cols,
                             valid=is_start)  # [m*k, E]; zeros off-segment

    # re-expand duplicates from their segment first, unsort, ride back
    seg_first = jax.lax.cummax(jnp.where(is_start, iota, 0))
    vecs_full = vecs[seg_first]
    inv1 = jnp.argsort(order1)
    back = vecs_full[inv1].reshape(m, k, -1)
    back = jax.lax.all_to_all(back, fast_axis, split_axis=0, concat_axis=0,
                              tiled=False)  # [m, k, E]
    sorted_vectors = back[r.sorted_owner, r.pos_in_bucket]
    chunk = sorted_vectors[r.inverse]  # [k, E] — this replica's chunk
    full = jax.lax.all_gather(chunk, fast_axis, tiled=True)  # [b+pad, E]
    return full[:b]


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
