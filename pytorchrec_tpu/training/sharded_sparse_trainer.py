"""Explicit sharded-embedding trainer: the production multi-chip sparse path.

The flagship SURVEY §2.10/§5.8 recipe as a REAL ``fit()`` path, not a library
demo: embedding tables (and their row-sparse optimizer moments) are
row-sharded over the mesh ``model`` axis; every train step runs ONE
``shard_map`` over the full ``(data, model)`` grid in which

1. **forward lookup** — each table's batch ids ride the explicit
   ``all_to_all`` exchange (parallel/embedding_engine.py::all_to_all_lookup)
   to their owner shard and the gathered rows return by the reverse route;
   the rows are injected into the model through its ``sharded_table_specs``
   batch keys, so the model's own gather is skipped and ``d(loss)/d(rows)``
   is the exact per-occurrence row gradient;
2. **dense backward** — dense parameters are replicated; their grads are
   ``pmean``'d over the ``data`` axis (classic DP) and applied by the masked
   optax optimizer;
3. **sparse backward** — row gradients are routed BACK to the owner shard
   with ``all_to_all_rowgrad`` (padding slots carry an out-of-range sentinel
   id, dropped by the scatter), deduplicated, ``all_gather``'d over the
   ``data`` axis so every data replica applies the identical update, and
   applied as lazy row-sparse Adam/Adagrad on the local table shard — only
   touched rows move through HBM, exactly like the single-device
   SparseEmbeddingTrainer (numerics parity-tested, tests/test_sharded_trainer.py).

Autodiff THROUGH the lookup would instead transpose the exchange into a
dense [V/m, E] scatter-add gradient — correct but bandwidth-catastrophic for
large tables; keeping the backward explicit is the point of this trainer.

The reference has no counterpart of any of this (single device,
task/Task.py:187-190); ``torch.nn.Embedding`` gathers (e.g. FunkSVD.py:40-41)
are the ops being scaled out.

Models opt in via ``sharded_table_specs(batch) -> {name: {"path":
param_path, "ids": ids (broadcast to gather positions), "rows_key": batch
key}}`` — the CTR family (``unified_embedding=True``) and FunkSVD do. Table
row counts must divide the model-axis size (models expose
``table_row_multiple`` to round up).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from pytorchrec_tpu.ops.sparse_update import (
    dedup_row_grads,
    packed_sparse_update,
    sparse_adagrad,
    sparse_lazy_adam,
    sparse_rowwise_adagrad,
)
from pytorchrec_tpu.parallel.embedding_engine import (
    all_to_all_lookup,
    all_to_all_rowgrad,
    grid_lookup,
    grid_rowgrad,
    two_hop_lookup,
    two_hop_rowgrad,
)
from pytorchrec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from pytorchrec_tpu.training.sparse_trainer import (
    SparseEmbeddingTrainer,
    _flatten,
    _unflatten,
)

logger = logging.getLogger(__name__)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def resolve_hot_layouts(model, mesh, sample_batch, flat_params, hot_counts,
                        hot_budget, table_paths, out_layouts) -> None:
    """Build per-table HotColdLayout from ``hot_counts`` into
    ``out_layouts`` (static numpy; idempotent — also runs under
    ``jax.eval_shape`` tracing, where only leaf SHAPES are read). Shared
    by the embedding and RL sharded trainers."""
    import numpy as np

    from pytorchrec_tpu.parallel.hot_cold import build_layout

    if out_layouts:
        return
    m = mesh.shape[MODEL_AXIS]
    specs = model.sharded_table_specs(sample_batch)
    for name, spec in specs.items():
        path = spec["path"]
        if name not in hot_counts or path not in table_paths:
            continue
        v = flat_params[path].shape[0]  # leaf rows (possibly padded)
        counts = np.asarray(hot_counts[name], np.float64)
        assert len(counts) <= v, (name, len(counts), v)
        if len(counts) < v:  # leaf padding rows are coldest
            counts = np.concatenate([counts, np.full(v - len(counts), -1.0)])
        if isinstance(hot_budget, float) and 0 < hot_budget < 1:
            ranked = np.sort(np.maximum(counts, 0))[::-1]
            total = ranked.sum()
            h = (int(np.searchsorted(np.cumsum(ranked),
                                     hot_budget * total) + 1)
                 if total > 0 else 0)
        else:
            h = int(hot_budget)
        # keep >= m cold rows so every model shard owns a slice
        h = max(1, min(h, v - m))
        out_layouts[path] = build_layout(counts, h, pad_cold_to_multiple=m)


def hot_cold_fragment_lookup(flat_tree, path, ids, layout, perm, out_cols,
                             capacity, stop_grad=False):
    """Resolve ``ids`` against a hot/cold fragment pair: hot ids gather
    the replicated fragment locally (zero exchange), cold ids ride the
    all-to-all. Returns ``(raw_rows, (packed_ids, is_hot))`` — the aux
    feeds the fragment backward. Shared by the embedding and RL sharded
    trainers' train AND eval paths (one sentinel/clipping semantics)."""
    h = layout.hot_rows
    packed_ids = perm[ids]
    is_hot = packed_ids < h
    hot = flat_tree["hot_tables/" + path]
    cold = flat_tree[path]
    if stop_grad:
        hot = jax.lax.stop_gradient(hot)
        cold = jax.lax.stop_gradient(cold)
    hot_vec = hot[jnp.clip(packed_ids, 0, h - 1)]
    if out_cols is not None:
        hot_vec = hot_vec[:, :out_cols]
    cold_ids = jnp.where(is_hot, 0, packed_ids - h)
    cold_vec = all_to_all_lookup(cold, cold_ids, MODEL_AXIS,
                                 capacity=capacity, out_cols=out_cols)
    return (jnp.where(is_hot[:, None], hot_vec, cold_vec),
            (packed_ids, is_hot))


def split_hot_cold(flat, moments, layouts, packed_tables, table_optimizer):
    """Replace each hot/cold table leaf [V, E] with its cold fragment
    (row-sharded) and add the replicated hot fragment under
    ``hot_tables/<path>``; moments follow the fragments."""
    for path, layout in layouts.items():
        leaf = flat[path]
        e = leaf.shape[-1]
        h, c = layout.hot_rows, layout.cold_rows
        packed = jnp.take(leaf, jnp.asarray(layout.inverse), axis=0)
        pad = c - (len(layout.perm) - h)
        cold = packed[h:]
        if pad:
            cold = jnp.concatenate(
                [cold, jnp.zeros((pad, e), leaf.dtype)])
        flat[path] = cold
        flat["hot_tables/" + path] = packed[:h]
        if packed_tables:
            # fragments of a packed [V, W] leaf carry their moments (and
            # grad staging) inside the rows; the row permute/split above
            # moved them along (all zero at init)
            moments[path] = {}
            continue
        zc = jnp.zeros((c, e), leaf.dtype)
        zh = jnp.zeros((h, e), leaf.dtype)
        if table_optimizer == "adam":
            moments[path] = {"m": zc, "v": zc, "hot_m": zh, "hot_v": zh}
        elif table_optimizer == "rowwise_adagrad":
            moments[path] = {"acc": jnp.zeros((c,), leaf.dtype),
                             "hot_acc": jnp.zeros((h,), leaf.dtype)}
        else:
            moments[path] = {"acc": zc, "hot_acc": zh}
    return flat, moments


class ShardedSparseEmbeddingTrainer(SparseEmbeddingTrainer):
    """SparseEmbeddingTrainer whose multi-chip path routes lookups and row
    gradients through the explicit all-to-all engine inside one shard_map.

    ``strategy``:

    * ``"1d"`` — tables row-sharded over the ``model`` axis only (replicated
      along ``data``); row grads all_gather over ``data`` so every replica
      applies identical updates.
    * ``"grid"`` — 2-D sparse parallelism (FUTURE #1, arXiv 2508.03854):
      tables row-sharded over the FLATTENED (data, model) grid. Every row
      has one owner among all d*m devices: per-device table/moment HBM
      drops d-fold and the backward applies each row's update once locally
      — no data-axis all_gather, no replicated-update discipline.
    * ``"hot_cold"`` — frequency-aware placement (parallel/hot_cold.py,
      RecShard arXiv 2201.10095): for each table with observed traffic
      ``hot_counts``, the hottest ``hot_rows`` rows are REPLICATED on every
      device (local gather, zero exchange traffic; replicated-discipline
      row updates) and the cold tail is row-sharded over ``model`` exactly
      like ``"1d"``. On Zipfian ids the hot fraction absorbs most lookups,
      so the all-to-all only carries the long tail. Tables without counts
      fall back to plain 1-d sharding. Sizing comes straight from the
      admission pass: ``data/vocab.py::FrequencyVocab.slot_counts()`` is
      the counts vector and ``hot_rows(mass)`` the replica budget.
    """

    def __init__(self, model, mesh, table_optimizer: str = "adam",
                 strategy: str = "1d", grad_compression: str | None = None,
                 grad_compression_min_size: int | None = None,
                 hot_counts=None, hot_rows=0.9,
                 exchange_capacity: float | int | None = None,
                 packed_tables: bool = False, packed_min_width: int = 64,
                 two_hop: bool = False, packed_dtype=None,
                 qgrad_exchange: bool = False, table_lr: float = None):
        assert mesh is not None, "ShardedSparseEmbeddingTrainer requires a mesh"
        assert strategy in ("1d", "grid", "hot_cold"), strategy
        # qgrad_exchange: int8-compress the row-grad payload on the backward
        # exchange — each occurrence grad ships as q int8 + one f32 scale
        # (E + 4 bytes vs 4E), dequantized at the owner. ~4x less backward
        # ICI/DCN traffic at a one-rounding-per-occurrence accuracy cost
        # (measured in scripts/quantized_accuracy.py). Not composed with
        # two_hop (its mid-route combine sums grads in transit) or hot_cold
        # (hot grads never leave the device); tables of width <= 4 ship f32
        # (the scale byte overhead would exceed the payload).
        assert not (qgrad_exchange and two_hop), (
            "qgrad_exchange does not compose with two_hop (in-transit sums)")
        assert not (qgrad_exchange and strategy == "hot_cold"), (
            "qgrad_exchange does not compose with hot_cold")
        self.qgrad_exchange = qgrad_exchange
        # packed fast-width rows (FUTURE 5b propagation): each table SHARD
        # becomes [V/shards, W] table||moments||staging and the per-shard
        # update runs ops/sparse_update.py::packed_sparse_update — 3 fast
        # row passes instead of the classic ~6 narrow ones. Exchange traffic
        # stays at E (all_to_all_lookup slices via out_cols before the
        # return hop). With hot_cold, BOTH fragments are packed: the
        # replicated hot fragment [h, W] and the row-sharded cold tail.
        assert grad_compression in (None, "int8"), grad_compression
        # int8 dense-grad collectives with error feedback — for DATA axes
        # that ride slow DCN links (few participants); see
        # parallel/grad_compression.py for the traffic math
        self.grad_compression = grad_compression
        self.grad_compression_min_size = grad_compression_min_size
        if strategy == "grid":
            assert mesh.shape.get(MODEL_AXIS, 1) * mesh.shape.get(DATA_AXIS, 1) > 1
        else:
            assert mesh.shape.get(MODEL_AXIS, 1) > 1, (
                f"mesh needs a model axis > 1, got {dict(mesh.shape)} "
                "(use SparseEmbeddingTrainer for pure data-parallel)"
            )
        assert hasattr(model, "sharded_table_specs"), (
            f"{type(model).__name__} does not implement sharded_table_specs()"
        )
        self.strategy = strategy
        # bounded-capacity exchange buckets (embedding_engine.bucket_capacity):
        # float = factor over the uniform expectation (2.0 recommended for
        # hashed/admitted id streams), int = absolute bucket size, None =
        # exact worst case. Exactness is kept either way (overflow fallback).
        self.exchange_capacity = exchange_capacity
        # hierarchical 2-hop row-grad exchange (grid strategy only): route
        # over the fast/model axis first, combine duplicate ids inside the
        # fast group, then cross the slow/data axis — m-fold fewer DCN
        # messages and deduped DCN payload (embedding_engine.two_hop_rowgrad)
        assert not two_hop or strategy == "grid", (
            "two_hop applies to the grid strategy only")
        self.two_hop = two_hop
        # hot/cold sizing: {spec_name: counts [V]} + replica budget
        # (int = top-K rows, float in (0,1) = traffic-mass fraction a la
        # data/vocab.py::FrequencyVocab.hot_rows)
        if strategy == "hot_cold":
            assert hot_counts, "strategy='hot_cold' needs hot_counts={name: counts}"
        self._hot_counts = dict(hot_counts or {})
        self._hot_budget = hot_rows
        self._hot_layouts = {}  # param path -> HotColdLayout (set at _make_state)
        super().__init__(model, mesh=mesh, table_optimizer=table_optimizer,
                         packed_tables=packed_tables,
                         packed_min_width=packed_min_width,
                         packed_dtype=packed_dtype, table_lr=table_lr)

    # ------------------------------------------------------------------
    # state layout
    # ------------------------------------------------------------------

    def _declared_table_paths(self, sample_batch):
        specs = self.model.sharded_table_specs(sample_batch)
        # quantized packed byte-row tables announce themselves via the
        # spec's "quantized" block (models/ctr.py::sharded_table_specs);
        # their leaves are already packed by the model init and update via
        # packed_quantized_update with id-keyed stochastic rounding
        self._q_info = {
            spec["path"]: dict(spec["quantized"])
            for spec in specs.values() if spec.get("quantized")
        }
        assert not self._q_info or self.packed_tables, (
            "sharded quantized tables require packed_tables=True (the "
            "trainer's packed machinery carries the byte rows)"
        )
        return {spec["path"] for spec in specs.values()}

    def _resolve_hot_layouts(self, sample_batch, flat_params):
        """Build per-table HotColdLayout from ``hot_counts`` (static numpy;
        idempotent — also runs under ``jax.eval_shape`` tracing, where only
        leaf SHAPES are read)."""
        resolve_hot_layouts(
            self.model, self.mesh, sample_batch, flat_params,
            self._hot_counts, self._hot_budget, self._table_paths,
            self._hot_layouts)

    def _split_hot_cold(self, flat, moments):
        """Replace each hot/cold table leaf [V, E] with its cold fragment
        (row-sharded) and add the replicated hot fragment under
        ``hot_tables/<path>``; moments follow the fragments."""
        return split_hot_cold(flat, moments, self._hot_layouts,
                              self.packed_tables, self.table_optimizer)

    def _make_state(self, sample_batch, seed):
        state = super()._make_state(sample_batch, seed)
        if self.strategy == "hot_cold":
            import optax

            flat = dict(_flatten(state.params))
            self._resolve_hot_layouts(sample_batch, flat)
            flat, moments = self._split_hot_cold(flat, dict(state.table_moments))
            params = _unflatten(flat)
            # rebuild the dense optimizer over the NEW tree structure; hot
            # fragments are updated by the explicit sparse path, not optax
            mask = _unflatten({
                k: k not in self._table_paths
                and not k.startswith("hot_tables/")
                for k in flat
            })
            self._dense_tx = optax.masked(self.tx, mask)
            state = state.replace(
                params=params,
                opt_state=self._dense_tx.init(params),
                table_moments=moments,
            )
        if self.grad_compression is None:
            return state
        from pytorchrec_tpu.parallel.grad_compression import (
            DEFAULT_MIN_SIZE,
            select_compressible,
        )

        # error-feedback residuals are PER-DATA-REPLICA state (each shard
        # carries its own local quantization leftover): leading axis d,
        # sharded over DATA_AXIS (see _compute_state_shardings)
        d = self.mesh.shape[DATA_AXIS]
        min_size = (DEFAULT_MIN_SIZE if self.grad_compression_min_size is None
                    else self.grad_compression_min_size)
        residual = {
            path: jnp.zeros((d, *leaf.shape), leaf.dtype)
            for path, leaf in select_compressible(
                _flatten(state.params),
                exclude=self._table_paths
                | {"hot_tables/" + p for p in self._hot_layouts},
                min_size=min_size).items()
        }
        return state.replace(grad_residual=residual)

    def _compute_state_shardings(self, sample_batch, seed):
        """Declared tables + their moments: P(model, None) for 1-d,
        P((data, model), None) for the grid; rest replicated."""
        mesh = self.mesh
        table_axes = (
            (DATA_AXIS, MODEL_AXIS) if self.strategy == "grid" else MODEL_AXIS
        )
        n_shards = (
            mesh.shape[DATA_AXIS] * mesh.shape[MODEL_AXIS]
            if self.strategy == "grid" else mesh.shape[MODEL_AXIS]
        )
        shape_tree = jax.eval_shape(lambda: self._make_state(sample_batch, seed))
        table_paths = self._table_paths  # set by _make_state (via eval_shape)

        def pspec(path, leaf):
            joined = _path_str(path)
            if joined.startswith("grad_residual"):
                # per-data-replica error-feedback carry: leading axis = data
                return PartitionSpec(
                    DATA_AXIS, *([None] * (getattr(leaf, "ndim", 1) - 1)))
            # hot/cold: hot fragments + their moments are replicated
            if "hot_tables/" in joined or \
                    joined.rsplit("/", 1)[-1].startswith("hot_"):
                return PartitionSpec()
            if any(tp in joined for tp in table_paths) and getattr(leaf, "ndim", 0) >= 1:
                assert leaf.shape[0] % n_shards == 0, (
                    f"{joined}: {leaf.shape[0]} rows not divisible by the "
                    f"{n_shards} table shards; set the model's table_row_multiple"
                )
                return PartitionSpec(table_axes, *([None] * (leaf.ndim - 1)))
            return PartitionSpec()

        self._state_pspecs = jax.tree_util.tree_map_with_path(pspec, shape_tree)
        return jax.tree_util.tree_map(
            lambda spec: NamedSharding(mesh, spec), self._state_pspecs
        )

    # ------------------------------------------------------------------
    # the sharded step
    # ------------------------------------------------------------------

    def _build_train_step(self):
        model, loss_fn = self.model, self.loss_fn
        table_optimizer, table_lr = self.table_optimizer, self._table_lr
        dense_tx = self._dense_tx
        table_paths = self._table_paths
        mesh = self.mesh
        inv_data = 1.0 / mesh.shape[DATA_AXIS]
        grid = self.strategy == "grid"
        compress = self.grad_compression == "int8"
        table_axes = (DATA_AXIS, MODEL_AXIS)
        cap = self.exchange_capacity
        if grid and self.two_hop:
            def grid_exchange(ids, grads, rows_per_shard):
                return two_hop_rowgrad(ids, grads, rows_per_shard,
                                       table_axes, capacity2=cap)
        else:
            def grid_exchange(ids, grads, rows_per_shard):
                return grid_rowgrad(ids, grads, rows_per_shard, table_axes,
                                    capacity=cap)
        hot_layouts = dict(self._hot_layouts)
        # layout perms are static (fixed at init): closed over as constants
        hot_perms = {p: jnp.asarray(lo.perm) for p, lo in hot_layouts.items()}
        use_packed = self.packed_tables
        emb_dims = dict(self._table_emb_dims) if use_packed else {}
        q_info = dict(self._q_info)
        q_full_shapes = dict(getattr(self, "_q_full_shapes", {}))
        qgrad = self.qgrad_exchange

        from pytorchrec_tpu.ops.kernels.quantize import (
            quantize_rows_xla,
            table_rounding_salt,
        )
        from pytorchrec_tpu.ops.quantized_packed import (
            dequant_packed_rows,
            packed_quantized_update,
            q_row_bytes,
        )
        from pytorchrec_tpu.ops.sparse_update import bytes_to_f32, f32_to_bytes

        def _out_cols(path):
            """Columns each looked-up row ships on the return hop: E for
            packed f32/bf16 rows, the q||scale byte prefix for quantized
            rows (int8 rows + scales ON THE WIRE — the exchange never
            carries dequantized f32), None (full row) otherwise."""
            if path in q_info:
                i = q_info[path]
                return (q_row_bytes(i["emb_size"], i["bits"])
                        + 4 * i["col_groups"])
            return emb_dims.get(path)

        def _model_rows(path, raw):
            """Looked-up wire rows -> f32 rows for the model: dequantize
            q||scale bytes, upcast bf16 storage; f32 passes through."""
            if path in q_info:
                i = q_info[path]
                return dequant_packed_rows(raw, i["emb_size"], i["bits"],
                                           i["col_groups"])
            if use_packed:
                return raw.astype(jnp.float32)
            return raw

        def _qgrad_pack(g):
            """[n, E] f32 -> [n, E+4] u8: per-row int8 + bitcast f32 scale."""
            q, s = quantize_rows_xla(g, bits=8)
            return jnp.concatenate(
                [jax.lax.bitcast_convert_type(q, jnp.uint8),
                 f32_to_bytes(s[:, None])], axis=1)

        def _qgrad_unpack(p, e):
            q = jax.lax.bitcast_convert_type(p[:, :e], jnp.int8)
            s = bytes_to_f32(p[:, e:e + 4])[:, 0]
            return q.astype(jnp.float32) * s[:, None]

        def step_body(state, batch):
            # per-device view: batch sharded over data; tables/moments are
            # this shard's rows; dense params replicated
            step_rng = jax.random.fold_in(state.rng, state.step)
            # distinct dropout streams per data shard (replicated params
            # still receive identical updates via the grad pmean)
            step_rng = jax.random.fold_in(
                step_rng, jax.lax.axis_index(DATA_AXIS)
            )
            specs = {
                name: spec
                for name, spec in model.sharded_table_specs(batch).items()
                if spec["path"] in table_paths
            }
            flat_params = _flatten(state.params)

            ids_map, rows_in, hot_aux = {}, {}, {}
            for name, spec in specs.items():
                ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                ids_map[name] = ids
                path = spec["path"]
                shard = jax.lax.stop_gradient(flat_params[path])
                layout = hot_layouts.get(path)
                oc = _out_cols(path)
                if layout is not None:
                    # hot ids resolve from the replicated fragment (no
                    # exchange); only the cold tail rides the all-to-all
                    raw, aux = hot_cold_fragment_lookup(
                        flat_params, path, ids, layout, hot_perms[path],
                        oc, cap, stop_grad=True)
                    rows_in[name] = _model_rows(path, raw)
                    hot_aux[name] = aux
                elif grid and self.two_hop:
                    # forward twin of the 2-hop backward: request dedup
                    # inside the fast group, one DCN hop per direction
                    rows_in[name] = _model_rows(path, two_hop_lookup(
                        shard, ids, table_axes, capacity2=cap, out_cols=oc))
                elif grid:
                    # packed shards gather full fast-width rows locally and
                    # slice to the wire columns before the return hop
                    rows_in[name] = _model_rows(path, grid_lookup(
                        shard, ids, table_axes, capacity=cap, out_cols=oc))
                else:
                    rows_in[name] = _model_rows(path, all_to_all_lookup(
                        shard, ids, MODEL_AXIS, capacity=cap, out_cols=oc))

            # differentiate ONLY the dense sub-tree: every declared table's
            # rows are injected (their leaf grads are structural zeros), and
            # quantized u8 leaves are not differentiable at all. This also
            # keeps the data-axis grad pmean free of zero table shards.
            nondiff = {
                k for k in flat_params
                if k in table_paths or k.startswith("hot_tables/")
            }
            dense_flat = {k: v for k, v in flat_params.items()
                          if k not in nondiff}

            def compute_loss(dense_params, rows):
                full = dict(flat_params)
                # quantized leaves: flax validates the eagerly-declared
                # param's shape, but the per-shard view is a fragment —
                # substitute a full-shape dummy (never gathered: rows are
                # injected; DCE'd by XLA)
                for p, shp in q_full_shapes.items():
                    full[p] = jnp.zeros(shp, flat_params[p].dtype)
                full.update(dense_params)
                patched = dict(batch)
                for name, spec in specs.items():
                    patched[spec["rows_key"]] = rows[name]
                prediction, target = model.apply(
                    {"params": _unflatten(full)}, patched, train=True,
                    rngs={"dropout": step_rng},
                )
                return loss_fn(prediction, target)

            loss, (dense_grads_flat, row_grads) = jax.value_and_grad(
                compute_loss, argnums=(0, 1)
            )(dense_flat, rows_in)

            # global loss = mean of per-shard means (equal local sizes)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            if compress:
                from pytorchrec_tpu.parallel.grad_compression import (
                    compressed_pmean_flat,
                )

                # residual arrives as [1, ...] (this shard's slice of the
                # data-sharded carry); squeeze for the math, restore after
                local_res = {k: v[0] for k, v in state.grad_residual.items()}
                dense_grads_flat, new_res = compressed_pmean_flat(
                    dense_grads_flat, local_res, DATA_AXIS)
                new_residual = {k: v[None] for k, v in new_res.items()}
            else:
                dense_grads_flat = jax.lax.pmean(dense_grads_flat, DATA_AXIS)
                new_residual = state.grad_residual
            # full-tree grads for the masked dense optimizer (table leaves
            # carry zeros; optax.masked passes them through untouched)
            dense_grads = _unflatten({
                **dense_grads_flat,
                **{k: jnp.zeros_like(flat_params[k]) for k in nondiff},
            })
            updates, opt_state = dense_tx.update(
                dense_grads, state.opt_state, state.params
            )
            # packed table leaves must not see even a p+0 add: it would
            # materialize a fresh [V/m, W] buffer and break the scatter's
            # in-place aliasing with the donated state (masked optax emits
            # zero updates for them either way)
            flat_p = dict(_flatten(state.params))
            flat_u = dict(_flatten(updates))
            flat = {
                k: (flat_p[k] if (use_packed and k in nondiff)
                    else flat_p[k] + flat_u[k])
                for k in flat_p
            }

            step = state.step + 1
            moments = dict(state.table_moments)
            for name, spec in specs.items():
                path = spec["path"]
                shard = flat[path]
                rows_per_shard = shard.shape[0]
                # d(global mean)/d(row) = d(local mean)/d(row) / data_size
                layout = hot_layouts.get(path)
                if layout is not None:
                    # split each occurrence's grad by fragment: the other
                    # side's occurrences carry an out-of-range sentinel and
                    # drop out of that fragment's scatter
                    h = layout.hot_rows
                    packed, is_hot = hot_aux[name]
                    g_occ = row_grads[name] * inv_data
                    m_axis = mesh.shape[MODEL_AXIS]
                    cold_sent = jnp.asarray(
                        m_axis * rows_per_shard, packed.dtype)
                    cold_gids = jnp.where(is_hot, cold_sent, packed - h)
                    r_ids, r_rows = all_to_all_rowgrad(
                        cold_gids, g_occ, rows_per_shard, MODEL_AXIS,
                        capacity=cap)
                    if use_packed:
                        # both fragments take ONE packed update each (the
                        # internal sort/scan dedups; sentinels drop at the
                        # scatters: cold sentinel >= rows_per_shard after
                        # the offset shift, hot sentinel == h)
                        hot_key = "hot_tables/" + path
                        c_ids = jax.lax.all_gather(r_ids, DATA_AXIS,
                                                   tiled=True)
                        c_rows = jax.lax.all_gather(r_rows, DATA_AXIS,
                                                    tiled=True)
                        c_offset = (jax.lax.axis_index(MODEL_AXIS)
                                    * rows_per_shard)
                        c_local = (c_ids - c_offset).astype(jnp.int32)
                        cold_now = jax.lax.stop_gradient(flat[path])[c_local]
                        hot_gids = jnp.where(
                            is_hot, packed, jnp.asarray(h, packed.dtype))
                        h_ids = jax.lax.all_gather(
                            hot_gids, DATA_AXIS, tiled=True).astype(jnp.int32)
                        h_rows = jax.lax.all_gather(g_occ, DATA_AXIS,
                                                    tiled=True)
                        hot_now = jax.lax.stop_gradient(flat[hot_key])[h_ids]
                        if path in q_info:
                            # quantized fragments: rowwise-Adagrad +
                            # stochastic requantize per fragment, rounding
                            # bits keyed by fragment-space id
                            qi = q_info[path]
                            salt = table_rounding_salt(state.rng, step, path)
                            flat[path] = packed_quantized_update(
                                flat[path], cold_now, c_local, c_rows, None,
                                table_lr, bits=qi["bits"],
                                col_groups=qi["col_groups"], rng_salt=salt,
                                ids_offset=c_offset)
                            flat[hot_key] = packed_quantized_update(
                                flat[hot_key], hot_now, h_ids, h_rows, None,
                                table_lr, bits=qi["bits"],
                                col_groups=qi["col_groups"],
                                rng_salt=salt ^ jnp.uint32(0x9E3779B9))
                            continue
                        flat[path] = packed_sparse_update(
                            flat[path], cold_now, c_local, c_rows, step,
                            lr=table_lr, optimizer=table_optimizer)
                        flat[hot_key] = packed_sparse_update(
                            flat[hot_key], hot_now, h_ids, h_rows, step,
                            lr=table_lr, optimizer=table_optimizer)
                        continue
                    g = dedup_row_grads(r_ids, r_rows)
                    all_ids = jax.lax.all_gather(g.ids, DATA_AXIS, tiled=True)
                    all_rows = jax.lax.all_gather(g.rows, DATA_AXIS, tiled=True)
                    local_ids = (
                        all_ids - jax.lax.axis_index(MODEL_AXIS) * rows_per_shard
                    ).astype(jnp.int32)
                    # hot grads: local dedup, replicated-discipline gather
                    # over data (every device applies identical hot updates)
                    hot_key = "hot_tables/" + path
                    hot_gids = jnp.where(
                        is_hot, packed, jnp.asarray(h, packed.dtype))
                    gh = dedup_row_grads(hot_gids, g_occ, pad_id_base=h)
                    h_ids = jax.lax.all_gather(
                        gh.ids, DATA_AXIS, tiled=True).astype(jnp.int32)
                    h_rows = jax.lax.all_gather(gh.rows, DATA_AXIS, tiled=True)
                    if table_optimizer == "adam":
                        cold_t, cm, cv = sparse_lazy_adam(
                            shard, moments[path]["m"], moments[path]["v"],
                            local_ids, all_rows, step, lr=table_lr)
                        hot_t, hm, hv = sparse_lazy_adam(
                            flat[hot_key], moments[path]["hot_m"],
                            moments[path]["hot_v"], h_ids, h_rows, step,
                            lr=table_lr)
                        flat[path], flat[hot_key] = cold_t, hot_t
                        moments[path] = {"m": cm, "v": cv,
                                         "hot_m": hm, "hot_v": hv}
                    else:
                        upd = (sparse_rowwise_adagrad
                               if table_optimizer == "rowwise_adagrad"
                               else sparse_adagrad)
                        cold_t, cacc = upd(
                            shard, moments[path]["acc"], local_ids, all_rows,
                            lr=table_lr)
                        hot_t, hacc = upd(
                            flat[hot_key], moments[path]["hot_acc"],
                            h_ids, h_rows, lr=table_lr)
                        flat[path], flat[hot_key] = cold_t, hot_t
                        moments[path] = {"acc": cacc, "hot_acc": hacc}
                    continue
                if use_packed:
                    # FUTURE 5b propagation: ONE packed_sparse_update per
                    # shard (fast-width gather + permute + scatter; the
                    # sort/scan inside combines duplicates, so no pre-dedup
                    # pass — dedup keeps the same static length anyway, the
                    # data-axis gather payload is identical)
                    g_occ = row_grads[name] * inv_data
                    e_dim = g_occ.shape[1]
                    # int8 payload on the wire (qgrad_exchange): worth it
                    # only when the scale byte overhead amortizes
                    q_wire = qgrad and e_dim > 4
                    send = _qgrad_pack(g_occ) if q_wire else g_occ
                    if grid:
                        a_ids, a_pay = grid_exchange(
                            ids_map[name], send, rows_per_shard)
                        offset = (jax.lax.axis_index(table_axes)
                                  * rows_per_shard)
                    else:
                        r_ids, r_pay = all_to_all_rowgrad(
                            ids_map[name], send, rows_per_shard, MODEL_AXIS,
                            capacity=cap)
                        # replicated-update discipline over data: every
                        # replica applies the identical update
                        a_ids = jax.lax.all_gather(r_ids, DATA_AXIS,
                                                   tiled=True)
                        a_pay = jax.lax.all_gather(r_pay, DATA_AXIS,
                                                   tiled=True)
                        offset = (jax.lax.axis_index(MODEL_AXIS)
                                  * rows_per_shard)
                    a_rows = _qgrad_unpack(a_pay, e_dim) if q_wire else a_pay
                    # sentinel slots map >= rows_per_shard: their row gather
                    # clamps to the last row (values unused) and the
                    # update's scatter drops them
                    local_ids = (a_ids - offset).astype(jnp.int32)
                    rows_now = jax.lax.stop_gradient(flat[path])[local_ids]
                    if path in q_info:
                        qi = q_info[path]
                        salt = table_rounding_salt(state.rng, step, path)
                        flat[path] = packed_quantized_update(
                            flat[path], rows_now, local_ids, a_rows, None,
                            table_lr, bits=qi["bits"],
                            col_groups=qi["col_groups"], rng_salt=salt,
                            ids_offset=offset)
                        continue
                    flat[path] = packed_sparse_update(
                        flat[path], rows_now, local_ids, a_rows, step,
                        lr=table_lr, optimizer=table_optimizer)
                    continue
                g_occ = row_grads[name] * inv_data
                e_dim = g_occ.shape[1]
                q_wire = qgrad and e_dim > 4
                send = _qgrad_pack(g_occ) if q_wire else g_occ
                if grid:
                    # every received row is owned HERE (unique grid owner):
                    # dedup + apply locally, no data-axis gather at all
                    r_ids, r_pay = grid_exchange(
                        ids_map[name], send, rows_per_shard,
                    )
                    r_rows = _qgrad_unpack(r_pay, e_dim) if q_wire else r_pay
                    g = dedup_row_grads(r_ids, r_rows)
                    all_ids, all_rows = g.ids, g.rows
                    offset = jax.lax.axis_index(table_axes) * rows_per_shard
                else:
                    r_ids, r_pay = all_to_all_rowgrad(
                        ids_map[name], send, rows_per_shard, MODEL_AXIS,
                        capacity=cap,
                    )
                    r_rows = _qgrad_unpack(r_pay, e_dim) if q_wire else r_pay
                    # dedup before the data-axis gather (cuts its payload
                    # m-fold for duplicate-heavy batches; padding carries the
                    # sentinel)
                    g = dedup_row_grads(r_ids, r_rows)
                    all_ids = jax.lax.all_gather(g.ids, DATA_AXIS, tiled=True)
                    all_rows = jax.lax.all_gather(g.rows, DATA_AXIS, tiled=True)
                    offset = jax.lax.axis_index(MODEL_AXIS) * rows_per_shard
                # owner-local coordinates; the exchange sentinel maps >= V/m
                # on every shard, so those slots drop out of the scatter
                local_ids = (all_ids - offset).astype(jnp.int32)
                if table_optimizer == "adam":
                    table, m, v = sparse_lazy_adam(
                        shard, moments[path]["m"], moments[path]["v"],
                        local_ids, all_rows, step, lr=table_lr,
                    )
                    flat[path] = table
                    moments[path] = {"m": m, "v": v}
                else:
                    upd = (sparse_rowwise_adagrad
                           if table_optimizer == "rowwise_adagrad"
                           else sparse_adagrad)
                    table, acc = upd(
                        shard, moments[path]["acc"], local_ids, all_rows,
                        lr=table_lr,
                    )
                    flat[path] = table
                    moments[path] = {"acc": acc}

            new_state = state.replace(
                params=_unflatten(flat), opt_state=opt_state, step=step,
                table_moments=moments, grad_residual=new_residual,
            )
            return new_state, loss

        return jax.shard_map(
            step_body,
            mesh=mesh,
            in_specs=(self._state_pspecs, PartitionSpec(DATA_AXIS)),
            out_specs=(self._state_pspecs, PartitionSpec()),
            # loss/dense updates are value-replicated by construction
            # (identical math on every shard) but not statically inferable
            check_vma=False,
        )

    def _jit_train_step(self, train_step):
        # shard_map already pins every layout; plain jit + donation
        return jax.jit(self._with_precision(train_step), donate_argnums=0)

    # ------------------------------------------------------------------
    # hot/cold eval + export
    # ------------------------------------------------------------------

    def _build_eval_step(self):
        """hot/cold stores tables as (replicated hot, sharded cold)
        fragments the model can't gather from itself, so eval injects rows
        through the same lookup the train step uses (1d/grid keep the plain
        GSPMD eval: their [V, E] leaves are semantically unchanged)."""
        if self.strategy != "hot_cold":
            return super()._build_eval_step()
        from pytorchrec_tpu.ops.quantized_packed import (
            dequant_packed_rows,
            q_row_bytes,
        )

        model = self.model
        table_paths = self._table_paths
        hot_layouts = dict(self._hot_layouts)
        hot_perms = {p: jnp.asarray(lo.perm) for p, lo in hot_layouts.items()}
        cap = self.exchange_capacity
        emb_dims = dict(self._table_emb_dims) if self.packed_tables else {}
        q_info = dict(self._q_info)

        def _out_cols(path):
            if path in q_info:
                i = q_info[path]
                return (q_row_bytes(i["emb_size"], i["bits"])
                        + 4 * i["col_groups"])
            return emb_dims.get(path)

        def _model_rows(path, raw):
            if path in q_info:
                i = q_info[path]
                return dequant_packed_rows(raw, i["emb_size"], i["bits"],
                                           i["col_groups"])
            if self.packed_tables:
                return raw.astype(jnp.float32)
            return raw

        def eval_body(params, batch):
            flat = _flatten(params)
            specs = {
                name: spec
                for name, spec in model.sharded_table_specs(batch).items()
                if spec["path"] in table_paths
            }
            patched = dict(batch)
            for name, spec in specs.items():
                ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                path = spec["path"]
                layout = hot_layouts.get(path)
                out_cols = _out_cols(path)
                if layout is None:
                    rows = all_to_all_lookup(flat[path], ids, MODEL_AXIS,
                                             capacity=cap, out_cols=out_cols)
                else:
                    rows, _ = hot_cold_fragment_lookup(
                        flat, path, ids, layout, hot_perms[path],
                        out_cols, cap)
                patched[spec["rows_key"]] = _model_rows(path, rows)
            # full-shape dummies for eagerly-declared quantized leaves
            # (fragmented per-shard views fail flax's shape check; the
            # dummy is never gathered — rows are injected)
            for p, shp in getattr(self, "_q_full_shapes", {}).items():
                flat[p] = jnp.zeros(shp, flat[p].dtype)
            return model.apply({"params": _unflatten(flat)}, patched,
                               train=False)

        step = jax.shard_map(
            eval_body,
            mesh=self.mesh,
            in_specs=(self._state_pspecs.params, PartitionSpec(DATA_AXIS)),
            out_specs=PartitionSpec(DATA_AXIS),
            check_vma=False,
        )
        return jax.jit(step)

    def make_serving_fn(self):
        """Serving scores from the MERGED tables when hot/cold fragments are
        in play — the exported artifact is layout-free (a plain [V, E] gather
        model), deployable anywhere regardless of training placement."""
        if not self._hot_layouts:
            return super().make_serving_fn()
        self._assert_compiled()
        assert self.state is not None, "init_state()/fit() first"
        model = self.model
        params = jax.tree_util.tree_map(jnp.asarray, self.merged_params())

        @jax.jit
        def serve(batch):
            prediction, _ = model.apply({"params": params}, batch, train=False)
            return prediction

        return serve

    def merged_params(self):
        """Host copy of ``state.params`` with every hot/cold table merged
        back to its original [V, E] row order — for export/serving or
        cross-layout checkpoint interop (parallel/hot_cold.py::merge_table)."""
        from pytorchrec_tpu.ops.sparse_update import unpack_table
        from pytorchrec_tpu.parallel.hot_cold import merge_table

        if not self._hot_layouts:
            # packed [V, W] leaves -> plain [V, E]; classic passthrough
            return (self.unpacked_params() if self.packed_tables
                    else jax.device_get(self.state.params))
        params = jax.device_get(self.state.params)
        flat = dict(_flatten(params))
        for path, layout in self._hot_layouts.items():
            hot = flat.pop("hot_tables/" + path)
            cold = flat[path]
            if self.packed_tables and path not in self._q_info:
                # unpack fragments before merging; quantized byte-row
                # fragments merge as-is (the model's native storage format)
                e = self._table_emb_dims[path]
                hot = unpack_table(jnp.asarray(hot), e)
                cold = unpack_table(jnp.asarray(cold), e)
            flat[path] = merge_table(hot, cold, layout)
        if self.packed_tables:  # tables without a hot/cold layout
            for path in self._table_paths:
                if path not in self._hot_layouts and path not in self._q_info:
                    flat[path] = unpack_table(
                        jnp.asarray(flat[path]), self._table_emb_dims[path])
        merged = _unflatten(flat)
        merged.pop("hot_tables", None)
        return merged
