"""Sparse-embedding trainer: lazy row-sparse optimizer updates for tables.

Dense Adam over a [V, E] table moves ~6·V·E·4 bytes of HBM per step even
when the batch touches B·F rows; for Criteo-scale tables that traffic IS the
step time. This trainer keeps dense parameters on the normal optax path and
updates embedding tables with row-sparse lazy Adam / Adagrad
(pytorchrec_tpu/ops/sparse_update.py) — only touched rows move.

How gradients stay sparse without restructuring the models (the
"scatter-patch" trick): for each table ``T`` with batch ids ``ids``,
introduce ``rows = stop_grad(T)[ids]`` as an explicit differentiable input
and run the model on ``params`` where the table leaf is replaced by
``stop_grad(T).at[ids].set(rows)``. The model's internal gather then reads
exactly ``rows``, so ``d(loss)/d(rows)`` is the per-occurrence row gradient
(duplicates re-sum inside the sparse update), while the dense table leaf
itself contributes no gradient. One jit, tables donated.

Models opt in by implementing
``sparse_table_ids(batch) -> {table_param_path: ids}`` (path like
``"emb_c_0/embedding"``); the CTR family and FunkSVD do.
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from pytorchrec_tpu.ops.sparse_update import (
    bytes_to_f32,
    pack_table,
    pack_table_bytes,
    packed_sparse_update,
    packed_sparse_update_bytes,
    sparse_adagrad,
    sparse_lazy_adam,
    sparse_rowwise_adagrad,
    unpack_table,
    unpack_table_bytes,
)
from pytorchrec_tpu.training.state import TrainState
from pytorchrec_tpu.training.trainer import Trainer

logger = logging.getLogger(__name__)

import flax.struct


@flax.struct.dataclass
class SparseTrainState(TrainState):
    """``opt_state`` covers the dense leaves; tables live in ``params`` with
    their row-sparse moments here (dict: path -> moment pytree).

    ``grad_residual``: per-leaf quantization-error carry for int8-compressed
    dense-grad collectives (parallel/grad_compression.py); empty dict when
    compression is off."""

    table_moments: Dict[str, Dict[str, jnp.ndarray]] = None
    grad_residual: Dict[str, jnp.ndarray] = flax.struct.field(
        default_factory=dict)


def _flatten(params):
    return traverse_util.flatten_dict(params, sep="/")


def resolve_table_lr(model, override, lr, rowwise_tables: bool) -> float:
    """Table-lr resolution shared by every sparse/quantized trainer
    (VERDICT r4 #6 — close the silent-quality footgun).

    Rowwise-Adagrad-style tables (the optimizer carried inside quantized
    byte rows, or ``table_optimizer="rowwise_adagrad"``) undertrain the
    sequence family at the shared dense lr: GRU4Rec int8 NDCG@10 0.044 at
    lr=1e-3 vs 0.191 at the measured ABSOLUTE ~2e-2 band (RESULTS.md
    round-4 quantized-quality table; the knob is absolute, not a multiple
    of the dense lr). Resolution order:

    1. an explicit ``table_lr=`` override (trainer kwarg / trainer_kwargs);
    2. the model's measured ``table_lr_hint`` — set on DIN/GRU4Rec (2e-2)
       and SASRec (4e-3), applied ONLY when the tables actually run the
       rowwise-style optimizer (lazy-Adam f32 tables match dense quality
       at the shared lr and keep it);
    3. the shared dense ``lr`` — with a loud warning when rowwise tables
       fall back on it and the model declares no hint, so a fresh user
       cannot silently reproduce the 0.044 trap.
    """
    if override is not None:
        return float(override)
    hint = getattr(model, "table_lr_hint", None)
    if rowwise_tables:
        if hint is not None:
            return float(hint)
        if getattr(model, "table_lr_shared_ok", False):
            # CTR family: measured insensitive at the shared lr — no
            # override, no warning
            return lr
        logger.warning(
            "rowwise-Adagrad-style tables on %s fall back to the shared "
            "dense lr (%g). Measured guidance (RESULTS.md round 4): "
            "sequence-family quality needs an ABSOLUTE table lr around "
            "1-2e-2 — pass table_lr= (Task: trainer_kwargs={'table_lr': "
            "...}) or set table_lr_hint on the model.",
            type(model).__name__, lr)
    return lr


def _unflatten(flat):
    return traverse_util.unflatten_dict(flat, sep="/")


class SparseEmbeddingTrainer(Trainer):
    """Trainer with row-sparse table updates (lazy Adam or Adagrad)."""

    def __init__(self, model, mesh=None, table_optimizer: str = "adam",
                 rows_injection: bool = None, packed_tables: bool = False,
                 packed_min_width: int = 64, packed_bytes: bool = False,
                 packed_dtype=None, table_lr: float = None):
        assert hasattr(model, "sparse_table_ids"), (
            f"{type(model).__name__} does not implement sparse_table_ids()"
        )
        assert table_optimizer in ("adam", "adagrad",
                                   "rowwise_adagrad"), table_optimizer
        self._table_lr_override = table_lr
        super().__init__(model, mesh=mesh)
        self.table_optimizer = table_optimizer
        # rows injection (via the model's sharded_table_specs protocol) feeds
        # externally-gathered rows straight into the model, so the train
        # graph carries NO scatter-patch: one gather fwd, row grads bwd.
        # The patch path scatter-SETs the rows into a stop-grad table copy
        # whose transpose is a second large scatter — measurably slower.
        # None = auto-resolve at init_state (every declared table must be
        # injectable, else fall back to the patch path).
        self.rows_injection = rows_injection
        # packed tables (ops/sparse_update.py::packed_sparse_update): each
        # table leaf becomes [V, C] = table||moments rows, cutting the
        # latency-bound per-row passes of the update from ~6 to 3 (the
        # forward gather carries the moments for free). Requires the
        # rows-injection protocol for train AND eval (the model never
        # gathers from the packed leaf itself).
        if packed_bytes:
            # BYTE-row variant of the packed layout: f32 fields bitcast into
            # uint8 columns. Exact f32 numerics (bit-identical updates to
            # packed_tables=True) at fewer bytes per row wherever the f32
            # layout pads — e.g. rowwise_adagrad at E=16: 192 B rows vs 256
            # (ops/sparse_update.py::packed_bytes_width; width rule in
            # RESULTS.md — the byte emitters are also faster per byte).
            #
            # UNIT CHANGE (ADVICE r2): packed_min_width counts COLUMNS OF THE
            # LEAF DTYPE, so here it means uint8 columns = BYTES (64 -> 64 B
            # rows), whereas the f32 layout reads it as f32 columns (64 ->
            # 256 B rows). That is deliberate — the vectorized-emitter rule
            # is columns-not-bytes (RESULTS.md int-dtype probe), and once
            # vectorized fewer bytes win, so the byte layout should NOT be
            # inflated to f32-equivalent byte width. Callers tuning for a
            # byte-row target must pass the byte count directly.
            packed_tables = True
        if packed_tables:
            assert rows_injection is not False, (
                "packed_tables requires the rows-injection path"
            )
            self.rows_injection = True if rows_injection is None else rows_injection
        self.packed_tables = packed_tables
        self.packed_bytes = packed_bytes
        # packed_dtype ("bfloat16"): STORAGE dtype of the packed rows —
        # halves every latency-bound row pass's bytes vs f32 at the same
        # (vectorized) column count, with NO bitcast/reshape around the row
        # ops (what sank the byte-packed f32 layout). Optimizer math stays
        # f32 (packed_sparse_update converts in fused elementwise ops);
        # table/moments/staged grads round to bf16 nearest-even on write.
        # Accuracy cost measured in scripts/quantized_accuracy.py.
        if packed_dtype is not None:
            assert packed_tables and not packed_bytes, (
                "packed_dtype needs packed_tables=True (f32-exact byte rows "
                "are the packed_bytes option)")
            packed_dtype = jnp.dtype(packed_dtype)
            assert packed_dtype in (jnp.dtype(jnp.float32),
                                    jnp.dtype(jnp.bfloat16)), packed_dtype
        self.packed_dtype = packed_dtype
        # packed_min_width is in COLUMNS of the packed leaf's dtype: f32
        # columns for packed_tables (64 -> 256 B rows; 128 -> full 512 B
        # vector rows, ~2x table HBM for ~1.5x faster scatters), uint8
        # columns = bytes for packed_bytes (64 -> 64 B rows). 64 = the
        # vectorized-emitter threshold in either dtype (columns, not bytes —
        # RESULTS.md width rule; unit note at the packed_bytes branch above).
        self.packed_min_width = packed_min_width
        self._table_lr = None
        # quantized packed byte-row tables (path -> {bits, col_groups,
        # emb_size}); populated by the sharded subclass from the model's
        # sharded_table_specs "quantized" blocks. Such leaves are ALREADY
        # packed by the model's init (ops/quantized_packed.py layout) and
        # update via packed_quantized_update instead of packed_sparse_update.
        self._q_info = {}

    def compile(self, *args, lr: float = 1e-3, **kwargs):
        super().compile(*args, lr=lr, **kwargs)
        # the lazy table optimizers often want their OWN lr (measured: DIN
        # on rowwise-Adagrad needs ~4x adam's lr to reach f32-adam quality
        # — RESULTS.md round-4 quantized-quality section)
        rowwise = (self.table_optimizer == "rowwise_adagrad"
                   or bool(getattr(self.model, "quantized_table", False))
                   or bool(getattr(self.model, "quantized_embedding", False)))
        self._table_lr = resolve_table_lr(
            self.model, self._table_lr_override, lr, rowwise)

    def _declared_table_paths(self, sample_batch):
        return set(self.model.sparse_table_ids(sample_batch).keys())

    def _make_state(self, sample_batch, seed) -> SparseTrainState:
        root = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(root)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, sample_batch, train=False
        )
        params = variables["params"]

        declared = self._declared_table_paths(sample_batch)
        flat = _flatten(params)
        # a model may declare tables it never materialized (e.g. LR's unused
        # field embeddings); keep the intersection with the real param tree
        table_paths = declared & set(flat)
        if declared - table_paths:
            logger.info("ignoring absent tables: %s", sorted(declared - table_paths))
        self._table_paths = table_paths

        if self.rows_injection is None:
            self.rows_injection = False
            if hasattr(self.model, "sharded_table_specs"):
                try:
                    spec_paths = {
                        s["path"]
                        for s in self.model.sharded_table_specs(sample_batch).values()
                    }
                    self.rows_injection = table_paths <= spec_paths
                except AssertionError:  # e.g. CTR without unified_embedding
                    pass

        # dense optimizer skips the table leaves
        import optax

        def mask_tree():
            return _unflatten({k: k not in table_paths for k in flat})

        self._dense_tx = optax.masked(self.tx, mask_tree())

        if self.packed_tables:
            if hasattr(self.model, "sharded_table_specs"):
                spec_paths = {
                    s["path"]
                    for s in self.model.sharded_table_specs(sample_batch).values()
                }
            else:
                spec_paths = set()
            assert table_paths <= spec_paths and self.rows_injection, (
                "packed_tables needs every table injectable via "
                "sharded_table_specs (train AND eval gather externally)"
            )
            flat2 = dict(flat)
            # the packed width is padded to the fast-row multiple, so the
            # embedding width can't be derived back from the leaf — keep it
            self._table_emb_dims = {
                p: (self._q_info[p]["emb_size"] if p in self._q_info
                    else flat[p].shape[1])
                for p in table_paths
            }
            # quantized leaves are declared EAGERLY by the model's setup()
            # (self.param in _build_embeddings), so flax validates their
            # shape on every apply — record the full (pre-shard) shapes so
            # shard_map bodies can substitute a correctly-shaped dummy for
            # the never-gathered leaf (rows are injected; XLA DCEs it)
            self._q_full_shapes = {p: tuple(flat[p].shape)
                                   for p in table_paths if p in self._q_info}
            for path in table_paths:
                if path in self._q_info:
                    continue  # model init already built the q byte rows
                if self.packed_bytes:
                    flat2[path] = pack_table_bytes(
                        flat[path], self.table_optimizer,
                        self.packed_min_width)
                else:
                    flat2[path] = pack_table(
                        flat[path], self.table_optimizer,
                        self.packed_min_width, dtype=self.packed_dtype)
            params = _unflatten(flat2)
            moments = {path: {} for path in table_paths}
            return SparseTrainState(
                params=params,
                opt_state=self._dense_tx.init(params),
                step=jnp.zeros((), jnp.int32),
                rng=state_rng,
                table_moments=moments,
            )

        if self.table_optimizer == "adam":
            moments = {
                path: {"m": jnp.zeros_like(flat[path]), "v": jnp.zeros_like(flat[path])}
                for path in table_paths
            }
        elif self.table_optimizer == "rowwise_adagrad":
            # ONE f32 second-moment per row (16-64x less optimizer HBM)
            moments = {
                path: {"acc": jnp.zeros(flat[path].shape[0], jnp.float32)}
                for path in table_paths
            }
        else:
            moments = {
                path: {"acc": jnp.zeros_like(flat[path])} for path in table_paths
            }
        return SparseTrainState(
            params=params,
            opt_state=self._dense_tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
            table_moments=moments,
        )

    def _build_train_step(self):
        if self.packed_tables:
            return self._build_packed_train_step()
        model, loss_fn = self.model, self.loss_fn
        table_optimizer, table_lr = self.table_optimizer, self._table_lr
        dense_tx = self._dense_tx

        table_paths = self._table_paths

        inject = self.rows_injection

        def train_step(state: SparseTrainState, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)
            flat_params = _flatten(state.params)
            if inject:
                specs = {
                    spec["path"]: spec
                    for spec in model.sharded_table_specs(batch).values()
                    if spec["path"] in table_paths
                }
                ids_map = {
                    path: jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                    for path, spec in specs.items()
                }
            else:
                ids_map = {
                    path: jnp.asarray(ids).reshape(-1).astype(jnp.int32)
                    for path, ids in model.sparse_table_ids(batch).items()
                    if path in table_paths
                }
            rows_in = {
                path: jax.lax.stop_gradient(flat_params[path])[ids]
                for path, ids in ids_map.items()
            }

            def compute_loss(params, rows):
                if inject:
                    patched_batch = dict(batch)
                    for path, spec in specs.items():
                        patched_batch[spec["rows_key"]] = rows[path]
                    prediction, target = model.apply(
                        {"params": params}, patched_batch, train=True,
                        rngs={"dropout": step_rng},
                    )
                    return loss_fn(prediction, target)
                flat = dict(_flatten(params))
                for path, ids in ids_map.items():
                    base = jax.lax.stop_gradient(flat[path])
                    flat[path] = base.at[ids].set(rows[path])
                patched = _unflatten(flat)
                prediction, target = model.apply(
                    {"params": patched}, batch, train=True, rngs={"dropout": step_rng}
                )
                return loss_fn(prediction, target)

            loss, (dense_grads, row_grads) = jax.value_and_grad(
                compute_loss, argnums=(0, 1)
            )(state.params, rows_in)

            updates, opt_state = dense_tx.update(
                dense_grads, state.opt_state, state.params
            )
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

            step = state.step + 1
            flat = dict(_flatten(params))
            moments = dict(state.table_moments)
            for path, ids in ids_map.items():
                if table_optimizer == "adam":
                    table, m, v = sparse_lazy_adam(
                        flat[path], moments[path]["m"], moments[path]["v"],
                        ids, row_grads[path], step, lr=table_lr,
                    )
                    flat[path] = table
                    moments[path] = {"m": m, "v": v}
                else:
                    update = (sparse_rowwise_adagrad
                              if table_optimizer == "rowwise_adagrad"
                              else sparse_adagrad)
                    table, acc = update(
                        flat[path], moments[path]["acc"], ids, row_grads[path],
                        lr=table_lr,
                    )
                    flat[path] = table
                    moments[path] = {"acc": acc}

            new_state = state.replace(
                params=_unflatten(flat), opt_state=opt_state, step=step,
                table_moments=moments,
            )
            return new_state, loss

        return train_step  # pure; jitted by _get_train_step_fn / scan fusion

    def _build_packed_train_step(self):
        """Latency-optimal step over packed [V, C] table||moments leaves:
        3 per-row passes total (forward gather of packed rows, one combined
        permute inside packed_sparse_update, one scatter) instead of the
        classic ~6 — row ops are latency-bound on TPU (~29/107 ns/row
        regardless of row bytes; RESULTS.md correction section)."""
        model, loss_fn = self.model, self.loss_fn
        table_optimizer, table_lr = self.table_optimizer, self._table_lr
        dense_tx = self._dense_tx
        table_paths = self._table_paths
        as_bytes = self.packed_bytes
        packed_update = (packed_sparse_update_bytes if as_bytes
                         else packed_sparse_update)

        def train_step(state: SparseTrainState, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)
            flat_params = _flatten(state.params)
            specs = {
                spec["path"]: spec
                for spec in model.sharded_table_specs(batch).values()
                if spec["path"] in table_paths
            }
            emb_dims = self._table_emb_dims
            ids_map, packed_rows = {}, {}
            for path, spec in specs.items():
                ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                ids_map[path] = ids
                leaf = jax.lax.stop_gradient(flat_params[path])
                # ONE gather serves the model (":E" slice) AND the update
                # (the packed moments ride along in the fast-width row)
                packed_rows[path] = leaf[ids]

            if as_bytes:
                rows_in = {p: bytes_to_f32(r[:, :4 * emb_dims[p]])
                           for p, r in packed_rows.items()}
            else:
                # f32 for the model regardless of storage dtype (a fused
                # convert; keeps row grads f32 for the update's f32 math)
                rows_in = {p: r[:, :emb_dims[p]].astype(jnp.float32)
                           for p, r in packed_rows.items()}

            # differentiate only the dense sub-tree: the packed table leaves
            # are never consumed by the model (rows are injected), and the
            # byte layout's uint8 leaves are not differentiable at all
            dense_flat = {k: v for k, v in flat_params.items()
                          if k not in table_paths}

            def compute_loss(dense_params, rows):
                flat = dict(dense_params)
                for path in table_paths:
                    flat[path] = flat_params[path]
                patched_batch = dict(batch)
                for path, spec in specs.items():
                    patched_batch[spec["rows_key"]] = rows[path]
                prediction, target = model.apply(
                    {"params": _unflatten(flat)}, patched_batch, train=True,
                    rngs={"dropout": step_rng},
                )
                return loss_fn(prediction, target)

            loss, (dense_grads_flat, row_grads) = jax.value_and_grad(
                compute_loss, argnums=(0, 1)
            )(dense_flat, rows_in)

            # rebuild a full-tree grads pytree for the masked dense optimizer;
            # masked-out (table) leaves pass through optax.masked untouched
            dense_grads = _unflatten({
                **dense_grads_flat,
                **{p: jnp.zeros_like(flat_params[p]) for p in table_paths},
            })
            updates, opt_state = dense_tx.update(
                dense_grads, state.opt_state, state.params
            )
            # apply dense updates WITHOUT touching the packed table leaves:
            # even a p+0 add would materialize a fresh 100s-of-MB buffer and
            # break the scatter's in-place aliasing with the donated state
            flat_p = _flatten(state.params)
            flat_u = _flatten(updates)
            flat = {
                k: (flat_p[k] if k in table_paths else flat_p[k] + flat_u[k])
                for k in flat_p
            }

            step = state.step + 1
            for path, ids in ids_map.items():
                flat[path] = packed_update(
                    flat[path], packed_rows[path], ids, row_grads[path],
                    step, lr=table_lr, optimizer=table_optimizer,
                )

            new_state = state.replace(
                params=_unflatten(flat), opt_state=opt_state, step=step,
                table_moments=state.table_moments,
            )
            return new_state, loss

        return train_step

    def _jit_train_step(self, train_step):
        """Packed single-device path: pin every state leaf's layout to
        row-major on BOTH ends of the jit. XLA otherwise picks a different
        output layout for the scattered table ({0,1}) than the entry
        ({1,0}), which breaks donation aliasing and costs two full-table
        copies per step (~8 ms at the bench config — measured)."""
        if not self.packed_tables or self.mesh is not None:
            return super()._jit_train_step(train_step)
        from jax.experimental.layout import Format, Layout

        train_step = self._with_precision(train_step)
        # local_devices: under a multi-process runtime jax.devices()[0] can
        # be ANOTHER process's device — pinning layouts there makes the
        # state non-addressable (found by the cross-process engine drill)
        sh = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

        def leaf_fmt(x):
            return Format(Layout(tuple(range(np.ndim(x)))), sh)

        state_fmt = jax.tree_util.tree_map(leaf_fmt, self.state)
        if self.packed_transfer and self._packer is not None:
            packer = self._packer

            def packed_step(state, ints, floats):
                return train_step(state, packer.unpack(ints, floats))

            return jax.jit(packed_step, donate_argnums=0,
                           in_shardings=(state_fmt, None, None),
                           out_shardings=(state_fmt, None))
        return jax.jit(train_step, donate_argnums=0,
                       in_shardings=(state_fmt, None),
                       out_shardings=(state_fmt, None))

    def _build_eval_step(self):
        """Packed leaves can't be gathered by the model itself — eval
        injects the ':E' slice of the packed rows through the same
        rows-injection keys the train step uses."""
        if not self.packed_tables:
            return super()._build_eval_step()
        model = self.model
        table_paths = self._table_paths
        emb_dims = self._table_emb_dims
        as_bytes = self.packed_bytes
        q_info = dict(self._q_info)

        def eval_step(params, batch):
            from pytorchrec_tpu.ops.quantized_packed import dequant_packed_rows

            flat = _flatten(params)
            patched = dict(batch)
            for name, spec in model.sharded_table_specs(batch).items():
                path = spec["path"]
                if path not in table_paths:
                    continue
                ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                rows = flat[path][ids]
                if path in q_info:
                    info = q_info[path]
                    patched[spec["rows_key"]] = dequant_packed_rows(
                        rows, info["emb_size"], info["bits"],
                        info["col_groups"])
                elif as_bytes:
                    patched[spec["rows_key"]] = bytes_to_f32(
                        rows[:, :4 * emb_dims[path]])
                else:
                    patched[spec["rows_key"]] = (
                        rows[:, :emb_dims[path]].astype(jnp.float32))
            return model.apply({"params": params}, patched, train=False)

        return self._jit_eval_step(eval_step)

    def unpacked_params(self):
        """Host copy of ``state.params`` with every packed table leaf
        restored to its plain [V, E] columns — for export/serving and
        cross-trainer checkpoint interop. Quantized byte-row leaves are the
        model's own storage format (it dequantizes from them at gather
        time), so they pass through unchanged."""
        params = jax.device_get(self.state.params)
        if not self.packed_tables:
            return params
        flat = dict(_flatten(params))
        unpack = unpack_table_bytes if self.packed_bytes else unpack_table
        for path in self._table_paths:
            if path in self._q_info:
                continue  # model-native format; serving dequantizes in-graph
            flat[path] = np.asarray(
                unpack(jnp.asarray(flat[path]), self._table_emb_dims[path])
            ).astype(np.float32)  # bf16 storage -> f32 export
        return _unflatten(flat)

    def make_serving_fn(self):
        """Serving scores from the UNPACKED tables when packed leaves are in
        play — the exported artifact is a plain [V, E] gather model."""
        if not self.packed_tables:
            return super().make_serving_fn()
        self._assert_compiled()
        assert self.state is not None, "init_state()/fit() first"
        model = self.model
        # jnp leaves: a host-numpy quantized table indexed by a traced id
        # array would call __array__ on the tracer and fail
        params = jax.tree_util.tree_map(jnp.asarray, self.unpacked_params())

        @jax.jit
        def serve(batch):
            prediction, _ = model.apply({"params": params}, batch, train=False)
            return prediction

        return serve
