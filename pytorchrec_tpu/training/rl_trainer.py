"""Value-RL trainer: twin networks, per-batch "epochs", target sync.

Capability parity with reference model/IValueRLModel.py:95-185 — the RL
family redefines "epoch" as ONE BATCH: callbacks, dev evaluation and the
target-network sync all fire per batch inside the data loop
(IValueRLModel.py:148-182).

TPU-first: the target sync is a pure pytree swap inside the jitted step
(``target := params`` every ``update_freq`` steps via ``lax.cond``-free
``jnp.where`` masking is wasteful for whole trees, so the swap happens with a
cheap conditional in the jitted step using ``jax.lax.cond`` on
``step % update_freq == 0``) — no host round trip, unlike the reference's
state-dict deep copy (IValueRLModel.py:71-72).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from pytorchrec_tpu.data.loader import train_batches
from pytorchrec_tpu.data.readers.base import DataReader
from pytorchrec_tpu.data.schema import TrainMode
from pytorchrec_tpu.models.rl import ValueRLModel
from pytorchrec_tpu.training.callbacks import Callback, CallbackList, History
from pytorchrec_tpu.training.state import RLTrainState
from pytorchrec_tpu.training.trainer import Trainer

logger = logging.getLogger(__name__)


class RLTrainer(Trainer):
    """Trainer for ``ValueRLModel`` (DQN / DEERS / LSRL families)."""

    def __init__(self, model: ValueRLModel, mesh=None):
        super().__init__(model, mesh=mesh)

    def _make_state(self, sample_batch, seed) -> RLTrainState:
        root = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(root)
        variables = self.model.init({"params": init_rng, "dropout": init_rng}, sample_batch)
        params = variables["params"]
        return RLTrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
            # distinct buffers: donation forbids params/target aliasing
            target_params=jax.tree_util.tree_map(jnp.copy, params),
        )

    def _build_train_step(self):
        model, loss_fn, tx = self.model, self.loss_fn, self.tx
        update_freq = model.update_freq

        def train_step(state: RLTrainState, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)

            def compute_loss(params):
                prediction, target = model.apply(
                    {"params": params}, {"params": state.target_params},
                    batch, train=True, rngs={"dropout": step_rng},
                )
                return loss_fn(prediction, target)

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            step = state.step + 1
            # reference sync cadence: every update_freq batches
            # (IValueRLModel.py:173-175)
            target_params = jax.lax.cond(
                step % update_freq == 0,
                lambda: params,
                lambda: state.target_params,
            )
            new_state = state.replace(
                params=params, opt_state=opt_state, step=step,
                target_params=target_params,
            )
            return new_state, loss

        return train_step  # pure; jitted by _get_train_step_fn / scan fusion

    def _build_eval_step(self):
        model = self.model

        def eval_step(params, batch):
            prediction = model.apply_eval({"params": params}, batch)
            # ranking layout: positive first (reference DQN forward eval path)
            from pytorchrec_tpu.models.base import one_hot_first_target

            target = one_hot_first_target(prediction) if prediction.ndim == 2 else None
            return prediction, target

        return self._jit_eval_step(eval_step)

    def fit(
        self,
        reader: DataReader,
        batch_size: int,
        epochs: int,  # = number of BATCHES, reference semantics
        train_mode: Optional[TrainMode] = None,
        verbose: int = 1,
        callbacks: Optional[Union[List[Callback], CallbackList]] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        dev_batch_size: Optional[int] = None,
        dev_freq: int = 100,
        seed: int = 2020,
        eval_dev: bool = True,
        scan_batches: int = 1,
    ) -> History:
        """Epoch == one batch (reference IValueRLModel.py:148-182): the loop
        walks the shuffled train stream, re-shuffling (and pairwise
        re-sampling) whenever it is exhausted, until ``epochs`` batches ran."""
        self._assert_compiled()
        if self.state is None:
            bootstrap = reader.get_batch(
                "train", np.arange(min(2, reader.get_train_dataset_size()))
            )
            self.init_state(bootstrap, seed=seed)
        train_mode = train_mode or reader.train_mode

        if not isinstance(callbacks, CallbackList):
            callbacks = CallbackList(
                callbacks,
                add_history=True,
                add_progbar=verbose != 0,
                trainer=self,
                verbose=verbose,
                epochs=epochs,
                batches=epochs,
            )
        self.history = callbacks.history

        shuffle_rng = np.random.default_rng(seed)

        def fresh_stream():
            if train_mode == TrainMode.PAIR_WISE:
                reader.train_neg_sample()
            return train_batches(reader, batch_size, shuffle_rng, shuffle, drop_last)

        self.stop_training = False
        callbacks.on_train_begin()
        stream = fresh_stream()

        def next_batch():
            nonlocal stream
            batch = next(stream, None)
            if batch is None:
                stream = fresh_stream()
                batch = next(stream)
            return batch

        if scan_batches > 1:
            # SURVEY hard part 4: target-net sync + step counting run INSIDE
            # one scanned device call per dev-eval window — no host sync per
            # batch. The in-step `step % update_freq` counter keeps the
            # reference's sync cadence exact across window boundaries.
            assert self._use_packing(), "scan_batches > 1 requires packed_transfer"
            scan_fn = None
            epoch = 0
            while epoch < epochs and not self.stop_training:
                callbacks.on_epoch_begin(epoch)
                k = min(scan_batches, dev_freq - (epoch % dev_freq),
                        epochs - epoch)
                stack = []
                for _ in range(k):
                    batch = next_batch()
                    self._ensure_train_packer(batch)
                    stack.append(self._packer.pack(batch))
                if scan_fn is None or k != self._last_scan_k:
                    scan_fn = self._make_scan_step(k)
                    self._last_scan_k = k
                ints_k = np.stack([s[0] for s in stack])
                floats_k = np.stack([s[1] for s in stack])
                self.state, loss = scan_fn(self.state, ints_k, floats_k)
                epoch += k
                epoch_logs: Dict[str, Any] = {"loss": float(loss)}
                if eval_dev and epoch % dev_freq == 0:
                    epoch_logs.update(self.evaluate(
                        reader, split="dev",
                        batch_size=dev_batch_size or batch_size,
                        verbose=verbose, callbacks=callbacks,
                    ))
                callbacks.on_epoch_end(epoch - 1, epoch_logs)
            callbacks.on_train_end()
            return self.history

        for epoch in range(epochs):
            callbacks.on_epoch_begin(epoch)
            batch = next_batch()
            loss = self._train_step(batch)
            epoch_logs: Dict[str, Any] = {"loss": float(loss)}
            callbacks.on_train_batch_end(epoch, {"loss": float(loss)})

            if eval_dev and (epoch + 1) % dev_freq == 0 and not self.stop_training:
                dev_logs = self.evaluate(
                    reader, split="dev",
                    batch_size=dev_batch_size or batch_size,
                    verbose=verbose, callbacks=callbacks,
                )
                epoch_logs.update(dev_logs)

            callbacks.on_epoch_end(epoch, epoch_logs)
            if self.stop_training:
                break
        callbacks.on_train_end()
        return self.history


import flax.struct
from flax import traverse_util


@flax.struct.dataclass
class SparseRLTrainState(RLTrainState):
    """RL twin-network state + row-sparse table moments (path -> pytree)."""

    table_moments: Optional[Dict[str, Dict[str, jnp.ndarray]]] = None


class SparseRLTrainer(RLTrainer):
    """RLTrainer with row-sparse lazy table updates (VERDICT r3 #3: the RL
    zoo was locked out of the sparse path).

    The EVAL net's forward gathers (candidates + state histories, one
    flattened block per table — models/rl.py ``_forward_gather_ids``) are
    hoisted out of the model and re-injected through the QNet's rows keys,
    so ``d(loss)/d(rows)`` is the exact per-occurrence row gradient and the
    item table updates with lazy Adam/Adagrad over touched rows only. The
    TARGET net's ``next_forward`` gathers stay in-module: they sit under
    ``stop_gradient`` (reference DQN.py:97-100), so they cost one gather
    and route nothing back. The periodic target sync copies the plain
    [V, E] table leaf — moments are eval-net state and are not synced.
    """

    def __init__(self, model: ValueRLModel, mesh=None,
                 table_optimizer: str = "adam", table_lr: float = None,
                 packed_tables: bool = False, packed_min_width: int = 64):
        assert hasattr(model, "sparse_table_ids"), type(model).__name__
        assert table_optimizer in ("adam", "adagrad", "rowwise_adagrad")
        super().__init__(model, mesh=mesh)
        self.table_optimizer = table_optimizer
        self._table_lr = None
        self._table_lr_override = table_lr
        # packed fast-width rows (table||moments||grad-staging in one
        # [V, W] leaf): the change that took DIN's sparse path from -2.2x
        # to +1.79x vs dense Adam (scripts/din_sparse_ab.py). BOTH
        # networks' gathers must then be injected (a packed leaf cannot be
        # gathered in-module), so this path uses sharded_target_specs for
        # the target net too.
        self.packed_tables = packed_tables
        self.packed_min_width = packed_min_width
        if packed_tables:
            assert hasattr(model, "sharded_target_specs"), (
                type(model).__name__)
        self._table_emb_dims = {}

    def compile(self, *args, lr: float = 1e-3, **kwargs):
        super().compile(*args, lr=lr, **kwargs)
        from pytorchrec_tpu.training.sparse_trainer import resolve_table_lr

        inner = getattr(self.model, "qnet", self.model)
        rowwise = (self.table_optimizer == "rowwise_adagrad"
                   or bool(getattr(inner, "quantized_table", False)))
        self._table_lr = resolve_table_lr(
            inner, self._table_lr_override, lr, rowwise)

    def _make_state(self, sample_batch, seed) -> SparseRLTrainState:
        import optax

        root = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(root)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, sample_batch)
        params = variables["params"]
        flat = traverse_util.flatten_dict(params, sep="/")
        specs0 = self.model.sharded_table_specs(sample_batch)
        declared = {spec["path"] for spec in specs0.values()}
        table_paths = declared & set(flat)
        self._table_paths = table_paths
        # quantized packed byte-row leaves (DIN-style "quantized" spec
        # block): acc rides inside the rows, update via
        # packed_quantized_update with id-keyed rounding — no moments tree
        self._q_info = {
            spec["path"]: dict(spec["quantized"])
            for spec in specs0.values()
            if spec.get("quantized") and spec["path"] in flat
        }

        self._dense_tx = optax.masked(
            self.tx,
            traverse_util.unflatten_dict(
                {k: k not in table_paths for k in flat}, sep="/"))

        f32_paths = table_paths - set(self._q_info)
        if self.packed_tables:
            from pytorchrec_tpu.ops.sparse_update import pack_table

            assert not self._q_info, (
                "packed_tables composes with f32 RL tables (quantized "
                "leaves are already packed byte rows)")
            flat2 = dict(flat)
            self._table_emb_dims = {}
            for path in f32_paths:
                self._table_emb_dims[path] = flat[path].shape[1]
                flat2[path] = pack_table(flat[path], self.table_optimizer,
                                         self.packed_min_width)
            params = traverse_util.unflatten_dict(flat2, sep="/")
            moments = {p: {} for p in f32_paths}  # ride inside the rows
            return SparseRLTrainState(
                params=params,
                opt_state=self._dense_tx.init(params),
                step=jnp.zeros((), jnp.int32),
                rng=state_rng,
                target_params=jax.tree_util.tree_map(jnp.copy, params),
                table_moments=moments,
            )
        if self.table_optimizer == "adam":
            moments = {p: {"m": jnp.zeros_like(flat[p]),
                           "v": jnp.zeros_like(flat[p])} for p in f32_paths}
        elif self.table_optimizer == "rowwise_adagrad":
            moments = {p: {"acc": jnp.zeros(flat[p].shape[0], jnp.float32)}
                       for p in f32_paths}
        else:
            moments = {p: {"acc": jnp.zeros_like(flat[p])}
                       for p in f32_paths}
        return SparseRLTrainState(
            params=params,
            opt_state=self._dense_tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            table_moments=moments,
        )

    def _build_train_step(self):
        from pytorchrec_tpu.ops.kernels.quantize import table_rounding_salt
        from pytorchrec_tpu.ops.quantized_packed import (
            dequant_packed_rows,
            packed_quantized_update,
        )
        from pytorchrec_tpu.ops.sparse_update import (
            sparse_adagrad,
            sparse_lazy_adam,
            sparse_rowwise_adagrad,
        )

        model, loss_fn = self.model, self.loss_fn
        dense_tx = self._dense_tx
        table_paths = self._table_paths
        q_info = dict(self._q_info)
        table_optimizer, table_lr = self.table_optimizer, self._table_lr
        update_freq = model.update_freq
        if self.packed_tables:
            return self._build_packed_train_step()

        def train_step(state: SparseRLTrainState, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)
            flat_params = traverse_util.flatten_dict(state.params, sep="/")
            specs = {
                spec["path"]: spec
                for spec in model.sharded_table_specs(batch).values()
                if spec["path"] in table_paths
            }
            ids_map = {
                path: jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                for path, spec in specs.items()
            }
            raw_rows = {
                path: jax.lax.stop_gradient(flat_params[path])[ids]
                for path, ids in ids_map.items()
            }
            rows_in = {
                path: (dequant_packed_rows(raw, q_info[path]["emb_size"],
                                           q_info[path]["bits"],
                                           q_info[path]["col_groups"])
                       if path in q_info else raw)
                for path, raw in raw_rows.items()
            }

            def compute_loss(params, rows):
                patched = dict(batch)
                for path, spec in specs.items():
                    patched[spec["rows_key"]] = rows[path]
                prediction, target = model.apply(
                    {"params": params}, {"params": state.target_params},
                    patched, train=True, rngs={"dropout": step_rng},
                )
                return loss_fn(prediction, target)

            # allow_int: quantized uint8 leaves sit in params (their grads
            # are float0 and the masked dense optimizer skips them)
            loss, (dense_grads, row_grads) = jax.value_and_grad(
                compute_loss, argnums=(0, 1), allow_int=True
            )(state.params, rows_in)

            updates, opt_state = dense_tx.update(
                dense_grads, state.opt_state, state.params)
            # optax.masked passes MASKED (table) leaves through
            # UNTRANSFORMED — the raw gradient, not a descent update. Row
            # injection makes those grads structurally zero today, but if a
            # model ever silently fell back to an in-module gather (rows_key
            # mismatch) the table would take an unscaled gradient-ASCENT
            # step. Zero table-leaf updates explicitly (ADVICE r4).
            upd_flat = dict(traverse_util.flatten_dict(updates, sep="/"))
            for tp in table_paths:
                u = upd_flat[tp]
                if u.dtype != jax.dtypes.float0:
                    upd_flat[tp] = jnp.zeros_like(u)
            updates = traverse_util.unflatten_dict(upd_flat, sep="/")
            params = jax.tree_util.tree_map(
                lambda p, u: p if u.dtype == jax.dtypes.float0 else p + u,
                state.params, updates)

            step = state.step + 1
            flat = dict(traverse_util.flatten_dict(params, sep="/"))
            moments = dict(state.table_moments)
            for path, ids in ids_map.items():
                if path in q_info:
                    info = q_info[path]
                    salt = table_rounding_salt(state.rng, step, path)
                    flat[path] = packed_quantized_update(
                        flat[path], raw_rows[path], ids, row_grads[path],
                        None, table_lr, bits=info["bits"],
                        col_groups=info["col_groups"], rng_salt=salt)
                elif table_optimizer == "adam":
                    table, m, v = sparse_lazy_adam(
                        flat[path], moments[path]["m"], moments[path]["v"],
                        ids, row_grads[path], step, lr=table_lr)
                    flat[path] = table
                    moments[path] = {"m": m, "v": v}
                else:
                    upd = (sparse_rowwise_adagrad
                           if table_optimizer == "rowwise_adagrad"
                           else sparse_adagrad)
                    table, acc = upd(flat[path], moments[path]["acc"], ids,
                                     row_grads[path], lr=table_lr)
                    flat[path] = table
                    moments[path] = {"acc": acc}
            params = traverse_util.unflatten_dict(flat, sep="/")

            target_params = jax.lax.cond(
                step % update_freq == 0,
                lambda: params,
                lambda: state.target_params,
            )
            new_state = state.replace(
                params=params, opt_state=opt_state, step=step,
                target_params=target_params, table_moments=moments,
            )
            return new_state, loss

        return train_step  # pure; jitted by _get_train_step_fn / scan fusion


    def _build_packed_train_step(self):
        """Packed fast-width RL step: one [V, W] gather per table serves
        the eval-net forward (:E slice injected) AND the lazy update
        (moments ride in the row — ops/sparse_update.py::
        packed_sparse_update); the TARGET net's next-step gathers inject
        the :E slice of the packed TARGET leaf (a packed leaf cannot be
        gathered in-module). 3 fast row passes per table per step."""
        from pytorchrec_tpu.ops.sparse_update import packed_sparse_update

        model, loss_fn = self.model, self.loss_fn
        dense_tx = self._dense_tx
        table_paths = self._table_paths
        emb_dims = dict(self._table_emb_dims)
        table_optimizer, table_lr = self.table_optimizer, self._table_lr
        update_freq = model.update_freq

        def train_step(state: SparseRLTrainState, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)
            flat_params = traverse_util.flatten_dict(state.params, sep="/")
            flat_target = traverse_util.flatten_dict(state.target_params,
                                                     sep="/")
            specs = {
                spec["path"]: spec
                for spec in model.sharded_table_specs(batch).values()
                if spec["path"] in table_paths
            }
            tspecs = {
                spec["path"]: spec
                for spec in model.sharded_target_specs(batch).values()
                if spec["path"] in table_paths
            }
            ids_map, packed_rows, rows_in, trows_in = {}, {}, {}, {}
            for path, spec in specs.items():
                ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                ids_map[path] = ids
                leaf = jax.lax.stop_gradient(flat_params[path])
                packed_rows[path] = leaf[ids]
                rows_in[path] = packed_rows[path][:, :emb_dims[path]]
            for path, spec in tspecs.items():
                tids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                tleaf = jax.lax.stop_gradient(flat_target[path])
                trows_in[path] = tleaf[tids][:, :emb_dims[path]]

            def compute_loss(params, rows):
                patched = dict(batch)
                for path, spec in specs.items():
                    patched[spec["rows_key"]] = rows[path]
                for path, spec in tspecs.items():
                    patched[spec["rows_key"]] = trows_in[path]
                prediction, target = model.apply(
                    {"params": params}, {"params": state.target_params},
                    patched, train=True, rngs={"dropout": step_rng},
                )
                return loss_fn(prediction, target)

            loss, (dense_grads, row_grads) = jax.value_and_grad(
                compute_loss, argnums=(0, 1)
            )(state.params, rows_in)

            updates, opt_state = dense_tx.update(
                dense_grads, state.opt_state, state.params)
            flat_p = dict(traverse_util.flatten_dict(state.params, sep="/"))
            flat_u = dict(traverse_util.flatten_dict(updates, sep="/"))
            # packed leaves must not see even a p+0 add (it would
            # materialize a fresh [V, W] buffer and break the scatter's
            # in-place aliasing with the donated state)
            flat = {
                k: (flat_p[k] if k in table_paths else flat_p[k] + flat_u[k])
                for k in flat_p
            }

            step = state.step + 1
            for path, ids in ids_map.items():
                flat[path] = packed_sparse_update(
                    flat[path], packed_rows[path], ids, row_grads[path],
                    step, lr=table_lr, optimizer=table_optimizer)
            params = traverse_util.unflatten_dict(flat, sep="/")

            target_params = jax.lax.cond(
                step % update_freq == 0,
                lambda: params,
                lambda: state.target_params,
            )
            new_state = state.replace(
                params=params, opt_state=opt_state, step=step,
                target_params=target_params,
                table_moments=state.table_moments,
            )
            return new_state, loss

        return train_step

    def _build_eval_step(self):
        if not self.packed_tables:
            return super()._build_eval_step()
        model = self.model
        table_paths = self._table_paths
        emb_dims = dict(self._table_emb_dims)

        def eval_step(params, batch):
            flat_p = traverse_util.flatten_dict(params, sep="/")
            patched = dict(batch)
            for spec in model.sharded_table_specs(batch).values():
                path = spec["path"]
                if path not in table_paths:
                    continue
                ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                patched[spec["rows_key"]] = \
                    flat_p[path][ids][:, :emb_dims[path]]
            prediction = model.apply_eval({"params": params}, patched)
            from pytorchrec_tpu.models.base import one_hot_first_target

            target = (one_hot_first_target(prediction)
                      if prediction.ndim == 2 else None)
            return prediction, target

        return self._jit_eval_step(eval_step)


class ShardedSparseRLTrainer(SparseRLTrainer):
    """RL through the EXPLICIT all-to-all embedding engine (round 4 — the
    last family on the engine): the QNets' item tables row-shard over the
    mesh's ``model`` axis and BOTH networks' gathers ride one exchange
    each per step:

    * EVAL net: ``sharded_table_specs`` ids -> ``all_to_all_lookup`` over
      the eval shards, rows injected through the forward keys; the exact
      per-occurrence row grads route back with ``all_to_all_rowgrad`` and
      update owner shards with the lazy optimizers (replicated-update
      discipline over ``data``, like ShardedSparseEmbeddingTrainer's 1-d
      strategy);
    * TARGET net: ``sharded_target_specs`` (next-step candidate + state
      ids) -> one read-only lookup over the TARGET shards, injected
      through the target keys — nothing routes back (stop_gradient,
      reference DQN.py:97-100); the periodic sync copies shard to shard.

    Scope: strategy = "1d" row sharding, "grid" (round 5 — the flattened
    (data, model) grid with one unique owner per row: d-fold less table
    HBM per device, backward applies each row's update once locally with
    no data-axis all_gather), or "hot_cold" (round 5 — frequency-aware
    fragments for BOTH networks, f32 classic/packed); f32 classic, f32 PACKED
    fast-width rows (``packed_tables=True`` — the [V, W] table‖m‖v leaf
    row-shards over ``model``, lookups slice to E via ``out_cols`` before
    the return hop exactly like the embedding trainer's path 5, so ICI
    traffic stays at E while the owner-shard update is one
    ``packed_sparse_update``; VERDICT r4 #3 — the 1.88×-winning
    single-chip RL format is now also the multi-chip RL format), AND
    quantized int8/int4 byte-row tables (``quantized_table=True`` QNets —
    the lookup return hops ship q||scale bytes for BOTH networks, the
    owner shard updates via packed_quantized_update with id-keyed
    rounding). Dropout folds the data shard index into the stream
    (distinct per replica, like the embedding trainer)."""

    def __init__(self, model: ValueRLModel, mesh=None,
                 table_optimizer: str = "adam", table_lr: float = None,
                 exchange_capacity=None, packed_tables: bool = False,
                 packed_min_width: int = 64, strategy: str = "1d",
                 hot_counts=None, hot_rows=0.9):
        from pytorchrec_tpu.parallel import DATA_AXIS, MODEL_AXIS

        assert mesh is not None, "ShardedSparseRLTrainer requires a mesh"
        # "grid" (round 5, VERDICT r4 #4): both networks' tables row-shard
        # over the FLATTENED (data, model) grid — one unique owner per row
        # among all d*m devices, so per-device table HBM drops d-fold and
        # the backward applies each update once locally (no data-axis
        # all_gather / replicated-update discipline). Composes with f32
        # classic, packed fast-width and quantized byte-row formats.
        # "hot_cold" (round 5): frequency-aware placement for BOTH
        # networks — each QNet table's hottest rows replicate on every
        # device (local gather, zero exchange; replicated-discipline
        # updates) and the cold tail row-shards over `model`; the TARGET
        # net's fragments mirror the eval net's layout so the periodic
        # sync stays a plain tree copy. f32 classic + packed formats
        # (quantized RL stays 1d/grid — fragment-space rounding keys are
        # the embedding trainer's concern, not re-derived here).
        assert strategy in ("1d", "grid", "hot_cold"), strategy
        if strategy == "grid":
            assert (mesh.shape.get(MODEL_AXIS, 1)
                    * mesh.shape.get(DATA_AXIS, 1)) > 1
        else:
            assert mesh.shape.get(MODEL_AXIS, 1) > 1, (
                f"mesh needs a model axis > 1, got {dict(mesh.shape)} "
                "(use SparseRLTrainer for single-shard tables)")
        if strategy == "hot_cold":
            assert hot_counts, (
                "strategy='hot_cold' needs hot_counts={spec_name: counts}")
        assert hasattr(model, "sharded_target_specs"), type(model).__name__
        super().__init__(model, mesh=mesh, table_optimizer=table_optimizer,
                         table_lr=table_lr, packed_tables=packed_tables,
                         packed_min_width=packed_min_width)
        self.strategy = strategy
        self.exchange_capacity = exchange_capacity
        self._hot_counts = dict(hot_counts or {})
        self._hot_budget = hot_rows
        self._hot_layouts = {}

    def _n_table_shards(self):
        from pytorchrec_tpu.parallel import DATA_AXIS, MODEL_AXIS

        m = self.mesh.shape[MODEL_AXIS]
        if self.strategy == "grid":
            return m * self.mesh.shape[DATA_AXIS]
        return m

    def _make_state(self, sample_batch, seed):
        state = super()._make_state(sample_batch, seed)
        n = self._n_table_shards()
        flat = traverse_util.flatten_dict(state.params, sep="/")
        # eagerly-declared quantized params: flax validates their shape
        # inside shard_map where the leaf is a SHARD — record full shapes
        # so the step can substitute DCE'd dummies (rows are injected)
        self._q_full_shapes = {path: tuple(flat[path].shape)
                               for path in self._q_info}
        if self.strategy == "hot_cold":
            import optax

            from pytorchrec_tpu.training.sharded_sparse_trainer import (
                resolve_hot_layouts,
                split_hot_cold,
            )

            assert not self._q_info, (
                "RL hot_cold covers f32 classic/packed tables; quantized "
                "RL rides 1d/grid")
            flat = dict(flat)
            resolve_hot_layouts(self.model, self.mesh, sample_batch, flat,
                                self._hot_counts, self._hot_budget,
                                self._table_paths, self._hot_layouts)
            moments = dict(state.table_moments)
            flat, moments = split_hot_cold(
                flat, moments, self._hot_layouts, self.packed_tables,
                self.table_optimizer)
            # the TARGET net's fragments mirror the eval net's layout
            # (identical split of the identical init copy)
            tflat, _ = split_hot_cold(
                dict(traverse_util.flatten_dict(state.target_params,
                                                sep="/")),
                {}, self._hot_layouts, self.packed_tables,
                self.table_optimizer)
            params = traverse_util.unflatten_dict(flat, sep="/")
            mask = traverse_util.unflatten_dict(
                {k: k not in self._table_paths
                 and not k.startswith("hot_tables/") for k in flat},
                sep="/")
            self._dense_tx = optax.masked(self.tx, mask)
            state = state.replace(
                params=params,
                target_params=traverse_util.unflatten_dict(tflat, sep="/"),
                opt_state=self._dense_tx.init(params),
                table_moments=moments,
            )
            flat_check = {p: flat[p] for p in self._table_paths}
        else:
            flat_check = {p: flat[p] for p in self._table_paths}
        for path, leaf in flat_check.items():
            assert leaf.shape[0] % n == 0, (
                f"{path}: {leaf.shape[0]} rows do not divide the "
                f"{n} table shards — set table_row_multiple on the model")
        return state

    def _compute_state_shardings(self, sample_batch, seed):
        from jax.sharding import NamedSharding, PartitionSpec

        from pytorchrec_tpu.parallel import DATA_AXIS, MODEL_AXIS

        shape_tree = jax.eval_shape(lambda: self._make_state(sample_batch,
                                                             seed))
        table_paths = self._table_paths
        row_axes = ((DATA_AXIS, MODEL_AXIS) if self.strategy == "grid"
                    else MODEL_AXIS)

        def pspec(path, leaf):
            joined = "/".join(str(getattr(k, "key", k)) for k in path)
            # table leaves appear under params/, target_params/ and
            # table_moments/ — all row-shard over the model axis (the
            # flattened (data, model) grid under strategy="grid"). Match
            # on whole path-segment runs, not substrings: a dense param
            # whose flat path merely CONTAINS a table path (e.g. a future
            # 'i_embedding/embedding_proj') must not be row-sharded
            # (ADVICE r4).
            bounded = "/" + joined + "/"
            # hot/cold: hot fragments + their moments replicate everywhere
            if "/hot_tables/" in bounded or \
                    joined.rsplit("/", 1)[-1].startswith("hot_"):
                return PartitionSpec()
            if any(("/" + tp + "/") in bounded for tp in table_paths):
                ndim = getattr(leaf, "ndim", 1)
                return PartitionSpec(row_axes, *([None] * (ndim - 1)))
            return PartitionSpec()

        self._state_pspecs = jax.tree_util.tree_map_with_path(pspec,
                                                              shape_tree)
        return jax.tree_util.tree_map(
            lambda sp: NamedSharding(self.mesh, sp), self._state_pspecs)

    def _build_train_step(self):
        from jax.sharding import PartitionSpec

        from pytorchrec_tpu.ops.sparse_update import (
            dedup_row_grads,
            sparse_adagrad,
            sparse_lazy_adam,
            sparse_rowwise_adagrad,
        )
        from pytorchrec_tpu.parallel import DATA_AXIS, MODEL_AXIS
        from pytorchrec_tpu.parallel.embedding_engine import (
            all_to_all_lookup,
            all_to_all_rowgrad,
            grid_lookup,
            grid_rowgrad,
        )

        from pytorchrec_tpu.ops.kernels.quantize import table_rounding_salt
        from pytorchrec_tpu.ops.quantized_packed import (
            dequant_packed_rows,
            packed_quantized_update,
            q_row_bytes,
        )

        from pytorchrec_tpu.ops.sparse_update import packed_sparse_update

        model, loss_fn = self.model, self.loss_fn
        dense_tx = self._dense_tx
        table_paths = self._table_paths
        q_info = dict(self._q_info)
        table_optimizer, table_lr = self.table_optimizer, self._table_lr
        update_freq = model.update_freq
        mesh, cap = self.mesh, self.exchange_capacity
        q_full_shapes = dict(getattr(self, "_q_full_shapes", {}))
        inv_data = 1.0 / mesh.shape[DATA_AXIS]
        use_packed = self.packed_tables
        emb_dims = dict(self._table_emb_dims) if use_packed else {}
        _flat = lambda t: traverse_util.flatten_dict(t, sep="/")
        _unflat = lambda f: traverse_util.unflatten_dict(f, sep="/")

        def _with_q_dummies(flat_tree):
            # full-shape dummies for eagerly-declared quantized leaves
            # (never gathered: rows are injected; DCE'd by XLA)
            out = dict(flat_tree)
            for qp, shp in q_full_shapes.items():
                out[qp] = jnp.zeros(shp, flat_tree[qp].dtype)
            return out

        def _out_cols(path):
            # quantized leaves ship only q||scale on the wire; packed f32
            # rows slice to E before the return hop (ICI traffic stays at
            # E while the local gather rides the fast [V/m, W] width —
            # same as the embedding trainer's path 5)
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
            return raw

        grid = self.strategy == "grid"
        table_axes = (DATA_AXIS, MODEL_AXIS)
        hot_layouts = dict(self._hot_layouts)
        hot_perms = {p: jnp.asarray(lo.perm) for p, lo in hot_layouts.items()}

        def _lookup(shard, ids, oc):
            if grid:
                return grid_lookup(shard, ids, table_axes, capacity=cap,
                                   out_cols=oc)
            return all_to_all_lookup(shard, ids, MODEL_AXIS, capacity=cap,
                                     out_cols=oc)

        from pytorchrec_tpu.training.sharded_sparse_trainer import (
            hot_cold_fragment_lookup,
        )

        def _resolve(flat_tree, path, ids, oc):
            """(rows, hot_aux) — hot ids resolve from the replicated
            fragment (no exchange), the cold tail rides the all-to-all;
            non-hot_cold tables pass straight through the engine."""
            layout = hot_layouts.get(path)
            if layout is None:
                shard = jax.lax.stop_gradient(flat_tree[path])
                return _model_rows(path, _lookup(shard, ids, oc)), None
            raw, aux = hot_cold_fragment_lookup(
                flat_tree, path, ids, layout, hot_perms[path], oc, cap,
                stop_grad=True)
            return _model_rows(path, raw), aux

        def _hot_cold_backward(flat, moments, path, aux, g_occ,
                               rows_per_shard, step):
            """Fragment backward (the embedding trainer's hot branch,
            applied to the eval net): cold grads route through the
            all-to-all, hot grads take replicated-discipline updates;
            sentinels drop at each fragment's scatter."""
            layout = hot_layouts[path]
            h = layout.hot_rows
            packed_ids, is_hot = aux
            hot_key = "hot_tables/" + path
            m_axis = mesh.shape[MODEL_AXIS]
            cold_sent = jnp.asarray(m_axis * rows_per_shard,
                                    packed_ids.dtype)
            cold_gids = jnp.where(is_hot, cold_sent, packed_ids - h)
            r_ids, r_rows = all_to_all_rowgrad(
                cold_gids, g_occ, rows_per_shard, MODEL_AXIS, capacity=cap)
            if use_packed:
                c_ids = jax.lax.all_gather(r_ids, DATA_AXIS, tiled=True)
                c_rows = jax.lax.all_gather(r_rows, DATA_AXIS, tiled=True)
                c_offset = jax.lax.axis_index(MODEL_AXIS) * rows_per_shard
                c_local = (c_ids - c_offset).astype(jnp.int32)
                cold_now = jax.lax.stop_gradient(flat[path])[c_local]
                hot_gids = jnp.where(is_hot, packed_ids,
                                     jnp.asarray(h, packed_ids.dtype))
                h_ids = jax.lax.all_gather(
                    hot_gids, DATA_AXIS, tiled=True).astype(jnp.int32)
                h_rows = jax.lax.all_gather(g_occ, DATA_AXIS, tiled=True)
                hot_now = jax.lax.stop_gradient(flat[hot_key])[h_ids]
                flat[path] = packed_sparse_update(
                    flat[path], cold_now, c_local, c_rows, step,
                    lr=table_lr, optimizer=table_optimizer)
                flat[hot_key] = packed_sparse_update(
                    flat[hot_key], hot_now, h_ids, h_rows, step,
                    lr=table_lr, optimizer=table_optimizer)
                return flat, moments
            g = dedup_row_grads(r_ids, r_rows)
            all_ids = jax.lax.all_gather(g.ids, DATA_AXIS, tiled=True)
            all_rows = jax.lax.all_gather(g.rows, DATA_AXIS, tiled=True)
            local_ids = (all_ids - jax.lax.axis_index(MODEL_AXIS)
                         * rows_per_shard).astype(jnp.int32)
            hot_gids = jnp.where(is_hot, packed_ids,
                                 jnp.asarray(h, packed_ids.dtype))
            gh = dedup_row_grads(hot_gids, g_occ, pad_id_base=h)
            h_ids = jax.lax.all_gather(
                gh.ids, DATA_AXIS, tiled=True).astype(jnp.int32)
            h_rows = jax.lax.all_gather(gh.rows, DATA_AXIS, tiled=True)
            if table_optimizer == "adam":
                cold_t, cm, cv = sparse_lazy_adam(
                    flat[path], moments[path]["m"], moments[path]["v"],
                    local_ids, all_rows, step, lr=table_lr)
                hot_t, hm, hv = sparse_lazy_adam(
                    flat[hot_key], moments[path]["hot_m"],
                    moments[path]["hot_v"], h_ids, h_rows, step,
                    lr=table_lr)
                flat[path], flat[hot_key] = cold_t, hot_t
                moments[path] = {"m": cm, "v": cv, "hot_m": hm, "hot_v": hv}
            else:
                upd = (sparse_rowwise_adagrad
                       if table_optimizer == "rowwise_adagrad"
                       else sparse_adagrad)
                cold_t, cacc = upd(flat[path], moments[path]["acc"],
                                   local_ids, all_rows, lr=table_lr)
                hot_t, hacc = upd(flat[hot_key], moments[path]["hot_acc"],
                                  h_ids, h_rows, lr=table_lr)
                flat[path], flat[hot_key] = cold_t, hot_t
                moments[path] = {"acc": cacc, "hot_acc": hacc}
            return flat, moments

        def step_body(state, batch):
            didx = jax.lax.axis_index(DATA_AXIS)
            step_rng = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step), didx)
            flat_p = _flat(state.params)
            flat_t = _flat(state.target_params)
            specs = {
                spec["path"]: spec
                for spec in model.sharded_table_specs(batch).values()
                if spec["path"] in table_paths
            }
            tspecs = {
                spec["path"]: spec
                for spec in model.sharded_target_specs(batch).values()
                if spec["path"] in table_paths
            }
            ids_map, rows_in, trows_in, hot_aux = {}, {}, {}, {}
            for path, spec in specs.items():
                ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                ids_map[path] = ids
                rows_in[path], aux = _resolve(flat_p, path, ids,
                                              _out_cols(path))
                if aux is not None:
                    hot_aux[path] = aux
            for path, spec in tspecs.items():
                tids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                trows_in[path], _ = _resolve(flat_t, path, tids,
                                             _out_cols(path))

            dense_flat = {k: v for k, v in flat_p.items()
                          if k not in table_paths
                          and not k.startswith("hot_tables/")}

            def compute_loss(dense_params, rows):
                full = _with_q_dummies(flat_p)
                full.update(dense_params)
                target_full = _with_q_dummies(flat_t)
                patched = dict(batch)
                for path, spec in specs.items():
                    patched[spec["rows_key"]] = rows[path]
                for path, spec in tspecs.items():
                    patched[spec["rows_key"]] = trows_in[path]
                prediction, target = model.apply(
                    {"params": _unflat(full)},
                    {"params": _unflat(target_full)},
                    patched, train=True, rngs={"dropout": step_rng},
                )
                return loss_fn(prediction, target)

            loss, (dense_grads_flat, row_grads) = jax.value_and_grad(
                compute_loss, argnums=(0, 1)
            )(dense_flat, rows_in)

            loss = jax.lax.pmean(loss, DATA_AXIS)
            dense_grads_flat = jax.lax.pmean(dense_grads_flat, DATA_AXIS)
            nondiff = {k for k in flat_p
                       if k in table_paths or k.startswith("hot_tables/")}
            dense_grads = _unflat({
                **dense_grads_flat,
                **{k: jnp.zeros_like(flat_p[k]) for k in nondiff},
            })
            updates, opt_state = dense_tx.update(
                dense_grads, state.opt_state, state.params)
            # packed table leaves must not see even a p+0 add (it would
            # materialize a fresh [V/m, W] buffer and break the scatter's
            # in-place aliasing with the donated state)
            flat_u = _flat(updates)
            flat = {
                k: (flat_p[k] if (use_packed and k in nondiff)
                    else flat_p[k] + flat_u[k])
                for k in flat_p
            }

            step = state.step + 1
            moments = dict(state.table_moments)
            for path, ids in ids_map.items():
                shard = flat[path]
                rows_per_shard = shard.shape[0]
                g_occ = row_grads[path] * inv_data
                if path in hot_aux:
                    flat, moments = _hot_cold_backward(
                        flat, moments, path, hot_aux[path], g_occ,
                        rows_per_shard, step)
                    continue
                if use_packed and path not in q_info:
                    # ONE packed_sparse_update per shard (the internal
                    # sort/scan dedups; exchange sentinels map >= V/m and
                    # drop at the scatter) — the embedding trainer's
                    # path-5 discipline applied to RL
                    if grid:
                        # unique owner per row over the (data, model)
                        # grid: no data-axis gather, applied once
                        a_ids, a_rows = grid_rowgrad(
                            ids, g_occ, rows_per_shard, table_axes,
                            capacity=cap)
                        offset = (jax.lax.axis_index(table_axes)
                                  * rows_per_shard)
                    else:
                        r_ids, r_pay = all_to_all_rowgrad(
                            ids, g_occ, rows_per_shard, MODEL_AXIS,
                            capacity=cap)
                        a_ids = jax.lax.all_gather(r_ids, DATA_AXIS,
                                                   tiled=True)
                        a_rows = jax.lax.all_gather(r_pay, DATA_AXIS,
                                                    tiled=True)
                        offset = (jax.lax.axis_index(MODEL_AXIS)
                                  * rows_per_shard)
                    local_ids = (a_ids - offset).astype(jnp.int32)
                    rows_now = jax.lax.stop_gradient(shard)[local_ids]
                    flat[path] = packed_sparse_update(
                        shard, rows_now, local_ids, a_rows, step,
                        lr=table_lr, optimizer=table_optimizer)
                    continue
                if grid:
                    # every received row is owned HERE (unique grid
                    # owner): dedup + apply locally, no data-axis gather
                    r_ids, r_rows = grid_rowgrad(
                        ids, g_occ, rows_per_shard, table_axes,
                        capacity=cap)
                    g = dedup_row_grads(r_ids, r_rows)
                    all_ids, all_rows = g.ids, g.rows
                    offset = (jax.lax.axis_index(table_axes)
                              * rows_per_shard)
                else:
                    r_ids, r_rows = all_to_all_rowgrad(
                        ids, g_occ, rows_per_shard, MODEL_AXIS,
                        capacity=cap)
                    # dedup before the data gather; replicated-update
                    # discipline over data (every replica applies the same
                    # update to its copy of the row shard)
                    g = dedup_row_grads(r_ids, r_rows)
                    all_ids = jax.lax.all_gather(g.ids, DATA_AXIS,
                                                 tiled=True)
                    all_rows = jax.lax.all_gather(g.rows, DATA_AXIS,
                                                  tiled=True)
                    offset = (jax.lax.axis_index(MODEL_AXIS)
                              * rows_per_shard)
                local_ids = (all_ids - offset).astype(jnp.int32)
                if path in q_info:
                    qi = q_info[path]
                    salt = table_rounding_salt(state.rng, step, path)
                    rows_now = jax.lax.stop_gradient(shard)[local_ids]
                    flat[path] = packed_quantized_update(
                        shard, rows_now, local_ids, all_rows, None,
                        table_lr, bits=qi["bits"],
                        col_groups=qi["col_groups"], rng_salt=salt,
                        ids_offset=offset)
                elif table_optimizer == "adam":
                    table, m, v = sparse_lazy_adam(
                        shard, moments[path]["m"], moments[path]["v"],
                        local_ids, all_rows, step, lr=table_lr)
                    flat[path] = table
                    moments[path] = {"m": m, "v": v}
                else:
                    upd = (sparse_rowwise_adagrad
                           if table_optimizer == "rowwise_adagrad"
                           else sparse_adagrad)
                    table, acc = upd(shard, moments[path]["acc"], local_ids,
                                     all_rows, lr=table_lr)
                    flat[path] = table
                    moments[path] = {"acc": acc}
            params = _unflat(flat)

            target_params = jax.lax.cond(
                step % update_freq == 0,
                lambda: params,
                lambda: state.target_params,
            )
            new_state = state.replace(
                params=params, opt_state=opt_state, step=step,
                target_params=target_params, table_moments=moments,
            )
            return new_state, loss

        return jax.shard_map(
            step_body,
            mesh=mesh,
            in_specs=(self._state_pspecs, PartitionSpec(DATA_AXIS)),
            out_specs=(self._state_pspecs, PartitionSpec()),
            check_vma=False,
        )

    def _jit_train_step(self, train_step):
        return jax.jit(self._with_precision(train_step), donate_argnums=0)

    def merged_params(self, tree="params"):
        """Host copy of ``state.params`` (or ``target_params``) with every
        hot/cold fragment merged back to its original [V, E] row order and
        packed [V, W] leaves unpacked — the embedding trainer's
        ``merged_params`` contract for RL (export / cross-layout parity)."""
        from pytorchrec_tpu.ops.sparse_update import unpack_table
        from pytorchrec_tpu.parallel.hot_cold import merge_table

        params = jax.device_get(getattr(self.state, tree))
        flat = dict(traverse_util.flatten_dict(params, sep="/"))
        emb_dims = dict(getattr(self, "_table_emb_dims", {}) or {})
        for path, layout in self._hot_layouts.items():
            hot = flat.pop("hot_tables/" + path)
            cold = flat[path]
            if self.packed_tables and path not in self._q_info:
                e = emb_dims[path]
                hot = unpack_table(jnp.asarray(hot), e)
                cold = unpack_table(jnp.asarray(cold), e)
            flat[path] = merge_table(hot, cold, layout)
        if self.packed_tables:
            for path in self._table_paths:
                if path not in self._hot_layouts and path not in self._q_info:
                    flat[path] = unpack_table(jnp.asarray(flat[path]),
                                              emb_dims[path])
        merged = traverse_util.unflatten_dict(flat, sep="/")
        merged.pop("hot_tables", None)
        return merged

    def _build_eval_step(self):
        from jax.sharding import PartitionSpec

        from pytorchrec_tpu.parallel import DATA_AXIS, MODEL_AXIS
        from pytorchrec_tpu.parallel.embedding_engine import (
            all_to_all_lookup,
            grid_lookup,
        )

        from pytorchrec_tpu.ops.quantized_packed import (
            dequant_packed_rows,
            q_row_bytes,
        )

        model = self.model
        table_paths = self._table_paths
        q_info = dict(self._q_info)
        q_full_shapes = dict(getattr(self, "_q_full_shapes", {}))
        mesh, cap = self.mesh, self.exchange_capacity
        emb_dims = (dict(self._table_emb_dims) if self.packed_tables else {})
        grid = self.strategy == "grid"
        hot_layouts = dict(self._hot_layouts)
        hot_perms = {p: jnp.asarray(lo.perm) for p, lo in hot_layouts.items()}
        _flat = lambda t: traverse_util.flatten_dict(t, sep="/")
        _unflat = lambda f: traverse_util.unflatten_dict(f, sep="/")

        def eval_body(params, batch):
            flat_p = _flat(params)
            patched = dict(batch)
            for spec in model.sharded_table_specs(batch).values():
                path = spec["path"]
                if path not in table_paths:
                    continue
                ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
                oc = emb_dims.get(path)  # packed rows slice to E on the wire
                if path in q_info:
                    i = q_info[path]
                    oc = (q_row_bytes(i["emb_size"], i["bits"])
                          + 4 * i["col_groups"])
                layout = hot_layouts.get(path)
                if layout is not None:
                    from pytorchrec_tpu.training.sharded_sparse_trainer \
                        import hot_cold_fragment_lookup

                    raw, _ = hot_cold_fragment_lookup(
                        flat_p, path, ids, layout, hot_perms[path], oc, cap)
                elif grid:
                    raw = grid_lookup(flat_p[path], ids,
                                      (DATA_AXIS, MODEL_AXIS),
                                      capacity=cap, out_cols=oc)
                else:
                    raw = all_to_all_lookup(flat_p[path], ids, MODEL_AXIS,
                                            capacity=cap, out_cols=oc)
                if path in q_info:
                    i = q_info[path]
                    raw = dequant_packed_rows(raw, i["emb_size"], i["bits"],
                                              i["col_groups"])
                patched[spec["rows_key"]] = raw
            full = dict(flat_p)
            for qp, shp in q_full_shapes.items():
                full[qp] = jnp.zeros(shp, flat_p[qp].dtype)
            prediction = model.apply_eval({"params": _unflat(full)}, patched)
            from pytorchrec_tpu.models.base import one_hot_first_target

            target = (one_hot_first_target(prediction)
                      if prediction.ndim == 2 else None)
            return prediction, target

        step = jax.shard_map(
            eval_body,
            mesh=mesh,
            in_specs=(self._state_pspecs.params, PartitionSpec(DATA_AXIS)),
            out_specs=PartitionSpec(DATA_AXIS),
            check_vma=False,
        )
        return jax.jit(step)
