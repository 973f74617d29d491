"""Quantized-embedding trainer: int8/int4 tables, rowwise Adagrad, stochastic
requantization.

DLRM-grade memory/bandwidth recipe: table rows live as ``int8 * f32-scale``
(4x smaller than f32; ``table_bits=4`` packs two 4-bit values per byte for
8x), optimizer state is ONE f32 accumulator per row
(rowwise Adagrad — vs 2 full f32 moment tables for Adam), and updates
re-quantize with stochastic rounding so sub-scale deltas survive in
expectation (ops/kernels/quantize.py).

Step anatomy (one jit, donated):
  1. gather + dequantize the batch's rows (stop-gradient);
  2. run the model with the rows injected through the batch dict
     (``model.ROWS_KEY``) so ``d(loss)/d(rows)`` is exact while the int8
     leaves receive no gradient;
  3. dense params (incl. the f32 linear table) update via masked optax;
  4. dedup row grads, rowwise-Adagrad in f32, stochastically requantize the
     new rows, scatter int8/scale/accumulator.

Models opt in with ``quantized_table_spec(batch)`` (the CTR family with
``quantized_embedding=True`` does).
"""

from __future__ import annotations

import logging
from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp
from flax import traverse_util

from pytorchrec_tpu.ops.kernels.quantize import (
    dequantize_rows,
    id_keyed_rounding_bits,
    quantize_rows_xla,
    table_rounding_salt,
)
from pytorchrec_tpu.ops.sparse_update import dedup_row_grads
from pytorchrec_tpu.training.state import TrainState
from pytorchrec_tpu.training.trainer import Trainer

logger = logging.getLogger(__name__)


@flax.struct.dataclass
class QuantizedTrainState(TrainState):
    table_acc: Dict[str, jnp.ndarray] = None  # rowwise adagrad accumulators [V]


def _flatten(params):
    return traverse_util.flatten_dict(params, sep="/")


def _unflatten(flat):
    return traverse_util.unflatten_dict(flat, sep="/")


class QuantizedEmbeddingTrainer(Trainer):
    def __init__(self, model, mesh=None, table_eps: float = 1e-6,
                 packed_tables: bool = False, table_lr: float = None):
        assert hasattr(model, "quantized_table_spec"), (
            f"{type(model).__name__} does not implement quantized_table_spec()"
        )
        super().__init__(model, mesh=mesh)
        self.table_eps = table_eps
        self._table_lr_override = table_lr
        # packed BYTE rows (ops/quantized_packed.py): q||scale||acc||staging
        # in one [V, W>=64] uint8 leaf — the vectorized row emitter engages
        # on COLUMN count, so 64+ byte columns run ~40x faster per pass than
        # the classic 16-24 byte q/scale/acc rows (RESULTS.md int-dtype
        # width probe); the step drops to 3 fast row passes like the f32
        # packed path, at half its bytes.
        self.packed_tables = packed_tables
        self._packed_specs = {}
        self._table_lr = None

    def compile(self, *args, lr: float = 1e-3, **kwargs):
        super().compile(*args, lr=lr, **kwargs)
        # quantized rows always carry the rowwise-Adagrad accumulator, so
        # the model's measured table_lr_hint applies (sparse_trainer.py::
        # resolve_table_lr — VERDICT r4 #6)
        from pytorchrec_tpu.training.sparse_trainer import resolve_table_lr

        self._table_lr = resolve_table_lr(
            self.model, self._table_lr_override, lr, rowwise_tables=True)

    def _make_state(self, sample_batch, seed) -> QuantizedTrainState:
        root = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(root)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, sample_batch, train=False
        )
        params = variables["params"]
        flat = _flatten(params)

        spec = self.model.quantized_table_spec(sample_batch)
        quantized_leaves = set()
        acc = {}
        for name, table in spec.items():
            assert bool(table.get("packed")) == self.packed_tables, (
                "model table_packed and trainer packed_tables must agree: "
                f"{table.get('packed')} vs {self.packed_tables}"
            )
            assert table["q"] in flat, (table, list(flat))
            quantized_leaves.add(table["q"])
            if table.get("packed"):
                # scale + the rowwise accumulator live INSIDE the packed
                # byte rows; keep a zero-size accumulator so the state tree
                # structure is stable for donation/checkpointing
                # one-element placeholder (NOT zero-size: orbax refuses to
                # serialize empty arrays, which made packed quantized state
                # un-checkpointable — found by the round-4 roundtrip test);
                # the packed path never reads it (acc rides in the rows)
                acc[name] = jnp.zeros((1,), jnp.float32)
                self._packed_specs[name] = dict(
                    emb=table["emb_size"], bits=table.get("bits", 8),
                    col_groups=table.get("col_groups", 1),
                    q_path=table["q"])
            else:
                assert table["scale"] in flat, (table, list(flat))
                quantized_leaves.add(table["scale"])
                acc[name] = jnp.zeros(flat[table["q"]].shape[0], jnp.float32)

        import optax

        mask = _unflatten({k: k not in quantized_leaves for k in flat})
        self._dense_tx = optax.masked(self.tx, mask)

        return QuantizedTrainState(
            params=params,
            opt_state=self._dense_tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
            table_acc=acc,
        )

    def _build_packed_train_step(self):
        """3 fast row passes per table: one uint8 packed-row gather serves
        the forward (dequantized slice) AND the update (scale + acc ride
        along); ops/quantized_packed.py::packed_quantized_update does the
        combined permute + scan dedup + single scatter."""
        from pytorchrec_tpu.ops.quantized_packed import (
            dequant_packed_rows,
            packed_quantized_update,
        )

        model, loss_fn = self.model, self.loss_fn
        table_lr, eps = self._table_lr, self.table_eps
        dense_tx = self._dense_tx
        packed_specs = dict(self._packed_specs)

        def train_step(state: QuantizedTrainState, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)
            spec = model.quantized_table_spec(batch)
            flat_params = _flatten(state.params)

            rows_in, ids_map, packed_rows = {}, {}, {}
            for name, table in spec.items():
                info = packed_specs[name]
                ids = jnp.asarray(table["ids"]).reshape(-1).astype(jnp.int32)
                ids_map[name] = ids
                leaf = jax.lax.stop_gradient(flat_params[table["q"]])
                packed_rows[name] = leaf[ids]
                rows_in[name] = dequant_packed_rows(
                    packed_rows[name], info["emb"], info["bits"],
                    info["col_groups"])

            def compute_loss(params, rows):
                patched_batch = dict(batch)
                for name, table in spec.items():
                    patched_batch[table["rows_key"]] = rows[name]
                prediction, target = model.apply(
                    {"params": params}, patched_batch, train=True,
                    rngs={"dropout": step_rng},
                )
                return loss_fn(prediction, target)

            loss, (dense_grads, row_grads) = jax.value_and_grad(
                compute_loss, argnums=(0, 1), allow_int=True
            )(state.params, rows_in)

            updates, opt_state = dense_tx.update(
                dense_grads, state.opt_state, state.params
            )
            # float0 "updates" (masked int leaves) skip, and the packed u8
            # leaves must not see even a p+0 add (it would break the
            # scatter's donation aliasing)
            params = jax.tree_util.tree_map(
                lambda p, u: p if u.dtype == jax.dtypes.float0 else p + u,
                state.params, updates,
            )

            step = state.step + 1
            flat = dict(_flatten(params))
            for name, table in spec.items():
                info = packed_specs[name]
                # id-keyed rounding bits (layout-independent): the sharded
                # trainer draws the identical stream for the same rows
                salt = table_rounding_salt(state.rng, step, table["q"])
                flat[table["q"]] = packed_quantized_update(
                    flat[table["q"]], packed_rows[name], ids_map[name],
                    row_grads[name], None, table_lr,
                    bits=info["bits"], col_groups=info["col_groups"],
                    eps=eps, rng_salt=salt)

            new_state = state.replace(
                params=_unflatten(flat), opt_state=opt_state, step=step,
                table_acc=state.table_acc,
            )
            return new_state, loss

        return train_step

    def unpacked_quantized(self):
        """Host copies of each packed table's classic (q int8, scale, acc)
        triple — for cross-layout checkpoint interop (load into a
        ``table_packed=False`` model) or offline inspection. Eval/serving
        need no unpacking: the packed model dequantizes from its own leaf."""
        assert self.packed_tables
        from pytorchrec_tpu.ops.quantized_packed import unpack_quantized_table

        flat = _flatten(jax.device_get(self.state.params))
        out = {}
        for name, info in self._packed_specs.items():
            out[name] = unpack_quantized_table(
                jnp.asarray(flat[info["q_path"]]), info["emb"], info["bits"],
                info["col_groups"])
        return out

    def _build_train_step(self):
        if self.packed_tables:
            return self._build_packed_train_step()
        model, loss_fn = self.model, self.loss_fn
        table_lr, eps = self._table_lr, self.table_eps
        dense_tx = self._dense_tx

        def train_step(state: QuantizedTrainState, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)
            spec = model.quantized_table_spec(batch)
            flat_params = _flatten(state.params)

            rows_in = {}
            ids_map = {}
            for name, table in spec.items():
                ids = jnp.asarray(table["ids"]).reshape(-1).astype(jnp.int32)
                ids_map[name] = ids
                q = jax.lax.stop_gradient(flat_params[table["q"]])
                s = jax.lax.stop_gradient(flat_params[table["scale"]])
                rows_in[name] = dequantize_rows(
                    q[ids], s[ids], bits=table.get("bits", 8),
                    col_groups=table.get("col_groups", 1))

            def compute_loss(params, rows):
                patched_batch = dict(batch)
                for name, table in spec.items():
                    patched_batch[table["rows_key"]] = rows[name]
                prediction, target = model.apply(
                    {"params": params}, patched_batch, train=True,
                    rngs={"dropout": step_rng},
                )
                return loss_fn(prediction, target)

            # allow_int: the int8/scale leaves ride inside params but get no
            # gradient (they're stop-gradient'd; their float0 grads are
            # masked out of the dense optimizer)
            loss, (dense_grads, row_grads) = jax.value_and_grad(
                compute_loss, argnums=(0, 1), allow_int=True
            )(state.params, rows_in)

            updates, opt_state = dense_tx.update(
                dense_grads, state.opt_state, state.params
            )
            # int8/scale leaves carry float0 "updates" (masked out) — skip them
            params = jax.tree_util.tree_map(
                lambda p, u: p if u.dtype == jax.dtypes.float0 else p + u,
                state.params, updates,
            )

            step = state.step + 1
            flat = dict(_flatten(params))
            acc_out = dict(state.table_acc)
            for name, table in spec.items():
                g = dedup_row_grads(ids_map[name], row_grads[name])
                acc_rows = acc_out[name][g.ids]
                acc_new = acc_rows + jnp.mean(jnp.square(g.rows), axis=-1)
                delta = table_lr * g.rows / (jnp.sqrt(acc_new)[:, None] + eps)

                q, s = flat[table["q"]], flat[table["scale"]]
                table_bits = table.get("bits", 8)
                col_groups = table.get("col_groups", 1)
                current = dequantize_rows(q[g.ids], s[g.ids], bits=table_bits,
                                          col_groups=col_groups)
                new_rows = current - delta
                # id-keyed rounding bits: keyed by (global row id, column,
                # per-table salt), so the packed and sharded layouts draw
                # the identical rounding stream for the same rows
                salt = table_rounding_salt(state.rng, step, table["q"])
                rng_bits = id_keyed_rounding_bits(
                    g.ids, new_rows.shape[1], salt)
                q_new, s_new = quantize_rows_xla(new_rows, rng_bits=rng_bits,
                                                 bits=table_bits,
                                                 col_groups=col_groups)
                # Padding slots in g alias the last unique id; a scatter-SET
                # with duplicate indices is last-wins-nondeterministic, so a
                # padding slot's stale row could clobber that id's real
                # update. Route padding out of bounds + mode='drop' instead.
                n_rows = acc_out[name].shape[0]
                safe_ids = jnp.where(g.mask > 0, g.ids, n_rows)
                flat[table["q"]] = q.at[safe_ids].set(q_new, mode="drop")
                flat[table["scale"]] = s.at[safe_ids].set(s_new, mode="drop")
                acc_out[name] = acc_out[name].at[g.ids].add(
                    (acc_new - acc_rows) * g.mask
                )

            new_state = state.replace(
                params=_unflatten(flat), opt_state=opt_state, step=step,
                table_acc=acc_out,
            )
            return new_state, loss

        return train_step  # pure; jitted by _get_train_step_fn / scan fusion
