"""CTR model family: LR, FM, DeepFM, DCN-v2, DLRM.

No reference-model counterpart in the zoo (the reference covers MF/NCF/seq/RL
only); these are required configs per BASELINE.json ("LR+FM on MovieLens-100K",
"DeepFM on Criteo", "DCN-v2 on full Criteo"). They share one field-embedding
contract:

* ``sparse_columns``: categorical fields, each embedded to ``emb_size``;
* ``dense_columns``: numeric fields; each gets a learned factor vector scaled
  by the (normalized) value, so FM-style interactions cover dense x sparse;
* fields arriving ``[B]`` are broadcast against candidate fields ``[B, N]``
  (leave-k-out ranking layout, positive first), so every model serves both the
  point-wise CTR task and the ranking task.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity, NumericColumn
from pytorchrec_tpu.models.base import Batch, Prediction, RecModel, label_target, one_hot_first_target
from pytorchrec_tpu.ops import MLP, Embedding
from pytorchrec_tpu.ops.embedding import normal_init
from pytorchrec_tpu.ops.interactions import CrossNetworkV2, dot_interaction, fm_interaction


def _gather_fields(batch: Batch, sparse_columns, dense_columns) -> Tuple[list, list, bool]:
    """Pull field arrays; broadcast [B] fields to [B, N] when any field is 2-D.

    Returns (sparse_ids, dense_values, candidate_mode).
    """
    sparse = [c.get_feature_data(batch) for c in sparse_columns]
    dense = [c.get_feature_data(batch) for c in dense_columns]
    ndims = [a.ndim for a in sparse + dense if a is not None]
    candidate_mode = any(n == 2 for n in ndims)
    if candidate_mode:
        shape2 = next(a.shape for a in sparse + dense if a is not None and a.ndim == 2)
        sparse = [jnp.broadcast_to(a[:, None], shape2) if a.ndim == 1 else a for a in sparse]
        dense = [jnp.broadcast_to(a[:, None], shape2) if a.ndim == 1 else a for a in dense]
    return sparse, dense, candidate_mode


class _CTRBase(RecModel):
    sparse_columns: Sequence[CategoricalColumnWithIdentity] = ()
    dense_columns: Sequence[NumericColumn] = ()
    label_column: CategoricalColumnWithIdentity = None
    emb_size: int = 16
    # one [sum(vocab), E] table indexed by per-field offsets instead of F
    # separate tables: collapses F gathers (and, under the sparse trainer, F
    # sorts/dedups/scatters) into ONE of each — the production layout
    unified_embedding: bool = False
    # int8 rows + per-row f32 scale for the unified table (DLRM-style):
    # 4x less table HBM; train with QuantizedEmbeddingTrainer (rowwise
    # adagrad + stochastic-rounding requantize). Requires unified_embedding.
    quantized_embedding: bool = False
    # MEASURED: the CTR family is insensitive to the rowwise-Adagrad table
    # lr (its quantized quality runs used the shared dense lr and matched
    # f32 — RESULTS.md round 4), so resolve_table_lr neither overrides nor
    # warns for these models (VERDICT r4 #6)
    table_lr_shared_ok: bool = True
    # 8 (default) or 4: int4 packs two values per byte (8x less table HBM
    # than f32, scale = absmax/7) — same trainer, same stochastic rounding
    table_bits: int = 8
    # per-column-group scales: each row quantizes in G independent column
    # groups (scale leaf [V, G] instead of [V]) so one outlier column does
    # not inflate the whole row's quantization step; biggest win at int4
    scale_col_groups: int = 1
    # packed byte-row storage for the quantized table: q||scale||acc in one
    # [V, W>=64] uint8 leaf (ops/quantized_packed.py) so row ops hit the
    # vectorized >=64-column emitter; train with
    # QuantizedEmbeddingTrainer(packed_tables=True)
    table_packed: bool = False
    # round the unified table's rows up so they divide a mesh 'model' axis
    # (the explicit sharded-embedding trainer requires equal row shards;
    # padding rows are never referenced — unified ids stay < sum(vocab))
    table_row_multiple: int = 1

    # batch keys carrying externally-gathered rows — the quantized trainer
    # injects dequantized second-order rows through ROWS_KEY; the explicit
    # sharded trainer injects both tables' rows (gradients then flow to the
    # injected rows, not the table leaves)
    ROWS_KEY = "__rows__unified"
    LIN_ROWS_KEY = "__rows__unified_lin"

    def _field_offsets(self):
        sizes = [c.category_num for c in self.sparse_columns]
        offsets = [0]
        for size in sizes[:-1]:
            offsets.append(offsets[-1] + size)
        m = self.table_row_multiple
        return offsets, -(-sum(sizes) // m) * m

    def _build_embeddings(self):
        if self.quantized_embedding:
            assert self.unified_embedding, "quantized_embedding requires unified_embedding"
        if self.unified_embedding:
            offsets, total = self._field_offsets()
            self._offsets = offsets
            if self.quantized_embedding:
                from pytorchrec_tpu.ops.kernels.quantize import quantize_rows_xla

                assert self.table_bits in (8, 4)
                if self.table_bits == 4:
                    assert self.emb_size % 2 == 0, "int4 packing needs even emb_size"
                stored = self.emb_size if self.table_bits == 8 else self.emb_size // 2
                groups = self.scale_col_groups
                assert self.emb_size % groups == 0, (self.emb_size, groups)

                if self.table_packed:
                    # packed byte rows (ops/quantized_packed.py): q, scale
                    # and the rowwise-Adagrad accumulator live in ONE
                    # [V, W>=64] uint8 leaf so every row op runs on the
                    # vectorized (column-count >= 64) emitter path
                    from pytorchrec_tpu.ops.quantized_packed import (
                        pack_quantized_table,
                    )

                    def _pack_chunk(rng, n):
                        rows = normal_init(rng, (n, self.emb_size))
                        q, s = quantize_rows_xla(rows, bits=self.table_bits,
                                                 col_groups=groups)
                        acc = jnp.zeros((n,), jnp.float32)
                        return pack_quantized_table(
                            q, s, acc, self.emb_size, self.table_bits, groups)

                    def packed_init(rng, shape):
                        # chunked: the normal->quantize->pack chain keeps
                        # several [V, E] f32 temporaries live inside the one
                        # init jit — at 26M rows that transient peak OOMs a
                        # 16 GB chip even though the packed result is 3.3 GB
                        n, chunk = shape[0], 2_000_000
                        if n <= chunk:
                            return _pack_chunk(rng, n)
                        parts = [
                            _pack_chunk(jax.random.fold_in(rng, i),
                                        min(chunk, n - start))
                            for i, start in enumerate(range(0, n, chunk))
                        ]
                        return jnp.concatenate(parts)

                    self.unified_q = self.param("unified_q", packed_init,
                                                (total,))
                else:
                    def q_init(rng, shape):
                        rows = normal_init(rng, (shape[0], self.emb_size))
                        q, _ = quantize_rows_xla(rows, bits=self.table_bits,
                                                 col_groups=groups)
                        return q

                    def s_init(rng, shape):
                        rows = normal_init(rng, (shape[0], self.emb_size))
                        _, scale = quantize_rows_xla(rows, bits=self.table_bits,
                                                     col_groups=groups)
                        return scale

                    # NOTE: q/scale come from independent inits; exact row
                    # values are re-established by the first quantized
                    # update. Kept simple: tables start near-normal(0, 0.01)
                    # either way.
                    self.unified_q = self.param("unified_q", q_init,
                                                (total, stored))
                    scale_shape = (total,) if groups == 1 else (total, groups)
                    self.unified_scale = self.param("unified_scale", s_init,
                                                    scale_shape)
            else:
                self.unified_table = Embedding(total, self.emb_size, name="unified_emb")
            if self._uses_linear:
                self.unified_lin = Embedding(total, 1, name="unified_lin")
        else:
            self.field_embeddings = [
                Embedding(c.category_num, self.emb_size, name=f"emb_{c.feature_name}")
                for c in self.sparse_columns
            ]
            if self._uses_linear:
                self.first_order = [
                    Embedding(c.category_num, 1, name=f"lin_{c.feature_name}")
                    for c in self.sparse_columns
                ]
        if self.dense_columns and self._uses_linear:
            # one factor vector per dense field, scaled by the value
            self.dense_factors = self.param(
                "dense_factors", normal_init, (len(self.dense_columns), self.emb_size)
            )
            self.dense_linear = self.param(
                "dense_linear", normal_init, (len(self.dense_columns),)
            )
        if self._uses_linear:
            self.global_bias = self.param("bias", nn.initializers.zeros, ())

    def _unified_vectors(self, sparse, batch: Batch) -> jnp.ndarray:
        """[..., Fs, E] from the unified table (f32, quantized, or the
        trainer-injected external rows)."""
        ids = self._unified_ids(sparse)
        rows = batch.get(self.ROWS_KEY) if batch is not None else None
        if rows is not None:
            return jnp.reshape(rows, (*ids.shape, self.emb_size))
        if self.quantized_embedding:
            if self.table_packed:
                from pytorchrec_tpu.ops.quantized_packed import (
                    dequant_packed_rows,
                )

                flat = jnp.reshape(self.unified_q[ids.reshape(-1)],
                                   (-1, self.unified_q.shape[1]))
                rows = dequant_packed_rows(flat, self.emb_size,
                                           self.table_bits,
                                           self.scale_col_groups)
                return jnp.reshape(rows, (*ids.shape, self.emb_size))
            from pytorchrec_tpu.ops.kernels.quantize import dequantize_rows

            return dequantize_rows(self.unified_q[ids], self.unified_scale[ids],
                                   bits=self.table_bits,
                                   col_groups=self.scale_col_groups)
        return self.unified_table(ids)

    def _embedded_concat(self, sparse, batch: Batch = None) -> jnp.ndarray:
        """All sparse-field embeddings concatenated: [..., F_sparse * E]."""
        if self.unified_embedding:
            vectors = self._unified_vectors(sparse, batch)  # [..., Fs, E]
            return vectors.reshape(*vectors.shape[:-2], -1)
        return jnp.concatenate(
            [emb(ids) for emb, ids in zip(self.field_embeddings, sparse)], axis=-1
        )

    def _unified_ids(self, sparse) -> jnp.ndarray:
        """Stack per-field ids with their offsets -> [..., F_sparse]."""
        return jnp.stack(
            [ids + off for ids, off in zip(sparse, self._offsets)], axis=-1
        )

    def _field_vectors(self, sparse, dense, batch: Batch = None) -> jnp.ndarray:
        """Embed all fields -> [..., F, E] (sparse then dense fields)."""
        if self.unified_embedding:
            vectors = [self._unified_vectors(sparse, batch)]  # [..., Fs, E]
        else:
            vectors = [
                jnp.stack([emb(ids) for emb, ids in zip(self.field_embeddings, sparse)],
                          axis=-2)
            ]
        for i, values in enumerate(dense):
            vectors.append((values[..., None] * self.dense_factors[i])[..., None, :])
        return jnp.concatenate(vectors, axis=-2)

    def _linear_term(self, sparse, dense, batch: Batch = None) -> jnp.ndarray:
        total = self.global_bias
        if self.unified_embedding:
            ids = self._unified_ids(sparse)
            lin_rows = batch.get(self.LIN_ROWS_KEY) if batch is not None else None
            if lin_rows is not None:
                total = total + jnp.sum(jnp.reshape(lin_rows, ids.shape), axis=-1)
            else:
                total = total + jnp.sum(self.unified_lin(ids)[..., 0], axis=-1)
        else:
            for emb, ids in zip(self.first_order, sparse):
                total = total + emb(ids)[..., 0]
        for i, values in enumerate(dense):
            total = total + values * self.dense_linear[i]
        return total

    def _finish(self, prediction: jnp.ndarray, candidate_mode: bool, batch: Batch) -> Prediction:
        if candidate_mode:
            return prediction, one_hot_first_target(prediction)
        return prediction, label_target(self.label_column, batch)

    # sparse-trainer protocol (training/sparse_trainer.py): table param path
    # -> the batch ids that gather from it. Second-order field tables are
    # only materialized by models that call _field_vectors; the trainer
    # filters paths against the real param tree.
    _uses_field_embeddings = True
    # wide/linear term: DLRM has none — setting False skips the linear
    # tables entirely (no params, no sparse-trainer row passes on them)
    _uses_linear = True

    def quantized_table_spec(self, batch: Batch):
        """Quantized-trainer protocol (training/quantized_trainer.py)."""
        assert self.quantized_embedding
        sparse, _, _ = _gather_fields(batch, self.sparse_columns, self.dense_columns)
        offsets, _ = self._field_offsets()
        ids = jnp.stack([jnp.asarray(i) + off for i, off in zip(sparse, offsets)],
                        axis=-1)
        return {
            "unified": {
                "q": "unified_q",
                "scale": None if self.table_packed else "unified_scale",
                "ids": ids, "rows_key": self.ROWS_KEY, "bits": self.table_bits,
                "col_groups": self.scale_col_groups,
                "packed": self.table_packed, "emb_size": self.emb_size,
            }
        }

    def sharded_table_specs(self, batch: Batch):
        """Explicit sharded-table protocol
        (training/sharded_sparse_trainer.py). Requires the unified layout
        (one offset-indexed table = one exchange per step instead of F).

        Quantized tables shard too (VERDICT r3 #1): with
        ``quantized_embedding=True`` the spec carries a ``"quantized"``
        block and points at the packed byte-row leaf ``unified_q``
        (``table_packed=True`` required — the per-shard update needs the
        scale + accumulator riding in the row). The exchange then ships
        int8 rows + scales on the lookup return hop (~4x fewer bytes than
        f32 E-columns; 8x at int4)."""
        assert self.unified_embedding, (
            "explicit sharding needs unified_embedding=True"
        )
        sparse, _, _ = _gather_fields(batch, self.sparse_columns, self.dense_columns)
        ids = self._unified_ids_from(sparse)
        specs = {}
        if self._uses_linear:
            specs["unified_lin"] = {"path": "unified_lin/embedding", "ids": ids,
                                    "rows_key": self.LIN_ROWS_KEY}
        if self._uses_field_embeddings:
            if self.quantized_embedding:
                assert self.table_packed, (
                    "sharded quantized tables need table_packed=True "
                    "(q||scale||acc byte rows; the owner-shard update reads "
                    "them in-row)"
                )
                specs["unified"] = {
                    "path": "unified_q", "ids": ids, "rows_key": self.ROWS_KEY,
                    "quantized": {"bits": self.table_bits,
                                  "col_groups": self.scale_col_groups,
                                  "emb_size": self.emb_size},
                }
            else:
                specs["unified"] = {"path": "unified_emb/embedding", "ids": ids,
                                    "rows_key": self.ROWS_KEY}
        return specs

    def _unified_ids_from(self, sparse) -> jnp.ndarray:
        """_unified_ids without setup(): usable outside apply()."""
        offsets, _ = self._field_offsets()
        return jnp.stack(
            [jnp.asarray(i) + off for i, off in zip(sparse, offsets)], axis=-1
        )

    def sparse_table_ids(self, batch: Batch):
        if self.unified_embedding:
            offsets, _ = self._field_offsets()
            parts = []
            for column, off in zip(self.sparse_columns, offsets):
                ids = column.get_feature_data(batch)
                if ids is not None:
                    parts.append((jnp.asarray(ids) + off).reshape(-1))
            unified = jnp.concatenate(parts) if parts else jnp.zeros((0,), jnp.int32)
            ids_map = {}
            if self._uses_linear:
                ids_map["unified_lin/embedding"] = unified
            if self._uses_field_embeddings:
                ids_map["unified_emb/embedding"] = unified
            return ids_map
        ids_map = {}
        for column in self.sparse_columns:
            ids = column.get_feature_data(batch)
            if ids is None:
                continue
            if self._uses_linear:
                ids_map[f"lin_{column.feature_name}/embedding"] = ids
            if self._uses_field_embeddings:
                ids_map[f"emb_{column.feature_name}/embedding"] = ids
        return ids_map


class LR(_CTRBase):
    """Logistic regression: first-order terms only (logit output)."""

    _uses_field_embeddings = False

    def setup(self):
        self._build_embeddings()

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        sparse, dense, candidate_mode = _gather_fields(batch, self.sparse_columns, self.dense_columns)
        prediction = self._linear_term(sparse, dense, batch)
        return self._finish(prediction, candidate_mode, batch)


class FM(_CTRBase):
    """Factorization machine: first-order + pairwise second-order terms."""

    def setup(self):
        self._build_embeddings()

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        sparse, dense, candidate_mode = _gather_fields(batch, self.sparse_columns, self.dense_columns)
        vectors = self._field_vectors(sparse, dense, batch)
        prediction = self._linear_term(sparse, dense, batch) + fm_interaction(vectors)
        return self._finish(prediction, candidate_mode, batch)


class DeepFM(_CTRBase):
    """FM + deep MLP tower on the concatenated field embeddings (shared
    embeddings between the FM and deep parts, as in the original paper)."""

    layers: Sequence[int] = (256, 128)
    dropout: float = 0.0

    def setup(self):
        self._build_embeddings()
        self.deep = MLP(tuple(self.layers), activation="relu", dropout=self.dropout)
        self.deep_head = nn.Dense(1, use_bias=False, kernel_init=normal_init)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        sparse, dense, candidate_mode = _gather_fields(batch, self.sparse_columns, self.dense_columns)
        vectors = self._field_vectors(sparse, dense, batch)  # [..., F, E]
        fm_term = self._linear_term(sparse, dense, batch) + fm_interaction(vectors)
        flat = vectors.reshape(*vectors.shape[:-2], -1)  # [..., F*E]
        deep_term = self.deep_head(self.deep(flat, train=train))[..., 0]
        prediction = fm_term + deep_term
        return self._finish(prediction, candidate_mode, batch)


class DLRM(_CTRBase):
    """DLRM: bottom MLP over dense features -> one extra "field" vector,
    pairwise dot interaction across all field vectors (Gram lower-triangle,
    one MXU matmul — ops/interactions.py::dot_interaction), top MLP over
    [dense vector ++ interactions].

    The canonical production CTR architecture (Naumov et al., arXiv
    1906.00091). No reference counterpart; shares _CTRBase's embedding
    layouts (unified / quantized / packed / sharded protocols) so every
    trainer path serves it unchanged.
    """

    bottom_layers: Sequence[int] = (64,)   # last entry is projected to emb_size
    top_layers: Sequence[int] = (256, 128)
    dropout: float = 0.0
    self_interaction: bool = False
    _uses_linear = False  # DLRM has no wide/linear term

    def setup(self):
        self._build_embeddings()
        if self.dense_columns:
            self.bottom = MLP(tuple(self.bottom_layers), activation="relu",
                              dropout=self.dropout)
            self.bottom_proj = nn.Dense(self.emb_size, kernel_init=normal_init)
        self.top = MLP(tuple(self.top_layers), activation="relu",
                       dropout=self.dropout)
        self.top_head = nn.Dense(1, use_bias=True, kernel_init=normal_init,
                                 bias_init=nn.initializers.zeros)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        sparse, dense, candidate_mode = _gather_fields(
            batch, self.sparse_columns, self.dense_columns)
        if self.unified_embedding:
            vectors = self._unified_vectors(sparse, batch)  # [..., Fs, E]
        else:
            vectors = jnp.stack(
                [emb(ids) for emb, ids in zip(self.field_embeddings, sparse)],
                axis=-2)
        top_in = []
        if dense:
            dense_x = jnp.stack(dense, axis=-1)  # [..., F_dense]
            dense_vec = self.bottom_proj(self.bottom(dense_x, train=train))
            vectors = jnp.concatenate([vectors, dense_vec[..., None, :]], axis=-2)
            top_in.append(dense_vec)
        top_in.append(dot_interaction(vectors, self.self_interaction))
        prediction = self.top_head(
            self.top(jnp.concatenate(top_in, axis=-1), train=train))[..., 0]
        return self._finish(prediction, candidate_mode, batch)


class DCNv2(_CTRBase):
    """DCN-v2: cross network + deep network in parallel over
    [field embeddings ++ dense values], fused linear head."""

    num_cross_layers: int = 3
    layers: Sequence[int] = (256, 128)
    dropout: float = 0.0

    def setup(self):
        self._build_embeddings()
        self.cross = CrossNetworkV2(num_layers=self.num_cross_layers)
        self.deep = MLP(tuple(self.layers), activation="relu", dropout=self.dropout)
        self.head = nn.Dense(1, use_bias=True, kernel_init=normal_init, bias_init=normal_init)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        sparse, dense, candidate_mode = _gather_fields(batch, self.sparse_columns, self.dense_columns)
        x0_parts = [self._embedded_concat(sparse, batch)]
        if dense:
            x0_parts.append(jnp.stack(dense, axis=-1))
        x0 = jnp.concatenate(x0_parts, axis=-1)
        cross_out = self.cross(x0)
        deep_out = self.deep(x0, train=train)
        prediction = self.head(jnp.concatenate([cross_out, deep_out], axis=-1))[..., 0]
        return self._finish(prediction, candidate_mode, batch)
