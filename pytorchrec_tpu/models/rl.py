"""Value-based RL ranking family: DQN, DEERS, LSRL and the LSRL ablations.

Capability parity with reference model/IValueRLModel.py:31-88 (IQNet with
``forward`` / ``next_forward``), model/DQN.py:12-109, model/DEERS.py:13-160,
model/LSRL.py:16-186 and model/LSRL_{L,PS,LPS,PSNS}.py.

TPU-first re-design:

* the twin eval/target networks are ONE flax module with two parameter trees;
  the RL trainer keeps ``target_params`` in the train state and swaps
  ``target := params`` every ``update_freq`` steps (the reference deep-copies
  state dicts, IValueRLModel.py:71-72);
* the Bellman target is computed under ``stop_gradient`` (the reference's
  ``torch.no_grad`` block, DQN.py:97-100);
* GRU state encoders use the masked-scan GRU — no sort/pack/unsort.

Known divergence, by design: the reference DEERS/LSRL forward mixes the
*sorted* GRU hidden state with *unsorted* item vectors before the per-stream
MLP and only unsorts afterwards (DEERS.py:73-81), silently mis-pairing rows
whenever the length sort permutes the batch. The masked GRU never permutes
rows, so this bug is fixed rather than reproduced.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
from pytorchrec_tpu.models.base import Batch
from pytorchrec_tpu.ops import Embedding, MaskedGRU
from pytorchrec_tpu.ops.embedding import normal_init
from pytorchrec_tpu.ops.mlp import MLP, Dense


class QNet(nn.Module):
    """Interface: Q(s, a) over current state and over next state / candidates."""

    def forward(self, batch: Batch, train: bool = False) -> jnp.ndarray:  # pragma: no cover
        raise NotImplementedError

    def next_forward(self, batch: Batch, train: bool = False) -> jnp.ndarray:  # pragma: no cover
        raise NotImplementedError

    def __call__(self, batch: Batch, train: bool = False) -> jnp.ndarray:
        # default method so .init() touches every parameter via forward
        return self.forward(batch, train=train)


class DQNQNet(QNet):
    """GRU state encoder + dot-product Q (reference model/DQN.py:12-93)."""

    iid_column: CategoricalColumnWithIdentity
    state_column: CategoricalColumnWithIdentity
    state_len_column: CategoricalColumnWithIdentity
    next_state_column: CategoricalColumnWithIdentity
    next_state_len_column: CategoricalColumnWithIdentity
    rl_sample_column: CategoricalColumnWithIdentity
    emb_size: int = 64
    hidden_size: int = 64
    # round the item table's rows so they divide a mesh 'model' axis
    table_row_multiple: int = 1
    # item table as int8/int4 packed byte rows (same contracts as DIN);
    # the target net's in-module reads dequantize on the fly
    quantized_table: bool = False
    table_bits: int = 8
    scale_col_groups: int = 1

    # sparse/sharded injection for the EVAL net's forward gathers only
    # (candidates + state history, one flattened block [B*N | B*S]); the
    # target net's next_forward gathers stay in-module — its reads are
    # under stop_gradient, so no rows need routing back (VERDICT r3 #2)
    I_ROWS_KEY = "__rows__dqn_i"
    # TARGET-net injection (sharded RL trainer): next_forward's gathers
    # ([B*N next candidates | B*S next state]) hoisted the same way, read
    # from the TARGET table shards
    N_ROWS_KEY = "__rows__dqn_i_next"

    def setup(self):
        m = self.table_row_multiple
        rows = -(-self.iid_column.category_num // m) * m
        if self.quantized_table:
            from pytorchrec_tpu.ops.quantized_packed import packed_table_init

            self.i_q = self.param(
                "i_q",
                packed_table_init(self.emb_size, self.table_bits,
                                  self.scale_col_groups),
                (rows,))
        else:
            self.i_embedding = Embedding(rows, self.emb_size)
        self.rnn = MaskedGRU(hidden_size=self.hidden_size)
        self.out = nn.Dense(self.emb_size, kernel_init=normal_init, bias_init=normal_init)

    def _item_vec(self, ids):
        if self.quantized_table:
            from pytorchrec_tpu.ops.quantized_packed import (
                packed_gather_dequant,
            )

            return packed_gather_dequant(self.i_q, ids, self.emb_size,
                                         self.table_bits,
                                         self.scale_col_groups)
        return self.i_embedding(ids)

    def _encode_vectors(self, state_vectors, state_len):
        return self.out(self.rnn(state_vectors, state_len))  # [B, E]

    def _encode(self, state_ids, state_len):
        return self._encode_vectors(self._item_vec(state_ids), state_len)

    def forward(self, batch: Batch, train: bool = False) -> jnp.ndarray:
        i_ids = self.iid_column.get_feature_data(batch)  # [B] or [B, N]
        state_ids = self.state_column.get_feature_data(batch)
        state_len = self.state_len_column.get_feature_data(batch)
        squeeze = i_ids.ndim == 1
        i2 = i_ids[:, None] if squeeze else i_ids
        rows = batch.get(self.I_ROWS_KEY)
        if rows is not None:
            r = jnp.reshape(rows, (-1, self.emb_size))
            n_cand = i2.shape[0] * i2.shape[1]
            i_vectors = r[:n_cand].reshape(*i2.shape, self.emb_size)
            state_vectors = r[n_cand:].reshape(*state_ids.shape, self.emb_size)
        else:
            i_vectors = self._item_vec(i2)
            state_vectors = self._item_vec(state_ids)
        rnn_vector = self._encode_vectors(state_vectors, state_len)
        q = jnp.sum(rnn_vector[:, None, :] * i_vectors, axis=-1)  # [B, N]
        return q[:, 0] if squeeze else q

    def _forward_gather_ids(self, batch: Batch) -> jnp.ndarray:
        i_ids = jnp.asarray(self.iid_column.get_feature_data(batch))
        if i_ids.ndim == 1:
            i_ids = i_ids[:, None]
        state_ids = jnp.asarray(self.state_column.get_feature_data(batch))
        return jnp.concatenate([i_ids.reshape(-1), state_ids.reshape(-1)])

    def sparse_table_ids(self, batch: Batch):
        """Sparse-trainer protocol (training/rl_trainer.py::SparseRLTrainer):
        the EVAL net's forward gathers on the item table."""
        return {"i_embedding/embedding": self._forward_gather_ids(batch)}

    def sharded_table_specs(self, batch: Batch):
        i_spec = {"ids": self._forward_gather_ids(batch),
                  "rows_key": self.I_ROWS_KEY}
        if self.quantized_table:
            i_spec["path"] = "i_q"
            i_spec["quantized"] = {"emb_size": self.emb_size,
                                   "bits": self.table_bits,
                                   "col_groups": self.scale_col_groups}
        else:
            i_spec["path"] = "i_embedding/embedding"
        return {"i": i_spec}

    def next_forward(self, batch: Batch, train: bool = False) -> jnp.ndarray:
        next_i_ids = self.rl_sample_column.get_feature_data(batch)  # [B, N]
        next_state_ids = self.next_state_column.get_feature_data(batch)
        next_state_len = self.next_state_len_column.get_feature_data(batch)
        rows = batch.get(self.N_ROWS_KEY)
        if rows is not None:
            r = jnp.reshape(rows, (-1, self.emb_size))
            n_cand = next_i_ids.shape[0] * next_i_ids.shape[1]
            next_i_vectors = r[:n_cand].reshape(*next_i_ids.shape,
                                                self.emb_size)
            state_vectors = r[n_cand:].reshape(*next_state_ids.shape,
                                               self.emb_size)
            rnn_vector = self._encode_vectors(state_vectors, next_state_len)
        else:
            rnn_vector = self._encode(next_state_ids, next_state_len)
            next_i_vectors = self._item_vec(next_i_ids)
        return jnp.sum(rnn_vector[:, None, :] * next_i_vectors, axis=-1)  # [B, N]

    def _next_gather_ids(self, batch: Batch) -> jnp.ndarray:
        next_i = jnp.asarray(self.rl_sample_column.get_feature_data(batch))
        next_s = jnp.asarray(self.next_state_column.get_feature_data(batch))
        return jnp.concatenate([next_i.reshape(-1), next_s.reshape(-1)])

    def sharded_target_specs(self, batch: Batch):
        """TARGET-net twin of sharded_table_specs: same table paths, the
        NEXT-step gather ids, distinct injection keys — the sharded RL
        trainer looks these up from the TARGET shards (read-only)."""
        spec = dict(self.sharded_table_specs(batch)["i"])
        spec["ids"] = self._next_gather_ids(batch)
        spec["rows_key"] = self.N_ROWS_KEY
        return {"i": spec}


class BranchQNet(QNet):
    """Composable long / pos-short / neg-short Q-network.

    One implementation covers DEERSQNet (pos+neg, DEERS.py:13-105), LSRLQNet
    (long+pos+neg, LSRL.py:16-121), and the four LSRL ablations (branch
    subsets, LSRL_*.py) — branch toggles select the architecture.
    """

    iid_column: CategoricalColumnWithIdentity
    pos_state_column: CategoricalColumnWithIdentity
    pos_state_len_column: CategoricalColumnWithIdentity
    pos_next_state_column: CategoricalColumnWithIdentity
    pos_next_state_len_column: CategoricalColumnWithIdentity
    rl_sample_column: CategoricalColumnWithIdentity
    uid_column: Optional[CategoricalColumnWithIdentity] = None
    neg_state_column: Optional[CategoricalColumnWithIdentity] = None
    neg_state_len_column: Optional[CategoricalColumnWithIdentity] = None
    neg_next_state_column: Optional[CategoricalColumnWithIdentity] = None
    neg_next_state_len_column: Optional[CategoricalColumnWithIdentity] = None
    use_long: bool = False
    use_pos: bool = True
    use_neg: bool = False
    emb_size: int = 64
    hidden_size: int = 64
    dropout: float = 0.2
    # round table rows so they divide a mesh 'model' axis
    table_row_multiple: int = 1
    # item table as int8/int4 packed byte rows (same contracts as DIN)
    quantized_table: bool = False
    table_bits: int = 8
    scale_col_groups: int = 1

    # sparse/sharded injection for the EVAL net's forward gathers only
    # (candidates + active-branch state histories in one flattened block
    # [B*N | B*S_pos | B*S_neg]); next_forward (target net) gathers stay
    # in-module (stop_gradient reads)
    I_ROWS_KEY = "__rows__branchq_i"
    U_ROWS_KEY = "__rows__branchq_u"
    # TARGET-net injection keys (next-step gathers from the target shards)
    N_I_ROWS_KEY = "__rows__branchq_i_next"
    N_U_ROWS_KEY = "__rows__branchq_u_next"

    def setup(self):
        m = self.table_row_multiple
        ni = -(-self.iid_column.category_num // m) * m
        if self.quantized_table:
            from pytorchrec_tpu.ops.quantized_packed import packed_table_init

            self.i_q = self.param(
                "i_q",
                packed_table_init(self.emb_size, self.table_bits,
                                  self.scale_col_groups),
                (ni,))
        else:
            self.i_embeddings = Embedding(ni, self.emb_size)
        n_branches = 0
        if self.use_long:
            assert self.uid_column is not None
            self.u_embeddings = Embedding(
                -(-self.uid_column.category_num // m) * m, self.emb_size)
            self.long_mlp = MLP((self.emb_size,) * 3, activation="relu", dropout=self.dropout)
            n_branches += 1
        if self.use_pos:
            self.pos_rnn = MaskedGRU(hidden_size=self.hidden_size)
            self.pos_mlp = MLP((self.emb_size,) * 3, activation="relu", dropout=self.dropout)
            n_branches += 1
        if self.use_neg:
            self.neg_rnn = MaskedGRU(hidden_size=self.hidden_size)
            self.neg_mlp = MLP((self.emb_size,) * 3, activation="relu", dropout=self.dropout)
            n_branches += 1
        assert n_branches > 0, "at least one branch required"
        self.fuse = Dense(self.emb_size, activation="relu", dropout=self.dropout)
        self.prediction = nn.Dense(1, use_bias=False, kernel_init=normal_init)

    def _item_vec(self, ids):
        if self.quantized_table:
            from pytorchrec_tpu.ops.quantized_packed import (
                packed_gather_dequant,
            )

            return packed_gather_dequant(self.i_q, ids, self.emb_size,
                                         self.table_bits,
                                         self.scale_col_groups)
        return self.i_embeddings(ids)

    def _score(self, batch: Batch, i_ids, pos_cols, neg_cols, train: bool,
               rows_key=None, u_rows_key=None) -> jnp.ndarray:
        squeeze = i_ids.ndim == 1
        if squeeze:
            i_ids = i_ids[:, None]

        pos_ids = pos_cols[0].get_feature_data(batch) if self.use_pos else None
        neg_ids = neg_cols[0].get_feature_data(batch) if self.use_neg else None
        i_rows = batch.get(rows_key) if rows_key else None
        if i_rows is not None:
            # one injected block, split in _forward_gather_ids order
            r = jnp.reshape(i_rows, (-1, self.emb_size))
            off = i_ids.shape[0] * i_ids.shape[1]
            i_vectors = r[:off].reshape(*i_ids.shape, self.emb_size)
            if self.use_pos:
                n = pos_ids.shape[0] * pos_ids.shape[1]
                pos_vectors = r[off:off + n].reshape(*pos_ids.shape,
                                                     self.emb_size)
                off += n
            if self.use_neg:
                n = neg_ids.shape[0] * neg_ids.shape[1]
                neg_vectors = r[off:off + n].reshape(*neg_ids.shape,
                                                     self.emb_size)
        else:
            i_vectors = self._item_vec(i_ids)  # [B, N, E]
            if self.use_pos:
                pos_vectors = self._item_vec(pos_ids)
            if self.use_neg:
                neg_vectors = self._item_vec(neg_ids)

        branches = []
        if self.use_long:
            u_ids = self.uid_column.get_feature_data(batch)  # [B]
            u_rows = batch.get(u_rows_key) if u_rows_key else None
            u_vec = (jnp.reshape(u_rows, (*u_ids.shape, self.emb_size))
                     if u_rows is not None else self.u_embeddings(u_ids))
            u_vectors = jnp.broadcast_to(u_vec[:, None, :], i_vectors.shape)
            branches.append(self.long_mlp(
                jnp.concatenate([u_vectors, i_vectors], axis=-1), train=train))
        if self.use_pos:
            state_len = pos_cols[1].get_feature_data(batch)
            hidden = self.pos_rnn(pos_vectors, state_len)  # [B, H]
            hidden = jnp.broadcast_to(hidden[:, None, :], (*i_vectors.shape[:2], hidden.shape[-1]))
            branches.append(self.pos_mlp(
                jnp.concatenate([hidden, i_vectors], axis=-1), train=train))
        if self.use_neg:
            state_len = neg_cols[1].get_feature_data(batch)
            hidden = self.neg_rnn(neg_vectors, state_len)  # [B, H]
            hidden = jnp.broadcast_to(hidden[:, None, :], (*i_vectors.shape[:2], hidden.shape[-1]))
            branches.append(self.neg_mlp(
                jnp.concatenate([hidden, i_vectors], axis=-1), train=train))

        fused = self.fuse(jnp.concatenate(branches, axis=-1), train=train)
        prediction = self.prediction(fused)[..., 0]  # [B, N]
        return prediction[:, 0] if squeeze else prediction

    def forward(self, batch: Batch, train: bool = False) -> jnp.ndarray:
        i_ids = self.iid_column.get_feature_data(batch)
        return self._score(
            batch, i_ids,
            pos_cols=(self.pos_state_column, self.pos_state_len_column),
            neg_cols=(self.neg_state_column, self.neg_state_len_column),
            train=train, rows_key=self.I_ROWS_KEY,
            u_rows_key=self.U_ROWS_KEY,
        )

    def _forward_gather_ids(self, batch: Batch) -> jnp.ndarray:
        i_ids = jnp.asarray(self.iid_column.get_feature_data(batch))
        if i_ids.ndim == 1:
            i_ids = i_ids[:, None]
        parts = [i_ids.reshape(-1)]
        if self.use_pos:
            parts.append(jnp.asarray(
                self.pos_state_column.get_feature_data(batch)).reshape(-1))
        if self.use_neg:
            parts.append(jnp.asarray(
                self.neg_state_column.get_feature_data(batch)).reshape(-1))
        return jnp.concatenate(parts)

    def sparse_table_ids(self, batch: Batch):
        ids = {"i_embeddings/embedding": self._forward_gather_ids(batch)}
        if self.use_long:
            ids["u_embeddings/embedding"] = \
                self.uid_column.get_feature_data(batch)
        return ids

    def sharded_table_specs(self, batch: Batch):
        i_spec = {"ids": self._forward_gather_ids(batch),
                  "rows_key": self.I_ROWS_KEY}
        if self.quantized_table:
            i_spec["path"] = "i_q"
            i_spec["quantized"] = {"emb_size": self.emb_size,
                                   "bits": self.table_bits,
                                   "col_groups": self.scale_col_groups}
        else:
            i_spec["path"] = "i_embeddings/embedding"
        specs = {"i": i_spec}
        if self.use_long:
            specs["u"] = {"path": "u_embeddings/embedding",
                          "ids": self.uid_column.get_feature_data(batch),
                          "rows_key": self.U_ROWS_KEY}
        return specs

    def next_forward(self, batch: Batch, train: bool = False) -> jnp.ndarray:
        next_i_ids = self.rl_sample_column.get_feature_data(batch)  # [B, N]
        return self._score(
            batch, next_i_ids,
            pos_cols=(self.pos_next_state_column, self.pos_next_state_len_column),
            neg_cols=(self.neg_next_state_column, self.neg_next_state_len_column),
            train=train, rows_key=self.N_I_ROWS_KEY,
            u_rows_key=self.N_U_ROWS_KEY,
        )

    def _next_gather_ids(self, batch: Batch) -> jnp.ndarray:
        next_i = jnp.asarray(self.rl_sample_column.get_feature_data(batch))
        if next_i.ndim == 1:
            next_i = next_i[:, None]
        parts = [next_i.reshape(-1)]
        if self.use_pos:
            parts.append(jnp.asarray(
                self.pos_next_state_column.get_feature_data(batch)
            ).reshape(-1))
        if self.use_neg:
            parts.append(jnp.asarray(
                self.neg_next_state_column.get_feature_data(batch)
            ).reshape(-1))
        return jnp.concatenate(parts)

    def sharded_target_specs(self, batch: Batch):
        """TARGET-net twin of sharded_table_specs (next-step gathers)."""
        specs = {}
        base = self.sharded_table_specs(batch)
        i_spec = dict(base["i"])
        i_spec["ids"] = self._next_gather_ids(batch)
        i_spec["rows_key"] = self.N_I_ROWS_KEY
        specs["i"] = i_spec
        if self.use_long:
            u_spec = dict(base["u"])
            u_spec["rows_key"] = self.N_U_ROWS_KEY  # same uid gather
            specs["u"] = u_spec
        return specs


class ValueRLModel:
    """DQN-family wrapper: one QNet, two parameter trees, Bellman targets.

    Mirrors reference model/IValueRLModel.py:50-88 + model/DQN.py:96-101 in a
    functional form the RL trainer can jit:
    ``prediction = Q(s, a; params)``,
    ``target = stop_grad(reward + gamma * max_a' Q'(s', a'; target_params))``.
    """

    def __init__(self, qnet: QNet, reward_column: CategoricalColumnWithIdentity,
                 gamma: float = 0.9, update_freq: int = 10):
        self.qnet = qnet
        self.reward_column = reward_column
        self.gamma = float(gamma)
        self.update_freq = int(update_freq)

    def init(self, rng, batch):
        variables = self.qnet.init(rng, batch, method=self.qnet.forward)
        return variables

    def apply(self, variables, target_variables, batch, train: bool = False, rngs=None):
        main_q = self.qnet.apply(variables, batch, train=train, rngs=rngs,
                                 method=self.qnet.forward)
        reward = jnp.asarray(self.reward_column.get_feature_data(batch)).astype(jnp.float32)
        next_q = self.qnet.apply(target_variables, batch, train=False,
                                 method=self.qnet.next_forward)
        target_q = jax.lax.stop_gradient(reward + self.gamma * jnp.max(next_q, axis=-1))
        return main_q, target_q

    def apply_eval(self, variables, batch):
        """Candidate scoring for dev/test ranking evaluation."""
        return self.qnet.apply(variables, batch, train=False, method=self.qnet.forward)

    # sparse/sharded table protocols delegate to the QNet (eval-net forward
    # gathers only; the target net's reads are under stop_gradient)
    def sparse_table_ids(self, batch: Batch):
        return self.qnet.sparse_table_ids(batch)

    def sharded_table_specs(self, batch: Batch):
        return self.qnet.sharded_table_specs(batch)

    def sharded_target_specs(self, batch: Batch):
        return self.qnet.sharded_target_specs(batch)

    @staticmethod
    def load_pretrain_embedding(params, weight_file: str,
                                source_path: str = "i_embeddings/embedding",
                                target_path: str = "i_embedding/embedding"):
        """Warm-start the QNet's item table from a pretrained checkpoint
        (e.g. a FunkSVD run's ``save_weights`` msgpack).

        The reference declares this hook but its body is dead code
        (DQN.py:89-92: the torch.load logic is commented out, the method is
        ``pass``); here it works. Returns a new params pytree with the
        target table replaced (shape-checked).
        """
        from flax import serialization, traverse_util

        with open(weight_file, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        source = traverse_util.flatten_dict(raw, sep="/")
        assert source_path in source, (source_path, sorted(source))
        table = source[source_path]

        flat = traverse_util.flatten_dict(params, sep="/")
        assert target_path in flat, (target_path, sorted(flat))
        assert flat[target_path].shape == table.shape, (
            flat[target_path].shape, table.shape,
        )
        flat[target_path] = jnp.asarray(table)
        return traverse_util.unflatten_dict(flat, sep="/")


def make_deers_qnet(**kwargs) -> BranchQNet:
    return BranchQNet(use_long=False, use_pos=True, use_neg=True, **kwargs)


def make_lsrl_qnet(**kwargs) -> BranchQNet:
    return BranchQNet(use_long=True, use_pos=True, use_neg=True, **kwargs)


def make_lsrl_l_qnet(**kwargs) -> BranchQNet:
    return BranchQNet(use_long=True, use_pos=False, use_neg=False, **kwargs)


def make_lsrl_ps_qnet(**kwargs) -> BranchQNet:
    return BranchQNet(use_long=False, use_pos=True, use_neg=False, **kwargs)


def make_lsrl_lps_qnet(**kwargs) -> BranchQNet:
    return BranchQNet(use_long=True, use_pos=True, use_neg=False, **kwargs)


def make_lsrl_psns_qnet(**kwargs) -> BranchQNet:
    return BranchQNet(use_long=False, use_pos=True, use_neg=True, **kwargs)
