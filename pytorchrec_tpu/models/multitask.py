"""Multi-task CTR family: SharedBottom, MMoE, PLE, ESMM.

The production multi-objective ranking architectures (click + conversion +
dwell ... one forward, T heads):

* ``SharedBottom`` — one shared MLP trunk, per-task towers (Caruana 1997).
* ``MMoE`` — Multi-gate Mixture-of-Experts (Ma et al., KDD 2018): K expert
  MLPs, a per-task softmax gate mixes them; experts run as ONE batched
  einsum over the K axis (MXU-batched, not a Python loop over experts).
* ``PLE`` — Progressive Layered Extraction (Tang et al., RecSys 2020): CGC
  levels with task-specific + shared expert groups, task gates reading own
  + shared experts, shared gate reading all.
* ``ESMM`` — Entire-Space Multi-task Model (Ma et al., SIGIR 2018): CTR and
  CVR towers; pCTCVR = pCTR x pCVR supervises the conversion head on the
  full impression space (fixes CVR sample-selection bias).

No reference counterpart (the reference zoo is single-objective); these are
required for production parity of a rec framework. All subclass _CTRBase, so
the unified / quantized / packed / sharded table machinery and every trainer
protocol (sparse_table_ids, sharded_table_specs, quantized_table_spec) serve
them unchanged.

Data contract: point-wise rows only (multi-objective training is an
impression-log protocol; candidate/ranking layouts are single-task).
``task_columns`` holds one binary label column per task; ``__call__``
returns ``(logits [B, T], targets [B, T])``. Loss: ``bce`` (elementwise
mean = equal-weighted sum of per-task BCEs) or ``multitask_bce`` with
weights; ESMM uses the ``esmm`` loss. Per-task eval metrics: ``auc/0``,
``logloss/1`` ... (metric/metrics.py TaskSlice).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
from pytorchrec_tpu.models.base import Batch, Prediction, label_target
from pytorchrec_tpu.models.ctr import _CTRBase, _gather_fields
from pytorchrec_tpu.ops import MLP
from pytorchrec_tpu.ops.embedding import normal_init


class ExpertBank(nn.Module):
    """K expert MLPs evaluated together: ``[..., D] -> [..., K, H]``.

    Parameters are stacked along a leading expert axis and applied with one
    einsum per layer — the MXU sees a single batched matmul over K instead
    of K small ones (a Python loop over experts would emit K tiny matmuls
    that XLA cannot always fuse back together).
    """

    n_experts: int
    layers: Sequence[int]
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 per_expert: bool = False) -> jnp.ndarray:
        """``per_expert=False``: every expert reads the same ``[..., D]`` x.
        ``per_expert=True``: x is ``[..., K, D]`` — expert k reads its own
        row (PLE's group-specific selectors)."""
        if per_expert:
            assert x.shape[-2] == self.n_experts, x.shape
            h = x
        else:
            h = jnp.broadcast_to(x[..., None, :],
                                 (*x.shape[:-1], self.n_experts, x.shape[-1]))
        for i, width in enumerate(self.layers):
            w = self.param(f"w_{i}", normal_init,
                           (self.n_experts, h.shape[-1], width))
            b = self.param(f"b_{i}", nn.initializers.zeros,
                           (self.n_experts, width))
            h = jax.nn.relu(jnp.einsum("...kd,kdh->...kh", h, w) + b)
            if self.dropout > 0 and train:
                h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        return h


class _MultiTaskBase(_CTRBase):
    """Shared plumbing: field input vector, [B, T] targets, task towers."""

    task_columns: Sequence[CategoricalColumnWithIdentity] = ()
    tower_layers: Sequence[int] = (64,)
    dropout: float = 0.0
    _uses_linear = False  # no wide/linear term in the multi-task family

    @property
    def n_tasks(self) -> int:
        return len(self.task_columns)

    def _input_vector(self, batch: Batch) -> jnp.ndarray:
        sparse, dense, candidate_mode = _gather_fields(
            batch, self.sparse_columns, self.dense_columns)
        assert not candidate_mode, (
            "multi-task models are point-wise (impression-log protocol)")
        parts = [self._embedded_concat(sparse, batch)]
        if dense:
            parts.append(jnp.stack(dense, axis=-1))
        return jnp.concatenate(parts, axis=-1)

    def _targets(self, batch: Batch) -> jnp.ndarray:
        cols = [label_target(c, batch) for c in self.task_columns]
        return jnp.stack(cols, axis=-1)  # [B, T]

    def _make_towers(self):
        return [
            (MLP(tuple(self.tower_layers), activation="relu",
                 dropout=self.dropout, name=f"tower_{t}"),
             nn.Dense(1, use_bias=True, kernel_init=normal_init,
                      bias_init=nn.initializers.zeros, name=f"head_{t}"))
            for t in range(self.n_tasks)
        ]

    def _tower_logits(self, per_task_inputs, train: bool) -> jnp.ndarray:
        """``per_task_inputs[t] [..., H] -> logits [..., T]``."""
        logits = [
            head(tower(x, train=train))[..., 0]
            for (tower, head), x in zip(self.towers, per_task_inputs)
        ]
        return jnp.stack(logits, axis=-1)


class SharedBottom(_MultiTaskBase):
    """One shared trunk MLP, per-task towers — the multi-task baseline."""

    bottom_layers: Sequence[int] = (256, 128)

    def setup(self):
        assert self.n_tasks >= 1
        self._build_embeddings()
        self.bottom = MLP(tuple(self.bottom_layers), activation="relu",
                          dropout=self.dropout)
        self.towers = self._make_towers()

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        h = self.bottom(self._input_vector(batch), train=train)
        logits = self._tower_logits([h] * self.n_tasks, train)
        return logits, self._targets(batch)


class MMoE(_MultiTaskBase):
    """Multi-gate Mixture-of-Experts (Ma et al. 2018, eq. 2-3):
    ``f^t(x) = sum_k softmax(W_t x)_k * E_k(x)`` feeds task tower t."""

    n_experts: int = 4
    expert_layers: Sequence[int] = (128, 64)

    def setup(self):
        assert self.n_tasks >= 1
        self._build_embeddings()
        self.experts = ExpertBank(self.n_experts, tuple(self.expert_layers),
                                  dropout=self.dropout)
        self.gates = [
            nn.Dense(self.n_experts, use_bias=False, kernel_init=normal_init,
                     name=f"gate_{t}")
            for t in range(self.n_tasks)
        ]
        self.towers = self._make_towers()

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        x = self._input_vector(batch)
        expert_out = self.experts(x, train=train)          # [B, K, H]
        per_task = [
            # [B, K] gate probs mix the expert axis -> [B, H]
            jnp.einsum("...k,...kh->...h",
                       jax.nn.softmax(gate(x), axis=-1), expert_out)
            for gate in self.gates
        ]
        logits = self._tower_logits(per_task, train)
        return logits, self._targets(batch)


class PLE(_MultiTaskBase):
    """Progressive Layered Extraction (Tang et al. 2020).

    Each CGC level holds T task-specific expert groups + 1 shared group
    (``experts_per_group`` each, stacked into ONE ExpertBank of
    (T+1)*experts_per_group experts — one batched einsum per level). Task
    gate t mixes [group t ++ shared]; the shared gate (inner levels only)
    mixes all experts. The last level feeds the task towers.
    """

    n_levels: int = 2
    experts_per_group: int = 2
    expert_layers: Sequence[int] = (128, 64)

    def setup(self):
        assert self.n_tasks >= 1 and self.n_levels >= 1
        self._build_embeddings()
        g = self.experts_per_group
        k_total = (self.n_tasks + 1) * g
        self.levels = [
            ExpertBank(k_total, tuple(self.expert_layers),
                       dropout=self.dropout, name=f"cgc_{lv}")
            for lv in range(self.n_levels)
        ]
        # per-level gates: n_tasks task gates (+ 1 shared gate on inner
        # levels, feeding the next level's shared input)
        self.task_gates = [
            [nn.Dense(2 * g, use_bias=False, kernel_init=normal_init,
                      name=f"gate_{lv}_t{t}") for t in range(self.n_tasks)]
            for lv in range(self.n_levels)
        ]
        self.shared_gates = [
            nn.Dense(k_total, use_bias=False, kernel_init=normal_init,
                     name=f"gate_{lv}_shared")
            for lv in range(self.n_levels - 1)
        ]
        self.towers = self._make_towers()

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        x = self._input_vector(batch)
        g, T = self.experts_per_group, self.n_tasks
        # level inputs: per-task selectors + shared selector (all start = x)
        task_in = [x] * T
        shared_in = x
        for lv, bank in enumerate(self.levels):
            # experts read their OWN group's selector: groups t*g:(t+1)*g
            # are task t's, the last g are shared. Evaluate the bank on the
            # stacked selectors so it stays one einsum: build a per-expert
            # input by gathering the right selector per group.
            sel = jnp.stack(task_in + [shared_in], axis=-2)  # [B, T+1, D]
            per_expert = jnp.repeat(sel, g, axis=-2)         # [B, K, D]
            h = bank(per_expert, train=train, per_expert=True)  # [B, K, H]
            new_task_in = []
            for t in range(T):
                own = h[..., t * g:(t + 1) * g, :]
                shared = h[..., T * g:, :]
                cand = jnp.concatenate([own, shared], axis=-2)  # [B, 2g, H]
                gate = jax.nn.softmax(
                    self.task_gates[lv][t](task_in[t]), axis=-1)
                new_task_in.append(
                    jnp.einsum("...k,...kh->...h", gate, cand))
            if lv < self.n_levels - 1:
                gate = jax.nn.softmax(self.shared_gates[lv](shared_in),
                                      axis=-1)
                shared_in = jnp.einsum("...k,...kh->...h", gate, h)
            task_in = new_task_in
        logits = self._tower_logits(task_in, train)
        return logits, self._targets(batch)


class ESMM(_MultiTaskBase):
    """Entire-Space Multi-task Model (Ma et al. 2018): task 0 = CTR (click),
    task 1 = CVR (conversion). Emits ``[B, 2]`` = (ctr_logit, log pCTCVR)
    where ``log pCTCVR = log_sigmoid(ctr) + log_sigmoid(cvr)`` — monotone in
    pCTCVR, so ``auc/1`` ranks it directly; train with the ``esmm`` loss
    (bce on clicks + bce of pCTCVR against click*conversion over ALL
    impressions — the entire-space trick). ``task_columns`` = (click_column,
    conversion_column); the returned target column 1 is ALREADY the product
    click*conversion."""

    bottom_layers: Sequence[int] = (256, 128)
    # prediction column 1 is log pCTCVR (a log-probability, not a logit):
    # Trainer.compile rejects sigmoid-based sliced metrics (logloss/1,
    # mse/1) on it — auc/1 is the meaningful slice (ADVICE r3 #4)
    log_prob_task_columns = (1,)

    def setup(self):
        assert self.n_tasks == 2, "ESMM is (click, conversion)"
        self._build_embeddings()
        self.ctr_tower = MLP(tuple(self.bottom_layers), activation="relu",
                             dropout=self.dropout)
        self.cvr_tower = MLP(tuple(self.bottom_layers), activation="relu",
                             dropout=self.dropout)
        self.ctr_head = nn.Dense(1, use_bias=True, kernel_init=normal_init,
                                 bias_init=nn.initializers.zeros)
        self.cvr_head = nn.Dense(1, use_bias=True, kernel_init=normal_init,
                                 bias_init=nn.initializers.zeros)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        x = self._input_vector(batch)
        ctr_logit = self.ctr_head(self.ctr_tower(x, train=train))[..., 0]
        cvr_logit = self.cvr_head(self.cvr_tower(x, train=train))[..., 0]
        log_pctcvr = (jax.nn.log_sigmoid(ctr_logit)
                      + jax.nn.log_sigmoid(cvr_logit))
        prediction = jnp.stack([ctr_logit, log_pctcvr], axis=-1)
        t = self._targets(batch)  # [B, 2] = (click, conversion)
        target = jnp.stack([t[..., 0], t[..., 0] * t[..., 1]], axis=-1)
        return prediction, target
