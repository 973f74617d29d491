"""Quantized-table accuracy deltas vs f32 on the CTR harness (VERDICT r1 #10).

Same data/model/protocol as scripts/ctr_parity.py (DCN-v2 on synthetic
Criteo-like rows, 3 seeds, dev AUC/logloss); varies only the table storage:

  f32        — plain Trainer (dense Adam over f32 tables)
  int8 G=1   — QuantizedEmbeddingTrainer, per-row scales
  int4 G=1   — 16-level grid, per-row scales
  int4 G=4   — 16-level grid, per-column-group scales (4 groups of E/4)

Note the quantized trainer's table optimizer is rowwise Adagrad (one f32
accumulator per row) by design — the storage recipe includes the optimizer —
so the deltas fold in both quantization error and the Adam->Adagrad swap.

Usage: PYTORCHREC_TPU_WORK_DIR=/tmp/ctr_parity \
       PYTHONPATH=/root/repo python scripts/quantized_accuracy.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctr_parity import (  # noqa: E402  (shared harness)
    BATCH,
    CROSS,
    DATASET,
    EMB,
    EPOCHS,
    LR,
    MLP,
    SEEDS,
    feature_lists,
    get_reader,
    run_ours,
)


def run_quantized(seed: int, bits: int, col_groups: int):
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.quantized_trainer import QuantizedEmbeddingTrainer

    reader = get_reader(seed)
    sparse, dense, label = feature_lists(reader)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=CROSS,
                  layers=MLP, unified_embedding=True, quantized_embedding=True,
                  table_bits=bits, scale_col_groups=col_groups)
    t = QuantizedEmbeddingTrainer(model)
    t.compile(optimizer="adam", lr=LR, loss="bce",
              metrics=("auc", "logloss"), user_sample_n=1)
    t.fit(reader, batch_size=BATCH, epochs=EPOCHS, verbose=0, eval_dev=False,
          seed=seed)
    logs = t.evaluate(reader, split="dev", batch_size=BATCH)
    return logs["auc"], logs["logloss"]


def run_rowwise(seed: int):
    """f32 tables + SparseEmbeddingTrainer(rowwise_adagrad): isolates the
    optimizer swap from quantization (one f32 accumulator per row, 8E x less
    optimizer HBM than Adam's two [V, E] moments)."""
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    reader = get_reader(seed)
    sparse, dense, label = feature_lists(reader)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=CROSS,
                  layers=MLP, unified_embedding=True)
    t = SparseEmbeddingTrainer(model, table_optimizer="rowwise_adagrad")
    t.compile(optimizer="adam", lr=LR, loss="bce",
              metrics=("auc", "logloss"), user_sample_n=1)
    t.fit(reader, batch_size=BATCH, epochs=EPOCHS, verbose=0, eval_dev=False,
          seed=seed)
    logs = t.evaluate(reader, split="dev", batch_size=BATCH)
    return logs["auc"], logs["logloss"]


def run_bf16_packed(seed: int):
    """bf16 packed rows (SparseEmbeddingTrainer(packed_dtype='bfloat16')):
    table + Adam moments stored bf16 (half the HBM of f32), optimizer math
    f32 — the mildest storage compression, between f32 and int8."""
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    reader = get_reader(seed)
    sparse, dense, label = feature_lists(reader)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=CROSS,
                  layers=MLP, unified_embedding=True)
    t = SparseEmbeddingTrainer(model, packed_tables=True,
                               packed_dtype="bfloat16")
    t.compile(optimizer="adam", lr=LR, loss="bce",
              metrics=("auc", "logloss"), user_sample_n=1)
    t.fit(reader, batch_size=BATCH, epochs=EPOCHS, verbose=0, eval_dev=False,
          seed=seed)
    logs = t.evaluate(reader, split="dev", batch_size=BATCH)
    return logs["auc"], logs["logloss"]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pytorchrec_tpu.data.process.datasets import generate_synthetic_ctr
    from pytorchrec_tpu.utils import constants as C

    if not os.path.exists(os.path.join(C.dataset_dir(), DATASET)):
        generate_synthetic_ctr(DATASET, n_rows=200_000, seed=7)

    variants = [
        ("f32", lambda s: run_ours(s)),
        ("f32 rowwise-adagrad", run_rowwise),
        ("bf16 packed adam", run_bf16_packed),
        ("int8 G=1", lambda s: run_quantized(s, bits=8, col_groups=1)),
        ("int4 G=1", lambda s: run_quantized(s, bits=4, col_groups=1)),
        ("int4 G=4", lambda s: run_quantized(s, bits=4, col_groups=4)),
    ]
    base_auc = None
    for name, fn in variants:
        rows = np.asarray([fn(s) for s in SEEDS])
        auc_m, auc_s = rows[:, 0].mean(), rows[:, 0].std()
        ll_m, ll_s = rows[:, 1].mean(), rows[:, 1].std()
        if base_auc is None:
            base_auc = auc_m
            delta = 0.0
        else:
            delta = auc_m - base_auc
        print(f"[quant] {name:9s} auc {auc_m:.4f}±{auc_s:.4f} "
              f"(Δ vs f32 {delta:+.4f})  logloss {ll_m:.4f}±{ll_s:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
