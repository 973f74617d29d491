"""Interleaved same-window A/B: pred vs f32 flags in the segmented scan.

The adaptive-depth segmented scan (ops/sparse_update.py::_scan_passes)
carried its done flags as bool; XLA lays pred[n] out bit-packed
(T(1024)(128)(4,1)) and the shift/or/select chain over that layout runs at
~7 ns/element — 6.8x slower than the same passes with f32 0/1 flags
(isolated: 1.49 vs 0.22 ms / 3 passes at n=852k, v5e). This script measures
the END-TO-END effect on the two packed train steps (f32-adam = bench
headline, int8-quantized = fastest config), interleaving windows over
pre-warmed trainers (tunnel drift is ±5-10%; CLAUDE.md).

Usage: PYTHONPATH=/root/repo python scripts/scan_flags_ab.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_DENSE, N_SPARSE, VOCAB, EMB, BATCH = 13, 26, 100_000, 16, 32768
STEPS, ROUNDS = 20, 3


def make_host_batch(rng):
    b = {f"c_{i}": rng.integers(0, VOCAB, size=BATCH).astype(np.int32)
         for i in range(N_SPARSE)}
    for i in range(N_DENSE):
        b[f"d_{i}"] = rng.normal(size=BATCH).astype(np.float32)
    b["label"] = rng.integers(0, 2, size=BATCH).astype(np.int32)
    return b


def build(kind: str, pred_flags: bool):
    import jax

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.ops import sparse_update

    sparse_update._PRED_FLAGS = pred_flags  # read at trace time

    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=VOCAB)
              for i in range(N_SPARSE)]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    kwargs = dict(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True)
    if kind == "int8":
        from pytorchrec_tpu.training.quantized_trainer import (
            QuantizedEmbeddingTrainer,
        )

        model = DCNv2(**kwargs, quantized_embedding=True, table_bits=8,
                      table_packed=True)
        t = QuantizedEmbeddingTrainer(model, packed_tables=True)
    else:
        from pytorchrec_tpu.training.sparse_trainer import (
            SparseEmbeddingTrainer,
        )

        model = DCNv2(**kwargs)
        t = SparseEmbeddingTrainer(model, packed_tables=True)
    t.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
              matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng) for _ in range(4)]
    t.init_state(batches[0], seed=0)
    t.packed_transfer = False
    t._train_step_fn = None
    batches_dev = [{k: jax.device_put(v) for k, v in b.items()}
                   for b in batches]
    for i in range(5):
        loss = t._train_step(batches_dev[i % 4])
    float(loss)
    return t, batches_dev


def window(t, batches_dev):
    start = time.perf_counter()
    for i in range(STEPS + 1):
        loss = t._train_step(batches_dev[i % 4])
    float(loss)
    return STEPS * BATCH / (time.perf_counter() - start)


def main():
    for kind in ("f32", "int8"):
        pred = build(kind, pred_flags=True)
        f32f = build(kind, pred_flags=False)
        got = {"pred": [], "f32": []}
        for _ in range(ROUNDS):
            got["pred"].append(window(*pred))
            got["f32"].append(window(*f32f))
        for name, vals in got.items():
            med = np.median(vals)
            print(f"{kind:5s} {name}-flags: median {med/1e3:7.1f}k ex/s "
                  f"({BATCH/med*1e3:5.1f} ms/step)  windows "
                  f"{[round(v/1e3, 1) for v in vals]}")


if __name__ == "__main__":
    main()
