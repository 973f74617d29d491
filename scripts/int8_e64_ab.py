"""Interleaved same-window A/B: int8 packed byte rows vs f32 packed rows
at E=64 — the production sequence-model embedding width, where (a) the
Pallas seg-scan auto-enables (E >= 64 crossover, RESULTS.md) and now
composes with the QUANTIZED path for the first time (the dispatcher's
emb_dim contract from ADVICE r4 #4 is what keys it correctly), and (b)
the int8 row is 128 B vs f32-packed's 1 KB (table||m||v at 192 f32 cols
-> W=192... see packed_width), so the byte format's bandwidth edge should
GROW vs the E=16 bench config's 1.2x.

Usage: python scripts/int8_e64_ab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_DENSE, N_SPARSE, VOCAB, EMB, BATCH = 13, 26, 100_000, 64, 32768
STEPS, ROUNDS = 10, 3


def make_host_batch(rng):
    b = {f"c_{i}": rng.integers(0, VOCAB, size=BATCH).astype(np.int32)
         for i in range(N_SPARSE)}
    for i in range(N_DENSE):
        b[f"d_{i}"] = rng.normal(size=BATCH).astype(np.float32)
    b["label"] = rng.integers(0, 2, size=BATCH).astype(np.int32)
    return b


def build(quantized):
    import jax

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=VOCAB)
              for i in range(N_SPARSE)]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label",
                                          category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True,
                  quantized_embedding=quantized, table_packed=quantized)
    cls = QuantizedEmbeddingTrainer if quantized else SparseEmbeddingTrainer
    t = cls(model, packed_tables=True)
    t.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
              matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng) for _ in range(4)]
    t.init_state(batches[0], seed=0)
    t.packed_transfer = False
    t._train_step_fn = None
    dev = [{k: jax.device_put(v) for k, v in b.items()} for b in batches]
    for i in range(12):  # tunnel ramp
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    return t, dev


def window(t, dev):
    start = time.perf_counter()
    for i in range(STEPS + 1):
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    return STEPS * BATCH / (time.perf_counter() - start)


def main():
    names = {"f32-packed": False, "int8-packed": True}
    trainers = {}
    for name, q in names.items():
        print(f"building {name} (E={EMB}) ...", flush=True)
        trainers[name] = build(q)
        print(f"  warmed {name}", flush=True)

    results = {n: [] for n in names}
    for r in range(ROUNDS):
        for name in names:
            exs = window(*trainers[name])
            results[name].append(exs)
            print(f"round {r} {name:12s} {exs/1e3:8.1f}k ex/s "
                  f"({BATCH*STEPS/exs*1e3:.1f} ms/step)", flush=True)

    print("\n=== medians (E=64) ===")
    for name in names:
        med = float(np.median(results[name]))
        print(f"{name:12s} {med/1e3:8.1f}k ex/s ({BATCH*STEPS/med*1e3:.1f} "
              f"ms/step)  windows={['%.0fk' % (x/1e3) for x in results[name]]}")


if __name__ == "__main__":
    main()
