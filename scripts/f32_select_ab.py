"""Interleaved same-window A/B: f32-packed row assembly via concatenate
(base) vs elementwise where/pad-add ("select") — the f32 twin of the int8
"select" win (+1.5%, scripts/int8_plumbing_ab.py). Bit-identical
(tested); PYTORCHREC_TPU_PACK_VARIANT selects at trace time.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_DENSE, N_SPARSE, VOCAB, EMB, BATCH = 13, 26, 100_000, 16, 32768
STEPS, ROUNDS = 20, 3
VARIANTS = {"base": "", "select": "select"}


def make_host_batch(rng):
    b = {f"c_{i}": rng.integers(0, VOCAB, size=BATCH).astype(np.int32)
         for i in range(N_SPARSE)}
    for i in range(N_DENSE):
        b[f"d_{i}"] = rng.normal(size=BATCH).astype(np.float32)
    b["label"] = rng.integers(0, 2, size=BATCH).astype(np.int32)
    return b


def build(variant_value):
    import jax

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    os.environ["PYTORCHREC_TPU_PACK_VARIANT"] = variant_value
    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=VOCAB)
              for i in range(N_SPARSE)]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label",
                                          category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True)
    t = SparseEmbeddingTrainer(model, packed_tables=True)
    t.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
              matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng) for _ in range(4)]
    t.init_state(batches[0], seed=0)
    t.packed_transfer = False
    t._train_step_fn = None
    dev = [{k: jax.device_put(v) for k, v in b.items()} for b in batches]
    for i in range(12):  # trace (env read here) + tunnel ramp
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    return t, dev


def window(t, dev, variant_value):
    os.environ["PYTORCHREC_TPU_PACK_VARIANT"] = variant_value
    start = time.perf_counter()
    for i in range(STEPS + 1):
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    return STEPS * BATCH / (time.perf_counter() - start)


def main():
    names = sys.argv[1:] or list(VARIANTS)
    trainers = {}
    for name in names:
        print(f"building {name} ...", flush=True)
        trainers[name] = build(VARIANTS[name])
        print(f"  warmed {name}", flush=True)

    results = {n: [] for n in names}
    for r in range(ROUNDS):
        for name in names:
            t, dev = trainers[name]
            exs = window(t, dev, VARIANTS[name])
            results[name].append(exs)
            print(f"round {r} {name:7s} {exs/1e3:8.1f}k ex/s", flush=True)

    print("\n=== medians ===")
    for name in names:
        med = float(np.median(results[name]))
        print(f"{name:7s} {med/1e3:8.1f}k ex/s "
              f"windows={['%.0fk' % (x/1e3) for x in results[name]]}")


if __name__ == "__main__":
    main()
