"""Interleaved same-window A/B: Pallas seg-scan kernel at LARGE E.

VERDICT r3 #9: the Pallas segmented-scan kernel lost end-to-end at E=16
(fusion barrier, RESULTS.md) but was predicted to win "at larger E where
the scan's HBM traffic dominates". This settles it: the packed DCN bench
config at E=64 and E=128, XLA shift-pass scan vs the Pallas kernel
(PYTORCHREC_TPU_SEG_SCAN_PALLAS=1 read at trace time), alternating windows
over pre-warmed trainers (the only trustworthy <2 ms comparison through the
tunnel — CLAUDE.md), fetch-forced timing.

Usage: python scripts/seg_scan_e_ab.py [E ...]   (default 64 128)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_DENSE, N_SPARSE, BATCH = 13, 26, 32768
# bench vocab by default; E=128 needs SEG_SCAN_VOCAB=50000 to fit two
# warmed [26V, 512]-f32 trainers + step transients in the v5e's 16 GB
VOCAB = int(os.environ.get("SEG_SCAN_VOCAB", 100_000))
STEPS, ROUNDS = 10, 3


def make_host_batch(rng, emb):
    b = {f"c_{i}": rng.integers(0, VOCAB, size=BATCH).astype(np.int32)
         for i in range(N_SPARSE)}
    for i in range(N_DENSE):
        b[f"d_{i}"] = rng.normal(size=BATCH).astype(np.float32)
    b["label"] = rng.integers(0, 2, size=BATCH).astype(np.int32)
    return b


def build(emb, seg_scan_pallas):
    import jax

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=VOCAB)
              for i in range(N_SPARSE)]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=emb, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True)
    t = SparseEmbeddingTrainer(model, packed_tables=True)
    t.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
              matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng, emb) for _ in range(3)]
    # the env toggle is read at TRACE time (ops/sparse_update.py
    # segmented_sum_scan): set it for init + warm, restore after
    os.environ["PYTORCHREC_TPU_SEG_SCAN_PALLAS"] = (
        "1" if seg_scan_pallas else "0")  # "0" forces OFF (auto-on at E>=64)
    t.init_state(batches[0], seed=0)
    t.packed_transfer = False
    t._train_step_fn = None
    dev = [{k: jax.device_put(v) for k, v in b.items()} for b in batches]
    for i in range(10):  # warm past the tunnel ramp (traces HERE)
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    os.environ.pop("PYTORCHREC_TPU_SEG_SCAN_PALLAS", None)
    return t, dev


def window(t, dev):
    start = time.perf_counter()
    for i in range(STEPS + 1):
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    return STEPS * BATCH / (time.perf_counter() - start)


def main():
    embs = [int(a) for a in sys.argv[1:]] or [64, 128]
    medians = {}
    # one E at a time: an E=128 packed table+staging is ~5 GB on-device, so
    # all four trainers at once exhaust the 16 GB HBM (found on-chip); the
    # interleaved protocol only needs the xla/pallas PAIR warmed together
    for emb in embs:
        trainers = {}
        for pallas in (False, True):
            name = f"E={emb}/{'pallas' if pallas else 'xla'}"
            print(f"building {name} ...", flush=True)
            trainers[name] = build(emb, pallas)
            print(f"  warmed {name}", flush=True)

        results = {n: [] for n in trainers}
        for r in range(ROUNDS):
            for name in trainers:
                exs = window(*trainers[name])
                results[name].append(exs)
                print(f"round {r} {name:16s} {exs/1e3:8.1f}k ex/s "
                      f"({BATCH*STEPS/exs*1e3:.1f} ms/step)", flush=True)
        for name in results:
            medians[name] = float(np.median(results[name]))
        trainers.clear()  # free device tables before the next E

    print("\n=== medians ===")
    for name, med in medians.items():
        print(f"{name:16s} {med/1e3:8.1f}k ex/s "
              f"({BATCH*STEPS/med*1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
