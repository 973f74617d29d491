"""Interleaved same-window A/B of the int8 packed step's plumbing variants
(VERDICT r4 #2: the step's own profile shows ~2.1 ms byte-view staging +
~2.4 ms u8 layout-flip copies of identified, unattacked slack).

Contenders (PYTORCHREC_TPU_QPACK_VARIANT, read at trace time — see
ops/quantized_packed.py::packed_quantized_update; all bit-identical):

  base      3-way concatenate stages dvec bytes into the row
  dus       dynamic_update_slice staging (row tail already zero)
  sortgrad  the dedup sort carries dvec's E f32 columns: grads never
            round-trip through the byte view; the permute moves the
            untouched gather output

Protocol: CLAUDE.md timing rules — fetch-forced windows, >=10-step
tunnel ramp warmup per trainer, alternating windows over pre-warmed
trainers, medians of 3 rounds.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_DENSE, N_SPARSE, VOCAB, EMB, BATCH = 13, 26, 100_000, 16, 32768
STEPS, ROUNDS = 20, 3
VARIANTS = {"base": "base", "dus": "dus", "sortgrad": "sortgrad",
            "select": "select", "kernel": "kernel"}


def make_host_batch(rng):
    b = {f"c_{i}": rng.integers(0, VOCAB, size=BATCH).astype(np.int32)
         for i in range(N_SPARSE)}
    for i in range(N_DENSE):
        b[f"d_{i}"] = rng.normal(size=BATCH).astype(np.float32)
    b["label"] = rng.integers(0, 2, size=BATCH).astype(np.int32)
    return b


def build(variant_value, bits=8):
    import jax

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )

    os.environ["PYTORCHREC_TPU_QPACK_VARIANT"] = variant_value
    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=VOCAB)
              for i in range(N_SPARSE)]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label",
                                          category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True,
                  quantized_embedding=True, table_packed=True,
                  table_bits=bits)
    t = QuantizedEmbeddingTrainer(model, packed_tables=True)
    t.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
              matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng) for _ in range(4)]
    t.init_state(batches[0], seed=0)
    t.packed_transfer = False
    t._train_step_fn = None
    dev = [{k: jax.device_put(v) for k, v in b.items()} for b in batches]
    # trace (env read here) + tunnel-ramp warm (>=10 calls)
    for i in range(12):
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    return t, dev


def window(t, dev, variant_value):
    os.environ["PYTORCHREC_TPU_QPACK_VARIANT"] = variant_value  # paranoia
    start = time.perf_counter()
    for i in range(STEPS + 1):
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    return STEPS * BATCH / (time.perf_counter() - start)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=list(VARIANTS))
    ap.add_argument("--bits", type=int, default=8)
    args = ap.parse_args()
    names = args.names or list(VARIANTS)
    trainers = {}
    for name in names:
        print(f"building {name} (int{args.bits}) ...", flush=True)
        trainers[name] = build(VARIANTS[name], bits=args.bits)
        print(f"  warmed {name}", flush=True)

    results = {n: [] for n in names}
    for r in range(ROUNDS):
        for name in names:
            t, dev = trainers[name]
            exs = window(t, dev, VARIANTS[name])
            results[name].append(exs)
            print(f"round {r} {name:9s} {exs/1e3:8.1f}k ex/s "
                  f"({BATCH*STEPS/exs*1e3:.1f} ms/step)", flush=True)

    print("\n=== medians ===")
    for name in names:
        med = float(np.median(results[name]))
        print(f"{name:9s} {med/1e3:8.1f}k ex/s ({BATCH*STEPS/med*1e3:.1f} "
              f"ms/step)  windows={['%.0fk' % (x/1e3) for x in results[name]]}")


if __name__ == "__main__":
    main()
