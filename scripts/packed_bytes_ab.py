"""Interleaved same-window A/B: f32 packed rows vs BYTE-packed f32 rows.

Bench config (DCN-v2 Criteo-like, b32768, unified 26-field table). Window
drift through the axon tunnel is ±5-10%, so the only trustworthy comparison
is alternating windows over pre-warmed trainers (CLAUDE.md perf notes).
Timing is fetch-forced (float(loss) of a donated-state step chain).

Contenders:
  f32/adam        packed [V, 64] f32 rows (256 B) — the current bench path
  bytes/adam      packed [V, 256] uint8 rows (256 B, byte emitter)
  bytes/rowwise   packed [V, 192] uint8 rows (192 B) — padding waste removed
  f32/rowwise     packed [V, 64] f32 rows (256 B, padded from 33 cols)
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


def build(table_optimizer, packed_bytes, packed_dtype=None, min_width=64):
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
                  label_column=label, emb_size=EMB, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True)
    t = SparseEmbeddingTrainer(model, packed_tables=True,
                               packed_bytes=packed_bytes,
                               packed_dtype=packed_dtype,
                               packed_min_width=min_width,
                               table_optimizer=table_optimizer)
    t.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
              matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng) for _ in range(4)]
    t.init_state(batches[0], seed=0)
    t.packed_transfer = False
    t._train_step_fn = None
    dev = [{k: jax.device_put(v) for k, v in b.items()} for b in batches]
    return t, dev


def window(t, dev):
    start = time.perf_counter()
    for i in range(STEPS + 1):
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    return STEPS * BATCH / (time.perf_counter() - start)


def main():
    names = sys.argv[1:] or ["f32/adam", "bytes/adam", "bytes/rowwise",
                             "f32/rowwise"]
    cfg = {
        "f32/adam": ("adam", False, None),
        "bytes/adam": ("adam", True, None),
        "bytes/rowwise": ("rowwise_adagrad", True, None),
        "f32/rowwise": ("rowwise_adagrad", False, None),
        # native bf16 storage: [V, 64] bf16 = 128 B rows, no bitcast
        "bf16/adam": ("adam", False, "bfloat16"),
        "bf16/rowwise": ("rowwise_adagrad", False, "bfloat16"),
        # bf16 at 128 cols: 256 B rows (same bytes as f32/64) but the
        # emitter is ~1.5-2x faster at 128 columns (isolated probe)
        "bf16w128/adam": ("adam", False, "bfloat16", 128),
    }
    trainers = {}
    for name in names:
        opt, pb, pd, *mw = cfg[name]
        print(f"building {name} ...", flush=True)
        t, dev = build(opt, pb, pd, *(mw or [64]))
        for i in range(4):  # warm: compile + settle
            loss = t._train_step(dev[i % len(dev)])
        float(loss)
        trainers[name] = (t, dev)
        print(f"  warmed {name}", flush=True)

    results = {n: [] for n in names}
    for r in range(ROUNDS):
        for name in names:
            exs = window(*trainers[name])
            results[name].append(exs)
            print(f"round {r} {name:14s} {exs/1e3:8.1f}k ex/s "
                  f"({BATCH*STEPS/exs*1e3:.1f} ms/step)", flush=True)

    print("\n=== medians ===")
    for name in names:
        med = float(np.median(results[name]))
        print(f"{name:14s} {med/1e3:8.1f}k ex/s ({BATCH*STEPS/med*1e3:.1f} "
              f"ms/step)  windows={['%.0fk' % (x/1e3) for x in results[name]]}")


if __name__ == "__main__":
    main()
