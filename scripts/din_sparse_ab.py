"""DIN single-chip sparse-trainer A/B at a bench-scale item vocab.

VERDICT r3 #2 "done" criterion: with the sequence zoo now on the sparse
path, measure what it buys. DIN (BASELINE 'DIN on Amazon' config class) at
a production-scale item table ([1M, 64]): dense-Adam GSPMD Trainer (the
only option before round 4) vs SparseEmbeddingTrainer classic vs packed
rows. Dense Adam moves ~6·V·E·4 bytes of moments+table per step regardless
of the batch; the sparse path touches only the B·(N+S) gathered rows.

Interleaved same-window protocol, fetch-forced timing (CLAUDE.md).

Usage: python scripts/din_sparse_ab.py [dense sparse packed]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

V_ITEM, V_USER = 1_048_576, 65_536
E, B, N_CAND, S = 64, 4096, 2, 20
STEPS, ROUNDS = 10, 3


def make_host_batch(rng):
    return {
        "uid": rng.integers(0, V_USER, size=B).astype(np.int32),
        "iid": rng.integers(0, V_ITEM, size=(B, N_CAND)).astype(np.int32),
        "pos_his": rng.integers(1, V_ITEM, size=(B, S)).astype(np.int32),
        "pos_his_len": rng.integers(1, S + 1, size=B).astype(np.int32),
        "label": rng.integers(0, 2, size=B).astype(np.int32),
    }


def build(mode):
    import jax

    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
    from pytorchrec_tpu.models.din import DIN
    from pytorchrec_tpu.training import SparseEmbeddingTrainer, Trainer

    col = CategoricalColumnWithIdentity
    model = DIN(
        uid_column=col(feature_name="uid", category_num=V_USER),
        iid_column=col(feature_name="iid", category_num=V_ITEM),
        his_column=col(feature_name="pos_his", category_num=V_ITEM),
        his_len_column=col(feature_name="pos_his_len", category_num=S + 1),
        label_column=col(feature_name="label", category_num=2),
        emb_size=E, att_hidden_units=(80, 40), mlp_layers=(200, 80),
    )
    if mode == "dense":
        t = Trainer(model)
    else:
        t = SparseEmbeddingTrainer(model, packed_tables=(mode == "packed"))
    t.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
              matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng) for _ in range(3)]
    t.init_state(batches[0], seed=0)
    t.packed_transfer = False
    t._train_step_fn = None
    dev = [{k: jax.device_put(v) for k, v in b.items()} for b in batches]
    for i in range(10):  # warm past the tunnel ramp
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    return t, dev


def window(t, dev):
    start = time.perf_counter()
    for i in range(STEPS + 1):
        loss = t._train_step(dev[i % len(dev)])
    float(loss)
    return STEPS * B / (time.perf_counter() - start)


def main():
    modes = sys.argv[1:] or ["dense", "sparse", "packed"]
    trainers = {}
    for mode in modes:
        print(f"building {mode} ...", flush=True)
        trainers[mode] = build(mode)
        print(f"  warmed {mode}", flush=True)

    results = {m: [] for m in modes}
    for r in range(ROUNDS):
        for mode in modes:
            exs = window(*trainers[mode])
            results[mode].append(exs)
            print(f"round {r} {mode:8s} {exs/1e3:8.1f}k ex/s "
                  f"({B*STEPS/exs*1e3:.1f} ms/step)", flush=True)

    print("\n=== medians ===")
    for mode in modes:
        med = float(np.median(results[mode]))
        print(f"{mode:8s} {med/1e3:8.1f}k ex/s ({B*STEPS/med*1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
