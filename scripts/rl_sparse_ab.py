"""DQN dense-vs-sparse A/B at a production-scale item vocab.

FUTURE #4's last tail: with the RL zoo on the sparse path
(SparseRLTrainer), measure what it buys at scale — DQN with a [1M, 64]
item table, B=4096, 20-step states, 4 next-candidates: dense-Adam
RLTrainer (twin full tables + full Adam moments move every step) vs
SparseRLTrainer classic (separate m/v buffers) vs packed fast-width rows
(table||m||v in one [V, W] leaf, both networks' gathers injected).

Interleaved same-window protocol, fetch-forced timing (CLAUDE.md).

Usage: python scripts/rl_sparse_ab.py [dense sparse]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

V_ITEM = 1_048_576
E, B, S, N = 64, 4096, 20, 4
STEPS, ROUNDS = 10, 3


def make_host_batch(rng):
    return {
        "iid": rng.integers(0, V_ITEM, size=B).astype(np.int32),
        "state": rng.integers(1, V_ITEM, size=(B, S)).astype(np.int32),
        "state_len": rng.integers(1, S + 1, size=B).astype(np.int32),
        "next_state": rng.integers(1, V_ITEM, size=(B, S)).astype(np.int32),
        "next_state_len": rng.integers(1, S + 1, size=B).astype(np.int32),
        "rl_sample": rng.integers(0, V_ITEM, size=(B, N)).astype(np.int32),
        "label": rng.integers(0, 2, size=B).astype(np.int32),
    }


def build(mode):
    import jax

    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
    from pytorchrec_tpu.models.rl import DQNQNet, ValueRLModel
    from pytorchrec_tpu.training import RLTrainer, SparseRLTrainer

    col = CategoricalColumnWithIdentity
    model = ValueRLModel(
        qnet=DQNQNet(
            iid_column=col(feature_name="iid", category_num=V_ITEM),
            state_column=col(feature_name="state", category_num=V_ITEM),
            state_len_column=col(feature_name="state_len",
                                 category_num=S + 1),
            next_state_column=col(feature_name="next_state",
                                  category_num=V_ITEM),
            next_state_len_column=col(feature_name="next_state_len",
                                      category_num=S + 1),
            rl_sample_column=col(feature_name="rl_sample",
                                 category_num=V_ITEM),
            emb_size=E, hidden_size=E),
        reward_column=col(feature_name="label", category_num=2))
    if mode == "dense":
        t = RLTrainer(model)
    else:
        t = SparseRLTrainer(model, packed_tables=(mode == "packed"))
    t.compile(optimizer="adam", lr=1e-3, loss="mse", metrics=(),
              matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng) for _ in range(3)]
    t.init_state(batches[0], seed=0)
    t.packed_transfer = False
    t._train_step_fn = None
    dev = [{k: jax.device_put(v) for k, v in b.items()} for b in batches]
    for i in range(10):  # warm past the tunnel ramp
        out = t._train_step(dev[i % len(dev)])
        loss = out[1] if isinstance(out, tuple) else out
    float(loss)
    return t, dev


def window(t, dev):
    start = time.perf_counter()
    for i in range(STEPS + 1):
        out = t._train_step(dev[i % len(dev)])
        loss = out[1] if isinstance(out, tuple) else out
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
