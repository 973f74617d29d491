"""RL-family parity: reference DQN (torch) vs this build's DQN.

Same dataset/artifacts (the reference's ValueRLDataReader consumes our
generated next-state + rl-sample npys directly), same protocol: point-wise
MSE on Bellman targets, epoch == one batch (reference IValueRLModel.py
semantics), target-net sync every ``update_freq`` batches, leave-1-out
ranking eval with 99 negatives at the end.

Usage: PYTORCHREC_TPU_WORK_DIR=/tmp/parity_wd python scripts/rl_parity.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = [2020, 2021, 2022]
PASSES = 2  # full dataset passes (reference fit's `epochs` unit)
BATCH = 256
LR = 1e-3
EMB = 32
HIDDEN = 32
NEG_N = 99
STATE_LEN = 10
RL_SAMPLE_LEN = 8
UPDATE_FREQ = 10
GAMMA = 0.9
DATASET = "Parity-ML"


def run_ours(seed: int):
    from pytorchrec_tpu.data import SplitMode, TrainMode, ValueRLDataReader
    from pytorchrec_tpu.tasks import build_model
    from pytorchrec_tpu.training import RLTrainer

    reader = ValueRLDataReader(
        DATASET, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
        neg_sample_n=NEG_N, train_mode=TrainMode.POINT_WISE, random_seed=seed,
        max_state_len=STATE_LEN, use_neg_state=False,
        rl_sample_len=RL_SAMPLE_LEN,
    )
    model = build_model("dqn", reader, emb_size=EMB, hidden_size=HIDDEN,
                        gamma=GAMMA, update_freq=UPDATE_FREQ)
    trainer = RLTrainer(model)
    trainer.compile(optimizer="adam", lr=LR, loss="mse",
                    metrics=("ndcg@10", "hit@10"), user_sample_n=1 + NEG_N)
    batches = PASSES * (reader.get_train_dataset_size() // BATCH)
    trainer.fit(reader, batch_size=BATCH, epochs=batches, verbose=0,
                eval_dev=False, seed=seed)
    logs = trainer.evaluate(reader, split="test", batch_size=BATCH)
    return logs["ndcg@10"], logs["hit@10"]


def run_reference(seed: int):
    import torch

    from torchrec.data.ValueRLDataReader import ValueRLDataReader
    from torchrec.data.adapter.TrainDataset import TrainDataset
    from torchrec.data.adapter.TestDataset import TestDataset
    from torchrec.data.dataset import SplitMode
    from torchrec.metric.NDCG import NDCG
    from torchrec.metric.Hit import Hit
    from torchrec.model.DQN import DQN, DQNQNet
    from torchrec.task import TrainMode
    from torchrec.utils.const import (
        IID, POS_HIS, POS_HIS_LEN, POS_NEXT_STATE, POS_NEXT_STATE_LEN,
        RATE, RL_SAMPLE,
    )

    reader = ValueRLDataReader(
        dataset=DATASET, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5,
        vt_ratio=0.1, leave_k=1, neg_sample_n=NEG_N, load_feature=False,
        append_id=False, train_mode=TrainMode.POINT_WISE, random_seed=seed,
        max_state_len=STATE_LEN, use_neg_state=False,
        rl_sample_len=RL_SAMPLE_LEN,
    )
    columns = reader.get_feature_column_dict()
    model = DQN(
        random_seed=seed, update_freq=UPDATE_FREQ, gamma=GAMMA,
        reward_column=columns[RATE], q_net_type=DQNQNet,
        weight_file="", iid_column=columns[IID],
        state_len_column=columns[POS_HIS_LEN], state_column=columns[POS_HIS],
        next_state_len_column=columns[POS_NEXT_STATE_LEN],
        next_state_column=columns[POS_NEXT_STATE],
        rl_sample_column=columns[RL_SAMPLE],
        emb_size=EMB, hidden_size=HIDDEN,
    )
    model.compile(
        optimizer=torch.optim.Adam(model.get_parameters(), lr=LR),
        loss=torch.nn.MSELoss(),
        metrics=[NDCG(1 + NEG_N, 10), Hit(1 + NEG_N, 10)],
        device=torch.device("cpu"),
    )
    model.fit(
        dataset=TrainDataset(reader), batch_size=BATCH, epochs=PASSES,
        dev_dataset=None, train_mode=TrainMode.POINT_WISE, verbose=0,
        callbacks=None, shuffle=True, workers=0, drop_last=True,
        dev_freq=10 ** 9,  # no dev eval inside the loop
    )
    logs = model.evaluate(dataset=TestDataset(reader), batch_size=BATCH,
                          verbose=0, callbacks=None, workers=0)
    return float(logs["ndcg@10"]), float(logs["hit@10"])


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    work_dir = os.environ.get("PYTORCHREC_TPU_WORK_DIR")
    assert work_dir, "set PYTORCHREC_TPU_WORK_DIR"
    from pytorchrec_tpu.data.process.datasets import generate_synthetic_ml

    if not os.path.exists(os.path.join(work_dir, "Dataset", DATASET)):
        generate_synthetic_ml(DATASET, n_users=500, n_items=1000,
                              min_interactions=30, max_interactions=80, seed=42)

    ours = [run_ours(seed) for seed in SEEDS]

    from scripts.reference_parity import _patch_reference_paths

    _patch_reference_paths(work_dir)
    theirs = [run_reference(seed) for seed in SEEDS]

    def stats(rows, i):
        vals = np.asarray([r[i] for r in rows])
        return f"{vals.mean():.4f}±{vals.std():.4f}"

    print(f"[dqn] build     ndcg@10 {stats(ours, 0)}  hit@10 {stats(ours, 1)}")
    print(f"[dqn] reference ndcg@10 {stats(theirs, 0)}  hit@10 {stats(theirs, 1)}")
    diff = abs(np.mean([r[0] for r in ours]) - np.mean([r[0] for r in theirs]))
    spread = max(np.std([r[0] for r in ours]), np.std([r[0] for r in theirs]))
    print(f"[dqn] ndcg@10 mean diff {diff:.4f} vs seed spread {spread:.4f} "
          f"-> {'PARITY' if diff <= max(2 * spread, 0.01) else 'DIVERGENT'}")


if __name__ == "__main__":
    main()
