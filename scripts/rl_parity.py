"""RL-family parity: the reference (torch) RL zoo vs this build, head-to-head.

Covers DQN, DEERS, LSRL and all four LSRL ablations (reference
model/DQN.py, model/DEERS.py, model/LSRL.py, model/LSRL_{L,PS,LPS,PSNS}.py).
Same dataset/artifacts (the reference's ValueRLDataReader consumes our
generated next-state + rl-sample npys directly), same protocol: point-wise
MSE on Bellman targets, epoch == one batch (reference IValueRLModel.py
semantics), target-net sync every ``update_freq`` batches, leave-1-out
ranking eval with 99 negatives at the end.

Note: the reference DEERS/LSRL forward has a sort/unsort bug (it pairs the
*sorted* GRU hidden state with *unsorted* item vectors, DEERS.py:73-81);
our BranchQNet never permutes the batch, so BEATS verdicts on the branch
models are expected, not suspicious (RESULTS.md documents this).

Usage: PYTORCHREC_TPU_WORK_DIR=/tmp/parity_wd python scripts/rl_parity.py \
    [dqn deers lsrl lsrl_l lsrl_ps lsrl_lps lsrl_psns]
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

ALL_MODELS = ["dqn", "deers", "lsrl", "lsrl_l", "lsrl_ps", "lsrl_lps",
              "lsrl_psns"]
# models whose qnet has a neg-feedback branch (need neg state streams)
NEG_MODELS = {"deers", "lsrl", "lsrl_psns"}


def run_ours(model_name: str, seed: int):
    from pytorchrec_tpu.data import SplitMode, TrainMode, ValueRLDataReader
    from pytorchrec_tpu.tasks import build_model
    from pytorchrec_tpu.training import RLTrainer

    reader = ValueRLDataReader(
        DATASET, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
        neg_sample_n=NEG_N, train_mode=TrainMode.POINT_WISE, random_seed=seed,
        max_state_len=STATE_LEN, use_neg_state=model_name in NEG_MODELS,
        rl_sample_len=RL_SAMPLE_LEN,
    )
    model = build_model(model_name, reader, emb_size=EMB, hidden_size=HIDDEN,
                        gamma=GAMMA, update_freq=UPDATE_FREQ)
    trainer = RLTrainer(model)
    trainer.compile(optimizer="adam", lr=LR, loss="mse",
                    metrics=("ndcg@10", "hit@10"), user_sample_n=1 + NEG_N)
    batches = PASSES * (reader.get_train_dataset_size() // BATCH)
    trainer.fit(reader, batch_size=BATCH, epochs=batches, verbose=0,
                eval_dev=False, seed=seed)
    logs = trainer.evaluate(reader, split="test", batch_size=BATCH)
    return logs["ndcg@10"], logs["hit@10"]


def run_reference(model_name: str, seed: int):
    import torch

    from torchrec.data.ValueRLDataReader import ValueRLDataReader
    from torchrec.data.adapter.TrainDataset import TrainDataset
    from torchrec.data.adapter.TestDataset import TestDataset
    from torchrec.data.dataset import SplitMode
    from torchrec.metric.NDCG import NDCG
    from torchrec.metric.Hit import Hit
    from torchrec.model.DQN import DQN, DQNQNet
    from torchrec.model.DEERS import DEERS, DEERSQNet
    from torchrec.model.LSRL import LSRL, LSRLQNet
    from torchrec.model.LSRL_L import LSRLL, LSRLLQNet
    from torchrec.model.LSRL_PS import LSRLPS, LSRLPSQNet
    from torchrec.model.LSRL_LPS import LSRLLPS, LSRLLPSQNet
    from torchrec.model.LSRL_PSNS import LSRLPSNS, LSRLPSNSQNet
    from torchrec.task import TrainMode
    from torchrec.utils.const import (
        IID, NEG_HIS, NEG_HIS_LEN, NEG_NEXT_STATE, NEG_NEXT_STATE_LEN,
        POS_HIS, POS_HIS_LEN, POS_NEXT_STATE, POS_NEXT_STATE_LEN,
        RATE, RL_SAMPLE, UID,
    )

    # all LSRL-family qnets take the full column set even when a branch is
    # ablated (LSRL_L.py:20-30), so the reader must produce neg streams for
    # every model except plain DQN
    use_neg = model_name != "dqn"
    reader = ValueRLDataReader(
        dataset=DATASET, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5,
        vt_ratio=0.1, leave_k=1, neg_sample_n=NEG_N, load_feature=False,
        append_id=False, train_mode=TrainMode.POINT_WISE, random_seed=seed,
        max_state_len=STATE_LEN, use_neg_state=use_neg,
        rl_sample_len=RL_SAMPLE_LEN,
    )
    columns = reader.get_feature_column_dict()
    common = dict(random_seed=seed, update_freq=UPDATE_FREQ, gamma=GAMMA,
                  reward_column=columns[RATE], weight_file="",
                  emb_size=EMB, hidden_size=HIDDEN)
    if model_name == "dqn":
        model = DQN(
            q_net_type=DQNQNet, iid_column=columns[IID],
            state_len_column=columns[POS_HIS_LEN], state_column=columns[POS_HIS],
            next_state_len_column=columns[POS_NEXT_STATE_LEN],
            next_state_column=columns[POS_NEXT_STATE],
            rl_sample_column=columns[RL_SAMPLE], **common,
        )
    else:
        branch_cols = dict(
            iid_column=columns[IID],
            pos_state_len_column=columns[POS_HIS_LEN],
            pos_state_column=columns[POS_HIS],
            pos_next_state_len_column=columns[POS_NEXT_STATE_LEN],
            pos_next_state_column=columns[POS_NEXT_STATE],
            neg_state_len_column=columns[NEG_HIS_LEN],
            neg_state_column=columns[NEG_HIS],
            neg_next_state_len_column=columns[NEG_NEXT_STATE_LEN],
            neg_next_state_column=columns[NEG_NEXT_STATE],
            rl_sample_column=columns[RL_SAMPLE],
        )
        if model_name == "deers":
            model = DEERS(q_net_type=DEERSQNet, **branch_cols, **common)
        else:
            wrapper, qnet = {
                "lsrl": (LSRL, LSRLQNet),
                "lsrl_l": (LSRLL, LSRLLQNet),
                "lsrl_ps": (LSRLPS, LSRLPSQNet),
                "lsrl_lps": (LSRLLPS, LSRLLPSQNet),
                "lsrl_psns": (LSRLPSNS, LSRLPSNSQNet),
            }[model_name]
            model = wrapper(q_net_type=qnet, uid_column=columns[UID],
                            **branch_cols, **common)
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

    models = sys.argv[1:] or ALL_MODELS
    results = {}
    for model_name in models:
        results[model_name] = {
            "ours": [run_ours(model_name, seed) for seed in SEEDS]}

    from scripts.reference_parity import _patch_reference_paths

    _patch_reference_paths(work_dir)
    for model_name in models:
        results[model_name]["ref"] = [run_reference(model_name, seed)
                                      for seed in SEEDS]

    def stats(rows, i):
        vals = np.asarray([r[i] for r in rows])
        return f"{vals.mean():.4f}±{vals.std():.4f}"

    for model_name in models:
        ours, theirs = results[model_name]["ours"], results[model_name]["ref"]
        print(f"[{model_name}] build     ndcg@10 {stats(ours, 0)}  "
              f"hit@10 {stats(ours, 1)}")
        print(f"[{model_name}] reference ndcg@10 {stats(theirs, 0)}  "
              f"hit@10 {stats(theirs, 1)}")
        m_ours = np.mean([r[0] for r in ours])
        m_ref = np.mean([r[0] for r in theirs])
        diff = abs(m_ours - m_ref)
        spread = max(np.std([r[0] for r in ours]),
                     np.std([r[0] for r in theirs]))
        if diff <= max(2 * spread, 0.01):
            verdict = "PARITY"
        else:
            verdict = "BEATS" if m_ours > m_ref else "DIVERGENT"
        print(f"[{model_name}] ndcg@10 mean diff {diff:.4f} vs seed spread "
              f"{spread:.4f} -> {verdict}")


if __name__ == "__main__":
    main()
