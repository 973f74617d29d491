"""Head-to-head quality parity: the actual reference (torch) vs this build,
same dataset, same protocol, same seeds.

The BASELINE.md north-star check ("NDCG parity within run-to-run seed
variance"): both stacks train FunkSVD with pairwise BPR on the same
canonical artifacts (our synthetic generator writes the exact on-disk format
the reference consumes; split/negative-sample generation is byte-identical —
golden-tested), evaluate leave-1-out with 99 sampled negatives, select the
best dev epoch, and report test NDCG@10 / Hit@10 per seed.

The reference runs UNMODIFIED from /root/reference — only its
hostname-hardcoded path constants are monkeypatched to the scratch work dir
(utils/const.py:9-22), and its metric factory's ``user_sample_n=99`` bug
(metrics.py:13-16 — eval rows are 1+99=100 wide) is bypassed by constructing
NDCG(100, k) directly, which is what its own data layout requires.

Usage: PYTORCHREC_TPU_WORK_DIR=/tmp/parity_wd python scripts/reference_parity.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = [2020, 2021, 2022, 2023, 2024]
EPOCHS = 20
BATCH = 256
LR = 5e-3
EMB = 64
NEG_N = 99
HIS_LEN = 10
DATASET = "Parity-ML"

# model name -> (our model_kwargs, our reader extra, reference builder)
# suffixed configs: "funksvd-top1" trains with Top1 loss (loss/Top1Loss.py),
# "funksvd-seqsplit" uses SEQUENTIAL_SPLIT + point-wise BCE and compares test
# logloss (neither stack joins ranking candidates outside leave-k-out —
# SimpleDataReader.py:155-156 gates _load_neg_sample on LEAVE_K_OUT)
MODELS = ["funksvd", "ncf", "gru4rec", "sasrec", "svdpp", "funksvd-top1",
          "funksvd-seqsplit"]
SVDPP_LIMIT = 64


def run_ours(model_name: str, seed: int):
    from pytorchrec_tpu.data.schema import SplitMode, TrainMode
    from pytorchrec_tpu.tasks import Task

    model_name, _, variant = model_name.partition("-")
    if variant == "seqsplit":
        # point-wise MSE regression — the reference's only point-wise loss
        # is MSELoss (loss/losses.py:8-12), so that's the common protocol
        task = Task.from_config(
            model_name, DATASET,
            reader_kwargs={"split_mode": SplitMode.SEQUENTIAL_SPLIT,
                           "warm_n": 5, "vt_ratio": 0.1,
                           "neg_sample_n": NEG_N, "random_seed": seed},
            model_kwargs={"emb_size": EMB},
            random_seed=seed, metrics=["mse"],
            monitor="mse", monitor_mode="min",
            train_mode=TrainMode.POINT_WISE,
            epoch=EPOCHS, batch_size=BATCH, lr=LR, loss="mse",
            patience=EPOCHS, verbose=0, debug=True,
        )
        _, _, test_logs = task.run()
        traj = [float(v) for v in task.history.history.get("mse", [])]
        return test_logs["mse"], test_logs["mse"], traj

    reader_kwargs = {"split_mode": SplitMode.LEAVE_K_OUT, "warm_n": 5,
                     "leave_k": 1, "neg_sample_n": NEG_N, "random_seed": seed}
    model_kwargs = {"emb_size": EMB}
    if model_name == "gru4rec":
        reader_kwargs["max_his_len"] = HIS_LEN
        model_kwargs["hidden_size"] = EMB
    elif model_name == "sasrec":
        reader_kwargs["max_his_len"] = HIS_LEN
        model_kwargs.update(max_his_len=HIS_LEN, num_layers=1, dropout=0.2)
    elif model_name == "svdpp":
        reader_kwargs["limit"] = SVDPP_LIMIT
    task = Task.from_config(
        model_name, DATASET,
        reader_kwargs=reader_kwargs,
        model_kwargs=model_kwargs,
        random_seed=seed,
        metrics=["ndcg@10", "hit@10"],
        train_mode=TrainMode.PAIR_WISE,
        epoch=EPOCHS, batch_size=BATCH, lr=LR,
        loss="top1" if variant == "top1" else "bpr",
        patience=EPOCHS, verbose=0, debug=True,
    )
    _, _, test_logs = task.run()
    traj = [float(v) for v in task.history.history.get("ndcg@10", [])]
    return test_logs["ndcg@10"], test_logs["hit@10"], traj


def _patch_reference_paths(work_dir: str) -> None:
    sys.path.insert(0, "/root/reference")
    import numpy as np

    # the reference targets numpy<2 (ModelCheckpoint.py:40-43 uses np.Inf,
    # removed in numpy 2) — restore the alias so its code runs unmodified
    if not hasattr(np, "Inf"):
        np.Inf = np.inf
    import torchrec.utils.const as rc

    rc.WORK_DIR = work_dir
    for name in ("RAW_DATA_DIR", "DATASET_DIR", "LOG_DIR", "MODEL_DIR",
                 "GRID_SEARCH_DIR", "REPEAT_TASK_DIR"):
        setattr(rc, name, os.path.join(work_dir, name.split("_DIR")[0].title()
                                       .replace("_", "")))
    rc.RAW_DATA_DIR = os.path.join(work_dir, "RawData")
    rc.DATASET_DIR = os.path.join(work_dir, "Dataset")
    rc.LOG_DIR = os.path.join(work_dir, "Log")
    rc.MODEL_DIR = os.path.join(work_dir, "Model")
    os.makedirs(rc.LOG_DIR, exist_ok=True)
    os.makedirs(rc.MODEL_DIR, exist_ok=True)


def run_reference(model_name: str, seed: int):
    """Train the reference stack, faithfully mirroring Task.run
    (task/Task.py:212-272) minus file artifacts."""
    import torch

    model_name, _, variant = model_name.partition("-")
    if variant == "seqsplit":
        return _run_reference_seqsplit(model_name, seed)

    from torchrec.data.SimpleDataReader import SimpleDataReader
    from torchrec.data.HistoryDataReader import HistoryDataReader
    from torchrec.data.SVDPPDataReader import SVDPPDataReader
    from torchrec.data.adapter.TrainDataset import TrainDataset
    from torchrec.data.adapter.DevDataset import DevDataset
    from torchrec.data.adapter.TestDataset import TestDataset
    from torchrec.data.dataset import SplitMode
    from torchrec.loss.BPRLoss import BPRLoss
    from torchrec.metric.NDCG import NDCG
    from torchrec.metric.Hit import Hit
    from torchrec.model.FunkSVD import FunkSVD
    from torchrec.model.NCF import NCF
    from torchrec.model.GRU4Rec import GRU4Rec
    from torchrec.model.SASRec import SASRec
    from torchrec.model.SVDPP import SVDPP
    from torchrec.task import TrainMode
    from torchrec.utils.const import UID, IID, IIDS, LABEL, POS_HIS, POS_HIS_LEN

    common = dict(
        dataset=DATASET, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5,
        vt_ratio=0.1, leave_k=1, neg_sample_n=NEG_N, load_feature=False,
        append_id=False, train_mode=TrainMode.PAIR_WISE, random_seed=seed,
    )
    if model_name in ("gru4rec", "sasrec"):
        # the reference reader asserts the history npys exist — OUR generator
        # produced them byte-identically during the build-side run
        reader = HistoryDataReader(**common, max_his_len=HIS_LEN, use_neg_his=False)
    elif model_name == "svdpp":
        reader = SVDPPDataReader(**common, limit=SVDPP_LIMIT)
    else:
        reader = SimpleDataReader(**common)
    columns = reader.get_feature_column_dict()
    if model_name == "funksvd":
        model = FunkSVD(uid_column=columns[UID], iid_column=columns[IID],
                        label_column=columns[LABEL], emb_size=EMB,
                        random_seed=seed)
    elif model_name == "ncf":
        model = NCF(uid_column=columns[UID], iid_column=columns[IID],
                    label_column=columns[LABEL], emb_size=EMB, layers=[EMB],
                    dropout=0.2, random_seed=seed)
    elif model_name == "sasrec":
        model = SASRec(iid_column=columns[IID],
                       his_len_column=columns[POS_HIS_LEN],
                       his_column=columns[POS_HIS],
                       label_column=columns[LABEL], emb_size=EMB,
                       hidden_size=EMB, max_his_len=HIS_LEN, num_layers=1,
                       dropout=0.2, random_seed=seed)
    elif model_name == "svdpp":
        model = SVDPP(uid_column=columns[UID], iid_column=columns[IID],
                      iids_column=columns[IIDS], label_column=columns[LABEL],
                      emb_size=EMB, random_seed=seed)
    else:
        model = GRU4Rec(iid_column=columns[IID],
                        his_len_column=columns[POS_HIS_LEN],
                        his_column=columns[POS_HIS],
                        label_column=columns[LABEL], emb_size=EMB,
                        hidden_size=EMB, random_seed=seed)
    from torchrec.loss.Top1Loss import Top1Loss

    metrics = [NDCG(1 + NEG_N, 10), Hit(1 + NEG_N, 10)]
    model.compile(
        optimizer=torch.optim.Adam(model.get_parameters(), lr=LR),
        loss=Top1Loss() if variant == "top1" else BPRLoss(),
        metrics=metrics,
        device=torch.device("cpu"),
    )
    # the reference's own ModelCheckpoint tracks the best dev epoch in RAM
    # (ModelCheckpoint.py:83 save_best_weights); Task.run then restores it
    # before the test pass (Task.py:258) — both stacks eval best weights
    from torchrec.callback.ModelCheckpoint import ModelCheckpoint
    import torchrec.utils.const as rc

    ckpt = ModelCheckpoint(
        filepath=os.path.join(rc.MODEL_DIR, f"parity_{model_name}_{seed}.pt"),
        monitor="ndcg@10", mode="max", save_best_only=True)
    history = model.fit(
        dataset=TrainDataset(reader), batch_size=BATCH, epochs=EPOCHS,
        dev_dataset=DevDataset(reader), train_mode=TrainMode.PAIR_WISE,
        verbose=0, callbacks=[ckpt], shuffle=True, workers=0, drop_last=True,
        dev_freq=1,
    )
    best_epoch, _ = history.get_best_epoch_logs(monitor="ndcg@10")
    model.load_best_weights()
    test_logs = model.evaluate(dataset=TestDataset(reader), batch_size=BATCH,
                               verbose=0, callbacks=None, workers=0)
    traj = [float(v) for v in history.history.get("ndcg@10", [])]
    return float(test_logs["ndcg@10"]), float(test_logs["hit@10"]), traj


def _run_reference_seqsplit(model_name: str, seed: int):
    """Reference FunkSVD under SEQUENTIAL_SPLIT + point-wise MSE: train the
    unmodified stack, score the test split, return test MSE (twice, to match
    the (metric_a, metric_b) tuple shape of the ranking configs)."""
    import numpy as np
    import torch

    from torchrec.data.SimpleDataReader import SimpleDataReader
    from torchrec.data.adapter.TrainDataset import TrainDataset
    from torchrec.data.adapter.DevDataset import DevDataset
    from torchrec.data.adapter.TestDataset import TestDataset
    from torchrec.data.dataset import SplitMode
    from torchrec.loss.losses import MSELoss
    from torchrec.metric.NDCG import NDCG
    from torchrec.model.FunkSVD import FunkSVD
    from torchrec.task import TrainMode
    from torchrec.utils.const import UID, IID, LABEL

    assert model_name == "funksvd", model_name
    reader = SimpleDataReader(
        dataset=DATASET, split_mode=SplitMode.SEQUENTIAL_SPLIT, warm_n=5,
        vt_ratio=0.1, leave_k=1, neg_sample_n=NEG_N, load_feature=False,
        append_id=False, train_mode=TrainMode.POINT_WISE, random_seed=seed,
    )
    columns = reader.get_feature_column_dict()
    model = FunkSVD(uid_column=columns[UID], iid_column=columns[IID],
                    label_column=columns[LABEL], emb_size=EMB,
                    random_seed=seed)
    # MetricList requires >=1 metric (MetricList.py:8); the ranking metric
    # can't score sequential-split scalar rows, so dev_freq > epochs skips
    # dev eval entirely — both stacks then compare final-epoch test MSE
    # (our side trains patience == epochs, so selection matches)
    model.compile(
        optimizer=torch.optim.Adam(model.get_parameters(), lr=LR),
        loss=MSELoss(), metrics=[NDCG(1 + NEG_N, 10)],
        device=torch.device("cpu"),
    )
    # reference predict() is dead code: it calls self.evaluate_step, a
    # method that exists nowhere (IModel.py:300; predict_step is the
    # intended body, IModel.py:265-270) — alias it so predict() runs
    model.evaluate_step = model.predict_step
    # best-dev-epoch selection to mirror our ModelCheckpoint(monitor=mse,
    # mode=min): one fit() call per epoch, dev MSE via predict, keep the
    # best state_dict, restore before the test pass
    import copy

    def _mse(dataset, labels):
        pred = model.predict(dataset=dataset, batch_size=BATCH,
                             verbose=0, callbacks=None, workers=0)
        return float(np.mean((np.asarray(pred).reshape(-1) - labels) ** 2))

    dev_labels = reader.dev_df[LABEL].to_numpy().astype(np.float64)
    best_mse, best_state = float("inf"), None
    traj = []
    for _ in range(EPOCHS):
        model.fit(
            dataset=TrainDataset(reader), batch_size=BATCH, epochs=1,
            dev_dataset=DevDataset(reader), train_mode=TrainMode.POINT_WISE,
            verbose=0, callbacks=None, shuffle=True, workers=0,
            drop_last=True, dev_freq=2,
        )
        dev_mse = _mse(DevDataset(reader), dev_labels)
        traj.append(dev_mse)
        if dev_mse < best_mse:
            best_mse, best_state = dev_mse, copy.deepcopy(model.state_dict())
    model.load_state_dict(best_state)
    labels = reader.test_df[LABEL].to_numpy().astype(np.float64)
    mse = _mse(TestDataset(reader), labels)
    return mse, mse, traj


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

    models = sys.argv[1:] or MODELS
    results = {}
    for model_name in models:
        results[model_name] = {"ours": [run_ours(model_name, seed) for seed in SEEDS]}

    _patch_reference_paths(work_dir)

    def stats(rows, i):
        vals = np.asarray([r[i] for r in rows])
        return f"{vals.mean():.4f}±{vals.std():.4f}"

    # per-model verdicts print as soon as the reference side finishes, so a
    # late failure can't swallow earlier results
    for model_name in models:
        results[model_name]["ref"] = [run_reference(model_name, seed) for seed in SEEDS]
        ours, theirs = results[model_name]["ours"], results[model_name]["ref"]
        a, b = (("mse", "mse") if model_name.endswith("-seqsplit")
                else ("ndcg@10", "hit@10"))
        print(f"[{model_name}] build     {a} {stats(ours, 0)}  {b} {stats(ours, 1)}")
        print(f"[{model_name}] reference {a} {stats(theirs, 0)}  {b} {stats(theirs, 1)}")
        diff = abs(np.mean([r[0] for r in ours]) - np.mean([r[0] for r in theirs]))
        spread = max(np.std([r[0] for r in ours]), np.std([r[0] for r in theirs]))
        print(f"[{model_name}] {a} mean diff {diff:.4f} vs seed spread {spread:.4f} "
              f"-> {'PARITY' if diff <= max(2 * spread, 0.01) else 'DIVERGENT'}",
              flush=True)
        _trajectory_verdict(model_name, ours, theirs)


def _trajectory_verdict(model_name, ours, theirs):
    """FUTURE #7: per-epoch dev-metric TRAJECTORY parity, not just the end
    point — both stacks' seed-mean dev curves must stay inside each other's
    per-epoch seed envelope, so a build that reaches the same final NDCG by
    a different optimization path (e.g. a silently-wrong lr schedule that a
    longer run would expose) still fails. Both runners return the per-epoch
    dev trajectory as ``r[2]`` (the reference's from its own History,
    torchrec/task/Task.py:241-248 dev_freq=1 protocol)."""
    import numpy as np

    t_ours = [r[2] for r in ours if len(r) > 2 and r[2]]
    t_ref = [r[2] for r in theirs if len(r) > 2 and r[2]]
    if not t_ours or not t_ref:
        return
    n = min(min(map(len, t_ours)), min(map(len, t_ref)))
    a = np.asarray([t[:n] for t in t_ours], dtype=np.float64)  # [seeds, n]
    b = np.asarray([t[:n] for t in t_ref], dtype=np.float64)
    mean_a, mean_b = a.mean(axis=0), b.mean(axis=0)
    per_epoch_diff = np.abs(mean_a - mean_b)
    per_epoch_spread = np.maximum(a.std(axis=0), b.std(axis=0))
    # same rule as the endpoint check, applied at EVERY epoch
    tol = np.maximum(2 * per_epoch_spread, 0.01)
    worst = int(np.argmax(per_epoch_diff - tol))
    corr = float(np.corrcoef(mean_a, mean_b)[0, 1]) if n > 1 else 1.0
    ok = bool(np.all(per_epoch_diff <= tol))
    print(f"[{model_name}] trajectory ({n} epochs): max |mean diff| "
          f"{per_epoch_diff.max():.4f} (epoch {worst}, tol there "
          f"{tol[worst]:.4f}), curve corr {corr:.3f} -> "
          f"{'TRAJECTORY PARITY' if ok else 'TRAJECTORY DIVERGENT'}",
          flush=True)


if __name__ == "__main__":
    main()
