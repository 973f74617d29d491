"""Quality-validation runs: RepeatTask over N seeds per model, mean +/- std.

The BASELINE.md measurement protocol (mirroring the reference's RepeatTask
discipline, task/RepeatTask.py:69-126): fixed seeds, N repeats, leave-1-out
with 99 sampled negatives, report NDCG@10/Hit@10 mean +/- std. Runs on a
synthetic MovieLens-like dataset with planted latent structure so learning is
measurable; swap the dataset name for real MovieLens-100K once its raw files
are present under RawData/.

Usage: python scripts/quality_run.py [--repeats 3] [--epochs 30]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--models", type=str, default="",
                        help="comma-separated subset of the config list "
                             "(e.g. 'din,sasrec' for the on-chip "
                             "Pallas-kernel quality rows)")
    parser.add_argument("--sequential", action="store_true",
                        help="run on the Markov-structured dataset where the "
                             "next item's cluster is predictable from history "
                             "order — sequence models should WIN here")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")


    from pytorchrec_tpu.data.process.datasets import generate_synthetic_ml
    from pytorchrec_tpu.data.schema import SplitMode, TrainMode
    from pytorchrec_tpu.tasks import RepeatTask
    from pytorchrec_tpu.utils import constants as C

    if args.sequential:
        dataset = "Synthetic-ML-Markov"
        if not os.path.exists(os.path.join(C.dataset_dir(), dataset)):
            generate_synthetic_ml(dataset, n_users=500, n_items=1000,
                                  min_interactions=30, max_interactions=80,
                                  seed=42, markov_strength=0.8, n_clusters=20)
        # all pairwise-BPR: interacted-vs-random IS next-item prediction,
        # the protocol where history order pays off
        configs = [
            # factorization baselines: only static affinity, should LOSE
            ("funksvd", {"emb_size": 64}, "bpr", TrainMode.PAIR_WISE, {}),
            ("ncf", {"emb_size": 32, "layers": (32,)}, "bpr",
             TrainMode.PAIR_WISE, {}),
            # sequence zoo: history order reveals the successor cluster
            ("sasrec", {"emb_size": 32, "num_layers": 1, "max_his_len": 10},
             "bpr", TrainMode.PAIR_WISE, {"max_his_len": 10}),
            ("gru4rec", {"emb_size": 32, "hidden_size": 32}, "bpr",
             TrainMode.PAIR_WISE, {"max_his_len": 10}),
            ("din", {"emb_size": 32}, "bpr",
             TrainMode.PAIR_WISE, {"max_his_len": 10}),
        ]
    else:
        dataset = "Synthetic-ML-Quality"
        if not os.path.exists(os.path.join(C.dataset_dir(), dataset)):
            generate_synthetic_ml(dataset, n_users=500, n_items=1000,
                                  min_interactions=30, max_interactions=80,
                                  seed=42)
        configs = [
            ("funksvd", {"emb_size": 64}, "bpr", TrainMode.PAIR_WISE, {}),
            ("ncf", {"emb_size": 32, "layers": (32,)}, "bpr", TrainMode.PAIR_WISE, {}),
            ("fm", {"emb_size": 32}, "bpr", TrainMode.PAIR_WISE, {"load_feature": True}),
            ("sasrec", {"emb_size": 32, "num_layers": 1, "max_his_len": 10}, "bce",
             TrainMode.POINT_WISE, {"max_his_len": 10}),
            ("gru4rec", {"emb_size": 32, "hidden_size": 32}, "bce",
             TrainMode.POINT_WISE, {"max_his_len": 10}),
        ]
    if args.models:
        keep = {m.strip() for m in args.models.split(",")}
        configs = [c for c in configs if c[0] in keep]
    rows = []
    for model_name, hp, loss, mode, extra_reader in configs:
        task = RepeatTask(
            repeat_num=args.repeats,
            model_name=model_name,
            dataset=dataset,
            reader_kwargs={"split_mode": SplitMode.LEAVE_K_OUT, "warm_n": 5,
                           "leave_k": 1, "neg_sample_n": 99,
                           "neg_sample_mode": "fast", **extra_reader},
            model_kwargs=hp,
            metrics=["ndcg@10", "hit@10"],
            train_mode=mode,
            epoch=args.epochs,
            batch_size=256,
            lr=1e-3 if model_name in ("sasrec", "gru4rec") else 5e-3,
            loss=loss,
            patience=5,
            verbose=0,
        )
        df = task.run()
        ndcg = df["test_ndcg@10"].astype(float)
        hit = df["test_hit@10"].astype(float)
        line = (f"{model_name:8s} ndcg@10 {ndcg.mean():.4f}±{ndcg.std():.4f}  "
                f"hit@10 {hit.mean():.4f}±{hit.std():.4f}")
        print(line, flush=True)
        rows.append(line)
    print("\n".join(rows))


if __name__ == "__main__":
    main()
