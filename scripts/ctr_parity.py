"""CTR quality parity: our DCN-v2 vs an equivalent torch DCN-v2, same data.

The reference has no CTR models, so this compares against a faithful torch
implementation of the same architecture (the reference's stack: torch
modules, dense Adam, normal(0, 0.01) init per IModel.py:61-68), trained on
IDENTICAL batches served by our reader, evaluated on the same dev rows with
the same AUC/logloss implementations. Covers the BASELINE "AUC/logloss
parity (CTR)" criterion on synthetic Criteo-like data (real Criteo raw data
cannot be downloaded in this zero-egress environment; the formatter is
ready).

Usage: PYTORCHREC_TPU_WORK_DIR=/tmp/ctr_parity python scripts/ctr_parity.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = [0, 1, 2]
EPOCHS = 3
BATCH = 512
LR = 1e-3
EMB = 16
CROSS = 2
MLP = (64, 32)
DATASET = "Synthetic-Criteo-Parity"


def get_reader(seed: int):
    from pytorchrec_tpu.data import CTRDataReader, SplitMode, TrainMode

    return CTRDataReader(
        DATASET, split_mode=SplitMode.SEQUENTIAL_SPLIT, warm_n=1, vt_ratio=0.1,
        train_mode=TrainMode.POINT_WISE, random_seed=seed,
    )


def feature_lists(reader):
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )

    cols = reader.get_feature_column_dict()
    sparse = [c for k, c in sorted(cols.items())
              if isinstance(c, CategoricalColumnWithIdentity)
              and k.startswith("c_")]
    dense = [c for k, c in sorted(cols.items())
             if isinstance(c, NumericColumn) and k.startswith("d_")]
    return sparse, dense, cols["label"]


def run_ours(seed: int):
    import numpy as np

    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training import Trainer

    reader = get_reader(seed)
    sparse, dense, label = feature_lists(reader)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=CROSS,
                  layers=MLP)
    t = Trainer(model)
    t.compile(optimizer="adam", lr=LR, loss="bce",
              metrics=("auc", "logloss"), user_sample_n=1)
    t.fit(reader, batch_size=BATCH, epochs=EPOCHS, verbose=0, eval_dev=False,
          seed=seed)
    logs = t.evaluate(reader, split="dev", batch_size=BATCH)
    return logs["auc"], logs["logloss"]


def run_torch(seed: int):
    import numpy as np
    import torch

    from pytorchrec_tpu.data.loader import eval_batches, train_batches
    from pytorchrec_tpu.metric import AUC, LogLoss

    torch.manual_seed(seed)
    reader = get_reader(seed)
    sparse, dense, _ = feature_lists(reader)
    sparse_names = [c.feature_name for c in sparse]
    dense_cols = list(dense)

    class TorchDCN(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embeddings = torch.nn.ModuleList(
                [torch.nn.Embedding(c.category_num, EMB) for c in sparse]
            )
            d = len(sparse) * EMB + len(dense_cols)
            self.cross_w = torch.nn.ParameterList(
                [torch.nn.Parameter(torch.empty(d, d)) for _ in range(CROSS)])
            self.cross_b = torch.nn.ParameterList(
                [torch.nn.Parameter(torch.empty(d)) for _ in range(CROSS)])
            mlp, prev = [], d
            for units in MLP:
                mlp += [torch.nn.Linear(prev, units), torch.nn.ReLU()]
                prev = units
            self.mlp = torch.nn.Sequential(*mlp)
            self.head = torch.nn.Linear(d + MLP[-1], 1)
            # reference init policy: normal(0, 0.01) everywhere
            for p in self.parameters():
                torch.nn.init.normal_(p, 0.0, 0.01)

        def forward(self, sparse_ids, dense_vals):
            embs = [emb(ids) for emb, ids in zip(self.embeddings, sparse_ids)]
            x0 = torch.cat(embs + [dense_vals], dim=-1)
            x = x0
            for w, b in zip(self.cross_w, self.cross_b):
                x = x0 * (x @ w + b) + x
            deep = self.mlp(x0)
            return self.head(torch.cat([x, deep], dim=-1))[:, 0]

    def to_torch(batch):
        ids = [torch.from_numpy(np.asarray(batch[n]).astype(np.int64))
               for n in sparse_names]
        vals = torch.from_numpy(np.stack(
            [np.asarray(c.get_feature_data(batch)) for c in dense_cols], axis=-1
        ))
        return ids, vals

    model = TorchDCN()
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    loss_fn = torch.nn.BCEWithLogitsLoss()
    rng = np.random.default_rng(seed)
    for _ in range(EPOCHS):
        for batch in train_batches(reader, BATCH, rng):
            ids, vals = to_torch(batch)
            labels = torch.from_numpy(np.asarray(batch["label"], np.float32))
            opt.zero_grad()
            loss = loss_fn(model(ids, vals), labels)
            loss.backward()
            opt.step()

    scores, labels = [], []
    with torch.no_grad():
        for batch, valid in eval_batches(reader, "dev", BATCH):
            ids, vals = to_torch(batch)
            scores.append(model(ids, vals).numpy()[:valid])
            labels.append(np.asarray(batch["label"])[:valid])
    s, l = np.concatenate(scores), np.concatenate(labels)
    return float(AUC()(s, l)), float(LogLoss()(s, l))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pytorchrec_tpu.data.process.datasets import generate_synthetic_ctr
    from pytorchrec_tpu.utils import constants as C

    if not os.path.exists(os.path.join(C.dataset_dir(), DATASET)):
        generate_synthetic_ctr(DATASET, n_rows=200_000, seed=7)

    ours = [run_ours(s) for s in SEEDS]
    torch_side = [run_torch(s) for s in SEEDS]

    o, r = np.asarray(ours), np.asarray(torch_side)
    print(f"[dcn-ctr] build auc {o[:,0].mean():.4f}±{o[:,0].std():.4f}  "
          f"logloss {o[:,1].mean():.4f}±{o[:,1].std():.4f}")
    print(f"[dcn-ctr] torch auc {r[:,0].mean():.4f}±{r[:,0].std():.4f}  "
          f"logloss {r[:,1].mean():.4f}±{r[:,1].std():.4f}")
    diff = abs(o[:, 0].mean() - r[:, 0].mean())
    spread = max(o[:, 0].std(), r[:, 0].std())
    print(f"[dcn-ctr] auc mean diff {diff:.4f} vs seed spread {spread:.4f} "
          f"-> {'PARITY' if diff <= max(2 * spread, 0.001) else 'DIVERGENT'}")


if __name__ == "__main__":
    main()
