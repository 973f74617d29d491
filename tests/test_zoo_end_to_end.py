"""Zoo-wide end-to-end smoke: every registered model builds via the task
builder, trains, and ranks on the synthetic dataset (the judge-checked
surface — SURVEY §2.3)."""

import os

import numpy as np
import pytest

from pytorchrec_tpu.data.process.datasets.synthetic import (
    generate_synthetic_ctr,
    generate_synthetic_ml,
)
from pytorchrec_tpu.data.schema import TrainMode
from pytorchrec_tpu.models import model_name_list
from pytorchrec_tpu.models.rl import ValueRLModel
from pytorchrec_tpu.tasks import build_model, build_reader, default_reader_kwargs, is_rl_model
from pytorchrec_tpu.training import RLTrainer, Trainer

DATASET = "Synthetic-ML-Zoo"
CTR_DATASET = "Synthetic-CTR-Zoo"  # click+conversion funnel (multi-task family)

MULTITASK = ("shared_bottom", "mmoe", "ple", "esmm")

SMALL_HPARAMS = {
    "funksvd": {"emb_size": 8},
    "ncf": {"emb_size": 8, "layers": (8,)},
    "svdpp": {"emb_size": 8},
    "gru4rec": {"emb_size": 8, "hidden_size": 8},
    "sasrec": {"emb_size": 8, "num_layers": 1, "max_his_len": 5},
    "din": {"emb_size": 8, "att_hidden_units": (8,), "mlp_layers": (8,)},
    "lr": {},
    "fm": {"emb_size": 4},
    "deepfm": {"emb_size": 4, "layers": (8,)},
    "dcn": {"emb_size": 4},
    "dcnv2": {"emb_size": 4},
    "dlrm": {"emb_size": 4, "bottom_layers": (8,), "top_layers": (8,)},
    "two_tower": {"emb_size": 8, "layers": (8,)},
    "shared_bottom": {"emb_size": 4, "bottom_layers": (8,), "tower_layers": (8,)},
    "mmoe": {"emb_size": 4, "n_experts": 2, "expert_layers": (8,),
             "tower_layers": (8,)},
    "ple": {"emb_size": 4, "n_levels": 1, "experts_per_group": 1,
            "expert_layers": (8,), "tower_layers": (8,)},
    "esmm": {"emb_size": 4, "bottom_layers": (8,), "tower_layers": (8,)},
    "dqn": {"emb_size": 8, "hidden_size": 8},
    "deers": {"emb_size": 8, "hidden_size": 8},
    "lsrl": {"emb_size": 8, "hidden_size": 8},
    "lsrl_l": {"emb_size": 8, "hidden_size": 8},
    "lsrl_ps": {"emb_size": 8, "hidden_size": 8},
    "lsrl_lps": {"emb_size": 8, "hidden_size": 8},
    "lsrl_psns": {"emb_size": 8, "hidden_size": 8},
}


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wd")
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = str(tmp)
    generate_synthetic_ml(DATASET, n_users=40, n_items=100, seed=17)
    generate_synthetic_ctr(CTR_DATASET, n_rows=2000, n_dense=2,
                           sparse_vocab_sizes={"c_0": 50, "c_1": 20},
                           seed=17, with_conversion=True)
    yield str(tmp)
    os.environ.pop("PYTORCHREC_TPU_WORK_DIR", None)


def test_every_model_has_small_hparams():
    assert set(SMALL_HPARAMS) == set(model_name_list)


@pytest.mark.parametrize("model_name", model_name_list)
def test_model_end_to_end(dataset_dir, model_name):
    if model_name in MULTITASK:
        # the multi-task family needs the click+conversion funnel dataset
        from pytorchrec_tpu.data import SplitMode

        reader = build_reader(
            model_name, CTR_DATASET, random_seed=2020, warm_n=1,
            split_mode=SplitMode.SEQUENTIAL_SPLIT, vt_ratio=0.1,
            train_mode=TrainMode.POINT_WISE)
        model = build_model(model_name, reader, **SMALL_HPARAMS[model_name])
        trainer = Trainer(model)
        loss = "esmm" if model_name == "esmm" else "bce"
        trainer.compile(optimizer="adam", lr=0.01, loss=loss,
                        metrics=("auc/0", "auc/1"), user_sample_n=1)
        history = trainer.fit(reader, batch_size=64, epochs=1, verbose=0,
                              eval_dev=False)
        assert all(np.isfinite(history.history["loss"])), model_name
        logs = trainer.evaluate(reader, split="dev", batch_size=64)
        assert np.isfinite(logs["auc/0"]), model_name
        return

    reader_kwargs = default_reader_kwargs(
        model_name, neg_sample_n=9, warm_n=5, random_seed=2020,
        train_mode=TrainMode.POINT_WISE,
    )
    if model_name in ("gru4rec", "sasrec", "din"):
        reader_kwargs["max_his_len"] = 5
    if is_rl_model(model_name):
        reader_kwargs["max_state_len"] = 5
        reader_kwargs["rl_sample_len"] = 4
    if model_name == "svdpp":
        reader_kwargs["limit"] = 8

    reader = build_reader(model_name, DATASET, **reader_kwargs)
    model = build_model(model_name, reader, **SMALL_HPARAMS[model_name])

    if isinstance(model, ValueRLModel):
        trainer = RLTrainer(model)
        trainer.compile(optimizer="adam", lr=0.01, loss="mse",
                        metrics=("ndcg@5",), user_sample_n=10)
        history = trainer.fit(reader, batch_size=16, epochs=3, verbose=0,
                              eval_dev=False)
    else:
        trainer = Trainer(model)
        trainer.compile(optimizer="adam", lr=0.01, loss="bce",
                        metrics=("ndcg@5",), user_sample_n=10)
        history = trainer.fit(reader, batch_size=16, epochs=1, verbose=0,
                              eval_dev=False)
    assert all(np.isfinite(history.history["loss"])), model_name
    logs = trainer.evaluate(reader, split="dev", batch_size=16)
    assert np.isfinite(logs["ndcg@5"]), model_name
