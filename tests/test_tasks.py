"""Task-layer tests: Task / RepeatTask / GridSearch harnesses and the CLI,
end-to-end on a hermetic synthetic dataset (reference task/Task.py:212-272,
RepeatTask.py:69-126, GridSearch.py:80-131 semantics)."""

import os

import numpy as np
import pandas as pd
import pytest

from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
from pytorchrec_tpu.data.schema import TrainMode
from pytorchrec_tpu.tasks import GridSearch, RepeatTask, Task, create_params_list, get_task_type
from pytorchrec_tpu.utils import constants as C

DATASET = "Synthetic-ML-Tasks"


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wd")
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = str(tmp)
    generate_synthetic_ml(DATASET, n_users=40, n_items=100, seed=13)
    yield str(tmp)
    os.environ.pop("PYTORCHREC_TPU_WORK_DIR", None)


COMMON = dict(
    metrics=["ndcg@5", "hit@5"],
    epoch=2,
    batch_size=32,
    lr=0.05,
    loss="bce",
    patience=5,
    verbose=0,
)


def test_task_registry():
    assert get_task_type("normal") is Task
    assert get_task_type("repeat") is RepeatTask
    assert get_task_type("grid_search") is GridSearch


def test_task_from_config_end_to_end(dataset_dir):
    task = Task.from_config(
        "funksvd", DATASET,
        reader_kwargs={"neg_sample_n": 9, "warm_n": 5},
        model_kwargs={"emb_size": 8},
        **COMMON,
    )
    best_epoch, best_dev, test_logs = task.run()
    assert 0 <= best_epoch < 2
    assert "ndcg@5" in best_dev and "ndcg@5" in test_logs
    # artifacts written (non-debug)
    assert os.path.exists(os.path.join(C.model_dir(), f"{task.filename}.msgpack"))
    assert os.path.exists(os.path.join(C.log_dir(), f"{task.filename}.csv"))
    assert os.path.exists(os.path.join(C.log_dir(), f"{task.filename}.test.csv"))


def test_task_debug_writes_nothing(dataset_dir):
    task = Task.from_config(
        "funksvd", DATASET, debug=True,
        reader_kwargs={"neg_sample_n": 9},
        model_kwargs={"emb_size": 8},
        filename="debug_run",
        **COMMON,
    )
    task.run()
    assert not os.path.exists(os.path.join(C.model_dir(), "debug_run.msgpack"))
    assert not os.path.exists(os.path.join(C.log_dir(), "debug_run.csv"))


def test_repeat_task(dataset_dir):
    task = RepeatTask(
        repeat_num=2,
        model_name="funksvd",
        dataset=DATASET,
        reader_kwargs={"neg_sample_n": 9},
        model_kwargs={"emb_size": 8},
        **COMMON,
    )
    df = task.run()
    assert len(df) == 2
    assert df["seed"].tolist() == [2020, 2021]
    assert "test_ndcg@5" in df.columns
    assert os.path.exists(task.log_filename)


def test_grid_search(dataset_dir):
    model_grid = create_params_list({}, {"emb_size": [4, 8]})
    optim_grid = create_params_list({}, {"lr": [0.05]})
    assert len(model_grid) == 2
    task = GridSearch(
        model_name="funksvd",
        dataset=DATASET,
        model_params_list=model_grid,
        optimizer_params_list=optim_grid,
        reader_kwargs={"neg_sample_n": 9},
        **{k: v for k, v in COMMON.items() if k != "lr"},
    )
    df = task.run()
    assert len(df) == 2
    assert set(df["emb_size"]) == {"4", "8"}
    assert os.path.exists(task.log_filename)


def test_cli_end_to_end(dataset_dir):
    from pytorchrec_tpu.console_main import main

    rc = main([
        "--model_name", "funksvd",
        "--dataset", DATASET,
        "--epoch", "1",
        "--batch_size", "32",
        "--metrics", "ndcg@5",
        "--loss", "bce",
        "--verbose", "0",
        "--reader", "neg_sample_n=9",
        "--model", "emb_size=8",
    ])
    assert rc == 0


def test_cli_rejects_unknown_model(dataset_dir):
    from pytorchrec_tpu.console_main import main

    with pytest.raises(SystemExit):
        main(["--model_name", "nope", "--dataset", DATASET])
