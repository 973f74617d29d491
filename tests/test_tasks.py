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


def test_task_argument_descriptions():
    from pytorchrec_tpu.tasks import Task

    descriptions = {d.name: d for d in Task.get_argument_descriptions()}
    # the reference's declared hyperparameter block (Task.py:33-76)
    for name in ("debug", "model_name", "random_seed", "metrics", "train_mode",
                 "epoch", "batch_size", "optimizer", "lr", "l2", "loss", "dev_freq"):
        assert name in descriptions, name

    args = {"model_name": "funksvd", "metrics": "ndcg@10,hit@5",
            "train_mode": "pair_wise"}
    Task.check_argument_values(args)
    assert args["metrics"] == ["ndcg@10", "hit@5"]
    from pytorchrec_tpu.data.schema import TrainMode as TM
    assert args["train_mode"] == TM.PAIR_WISE
    assert args["epoch"] == 100  # default filled

    with pytest.raises(ValueError):
        Task.check_argument_values({"model_name": "nope", "metrics": "ndcg@10"})
    with pytest.raises(ValueError):
        Task.check_argument_values({"model_name": "funksvd", "metrics": "bogus@x"})


def test_dataset_adapters(dataset_dir):
    from pytorchrec_tpu.data.adapter import DevDataset, TestDataset, TrainDataset
    from pytorchrec_tpu.data import SimpleDataReader, SplitMode, TrainMode

    reader = SimpleDataReader(
        DATASET, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
        neg_sample_n=9, train_mode=TrainMode.PAIR_WISE, random_seed=2020,
    )
    train, dev, test = TrainDataset(reader), DevDataset(reader), TestDataset(reader)
    assert len(train) == reader.get_train_dataset_size()
    assert len(dev) == reader.get_dev_dataset_size()
    train.train_neg_sample()
    item = train[0]
    assert item["iid"].shape == (2,)  # pairwise [pos, neg]
    assert dev[0]["iid"].shape == (10,)


def test_cli_grid_search(dataset_dir):
    from pytorchrec_tpu.console_main import main

    rc = main([
        "--task_name", "grid_search",
        "--model_name", "funksvd",
        "--dataset", DATASET,
        "--epoch", "1",
        "--batch_size", "32",
        "--metrics", "ndcg@5",
        "--verbose", "0",
        "--reader", "neg_sample_n=9",
        "--grid_model", "emb_size=4,8",
        "--grid_lr", "0.05",
    ])
    assert rc == 0
    import glob

    from pytorchrec_tpu.utils import constants as C

    tsvs = glob.glob(os.path.join(C.grid_search_dir(), "*grid_search*"))
    assert tsvs
    with open(tsvs[0]) as f:
        assert len(f.read().strip().split("\n")) == 3  # header + 2 combos


def test_rank_metrics_rejected_on_sequential_split(dataset_dir):
    from pytorchrec_tpu.data.schema import SplitMode

    task = Task.from_config(
        "funksvd", DATASET,
        reader_kwargs={"split_mode": SplitMode.SEQUENTIAL_SPLIT, "warm_n": 1,
                       "vt_ratio": 0.1},
        model_kwargs={"emb_size": 4},
        metrics=["ndcg@5"], epoch=1, batch_size=32, verbose=0, debug=True,
    )
    with pytest.raises(ValueError, match="candidate lists"):
        task.run()

    # auc works fine on sequential split
    ok = Task.from_config(
        "funksvd", DATASET,
        reader_kwargs={"split_mode": SplitMode.SEQUENTIAL_SPLIT, "warm_n": 1,
                       "vt_ratio": 0.1},
        model_kwargs={"emb_size": 4},
        metrics=["auc"], epoch=1, batch_size=32, verbose=0, debug=True,
    )
    _, dev, test = ok.run()
    assert 0.0 <= test["auc"] <= 1.0


def test_cli_repeat_task(dataset_dir):
    from pytorchrec_tpu.console_main import main

    rc = main([
        "--task_name", "repeat",
        "--repeat_num", "2",
        "--model_name", "funksvd",
        "--dataset", DATASET,
        "--epoch", "1",
        "--batch_size", "32",
        "--metrics", "ndcg@5",
        "--verbose", "0",
        "--reader", "neg_sample_n=9",
        "--model", "emb_size=4",
    ])
    assert rc == 0
    import glob

    tsvs = glob.glob(os.path.join(C.repeat_task_dir(), "*repeat*"))
    assert tsvs


def test_trainer_auto_routing(dataset_dir):
    """Task routes quantized-table models to the trainers that can update
    uint8 byte-row leaves (a dense Trainer would crash on them), both for
    plain models and the RL wrapper; f32 models keep the classic trainers;
    explicit 'sparse' opts in row-sparse updates."""
    from pytorchrec_tpu.tasks import Task
    from pytorchrec_tpu.training import (
        RLTrainer,
        SparseEmbeddingTrainer,
        SparseRLTrainer,
        Trainer,
    )
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )

    def mk(model_name, **mk_kwargs):
        kwargs = {"reader_kwargs": {"neg_sample_n": 9},
                  "model_kwargs": mk_kwargs, "epoch": 1, "verbose": 0}
        if model_name == "dqn":
            kwargs["reader_kwargs"].update(max_state_len=5, rl_sample_len=4)
            kwargs["loss"] = "mse"
        return Task.from_config(model_name, DATASET, **kwargs)

    assert type(mk("funksvd").trainer) is Trainer
    assert type(mk("funksvd", quantized_table=True).trainer) \
        is QuantizedEmbeddingTrainer
    assert type(mk("dqn").trainer) is RLTrainer
    assert type(mk("dqn", quantized_table=True).trainer) is SparseRLTrainer

    t = Task.from_config("funksvd", DATASET,
                         reader_kwargs={"neg_sample_n": 9},
                         model_kwargs={}, epoch=1, verbose=0,
                         trainer="sparse")
    assert type(t.trainer) is SparseEmbeddingTrainer
