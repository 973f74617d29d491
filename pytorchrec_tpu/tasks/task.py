"""Task: one experiment = train → select best epoch → test.

Capability parity with reference task/ITask.py:9-21 and task/Task.py:30-272:
seeds, builds datasets/model, wires ModelCheckpoint + CSVLogger +
EarlyStopping, fits, restores the best weights, evaluates on test with its
own CSVLogger, returns ``(best_epoch, best_dev_logs, test_logs)``.

Differences by design: no ``gpu`` integer (JAX owns device placement; an
optional ``mesh`` shards the run instead), and the task can be built either
from constructed objects (reference style) or from registry names via
``Task.from_config`` (the path the CLI uses — the reference's console
assembly is dead code, Task.py:99-164).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Tuple

from pytorchrec_tpu.data.readers.base import DataReader
from pytorchrec_tpu.data.schema import SplitMode, TrainMode
from pytorchrec_tpu.training import (
    CSVLogger,
    EarlyStopping,
    ModelCheckpoint,
    RLTrainer,
    Trainer,
)
from pytorchrec_tpu.models.rl import ValueRLModel
from pytorchrec_tpu.utils import constants as C

logger = logging.getLogger(__name__)


from pytorchrec_tpu.utils.argument import ArgumentDescription, WithArguments


class ITask(WithArguments):
    """Abstract task (reference ITask.py:9-21)."""

    def run(self):  # pragma: no cover
        raise NotImplementedError


class Task(ITask):
    @classmethod
    def get_argument_descriptions(cls):
        """Declared hyperparameter flag set (reference Task.py:33-76) — the
        same specs console_main's argparse surface is built from."""
        from pytorchrec_tpu.loss import loss_name_list
        from pytorchrec_tpu.models import model_name_list
        from pytorchrec_tpu.optim import optimizer_name_list
        from pytorchrec_tpu.utils.enum_utils import get_enum_values

        return [
            ArgumentDescription("debug", bool, "run without writing artifacts",
                                default_value=False),
            ArgumentDescription("model_name", str, "model name",
                                legal_value_list=model_name_list),
            ArgumentDescription("random_seed", int, "random seed",
                                default_value=2020, lower_closed_bound=0),
            ArgumentDescription("metrics", str, "comma separated, e.g. ndcg@10,hit@5",
                                default_value="ndcg@10"),
            ArgumentDescription("train_mode", str, "training mode",
                                default_value=TrainMode.POINT_WISE.value,
                                legal_value_list=get_enum_values(TrainMode)),
            ArgumentDescription("epoch", int, "training epochs",
                                default_value=100, lower_closed_bound=1),
            ArgumentDescription("batch_size", int, "batch size",
                                default_value=128, lower_closed_bound=1),
            ArgumentDescription("optimizer", str, "optimizer name",
                                default_value="adam",
                                legal_value_list=optimizer_name_list),
            ArgumentDescription("lr", float, "learning rate",
                                default_value=1e-3, lower_open_bound=0),
            ArgumentDescription("l2", float, "weight decay",
                                default_value=0.0, lower_closed_bound=0),
            ArgumentDescription("loss", str, "loss name", default_value="bce",
                                legal_value_list=loss_name_list),
            ArgumentDescription("dev_freq", int, "dev-eval cadence (epochs)",
                                default_value=1, lower_closed_bound=1),
            ArgumentDescription("patience", int, "early-stop patience",
                                default_value=10, lower_closed_bound=0),
            ArgumentDescription("trainer", str,
                                "trainer routing (auto picks the quantized "
                                "trainer for quantized-table models)",
                                default_value="auto",
                                legal_value_list=["auto", "dense", "sparse",
                                                  "quantized"]),
        ]

    @classmethod
    def check_argument_values(cls, arguments):
        """Validates + normalizes (reference Task.py:80-97: metric-name
        format check, TrainMode coercion)."""
        super().check_argument_values(arguments)
        if isinstance(arguments.get("metrics"), str):
            arguments["metrics"] = arguments["metrics"].split(",")
        from pytorchrec_tpu.metric import get_metric

        for name in arguments["metrics"]:
            get_metric(name)  # raises on malformed names
        if isinstance(arguments.get("train_mode"), str):
            arguments["train_mode"] = TrainMode(arguments["train_mode"])

    def __init__(
        self,
        data_reader: DataReader,
        model: Any,
        debug: bool = False,
        random_seed: int = 2020,
        metrics: Optional[List[str]] = None,
        train_mode: Optional[TrainMode] = None,
        epoch: int = 100,
        batch_size: int = 128,
        optimizer: str = "adam",
        lr: float = 1e-3,
        l2: float = 0.0,
        loss: str = "bce",
        dev_freq: int = 1,
        filename: Optional[str] = None,
        monitor: Optional[str] = None,
        monitor_mode: str = "max",
        patience: int = 10,
        verbose: int = 1,
        mesh=None,
        trainer: str = "auto",
        trainer_kwargs=None,
    ):
        self.debug = debug
        self.random_seed = random_seed
        self.metrics = list(metrics or ["ndcg@10"])
        if isinstance(train_mode, str):  # accept the enum's string value
            train_mode = TrainMode(train_mode)
        self.train_mode = train_mode or data_reader.train_mode
        self.data_reader = data_reader
        self.model = model
        self.epoch = epoch
        self.batch_size = batch_size
        self.optimizer = optimizer
        self.lr = lr
        self.l2 = l2
        self.loss = loss
        self.dev_freq = dev_freq
        self.filename = filename or f"{type(model).__name__}_{data_reader.dataset}_{random_seed}"
        self.monitor = monitor or self.metrics[0]
        self.monitor_mode = monitor_mode
        self.patience = patience
        self.verbose = verbose
        self.mesh = mesh

        # trainer routing: "auto" keeps the classic dense trainers for f32
        # models but routes models with quantized byte-row tables to the
        # trainers that can update them (a dense Trainer would hit
        # non-differentiable uint8 leaves); "sparse" opts any model with
        # sparse_table_ids into row-sparse lazy updates; "dense" forces the
        # classic path.
        assert trainer in ("auto", "dense", "sparse", "quantized"), trainer
        tkw = dict(trainer_kwargs or {})  # e.g. {"table_lr": 0.02}
        inner = getattr(model, "qnet", model)  # RL wrapper holds the net
        quantized = bool(getattr(inner, "quantized_table", False)
                         or getattr(inner, "quantized_embedding", False))
        # Misconfiguration fails loudly at construction (ADVICE r4):
        # a dense route cannot honor trainer_kwargs, and a dense trainer
        # on a quantized model would route uint8 leaves into value_and_grad
        # and die later with an opaque JAX error.
        if trainer == "dense":
            assert not quantized, (
                "trainer='dense' on a model with quantized byte-row tables: "
                "dense trainers cannot differentiate uint8 leaves; use "
                "trainer='auto'/'sparse'/'quantized'.")
        if isinstance(model, ValueRLModel):
            from pytorchrec_tpu.training import SparseRLTrainer

            use_sparse = (trainer in ("sparse", "quantized")
                          or (trainer == "auto" and quantized))
            if not use_sparse and tkw:
                raise ValueError(
                    f"trainer_kwargs {sorted(tkw)} given but routing resolved "
                    f"to the dense RLTrainer (trainer={trainer!r}); pass "
                    "trainer='sparse' or drop the kwargs.")
            trainer_cls = SparseRLTrainer if use_sparse else RLTrainer
            self.trainer = trainer_cls(model, mesh=mesh,
                                       **(tkw if use_sparse else {}))
        elif trainer == "quantized" or (trainer == "auto" and quantized):
            from pytorchrec_tpu.training.quantized_trainer import (
                QuantizedEmbeddingTrainer,
            )

            packed = bool(getattr(model, "table_packed", True))
            tkw.setdefault("packed_tables", packed)
            self.trainer = QuantizedEmbeddingTrainer(model, mesh=mesh, **tkw)
        elif trainer == "sparse":
            from pytorchrec_tpu.training import SparseEmbeddingTrainer

            tkw.setdefault("packed_tables", True)
            self.trainer = SparseEmbeddingTrainer(model, mesh=mesh, **tkw)
        else:
            if tkw:
                raise ValueError(
                    f"trainer_kwargs {sorted(tkw)} given but routing resolved "
                    f"to the dense Trainer (trainer={trainer!r}); pass "
                    "trainer='sparse'/'quantized' or drop the kwargs.")
            self.trainer = Trainer(model, mesh=mesh)

    @classmethod
    def from_config(cls, model_name: str, dataset: str,
                    reader_kwargs: Optional[Dict[str, Any]] = None,
                    model_kwargs: Optional[Dict[str, Any]] = None,
                    **task_kwargs) -> "Task":
        """Assemble a task from registry names (the working console path)."""
        from pytorchrec_tpu.tasks.builder import (
            build_model,
            build_reader,
            default_reader_kwargs,
        )

        reader_kwargs = default_reader_kwargs(model_name, **(reader_kwargs or {}))
        reader_kwargs.setdefault("random_seed", task_kwargs.get("random_seed", 2020))
        reader_kwargs.setdefault(
            "train_mode", task_kwargs.get("train_mode", TrainMode.POINT_WISE)
        )
        reader = build_reader(model_name, dataset, **reader_kwargs)
        model = build_model(model_name, reader, **(model_kwargs or {}))
        return cls(data_reader=reader, model=model, **task_kwargs)

    def run(self) -> Tuple[int, Dict[str, float], Dict[str, float]]:
        user_sample_n = 1 + self.data_reader.neg_sample_n \
            if self.data_reader.split_mode == SplitMode.LEAVE_K_OUT else 1
        if user_sample_n == 1 and any("@" in m for m in self.metrics):
            raise ValueError(
                "ranking metrics (ndcg@k/hit@k) need candidate lists, which "
                "only LEAVE_K_OUT provides; with SEQUENTIAL_SPLIT use "
                "point-wise metrics (auc, logloss)"
            )
        self.trainer.compile(
            optimizer=self.optimizer,
            loss=self.loss,
            metrics=self.metrics,
            lr=self.lr,
            weight_decay=self.l2,
            user_sample_n=user_sample_n,
        )

        # debug = no file artifacts, but best weights are still tracked in
        # RAM (filepath=None) so the test eval below really runs at the best
        # dev epoch — the reference's debug mode drops ModelCheckpoint and
        # its load_best_weights then asserts (Task.py:245,258, IModel.py:319)
        model_checkpoint = ModelCheckpoint(
            filepath=None if self.debug else os.path.join(
                C.model_dir(), f"{self.filename}.msgpack"),
            monitor=self.monitor,
            mode=self.monitor_mode,
            save_best_only=True,
        )
        csv_logger = CSVLogger(os.path.join(C.log_dir(), f"{self.filename}.csv"))
        early_stopping = EarlyStopping(
            monitor=self.monitor, mode=self.monitor_mode, patience=self.patience
        )
        callbacks = (
            [model_checkpoint, early_stopping]
            if self.debug
            else [model_checkpoint, csv_logger, early_stopping]
        )

        history = self.trainer.fit(
            self.data_reader,
            batch_size=self.batch_size,
            epochs=self.epoch,
            train_mode=self.train_mode,
            verbose=self.verbose,
            callbacks=callbacks,
            shuffle=True,
            drop_last=True,
            dev_freq=self.dev_freq,
            seed=self.random_seed,
        )
        # expose the per-epoch History for trajectory inspection (the
        # reference stores it on the model: History.py:31 ``self.model.history``)
        self.history = history

        best_epoch, best_dev_logs = history.get_best_epoch_logs(
            self.monitor, self.monitor_mode
        )
        if self.trainer.best_params is not None:
            self.trainer.load_best_weights()

        test_callbacks = [] if self.debug else [
            CSVLogger(os.path.join(C.log_dir(), f"{self.filename}.test.csv"))
        ]
        test_cb_list = None
        if test_callbacks:
            from pytorchrec_tpu.training import CallbackList

            test_cb_list = CallbackList(test_callbacks, trainer=self.trainer)
            test_cb_list.on_train_begin()  # open the CSV file
        test_logs = self.trainer.evaluate(
            self.data_reader, split="test", batch_size=self.batch_size,
            verbose=self.verbose, callbacks=test_cb_list,
        )
        if test_cb_list is not None:
            test_cb_list.on_epoch_end(0, test_logs)
            test_cb_list.set_params({"epochs": 1})
            test_cb_list.on_train_end()

        logger.info(
            "task %s: best_epoch=%d dev=%s test=%s",
            self.filename, best_epoch, best_dev_logs, test_logs,
        )
        return best_epoch, best_dev_logs, test_logs
