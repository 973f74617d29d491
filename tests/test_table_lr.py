"""table_lr footgun closure (VERDICT r4 #6): rowwise-Adagrad-style tables
(quantized byte rows, or table_optimizer="rowwise_adagrad") undertrain the
sequence family at the shared dense lr. Sequence models now carry a
measured ``table_lr_hint`` consumed by every sparse/quantized trainer
(training/sparse_trainer.py::resolve_table_lr), so a fresh user flipping
``quantized_table=True`` can no longer silently reproduce the broken
config (GRU4Rec int8 NDCG@10 0.044 vs 0.191 tuned — RESULTS.md round 4).
"""

import logging
import os

import pytest

from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
from pytorchrec_tpu.data.schema import SplitMode, TrainMode
from pytorchrec_tpu.tasks import Task

DATASET = "Synthetic-ML-TableLr"
READER_KWARGS = {
    "split_mode": SplitMode.LEAVE_K_OUT, "warm_n": 5, "leave_k": 1,
    "neg_sample_n": 99, "neg_sample_mode": "fast", "max_his_len": 10,
}


@pytest.fixture(scope="module")
def markov_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wd")
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = str(tmp)
    # the Markov sequential benchmark (quality_run.py --sequential): the
    # next item's cluster is predictable from history order, the protocol
    # where the sequence family's table-lr sensitivity shows
    generate_synthetic_ml(DATASET, n_users=500, n_items=1000,
                          min_interactions=30, max_interactions=80,
                          seed=42, markov_strength=0.8, n_clusters=20)
    yield DATASET
    os.environ.pop("PYTORCHREC_TPU_WORK_DIR", None)


def _gru4rec_int8_task(dataset, trainer_kwargs=None):
    return Task.from_config(
        "gru4rec", dataset, reader_kwargs=dict(READER_KWARGS),
        model_kwargs={"emb_size": 32, "hidden_size": 32,
                      "quantized_table": True},
        metrics=["ndcg@10"], train_mode=TrainMode.PAIR_WISE,
        epoch=30, batch_size=256, lr=1e-3, loss="bpr", patience=5,
        verbose=0, random_seed=2020, trainer_kwargs=trainer_kwargs)


class TestResolution:
    """Fast mechanical checks of the resolution order."""

    def test_hint_applies_to_quantized_sequence_model(self, markov_dataset):
        t = _gru4rec_int8_task(markov_dataset)
        t.trainer.compile(loss="bpr", optimizer="adam", lr=1e-3)
        assert t.trainer._table_lr == pytest.approx(2e-2)  # GRU4Rec hint

    def test_explicit_override_wins(self, markov_dataset):
        t = _gru4rec_int8_task(markov_dataset,
                               trainer_kwargs={"table_lr": 7e-3})
        t.trainer.compile(loss="bpr", optimizer="adam", lr=1e-3)
        assert t.trainer._table_lr == pytest.approx(7e-3)

    def test_lazy_adam_f32_keeps_shared_lr(self, markov_dataset):
        # f32 lazy-Adam tables match dense quality at the shared lr
        # (RESULTS.md) — the hint must NOT hijack them
        t = Task.from_config(
            "gru4rec", markov_dataset, reader_kwargs=dict(READER_KWARGS),
            model_kwargs={"emb_size": 32, "hidden_size": 32},
            metrics=["ndcg@10"], train_mode=TrainMode.PAIR_WISE,
            epoch=1, batch_size=256, lr=1e-3, loss="bpr", verbose=0,
            trainer="sparse")
        t.trainer.compile(loss="bpr", optimizer="adam", lr=1e-3)
        assert t.trainer.table_optimizer == "adam"
        assert t.trainer._table_lr == pytest.approx(1e-3)

    def test_warning_when_rowwise_falls_back(self, markov_dataset, caplog):
        # a model WITHOUT a hint (funksvd) on rowwise tables warns loudly
        t = Task.from_config(
            "funksvd", markov_dataset, reader_kwargs=dict(READER_KWARGS),
            model_kwargs={"emb_size": 16},
            metrics=["ndcg@10"], train_mode=TrainMode.PAIR_WISE,
            epoch=1, batch_size=256, lr=1e-3, loss="bpr", verbose=0,
            trainer="sparse",
            trainer_kwargs={"table_optimizer": "rowwise_adagrad"})
        assert getattr(t.trainer.model, "table_lr_hint", None) is None
        with caplog.at_level(logging.WARNING,
                             logger="pytorchrec_tpu.training.sparse_trainer"):
            t.trainer.compile(loss="bpr", optimizer="adam", lr=1e-3)
        assert any("ABSOLUTE table lr" in r.getMessage()
                   for r in caplog.records)
        assert t.trainer._table_lr == pytest.approx(1e-3)


@pytest.mark.slow
def test_gru4rec_int8_quality_pinned(markov_dataset):
    """The quality regression the footgun caused: default routing (no
    trainer_kwargs at all) must land at the tuned quality, and the broken
    shared-lr config must stay measurably behind it (calibrated on this
    exact seed/protocol: 0.2352 tuned vs 0.0392 shared, 2026-08-20)."""
    _, _, tuned_logs = _gru4rec_int8_task(markov_dataset).run()
    tuned = float(tuned_logs["ndcg@10"])
    assert tuned >= 0.12, tuned_logs

    _, _, broken_logs = _gru4rec_int8_task(
        markov_dataset, trainer_kwargs={"table_lr": 1e-3}).run()
    broken = float(broken_logs["ndcg@10"])
    assert tuned > 2 * broken, (tuned, broken)
