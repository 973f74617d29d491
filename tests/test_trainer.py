"""Trainer + callback tests: the Keras-parity lifecycle on a jitted core,
end-to-end on a hermetic synthetic dataset (reference IModel.py:94-321,
IValueRLModel.py:95-185 semantics)."""

import os

import numpy as np
import pytest

from pytorchrec_tpu.data import SimpleDataReader, SplitMode, TrainMode, ValueRLDataReader
from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
from pytorchrec_tpu.models import FunkSVD, DQNQNet
from pytorchrec_tpu.models.rl import ValueRLModel
from pytorchrec_tpu.training import (
    CSVLogger,
    EarlyStopping,
    ModelCheckpoint,
    RLTrainer,
    TerminateOnNaN,
    Trainer,
)
from pytorchrec_tpu.utils import constants as C

DATASET = "Synthetic-ML-Trainer"


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wd")
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = str(tmp)
    generate_synthetic_ml(DATASET, n_users=50, n_items=120, seed=11)
    yield str(tmp)
    os.environ.pop("PYTORCHREC_TPU_WORK_DIR", None)


def make_reader(train_mode=TrainMode.POINT_WISE, **kwargs):
    return SimpleDataReader(
        DATASET,
        split_mode=SplitMode.LEAVE_K_OUT,
        warm_n=5,
        leave_k=1,
        neg_sample_n=9,
        train_mode=train_mode,
        random_seed=2020,
        **kwargs,
    )


def make_trainer(reader, loss="bce", metrics=("ndcg@5", "hit@5")):
    columns = reader.get_feature_column_dict()
    model = FunkSVD(
        uid_column=columns[C.UID],
        iid_column=columns[C.IID],
        label_column=columns[C.LABEL],
        emb_size=8,
    )
    trainer = Trainer(model)
    trainer.compile(
        optimizer="adam", lr=0.05, loss=loss, metrics=metrics, user_sample_n=10
    )
    return trainer


def test_fit_pointwise_end_to_end(dataset_dir):
    reader = make_reader()
    trainer = make_trainer(reader)
    history = trainer.fit(reader, batch_size=32, epochs=3, verbose=0, dev_freq=1)
    assert len(history.epoch) == 3
    assert "loss" in history.history and "ndcg@5" in history.history
    losses = history.history["loss"]
    assert all(np.isfinite(losses))
    # learning happened: loss went down
    assert losses[-1] < losses[0]


def test_fit_pairwise_bpr(dataset_dir):
    reader = make_reader(train_mode=TrainMode.PAIR_WISE)
    trainer = make_trainer(reader, loss="bpr")
    history = trainer.fit(reader, batch_size=32, epochs=2, verbose=0)
    assert all(np.isfinite(history.history["loss"]))


def test_evaluate_and_predict(dataset_dir):
    reader = make_reader()
    trainer = make_trainer(reader)
    trainer.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    logs = trainer.evaluate(reader, split="test", batch_size=16)
    assert set(logs) == {"ndcg@5", "hit@5"}
    assert 0.0 <= logs["hit@5"] <= 1.0
    preds = trainer.predict(reader, split="test", batch_size=16)
    assert preds.shape == (reader.get_test_dataset_size(), 10)


def test_weights_roundtrip_and_best(dataset_dir):
    reader = make_reader()
    trainer = make_trainer(reader)
    trainer.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    p1 = trainer.predict(reader, split="dev", batch_size=16)

    path = os.path.join(dataset_dir, "w.msgpack")
    trainer.save_weights(path)
    trainer.save_best_weights()
    # keep training, weights drift
    trainer.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    p2 = trainer.predict(reader, split="dev", batch_size=16)
    assert not np.allclose(p1, p2)
    # disk restore
    trainer.load_weights(path)
    assert np.allclose(trainer.predict(reader, split="dev", batch_size=16), p1)
    # RAM restore
    trainer.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    trainer.load_best_weights()
    assert np.allclose(trainer.predict(reader, split="dev", batch_size=16), p1)


def test_full_checkpoint_resume(dataset_dir):
    reader = make_reader()
    trainer = make_trainer(reader)
    trainer.fit(reader, batch_size=32, epochs=2, verbose=0, eval_dev=False, seed=5)
    path = os.path.join(dataset_dir, "ckpt.pkl")
    trainer.save_checkpoint(path)
    step_before = int(trainer.state.step)

    trainer2 = make_trainer(reader)
    trainer2.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False, seed=99)
    trainer2.restore_checkpoint(path)
    assert int(trainer2.state.step) == step_before
    # params + opt state identical
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state.params),
        jax.tree_util.tree_leaves(trainer2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_callbacks_early_stop_checkpoint_csv(dataset_dir):
    reader = make_reader()
    trainer = make_trainer(reader)
    csv_path = os.path.join(dataset_dir, "log.tsv")
    ckpt_path = os.path.join(dataset_dir, "best.msgpack")
    history = trainer.fit(
        reader,
        batch_size=32,
        epochs=10,
        verbose=0,
        dev_freq=1,
        callbacks=[
            EarlyStopping(monitor="ndcg@5", mode="max", patience=1),
            ModelCheckpoint(ckpt_path, monitor="ndcg@5", mode="max", save_best_only=True),
            CSVLogger(csv_path),
            TerminateOnNaN(),
        ],
    )
    assert os.path.exists(csv_path)
    assert os.path.exists(ckpt_path)
    assert trainer.best_params is not None
    with open(csv_path) as f:
        lines = f.read().strip().split("\n")
    assert lines[0].startswith("epoch")
    assert len(lines) == 10 + 1  # NA-filled to `epochs` rows on early stop
    best_epoch, best_logs = history.get_best_epoch_logs("ndcg@5", mode="max")
    assert best_logs["ndcg@5"] == max(history.history["ndcg@5"])


def test_rl_trainer_dqn(dataset_dir):
    reader = ValueRLDataReader(
        DATASET,
        split_mode=SplitMode.LEAVE_K_OUT,
        warm_n=5,
        leave_k=1,
        neg_sample_n=9,
        train_mode=TrainMode.POINT_WISE,
        random_seed=2020,
        max_state_len=5,
        use_neg_state=False,
        rl_sample_len=4,
    )
    columns = reader.get_feature_column_dict()
    qnet = DQNQNet(
        iid_column=columns[C.IID],
        state_column=columns[C.POS_STATE],
        state_len_column=columns[C.POS_STATE_LEN],
        next_state_column=columns[C.POS_NEXT_STATE],
        next_state_len_column=columns[C.POS_NEXT_STATE_LEN],
        rl_sample_column=columns[C.RL_SAMPLE],
        emb_size=8,
        hidden_size=8,
    )
    model = ValueRLModel(qnet, reward_column=columns[C.RATE], gamma=0.9, update_freq=3)
    trainer = RLTrainer(model)
    trainer.compile(optimizer="adam", lr=0.01, loss="mse",
                    metrics=("ndcg@5",), user_sample_n=10)
    # "epochs" are batches in the RL family
    history = trainer.fit(reader, batch_size=16, epochs=8, verbose=0, dev_freq=4)
    assert len(history.epoch) == 8
    assert all(np.isfinite(history.history["loss"]))
    assert "ndcg@5" in history.history  # dev eval fired at batches 4 and 8
    logs = trainer.evaluate(reader, split="test", batch_size=16)
    assert "ndcg@5" in logs


def test_make_serving_fn(dataset_dir):
    reader = make_reader()
    trainer = make_trainer(reader)
    trainer.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    serve = trainer.make_serving_fn()
    batch = reader.get_batch("test", np.arange(8))
    scores = serve(batch)
    assert scores.shape == (8, 10)
    # matches the trainer's own eval path
    ref, _ = trainer._eval_step(batch)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref), rtol=1e-6)


def test_rl_target_sync_cadence(dataset_dir):
    """target := params exactly every update_freq steps (reference
    IValueRLModel.py:173-175 semantics), in-jit."""
    import jax

    reader = ValueRLDataReader(
        DATASET, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
        neg_sample_n=9, train_mode=TrainMode.POINT_WISE, random_seed=2020,
        max_state_len=5, use_neg_state=False, rl_sample_len=4,
    )
    columns = reader.get_feature_column_dict()
    qnet = DQNQNet(
        iid_column=columns[C.IID], state_column=columns[C.POS_STATE],
        state_len_column=columns[C.POS_STATE_LEN],
        next_state_column=columns[C.POS_NEXT_STATE],
        next_state_len_column=columns[C.POS_NEXT_STATE_LEN],
        rl_sample_column=columns[C.RL_SAMPLE], emb_size=8, hidden_size=8,
    )
    model = ValueRLModel(qnet, reward_column=columns[C.RATE], gamma=0.9, update_freq=3)
    trainer = RLTrainer(model)
    trainer.compile(optimizer="adam", lr=0.01, loss="mse", metrics=("ndcg@5",),
                    user_sample_n=10)
    batch = reader.get_batch("train", np.arange(16))
    trainer.init_state(batch, seed=0)

    def same(a, b):
        return all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    for step in range(1, 7):
        trainer._train_step(batch)
        synced = same(trainer.state.params, trainer.state.target_params)
        assert synced == (step % 3 == 0), (step, synced)


def test_rl_scan_batches_matches_per_batch(dataset_dir):
    """scan_batches: fused RL windows produce the same params as per-batch
    dispatch (target sync cadence preserved inside the scan)."""
    import jax

    def run(scan_batches):
        reader = ValueRLDataReader(
            DATASET, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
            neg_sample_n=9, train_mode=TrainMode.POINT_WISE, random_seed=2020,
            max_state_len=5, use_neg_state=False, rl_sample_len=4,
        )
        columns = reader.get_feature_column_dict()
        qnet = DQNQNet(
            iid_column=columns[C.IID], state_column=columns[C.POS_STATE],
            state_len_column=columns[C.POS_STATE_LEN],
            next_state_column=columns[C.POS_NEXT_STATE],
            next_state_len_column=columns[C.POS_NEXT_STATE_LEN],
            rl_sample_column=columns[C.RL_SAMPLE], emb_size=8, hidden_size=8,
        )
        model = ValueRLModel(qnet, reward_column=columns[C.RATE], gamma=0.9,
                             update_freq=3)
        trainer = RLTrainer(model)
        trainer.compile(optimizer="adam", lr=0.01, loss="mse",
                        metrics=("ndcg@5",), user_sample_n=10)
        trainer.fit(reader, batch_size=16, epochs=8, verbose=0, dev_freq=4,
                    seed=3, scan_batches=scan_batches)
        return trainer

    t1 = run(1)
    t4 = run(4)
    # ragged: dev_freq=4 not a multiple of 3 -> windows k=3,1,3,1 (exercises
    # the min() window shrink and the re-jit on k change)
    t3 = run(3)
    assert int(t1.state.step) == int(t4.state.step) == int(t3.state.step) == 8
    for tN in (t4, t3):
        for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                        jax.tree_util.tree_leaves(tN.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
        # target nets identical too (sync happened inside the scan)
        for a, b in zip(jax.tree_util.tree_leaves(t1.state.target_params),
                        jax.tree_util.tree_leaves(tN.state.target_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_matmul_precision_option(dataset_dir):
    reader = make_reader()
    trainer = make_trainer(reader)
    trainer.matmul_precision = "bfloat16"
    h = trainer.fit(reader, batch_size=32, epochs=2, verbose=0, dev_freq=2)
    assert all(np.isfinite(h.history["loss"]))
    assert h.history["loss"][-1] < h.history["loss"][0]


def test_rl_load_pretrain_embedding(dataset_dir):
    """Warm-start the DQN item table from a FunkSVD checkpoint (the hook the
    reference declares but leaves as dead code, DQN.py:89-92)."""
    # pretrain FunkSVD and save its weights
    reader = make_reader()
    pre = make_trainer(reader)
    pre.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    path = os.path.join(dataset_dir, "pretrain.msgpack")
    pre.save_weights(path)
    pretrained_table = np.asarray(pre.state.params["i_embeddings"]["embedding"])

    # RL model warm-started from it
    rl_reader = ValueRLDataReader(
        DATASET, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
        neg_sample_n=9, train_mode=TrainMode.POINT_WISE, random_seed=2020,
        max_state_len=5, use_neg_state=False, rl_sample_len=4,
    )
    columns = rl_reader.get_feature_column_dict()
    qnet = DQNQNet(
        iid_column=columns[C.IID], state_column=columns[C.POS_STATE],
        state_len_column=columns[C.POS_STATE_LEN],
        next_state_column=columns[C.POS_NEXT_STATE],
        next_state_len_column=columns[C.POS_NEXT_STATE_LEN],
        rl_sample_column=columns[C.RL_SAMPLE], emb_size=8, hidden_size=8,
    )
    model = ValueRLModel(qnet, reward_column=columns[C.RATE])
    trainer = RLTrainer(model)
    trainer.compile(optimizer="adam", lr=0.01, loss="mse", metrics=("ndcg@5",),
                    user_sample_n=10)
    trainer.init_state(rl_reader.get_batch("train", np.arange(4)), seed=0)
    trainer.state = trainer.state.replace(
        params=ValueRLModel.load_pretrain_embedding(trainer.state.params, path)
    )
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params["i_embedding"]["embedding"]),
        pretrained_table,
    )
    h = trainer.fit(rl_reader, batch_size=16, epochs=3, verbose=0, eval_dev=False)
    assert all(np.isfinite(h.history["loss"]))


def test_eval_packer_retraces_on_batch_size_change(dataset_dir):
    """Packed eval must retrace when evaluate() is called with a different
    batch size (packer layouts are shape-keyed)."""
    reader = make_reader()
    trainer = make_trainer(reader)
    trainer.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    a = trainer.evaluate(reader, split="dev", batch_size=16)
    b = trainer.evaluate(reader, split="dev", batch_size=8)
    c = trainer.evaluate(reader, split="dev", batch_size=16)
    assert a == c  # deterministic across packer swaps
    assert set(a) == set(b)


def test_export_serving_roundtrip(dataset_dir):
    """AOT serving export: serialized StableHLO artifact reproduces the live
    scorer without model code or a params file."""
    reader = make_reader()
    trainer = make_trainer(reader)
    trainer.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    batch = reader.get_batch("test", np.arange(8))
    live = np.asarray(trainer.make_serving_fn()(batch))

    path = os.path.join(dataset_dir, "serving.stablehlo")
    trainer.export_serving(path, batch)
    assert os.path.getsize(path) > 0
    loaded = Trainer.load_serving(path)
    np.testing.assert_allclose(np.asarray(loaded(batch)), live, rtol=1e-6)


# ---------------------------------------------------------------------------
# ProgbarLogger verbose modes (reference ProgbarLogger.py:15-234)
# ---------------------------------------------------------------------------

def test_progbar_verbose1_renders_bar_and_rate():
    import io
    from pytorchrec_tpu.training.callbacks import Progbar

    out = io.StringIO()
    p = Progbar(target=10, verbose=1, interval=0.0, out=out)
    for i in range(1, 11):
        p.update(i, [("loss", 0.5 / i)])
    lines = out.getvalue().splitlines()
    assert lines[0].startswith(" 1/10 [=") and "ETA:" in lines[0]
    assert lines[-1].startswith("10/10 [==============================]")
    assert "/batch" in lines[-1] and "loss: 0.0500" in lines[-1]


def test_progbar_verbose2_single_summary_line():
    import io
    from pytorchrec_tpu.training.callbacks import Progbar

    out = io.StringIO()
    p = Progbar(target=5, verbose=2, out=out)
    for i in range(1, 6):
        p.update(i, [("loss", 0.25), ("tiny", 1e-5)])
    # only the finalize line is emitted; small values use scientific notation
    assert out.getvalue().count("\n") == 1
    assert "loss: 0.2500" in out.getvalue() and "1.0000e-05" in out.getvalue()


def test_progbar_logger_hook_introspection():
    """verbose=1 implements batch hooks (live bar needs per-batch loss);
    verbose=2/0 must NOT, so the trainer can skip per-batch host syncs."""
    import io
    from pytorchrec_tpu.training.callbacks import CallbackList, ProgbarLogger

    for verbose, expect in [(1, True), (2, False), (0, False)]:
        cl = CallbackList(
            [ProgbarLogger(out=io.StringIO())],
            verbose=verbose, epochs=1, batches=3,
        )
        assert cl.implements_train_batch_hooks() is expect


def test_fit_verbose_modes_output(dataset_dir):
    """End-to-end: verbose=1 shows epoch headers + live bar lines, verbose=2
    one summary line per epoch; dev-eval inside fit stays silent."""
    import io
    from pytorchrec_tpu.training.callbacks import ProgbarLogger

    reader = make_reader()
    for verbose in (1, 2):
        out = io.StringIO()
        trainer = make_trainer(reader)
        trainer.fit(
            reader, batch_size=32, epochs=2, verbose=verbose, dev_freq=1,
            callbacks=[ProgbarLogger(out=out)],
        )
        text = out.getvalue()
        assert "Epoch 1/2" in text and "Epoch 2/2" in text
        assert "loss:" in text and "ndcg@5:" in text
        # dev evaluate inside fit must not start its own progbar: every
        # rendered progress line carries the epoch logs, none are bare
        # eval-only finalizations beyond the two epochs
        final_lines = [l for l in text.splitlines() if l.strip() and "Epoch" not in l]
        if verbose == 2:
            assert len(final_lines) == 2


def test_standalone_evaluate_progbar(dataset_dir):
    import io
    from pytorchrec_tpu.training.callbacks import ProgbarLogger

    reader = make_reader()
    trainer = make_trainer(reader)
    trainer.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    out = io.StringIO()
    logs = trainer.evaluate(
        reader, split="dev", batch_size=16, verbose=2,
        callbacks=[ProgbarLogger(out=out)],
    )
    text = out.getvalue()
    assert "ndcg@5:" in text and f"{logs['ndcg@5']:.4f}" in text


def test_evaluate_streaming_matches_default(dataset_dir):
    """streaming=True accumulates fixed-size on-device partials; values must
    match the concatenate-everything path (rank metrics exactly)."""
    reader = make_reader()
    trainer = make_trainer(reader)
    trainer.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    for split, bs in [("dev", 16), ("test", 7)]:  # bs=7 forces a padded tail
        exact = trainer.evaluate(reader, split=split, batch_size=bs, verbose=0)
        got = trainer.evaluate(reader, split=split, batch_size=bs, verbose=0,
                               streaming=True)
        assert set(got) == set(exact)
        for k in exact:
            assert abs(got[k] - exact[k]) < 1e-6, (split, k, got[k], exact[k])
