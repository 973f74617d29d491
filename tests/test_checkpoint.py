"""Orbax checkpoint manager tests: async atomic save, resume, retention,
sharded restore on the virtual mesh."""

import os

import jax
import numpy as np
import pytest

from pytorchrec_tpu.data import SimpleDataReader, SplitMode, TrainMode
from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
from pytorchrec_tpu.models import FunkSVD
from pytorchrec_tpu.training import Trainer
from pytorchrec_tpu.training.checkpoint import CheckpointCallback, CheckpointManager
from pytorchrec_tpu.utils import constants as C

DATASET = "Synthetic-ML-Ckpt"


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wd")
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = str(tmp)
    generate_synthetic_ml(DATASET, n_users=63, n_items=127, seed=21)
    yield str(tmp)
    os.environ.pop("PYTORCHREC_TPU_WORK_DIR", None)


def make_trainer(reader, mesh=None):
    cols = reader.get_feature_column_dict()
    model = FunkSVD(uid_column=cols[C.UID], iid_column=cols[C.IID],
                    label_column=cols[C.LABEL], emb_size=8)
    t = Trainer(model, mesh=mesh)
    t.compile(optimizer="adam", lr=0.02, loss="bce", metrics=("hit@5",), user_sample_n=10)
    return t


def make_reader():
    return SimpleDataReader(DATASET, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5,
                            leave_k=1, neg_sample_n=9,
                            train_mode=TrainMode.POINT_WISE, random_seed=2020)


def test_save_restore_roundtrip(dataset_dir, tmp_path):
    reader = make_reader()
    trainer = make_trainer(reader)
    trainer.fit(reader, batch_size=32, epochs=2, verbose=0, eval_dev=False)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(int(trainer.state.step), trainer.state)
    ckpt.wait()

    trainer2 = make_trainer(reader)
    trainer2.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False, seed=9)
    restored = ckpt.restore(trainer2.state)
    assert int(restored.step) == int(trainer.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()


def test_callback_retention_and_resume(dataset_dir, tmp_path):
    reader = make_reader()
    trainer = make_trainer(reader)
    cb = CheckpointCallback(str(tmp_path / "cb"), every_epochs=1, max_to_keep=2)
    trainer.fit(reader, batch_size=32, epochs=4, verbose=0, eval_dev=False,
                callbacks=[cb])
    cb.ckpt.wait()
    # retention: only the last 2 steps kept
    steps = sorted(cb.ckpt.manager.all_steps())
    assert len(steps) == 2
    assert cb.ckpt.latest_step() == int(trainer.state.step)

    # resume into a fresh trainer
    trainer2 = make_trainer(reader)
    bootstrap = reader.get_batch("train", np.arange(2))
    trainer2.init_state(bootstrap, seed=123)
    cb2 = CheckpointCallback(str(tmp_path / "cb"))
    cb2.set_trainer(trainer2)
    resumed = cb2.maybe_resume()
    assert resumed == int(trainer.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cb.ckpt.close()
    cb2.ckpt.close()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_sharded_restore_keeps_shardings(dataset_dir, tmp_path):
    from pytorchrec_tpu.parallel import MODEL_AXIS, make_mesh

    reader = make_reader()
    mesh = make_mesh(data=4, model=2)
    trainer = make_trainer(reader, mesh=mesh)
    trainer.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    ckpt = CheckpointManager(str(tmp_path / "sharded"))
    ckpt.save(int(trainer.state.step), trainer.state)
    ckpt.wait()

    restored = ckpt.restore(trainer.state)
    flat = jax.tree_util.tree_flatten_with_path(restored.params)[0]
    specs = [
        leaf.sharding.spec for path, leaf in flat
        if "embedding" in "/".join(str(getattr(k, "key", k)) for k in path).lower()
    ]
    assert any(spec and spec[0] == MODEL_AXIS for spec in specs), specs
    ckpt.close()


def test_preemption_guard_saves_and_resumes(dataset_dir, tmp_path):
    """SIGTERM mid-epoch -> durable full-state checkpoint at the next batch
    boundary, loop stops; a fresh process-equivalent trainer resumes from
    exactly that step. Handler is scoped to the fit window."""
    import signal

    from pytorchrec_tpu.training import PreemptionGuard
    from pytorchrec_tpu.training.callbacks import Callback

    class PreemptAtBatch(Callback):
        def __init__(self, at_batch):
            super().__init__()
            self.at_batch = at_batch

        def on_train_batch_end(self, batch, logs=None):
            if batch == self.at_batch:
                os.kill(os.getpid(), signal.SIGTERM)

    before = signal.getsignal(signal.SIGTERM)
    reader = make_reader()
    trainer = make_trainer(reader)
    guard = PreemptionGuard(str(tmp_path / "pre"))
    trainer.fit(reader, batch_size=32, epochs=50, verbose=0, eval_dev=False,
                callbacks=[guard, PreemptAtBatch(at_batch=2)])

    assert guard.preempted and trainer.stop_training
    saved_step = guard.ckpt.latest_step()
    assert saved_step == int(trainer.state.step)
    # interrupted long before the 50 epochs could finish
    from pytorchrec_tpu.data.loader import num_train_batches
    total = 50 * num_train_batches(reader.get_train_dataset_size(), 32,
                                   drop_last=True)
    assert saved_step < total
    # the previous SIGTERM disposition is back once fit returns
    assert signal.getsignal(signal.SIGTERM) is before

    # "new process": fresh trainer, resume, finish a couple more epochs
    trainer2 = make_trainer(reader)
    guard2 = PreemptionGuard(str(tmp_path / "pre"))
    bootstrap = reader.get_batch("train", np.arange(2))
    trainer2.init_state(bootstrap, seed=2020)
    guard2.trainer = trainer2
    assert guard2.maybe_resume() == saved_step
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    trainer2.fit(reader, batch_size=32, epochs=2, verbose=0, eval_dev=False,
                 callbacks=[guard2])
    assert int(trainer2.state.step) > saved_step
    assert not guard2.preempted


def test_quantized_packed_state_roundtrip(tmp_path):
    """uint8 packed byte-row table leaves (q||scale||acc) survive the orbax
    save/restore cycle bit-exactly — quantized production state is
    crash-resumable like f32 state (round 4)."""
    from flax import traverse_util

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity as col,
    )
    from pytorchrec_tpu.models.din import DIN
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )

    B, VI, S = 32, 128, 4
    model = DIN(uid_column=col(feature_name="uid", category_num=40),
                iid_column=col(feature_name="iid", category_num=VI),
                his_column=col(feature_name="pos_his", category_num=VI),
                his_len_column=col(feature_name="pos_his_len",
                                   category_num=S + 1),
                label_column=col(feature_name="label", category_num=2),
                emb_size=8, att_hidden_units=(8,), mlp_layers=(8,),
                quantized_table=True)
    rr = np.random.default_rng(11)
    b = {"uid": rr.integers(0, 40, size=B).astype(np.int32),
         "iid": rr.integers(0, VI, size=B).astype(np.int32),
         "pos_his": rr.integers(1, VI, size=(B, S)).astype(np.int32),
         "pos_his_len": rr.integers(1, S + 1, size=B).astype(np.int32),
         "label": rr.integers(0, 2, size=B).astype(np.int32)}
    t = QuantizedEmbeddingTrainer(model, packed_tables=True)
    t.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
    t.init_state(b, seed=0)
    for _ in range(3):
        t._train_step(b)

    ckpt = CheckpointManager(str(tmp_path / "qckpt"))
    ckpt.save(int(t.state.step), t.state)
    ckpt.wait()

    t2 = QuantizedEmbeddingTrainer(model, packed_tables=True)
    t2.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
    t2.init_state(b, seed=5)
    restored = ckpt.restore(t2.state)
    fa = traverse_util.flatten_dict(jax.device_get(t.state.params), sep="/")
    fb = traverse_util.flatten_dict(jax.device_get(restored.params), sep="/")
    assert fb["i_q"].dtype == np.uint8
    np.testing.assert_array_equal(fa["i_q"], fb["i_q"])
    ckpt.close()

    # and training continues from the restored uint8 state
    t2.state = restored
    loss = float(t2._train_step(b))
    assert np.isfinite(loss)
