"""Multi-task CTR family: SharedBottom/MMoE/PLE/ESMM forward contracts,
the esmm entire-space loss, per-task metric slices (auc/0 ...), streaming
partial parity, and end-to-end training on a planted click+conversion
funnel.

No reference counterpart (the reference zoo is single-objective) —
correctness targets are numpy re-derivations of the published formulations
(Ma et al. 2018 MMoE/ESMM, Tang et al. 2020 PLE).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchrec_tpu.feature_column import (
    CategoricalColumnWithIdentity,
    NumericColumn,
)
from pytorchrec_tpu.loss import get_loss
from pytorchrec_tpu.metric import MetricList, get_metric
from pytorchrec_tpu.models.multitask import ESMM, MMoE, PLE, ExpertBank, SharedBottom


def _cols(n_sparse=3, n_dense=2, vocab=50):
    sparse = tuple(CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                                 category_num=vocab)
                   for i in range(n_sparse))
    dense = tuple(NumericColumn(feature_name=f"d_{i}") for i in range(n_dense))
    click = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    conv = CategoricalColumnWithIdentity(feature_name="conversion",
                                         category_num=2)
    return sparse, dense, click, conv


def _batch(rng, b=16, n_sparse=3, n_dense=2, vocab=50):
    batch = {f"c_{i}": jnp.asarray(rng.integers(0, vocab, size=b))
             for i in range(n_sparse)}
    for i in range(n_dense):
        batch[f"d_{i}"] = jnp.asarray(rng.normal(size=b).astype(np.float32))
    batch["label"] = jnp.asarray(rng.integers(0, 2, size=b))
    batch["conversion"] = jnp.asarray(rng.integers(0, 2, size=b))
    return batch


def _make(cls, **kw):
    sparse, dense, click, conv = _cols()
    kw.setdefault("emb_size", 4)
    kw.setdefault("tower_layers", (8,))
    return cls(sparse_columns=sparse, dense_columns=dense, label_column=click,
               task_columns=(click, conv), **kw)


class TestExpertBank:
    def test_per_expert_rows_match_broadcast(self):
        """per_expert=True over K identical rows == per_expert=False."""
        bank = ExpertBank(n_experts=3, layers=(8, 4))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 6)),
                        jnp.float32)
        params = bank.init(jax.random.PRNGKey(0), x)
        out = bank.apply(params, x)
        stacked = jnp.broadcast_to(x[:, None, :], (5, 3, 6))
        out2 = bank.apply(params, stacked, per_expert=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   rtol=1e-6)
        assert out.shape == (5, 3, 4)


@pytest.mark.parametrize("cls,kw", [
    (SharedBottom, {"bottom_layers": (8,)}),
    (MMoE, {"n_experts": 3, "expert_layers": (8,)}),
    (PLE, {"n_levels": 2, "experts_per_group": 2, "expert_layers": (8,)}),
    (ESMM, {"bottom_layers": (8,)}),
])
class TestForwardContract:
    def test_shapes_and_targets(self, cls, kw):
        model = _make(cls, **kw)
        rng = np.random.default_rng(1)
        batch = _batch(rng)
        params = model.init(jax.random.PRNGKey(0), batch, False)
        (pred, target) = model.apply(params, batch, True,
                                     rngs={"dropout": jax.random.PRNGKey(1)})
        assert pred.shape == (16, 2)
        assert target.shape == (16, 2)
        np.testing.assert_allclose(np.asarray(target)[:, 0],
                                   np.asarray(batch["label"], np.float32))
        if cls is ESMM:
            # target column 1 is the PRODUCT click*conversion
            np.testing.assert_allclose(
                np.asarray(target)[:, 1],
                np.asarray(batch["label"] * batch["conversion"], np.float32))
            # prediction column 1 is log pCTCVR — always negative
            assert np.all(np.asarray(pred)[:, 1] < 0)
        else:
            np.testing.assert_allclose(
                np.asarray(target)[:, 1],
                np.asarray(batch["conversion"], np.float32))

    def test_gradients_flow_to_all_tables(self, cls, kw):
        model = _make(cls, **kw)
        rng = np.random.default_rng(2)
        batch = _batch(rng)
        params = model.init(jax.random.PRNGKey(0), batch, False)
        loss_name = "esmm" if cls is ESMM else "bce"
        loss_fn = get_loss(loss_name)

        def loss(p):
            pred, target = model.apply(p, batch, True,
                                       rngs={"dropout": jax.random.PRNGKey(1)})
            return loss_fn(pred, target)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # every task head received gradient
        nonzero = [float(jnp.abs(l).sum()) > 0 for l in leaves]
        assert np.mean(nonzero) > 0.8, f"{np.mean(nonzero)} of leaves nonzero"


class TestMMoEMixing:
    def test_gate_probs_mix_experts(self):
        """With ONE expert the gate is a no-op: MMoE output must equal the
        tower over that expert's output, independent of gate params."""
        model = _make(MMoE, n_experts=1, expert_layers=(8,))
        rng = np.random.default_rng(3)
        batch = _batch(rng)
        params = model.init(jax.random.PRNGKey(0), batch, False)
        pred, _ = model.apply(params, batch, False)
        # scaling the gate kernel must not change anything at K=1
        import flax

        flat = flax.traverse_util.flatten_dict(params["params"], sep="/")
        for k in flat:
            if k.startswith("gate_"):
                flat[k] = flat[k] * 100.0
        params2 = {"params": flax.traverse_util.unflatten_dict(flat, sep="/")}
        pred2, _ = model.apply(params2, batch, False)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(pred2),
                                   rtol=1e-6)


class TestESMMLoss:
    def test_matches_numpy(self):
        rng = np.random.default_rng(4)
        ctr_logit = rng.normal(size=32).astype(np.float32)
        log_p = -np.abs(rng.normal(size=32)).astype(np.float32) - 0.01
        pred = jnp.asarray(np.stack([ctr_logit, log_p], axis=1))
        click = rng.integers(0, 2, size=32).astype(np.float32)
        ctcvr = (click * rng.integers(0, 2, size=32)).astype(np.float32)
        target = jnp.asarray(np.stack([click, ctcvr], axis=1))

        got = float(get_loss("esmm")(pred, target))

        def sigmoid(x):
            return 1 / (1 + np.exp(-x))

        p_ctr = sigmoid(ctr_logit)
        ctr_term = -(click * np.log(p_ctr) + (1 - click) * np.log(1 - p_ctr))
        p = np.exp(log_p)
        ctcvr_term = -(ctcvr * np.log(p) + (1 - ctcvr) * np.log(1 - p))
        want = float(np.mean(ctr_term + ctcvr_term))
        assert got == pytest.approx(want, rel=1e-4)


class TestTaskSliceMetric:
    def test_slices_match_single_task(self):
        rng = np.random.default_rng(5)
        pred = rng.normal(size=(200, 2)).astype(np.float32)
        target = rng.integers(0, 2, size=(200, 2)).astype(np.float32)
        auc = get_metric("auc")
        for t in range(2):
            sliced = get_metric(f"auc/{t}")
            assert sliced.name == f"auc/{t}"
            assert float(sliced(pred, target)) == pytest.approx(
                float(auc(pred[:, t], target[:, t])))
        ll = get_metric("logloss")
        got = float(get_metric("logloss/1")(pred, target))
        assert got == pytest.approx(float(ll(pred[:, 1], target[:, 1])),
                                    rel=1e-5)

    def test_streaming_partials_match_direct(self):
        rng = np.random.default_rng(6)
        pred = rng.normal(size=(230, 2)).astype(np.float32)
        target = rng.integers(0, 2, size=(230, 2)).astype(np.float32)
        ml = MetricList(["auc/0", "auc/1", "logloss/0"], user_sample_n=1)
        direct = ml(pred, target)

        state = ml.partial_init()
        for start in range(0, 230, 64):  # final batch padded to 64
            chunk_p = np.zeros((64, 2), np.float32)
            chunk_t = np.zeros((64, 2), np.float32)
            n = min(64, 230 - start)
            chunk_p[:n] = pred[start:start + n]
            chunk_t[:n] = target[start:start + n]
            state = ml.partial_update(state, jnp.asarray(chunk_p),
                                      jnp.asarray(chunk_t), jnp.asarray(n))
        streamed = ml.partial_finalize(state)
        for key in direct:
            # AUC partials are histogram-binned (~1e-4); logloss exact
            assert streamed[key] == pytest.approx(direct[key], abs=2e-3), key

    def test_plain_pointwise_mixing_guard_is_call_time(self):
        """ADVICE r4 #5: a pooled 'auc' next to 'auc/0' is legal to
        CONSTRUCT and harmless on single-task [B] predictions; it raises
        only when a multi-task [B, T>1] prediction actually arrives."""
        rng = np.random.default_rng(7)
        ml = MetricList(["auc", "auc/0"], user_sample_n=1)  # no raise
        pred1 = rng.normal(size=(64, 1)).astype(np.float32)
        t1 = rng.integers(0, 2, size=(64, 1)).astype(np.float32)
        logs = ml(pred1, t1)  # [B, 1] prediction: pooled auc == auc/0
        assert logs["auc"] == pytest.approx(logs["auc/0"])

        pred2 = rng.normal(size=(64, 2)).astype(np.float32)
        t2 = rng.integers(0, 2, size=(64, 2)).astype(np.float32)
        with pytest.raises(AssertionError, match="cannot be combined"):
            ml(pred2, t2)
        with pytest.raises(AssertionError, match="cannot be combined"):
            ml.partial_update(ml.partial_init(), jnp.asarray(pred2),
                              jnp.asarray(t2), jnp.asarray(64))


@pytest.fixture(scope="module")
def mt_dataset(tmp_path_factory):
    from pytorchrec_tpu.data.process.datasets.synthetic import (
        generate_synthetic_ctr,
    )

    tmp = tmp_path_factory.mktemp("wd")
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = str(tmp)
    generate_synthetic_ctr("Synthetic-MT", n_rows=30_000, n_dense=4,
                           sparse_vocab_sizes={"c_0": 100, "c_1": 50,
                                               "c_2": 20},
                           seed=5, with_conversion=True)
    yield "Synthetic-MT"
    os.environ.pop("PYTORCHREC_TPU_WORK_DIR", None)


@pytest.mark.parametrize("model_name,loss", [
    ("shared_bottom", "bce"), ("mmoe", "bce"), ("ple", "bce"),
    ("esmm", "esmm"),
])
def test_multitask_end_to_end_learns(mt_dataset, model_name, loss):
    """Builder -> trainer -> per-task AUC: every model must beat random on
    BOTH tasks of the planted click+conversion funnel after 4 epochs."""
    from pytorchrec_tpu.data import SplitMode, TrainMode
    from pytorchrec_tpu.tasks import build_model, build_reader
    from pytorchrec_tpu.training.trainer import Trainer

    reader = build_reader(model_name, mt_dataset, random_seed=2020,
                          split_mode=SplitMode.SEQUENTIAL_SPLIT, warm_n=1,
                          vt_ratio=0.1, train_mode=TrainMode.POINT_WISE)
    hparams = {"emb_size": 4, "tower_layers": (16,)}
    if model_name == "mmoe":
        hparams.update(n_experts=3, expert_layers=(16,))
    elif model_name == "ple":
        hparams.update(n_levels=2, experts_per_group=2, expert_layers=(16,))
    else:
        hparams.update(bottom_layers=(32,))
    model = build_model(model_name, reader, **hparams)
    t = Trainer(model)
    t.compile(optimizer="adam", lr=0.01, loss=loss,
              metrics=("auc/0", "auc/1", "logloss/0"), user_sample_n=1)
    t.fit(reader, batch_size=256, epochs=4, verbose=0, eval_dev=False, seed=3)
    logs = t.evaluate(reader, split="dev", batch_size=256)
    assert logs["auc/0"] > 0.58, logs
    assert logs["auc/1"] > 0.58, logs

    # streaming evaluate agrees (multi-task partials)
    streamed = t.evaluate(reader, split="dev", batch_size=256, streaming=True)
    for key in logs:
        assert streamed[key] == pytest.approx(logs[key], abs=2e-3), key


def test_mmoe_sparse_trainer(mt_dataset):
    """The multi-task family rides the unified-table sparse trainer
    unchanged (_CTRBase protocols with _uses_linear=False)."""
    from pytorchrec_tpu.data import SplitMode, TrainMode
    from pytorchrec_tpu.tasks import build_model, build_reader
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    reader = build_reader("mmoe", mt_dataset, random_seed=2020,
                          split_mode=SplitMode.SEQUENTIAL_SPLIT, warm_n=1,
                          vt_ratio=0.1, train_mode=TrainMode.POINT_WISE)
    model = build_model("mmoe", reader, emb_size=4, tower_layers=(8,),
                        n_experts=2, expert_layers=(8,),
                        unified_embedding=True)
    t = SparseEmbeddingTrainer(model, packed_tables=True)
    t.compile(optimizer="adam", lr=0.01, loss="bce",
              metrics=("auc/0", "auc/1"), user_sample_n=1)
    t.fit(reader, batch_size=256, epochs=1, verbose=0, eval_dev=False, seed=3)
    logs = t.evaluate(reader, split="dev", batch_size=256)
    assert logs["auc/0"] > 0.55, logs
