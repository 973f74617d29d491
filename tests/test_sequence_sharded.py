"""Sequence/RL zoo on the sparse + sharded paths (VERDICT r3 #2/#3): DIN /
SASRec / GRU4Rec / NCF / SVDPP implement ``sparse_table_ids`` /
``sharded_table_specs`` (the shared item table serves history AND candidate
gathers through one exchange), the RL QNets inject their eval-net forward
gathers, and DIN's fit() on the 8-device mesh matches single-device
numerics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from pytorchrec_tpu.data.schema import TrainMode
from pytorchrec_tpu.parallel import make_mesh
from pytorchrec_tpu.tasks import build_model, build_reader, default_reader_kwargs

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)

DATASET = "Synthetic-ML-SeqSharded"

SEQ_HPARAMS = {
    "din": {"emb_size": 8, "att_hidden_units": (8,), "mlp_layers": (8,)},
    "sasrec": {"emb_size": 8, "num_layers": 1, "max_his_len": 5,
               "dropout": 0.0},  # parity needs deterministic nets: the
    # sharded step folds the data-shard index into the dropout stream
    "gru4rec": {"emb_size": 8, "hidden_size": 8},
    "ncf": {"emb_size": 8, "layers": (8,)},
    "svdpp": {"emb_size": 8},
    "dqn": {"emb_size": 8, "hidden_size": 8},
    "lsrl": {"emb_size": 8, "hidden_size": 8},
}


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from pytorchrec_tpu.data.process.datasets.synthetic import (
        generate_synthetic_ml,
    )

    tmp = tmp_path_factory.mktemp("wd")
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = str(tmp)
    generate_synthetic_ml(DATASET, n_users=40, n_items=104, seed=23)
    yield str(tmp)
    os.environ.pop("PYTORCHREC_TPU_WORK_DIR", None)


def _reader(model_name, **extra):
    kwargs = default_reader_kwargs(
        model_name, neg_sample_n=9, warm_n=5, random_seed=2020,
        train_mode=TrainMode.POINT_WISE,
    )
    if model_name in ("gru4rec", "sasrec", "din"):
        kwargs["max_his_len"] = 5
    if model_name in ("dqn", "lsrl"):
        kwargs["max_state_len"] = 5
        kwargs["rl_sample_len"] = 4
    if model_name == "svdpp":
        kwargs["limit"] = 8
    kwargs.update(extra)
    return build_reader(model_name, DATASET, **kwargs)


def _train_batch(reader, n=16):
    return reader.get_batch("train", np.arange(n))


@pytest.mark.parametrize("model_name",
                         ["din", "sasrec", "gru4rec", "ncf", "svdpp"])
def test_injection_forward_equivalence(dataset_dir, model_name):
    """model.apply with externally-gathered rows injected through the
    sharded_table_specs keys == the in-module gathers, bit for bit — the
    split/ordering of the combined candidate+history block is exact."""
    reader = _reader(model_name)
    model = build_model(model_name, reader, **SEQ_HPARAMS[model_name])
    batch = _train_batch(reader)
    params = model.init(jax.random.PRNGKey(0), batch, False)["params"]
    base, _ = model.apply({"params": params}, batch, train=False)

    flat = traverse_util.flatten_dict(params, sep="/")
    patched = dict(batch)
    for spec in model.sharded_table_specs(batch).values():
        ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
        patched[spec["rows_key"]] = flat[spec["path"]][ids]
    injected, _ = model.apply({"params": params}, patched, train=False)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(injected))


@pytest.mark.parametrize("model_name", ["dqn", "lsrl"])
def test_rl_injection_forward_equivalence(dataset_dir, model_name):
    """QNet.forward with injected rows == in-module gathers (eval net); the
    target net's next_forward path is untouched by the rows keys."""
    reader = _reader(model_name)
    model = build_model(model_name, reader, **SEQ_HPARAMS[model_name])
    batch = _train_batch(reader)
    variables = model.init(jax.random.PRNGKey(0), batch)
    qnet = model.qnet
    base = qnet.apply(variables, batch, method=qnet.forward)

    flat = traverse_util.flatten_dict(variables["params"], sep="/")
    patched = dict(batch)
    for spec in model.sharded_table_specs(batch).values():
        ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
        patched[spec["rows_key"]] = flat[spec["path"]][ids]
    injected = qnet.apply(variables, patched, method=qnet.forward)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(injected))
    # next_forward ignores the injected rows (target-net reads in-module)
    nf_base = qnet.apply(variables, batch, method=qnet.next_forward)
    nf_patch = qnet.apply(variables, patched, method=qnet.next_forward)
    np.testing.assert_array_equal(np.asarray(nf_base), np.asarray(nf_patch))


def _tree_allclose(a, b, rtol=2e-3, atol=5e-3):
    # looser than the FunkSVD parity tests: the attention score MLPs amplify
    # exchange-order reassociation noise chaotically over an epoch (observed
    # max ~1.5e-3 absolute on DIN's near-zero attention biases, while every
    # TABLE leaf agrees to ~1e-6 and eval metrics match exactly)
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def _zipf_hot_counts(model_name, reader):
    """Zipf(1.1)-mass traffic counts for every sharded table spec — the
    BASELINE 'DIN on Amazon' item-popularity shape (hot_cold sizing)."""
    model = build_model(model_name, reader, table_row_multiple=8,
                        **SEQ_HPARAMS[model_name])
    batch = _train_batch(reader)
    counts = {}
    for name, spec in model.sharded_table_specs(batch).items():
        v = int(np.asarray(spec["ids"]).max()) + 1
        # deterministic Zipf-like mass over a shuffled id order
        # (crc32, not hash(): PYTHONHASHSEED randomizes hash() per run)
        import zlib

        rng = np.random.default_rng(zlib.crc32(name.encode()))
        mass = (1.0 / np.arange(1, v + 1) ** 1.1)
        counts[name] = rng.permutation((mass * 1e4).astype(np.int64) + 1)
    return counts


@pytest.mark.parametrize("model_name,packed,strategy", [
    ("din", False, "1d"), ("din", True, "1d"),
    ("gru4rec", False, "1d"), ("sasrec", False, "1d"),
    # VERDICT r4 #4: history-gather models beyond 1d. grid routes the
    # flattened candidate+history exchange through virtual-bucket grid
    # owners; hot_cold (Zipf counts) is the BASELINE DIN-on-Amazon shape
    # where the replicated hot fragment meets the combined-block split.
    ("din", False, "grid"), ("din", True, "grid"),
    ("gru4rec", False, "grid"), ("sasrec", False, "grid"),
    ("din", False, "hot_cold"), ("din", True, "hot_cold"),
    ("gru4rec", False, "hot_cold"), ("sasrec", False, "hot_cold"),
])
def test_sequence_fit_matches_single_device(dataset_dir, model_name, packed,
                                            strategy):
    """fit() through the explicit engine on a (data=4, model=2) mesh ==
    single-device sparse training for the sequence zoo — the BASELINE 'DIN
    on Amazon' config class can now ride the production sparse path, on
    EVERY engine strategy (1d / grid / hot_cold)."""
    from pytorchrec_tpu.training import (
        ShardedSparseEmbeddingTrainer,
        SparseEmbeddingTrainer,
    )

    hot_counts = (_zipf_hot_counts(model_name, _reader(model_name))
                  if strategy == "hot_cold" else None)

    def run(mesh):
        reader = _reader(model_name)
        model = build_model(model_name, reader, table_row_multiple=8,
                            **SEQ_HPARAMS[model_name])
        if mesh is None:
            tr = SparseEmbeddingTrainer(model, packed_tables=packed)
        else:
            tr = ShardedSparseEmbeddingTrainer(
                model, mesh=mesh, packed_tables=packed, strategy=strategy,
                hot_counts=hot_counts, hot_rows=16)
        tr.compile(optimizer="adam", lr=0.01, loss="bce",
                   metrics=("ndcg@5",), user_sample_n=10)
        tr.fit(reader, batch_size=16, epochs=1, verbose=0, eval_dev=False,
               seed=7)
        ev = tr.evaluate(reader, split="dev", batch_size=16)
        return tr, ev

    single, e_single = run(None)
    sharded, e_sharded = run(make_mesh(data=4, model=2))
    if strategy == "hot_cold":
        # merged_params restores [V, E] row order (unpacking fragments).
        # hot_cold reorders the row-grad summation more than 1d/grid
        # (replicated hot fragment + exchange tail), so DIN's near-zero
        # attention biases drift past the shared tolerance while every
        # TABLE leaf still agrees tightly — assert the tables (the part
        # hot_cold actually touches) and the exact eval metric below.
        sh_flat = traverse_util.flatten_dict(sharded.merged_params(),
                                             sep="/")
        si_flat = traverse_util.flatten_dict(
            single.unpacked_params() if packed
            else jax.device_get(single.state.params), sep="/")
        for path in sharded._table_paths:
            np.testing.assert_allclose(
                np.asarray(si_flat[path]), np.asarray(sh_flat[path]),
                rtol=2e-3, atol=5e-3, err_msg=path)
    elif packed:
        _tree_allclose(single.unpacked_params(), sharded.unpacked_params())
    else:
        _tree_allclose(single.state.params, sharded.state.params)
        _tree_allclose(single.state.table_moments,
                       sharded.state.table_moments)
    assert e_single["ndcg@5"] == pytest.approx(e_sharded["ndcg@5"], abs=1e-6)


def test_sparse_rl_trainer_loss_matches_dense_step(dataset_dir):
    """SparseRLTrainer's first-step loss == RLTrainer's (the injected
    forward is exact in-situ), and only touched item-table rows move."""
    from pytorchrec_tpu.training import RLTrainer, SparseRLTrainer

    reader = _reader("dqn")
    batch = _train_batch(reader)

    def first_loss(cls):
        model = build_model("dqn", reader, **SEQ_HPARAMS["dqn"])
        tr = cls(model)
        tr.compile(optimizer="adam", lr=0.01, loss="mse",
                   metrics=("ndcg@5",), user_sample_n=10)
        tr.init_state(batch, seed=3)
        loss = tr._train_step(batch)
        return tr, float(loss)

    dense_tr, dense_loss = first_loss(RLTrainer)
    sparse_tr, sparse_loss = first_loss(SparseRLTrainer)
    assert sparse_loss == pytest.approx(dense_loss, rel=1e-5)

    # untouched rows stay bit-identical to init; touched rows moved
    model = build_model("dqn", reader, **SEQ_HPARAMS["dqn"])
    table = np.asarray(sparse_tr.state.params["i_embedding"]["embedding"])
    ids = np.unique(np.asarray(model.sparse_table_ids(batch)
                               ["i_embedding/embedding"]))
    touched = np.zeros(table.shape[0], bool)
    touched[ids] = True
    # target net still equals the pre-sync init copy of untouched rows
    target = np.asarray(
        sparse_tr.state.target_params["i_embedding"]["embedding"])
    np.testing.assert_array_equal(table[~touched], target[~touched])
    assert np.any(table[touched] != target[touched])


def test_sparse_rl_trainer_fit_runs(dataset_dir):
    """SparseRLTrainer fit(): epoch==batch loop, target sync, ranking eval."""
    from pytorchrec_tpu.training import SparseRLTrainer

    reader = _reader("lsrl")
    model = build_model("lsrl", reader, **SEQ_HPARAMS["lsrl"])
    tr = SparseRLTrainer(model, table_optimizer="rowwise_adagrad")
    tr.compile(optimizer="adam", lr=0.01, loss="mse",
               metrics=("ndcg@5",), user_sample_n=10)
    history = tr.fit(reader, batch_size=16, epochs=5, verbose=0,
                     eval_dev=False)
    assert all(np.isfinite(history.history["loss"]))
    logs = tr.evaluate(reader, split="dev", batch_size=16)
    assert np.isfinite(logs["ndcg@5"])


class TestDINQuantizedTable:
    """DIN's item table as int8 packed byte rows (round 4: composes the
    build's fastest table format with the BASELINE 'DIN on Amazon' family)
    — single-device QuantizedEmbeddingTrainer vs the sharded engine.

    ONE step is asserted bit-exact (identical init + batch => identical
    i_q bytes). Over multiple steps the two are NOT a parity twin — the
    (small, f32) user table trains dense-Adam single-device but lazy-Adam
    sharded, and DIN's attention MLP amplifies that float-level drift
    chaotically (same phenomenon as the f32 DIN sharded test) — so later
    steps only assert loss tracking. The DLRM test in
    test_sharded_quantized.py is the multi-step bit-parity proof of the
    quantized engine itself; this one proves DIN's wiring (flattened
    candidate+history ids through one exchange, quantized spec block).
    """

    def test_sharded_matches_single_device_within_rounding(self):
        import jax.numpy as jnp
        from flax import traverse_util

        from pytorchrec_tpu.feature_column import (
            CategoricalColumnWithIdentity as col,
        )
        from pytorchrec_tpu.models.din import DIN
        from pytorchrec_tpu.ops.quantized_packed import unpack_quantized_table
        from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer
        from pytorchrec_tpu.training.quantized_trainer import (
            QuantizedEmbeddingTrainer,
        )

        B, VI, VU, S, E = 64, 256, 50, 5, 8

        def mk():
            return DIN(
                uid_column=col(feature_name="uid", category_num=VU),
                iid_column=col(feature_name="iid", category_num=VI),
                his_column=col(feature_name="pos_his", category_num=VI),
                his_len_column=col(feature_name="pos_his_len",
                                   category_num=S + 1),
                label_column=col(feature_name="label", category_num=2),
                emb_size=E, att_hidden_units=(8,), mlp_layers=(8,),
                quantized_table=True, table_row_multiple=8)

        def batch(s):
            rr = np.random.default_rng(100 + s)
            return {
                "uid": rr.integers(0, VU, size=B).astype(np.int32),
                "iid": rr.integers(0, VI, size=B).astype(np.int32),
                "pos_his": rr.integers(1, VI, size=(B, S)).astype(np.int32),
                "pos_his_len": rr.integers(1, S + 1, size=B).astype(np.int32),
                "label": rr.integers(0, 2, size=B).astype(np.int32),
            }

        qt = QuantizedEmbeddingTrainer(mk(), packed_tables=True)
        qt.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
        qt.init_state(batch(0), seed=0)
        st = ShardedSparseEmbeddingTrainer(
            mk(), mesh=make_mesh(data=4, model=2), strategy="1d",
            packed_tables=True)
        st.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
        st.init_state(batch(0), seed=0)

        # step 1: bit-exact i_q parity (same init, same batch, id-keyed
        # rounding makes requantization layout-independent)
        lq = float(qt._train_step(batch(0)))
        ls = float(st._train_step(batch(0)))
        assert abs(lq - ls) < 1e-5, (lq, ls)
        fq = traverse_util.flatten_dict(
            jax.device_get(qt.state.params), sep="/")["i_q"]
        fs = traverse_util.flatten_dict(
            jax.device_get(st.merged_params()), sep="/")["i_q"]
        q1, s1, a1 = unpack_quantized_table(jnp.asarray(fq), E)
        q2, s2, a2 = unpack_quantized_table(jnp.asarray(fs), E)
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-7)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-9)

        # later steps: losses track (u-table dense-vs-lazy drift bounded)
        for s in range(1, 4):
            lq = float(qt._train_step(batch(s)))
            ls = float(st._train_step(batch(s)))
            assert abs(lq - ls) < 5e-3, (s, lq, ls)

    @pytest.mark.slow
    def test_multi_step_drift_is_bounded(self):
        """VERDICT r4 #5: the documented single-vs-sharded 'drift' for
        mixed dense/lazy models is a TESTED BOUND, not folklore. 40 steps
        of quantized DIN (dense-Adam u-table single-device vs lazy
        u-table sharded): per-step loss gap and the dev-AUC gap over a
        2048-row eval view stay within stated tolerances (measured
        2026-08-20: max |dloss| 3.8e-4 over 40 steps, AUC delta 0.0087 —
        asserted with ~10x/3x headroom)."""
        import jax.numpy as jnp  # noqa: F401 (parity with sibling tests)

        from pytorchrec_tpu.feature_column import (
            CategoricalColumnWithIdentity as col,
        )
        from pytorchrec_tpu.metric.metrics import MetricList
        from pytorchrec_tpu.models.din import DIN
        from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer
        from pytorchrec_tpu.training.quantized_trainer import (
            QuantizedEmbeddingTrainer,
        )

        B, VI, VU, S, E = 64, 256, 50, 5, 8

        def mk():
            return DIN(
                uid_column=col(feature_name="uid", category_num=VU),
                iid_column=col(feature_name="iid", category_num=VI),
                his_column=col(feature_name="pos_his", category_num=VI),
                his_len_column=col(feature_name="pos_his_len",
                                   category_num=S + 1),
                emb_size=E, att_hidden_units=(8,), mlp_layers=(8,),
                label_column=col(feature_name="label", category_num=2),
                quantized_table=True, table_row_multiple=8)

        def batch(s, n=B):
            rr = np.random.default_rng(100 + s)
            return {
                "uid": rr.integers(0, VU, size=n).astype(np.int32),
                "iid": rr.integers(0, VI, size=n).astype(np.int32),
                "pos_his": rr.integers(1, VI, size=(n, S)).astype(np.int32),
                "pos_his_len": rr.integers(1, S + 1, size=n).astype(np.int32),
                "label": rr.integers(0, 2, size=n).astype(np.int32),
            }

        qt = QuantizedEmbeddingTrainer(mk(), packed_tables=True)
        qt.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
        qt.init_state(batch(0), seed=0)
        st = ShardedSparseEmbeddingTrainer(
            mk(), mesh=make_mesh(data=4, model=2), strategy="1d",
            packed_tables=True)
        st.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
        st.init_state(batch(0), seed=0)

        worst = 0.0
        for s in range(40):
            lq = float(qt._train_step(batch(s)))
            ls = float(st._train_step(batch(s)))
            worst = max(worst, abs(lq - ls))
        assert worst < 5e-3, worst  # measured 3.8e-4

        evb = batch(999, n=2048)
        evq = np.asarray(qt._eval_step(evb)[0]).reshape(-1)
        evs = np.asarray(st._eval_step(evb)[0]).reshape(-1)
        ml = MetricList(["auc"], user_sample_n=1)
        y = evb["label"].astype(np.float32)
        aq = ml(evq, y)["auc"]
        a_s = ml(evs, y)["auc"]
        assert abs(aq - a_s) < 0.03, (aq, a_s)  # measured 0.0087

    def test_eval_matches_train_view(self):
        from pytorchrec_tpu.feature_column import (
            CategoricalColumnWithIdentity as col,
        )
        from pytorchrec_tpu.models.din import DIN
        from pytorchrec_tpu.training.quantized_trainer import (
            QuantizedEmbeddingTrainer,
        )

        B, VI, VU, S, E = 32, 128, 40, 4, 8
        model = DIN(
            uid_column=col(feature_name="uid", category_num=VU),
            iid_column=col(feature_name="iid", category_num=VI),
            his_column=col(feature_name="pos_his", category_num=VI),
            his_len_column=col(feature_name="pos_his_len", category_num=S + 1),
            label_column=col(feature_name="label", category_num=2),
            emb_size=E, att_hidden_units=(8,), mlp_layers=(8,),
            quantized_table=True)
        rr = np.random.default_rng(7)
        b = {
            "uid": rr.integers(0, VU, size=B).astype(np.int32),
            "iid": rr.integers(0, VI, size=(B, 3)).astype(np.int32),
            "pos_his": rr.integers(1, VI, size=(B, S)).astype(np.int32),
            "pos_his_len": rr.integers(1, S + 1, size=B).astype(np.int32),
        }
        t = QuantizedEmbeddingTrainer(model, packed_tables=True)
        t.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
        t.init_state({**b, "iid": b["iid"][:, 0],
                      "label": rr.integers(0, 2, size=B).astype(np.int32)},
                     seed=0)
        pred, _ = t._eval_step(b)
        assert np.asarray(pred).shape == (B, 3)
        assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.parametrize("model_cls_name", ["sasrec", "gru4rec"])
def test_seq_quantized_table_single_vs_sharded_one_step(model_cls_name):
    """SASRec/GRU4Rec item tables as int8 packed byte rows (round 4): same
    one-step bit-parity contract as TestDINQuantizedTable (single-device
    QuantizedEmbeddingTrainer vs the sharded engine, identical init+batch
    + id-keyed rounding => identical i_q bytes)."""
    import jax.numpy as jnp
    from flax import traverse_util

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity as col,
    )
    from pytorchrec_tpu.models.gru4rec import GRU4Rec
    from pytorchrec_tpu.models.sasrec import SASRec
    from pytorchrec_tpu.ops.quantized_packed import unpack_quantized_table
    from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )

    B, VI, S, E = 64, 256, 5, 8
    common = dict(
        iid_column=col(feature_name="iid", category_num=VI),
        his_column=col(feature_name="pos_his", category_num=VI),
        his_len_column=col(feature_name="pos_his_len", category_num=S + 1),
        label_column=col(feature_name="label", category_num=2),
        emb_size=E, quantized_table=True, table_row_multiple=8)

    def mk():
        if model_cls_name == "sasrec":
            return SASRec(max_his_len=S, num_layers=1, dropout=0.0, **common)
        return GRU4Rec(hidden_size=8, **common)

    rr = np.random.default_rng(3)
    b = {"iid": rr.integers(0, VI, size=B).astype(np.int32),
         "pos_his": rr.integers(1, VI, size=(B, S)).astype(np.int32),
         "pos_his_len": rr.integers(1, S + 1, size=B).astype(np.int32),
         "label": rr.integers(0, 2, size=B).astype(np.int32)}

    qt = QuantizedEmbeddingTrainer(mk(), packed_tables=True)
    qt.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
    qt.init_state(b, seed=0)
    lq = float(qt._train_step(b))

    st = ShardedSparseEmbeddingTrainer(
        mk(), mesh=make_mesh(data=4, model=2), strategy="1d",
        packed_tables=True)
    st.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
    st.init_state(b, seed=0)
    ls = float(st._train_step(b))

    assert abs(lq - ls) < 1e-5, (lq, ls)
    fq = traverse_util.flatten_dict(
        jax.device_get(qt.state.params), sep="/")["i_q"]
    fs = traverse_util.flatten_dict(
        jax.device_get(st.merged_params()), sep="/")["i_q"]
    q1, s1, _ = unpack_quantized_table(jnp.asarray(fq), E)
    q2, s2, _ = unpack_quantized_table(jnp.asarray(fs), E)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-7)

    # and it learns: a few more single-device steps reduce the fixed-batch
    # loss
    for _ in range(12):
        last = float(qt._train_step(b))
    assert last < lq - 0.01, (lq, last)


@pytest.mark.parametrize("model_cls_name", ["ncf", "svdpp"])
def test_factorization_quantized_table_one_step_parity(model_cls_name):
    """NCF (both GMF+MLP item tables) and SVD++ (item + implicit tables)
    as int8 packed byte rows — one-step bit-parity, single-device
    QuantizedEmbeddingTrainer vs the sharded engine (completes the
    model-family x quantized-format matrix)."""
    import jax.numpy as jnp
    from flax import traverse_util

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity as col,
    )
    from pytorchrec_tpu.models.ncf import NCF
    from pytorchrec_tpu.models.svdpp import SVDPP
    from pytorchrec_tpu.ops.quantized_packed import unpack_quantized_table
    from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )

    B, VI, VU, H, E = 64, 256, 50, 4, 8
    rr = np.random.default_rng(6)
    if model_cls_name == "ncf":
        def mk():
            return NCF(uid_column=col(feature_name="uid", category_num=VU),
                       iid_column=col(feature_name="iid", category_num=VI),
                       label_column=col(feature_name="label", category_num=2),
                       emb_size=E, layers=(8,), dropout=0.0,
                       quantized_table=True, table_row_multiple=8)

        b = {"uid": rr.integers(0, VU, size=B).astype(np.int32),
             "iid": rr.integers(0, VI, size=B).astype(np.int32),
             "label": rr.integers(0, 2, size=B).astype(np.int32)}
        q_paths = ["mf_i_q", "mlp_i_q"]
    else:
        def mk():
            return SVDPP(uid_column=col(feature_name="uid", category_num=VU),
                         iid_column=col(feature_name="iid", category_num=VI),
                         iids_column=col(feature_name="iids",
                                         category_num=VI),
                         label_column=col(feature_name="label",
                                          category_num=2),
                         emb_size=E, quantized_table=True,
                         table_row_multiple=8)

        b = {"uid": rr.integers(0, VU, size=B).astype(np.int32),
             "iid": rr.integers(0, VI, size=B).astype(np.int32),
             "iids": rr.integers(1, VI, size=(B, H)).astype(np.int32),
             "label": rr.integers(0, 2, size=B).astype(np.int32)}
        q_paths = ["i_q", "implicit_i_q"]

    qt = QuantizedEmbeddingTrainer(mk(), packed_tables=True)
    qt.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
    qt.init_state(b, seed=0)
    lq = float(qt._train_step(b))

    st = ShardedSparseEmbeddingTrainer(
        mk(), mesh=make_mesh(data=4, model=2), strategy="1d",
        packed_tables=True)
    st.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=("auc",))
    st.init_state(b, seed=0)
    ls = float(st._train_step(b))

    assert abs(lq - ls) < 1e-5, (lq, ls)
    fq = traverse_util.flatten_dict(jax.device_get(qt.state.params), sep="/")
    fs = traverse_util.flatten_dict(jax.device_get(st.merged_params()),
                                    sep="/")
    for path in q_paths:
        q1, s1, _ = unpack_quantized_table(jnp.asarray(fq[path]), E)
        q2, s2, _ = unpack_quantized_table(jnp.asarray(fs[path]), E)
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-7)

    # and it learns on the fixed batch
    for _ in range(15):
        last = float(qt._train_step(b))
    assert last < lq - 0.01, (lq, last)


@pytest.mark.parametrize("model_name", ["dqn", "lsrl"])
def test_rl_quantized_table_trains(dataset_dir, model_name):
    """RL zoo x quantized format (completes the matrix): the QNets' item
    tables as int8 packed byte rows, trained by SparseRLTrainer
    (packed_quantized_update with id-keyed rounding; target net
    dequantizes its in-module reads)."""
    from pytorchrec_tpu.training import SparseRLTrainer

    reader = _reader(model_name)
    model = build_model(model_name, reader, quantized_table=True,
                        **SEQ_HPARAMS[model_name])
    t = SparseRLTrainer(model)
    t.compile(optimizer="adam", lr=1e-2, loss="mse",
              metrics=("ndcg@5",), user_sample_n=10)
    batch = _train_batch(reader)
    t.init_state(batch, seed=0)

    flat0 = traverse_util.flatten_dict(jax.device_get(t.state.params),
                                       sep="/")
    q_keys = [k for k in flat0 if k.endswith("i_q")]
    assert q_keys and all(flat0[k].dtype == np.uint8 for k in q_keys)

    losses = []
    for _ in range(10):
        out = t._train_step(batch)
        losses.append(float(out[1] if isinstance(out, tuple) else out))
    assert losses[-1] < losses[0], losses
    flat1 = traverse_util.flatten_dict(jax.device_get(t.state.params),
                                       sep="/")
    for k in q_keys:
        assert (np.asarray(flat0[k]) != np.asarray(flat1[k])).any(), k
    # target net syncs the byte leaf verbatim at update_freq boundaries
    tflat = traverse_util.flatten_dict(
        jax.device_get(t.state.target_params), sep="/")
    assert all(tflat[k].dtype == np.uint8 for k in q_keys)


def test_funksvd_quantized_table_one_step_parity():
    """FunkSVD item table as int8 packed byte rows — one-step bit-parity
    single-device vs sharded + fixed-batch learning (the simplest-family
    corner of the quantized matrix)."""
    import jax.numpy as jnp

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity as col,
    )
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.ops.quantized_packed import unpack_quantized_table
    from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )

    r = np.random.default_rng(8)
    b = {"uid": r.integers(0, 40, size=64).astype(np.int32),
         "iid": r.integers(0, 120, size=64).astype(np.int32),
         "label": r.integers(0, 2, size=64).astype(np.int32)}

    def mk():
        return FunkSVD(uid_column=col(feature_name="uid", category_num=40),
                       iid_column=col(feature_name="iid", category_num=120),
                       label_column=col(feature_name="label", category_num=2),
                       emb_size=8, quantized_table=True, table_row_multiple=8)

    qt = QuantizedEmbeddingTrainer(mk(), packed_tables=True)
    qt.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=())
    qt.init_state(b, seed=0)
    lq = float(qt._train_step(b))
    st = ShardedSparseEmbeddingTrainer(
        mk(), mesh=make_mesh(data=4, model=2), strategy="1d",
        packed_tables=True)
    st.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=())
    st.init_state(b, seed=0)
    ls = float(st._train_step(b))
    assert abs(lq - ls) < 1e-5, (lq, ls)
    from flax import traverse_util as tu
    fq = tu.flatten_dict(jax.device_get(qt.state.params), sep="/")["i_q"]
    fs = tu.flatten_dict(jax.device_get(st.merged_params()), sep="/")["i_q"]
    q1, _, _ = unpack_quantized_table(jnp.asarray(fq), 8)
    q2, _, _ = unpack_quantized_table(jnp.asarray(fs), 8)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    for _ in range(15):
        last = float(qt._train_step(b))
    assert last < lq - 0.01, (lq, last)


@pytest.mark.parametrize("model_name", ["dqn", "lsrl"])
def test_rl_next_forward_injection_equivalence(dataset_dir, model_name):
    """sharded_target_specs rows injected into next_forward == in-module
    target-net gathers, bit for bit; forward ignores the target keys."""
    reader = _reader(model_name)
    model = build_model(model_name, reader, **SEQ_HPARAMS[model_name])
    batch = _train_batch(reader)
    variables = model.qnet.init(jax.random.PRNGKey(0), batch)
    qnet = model.qnet
    base = qnet.apply(variables, batch, method=qnet.next_forward)
    flat = traverse_util.flatten_dict(variables["params"], sep="/")
    patched = dict(batch)
    for spec in model.sharded_target_specs(batch).values():
        ids = jnp.asarray(spec["ids"]).reshape(-1).astype(jnp.int32)
        patched[spec["rows_key"]] = flat[spec["path"]][ids]
    inj = qnet.apply(variables, patched, method=qnet.next_forward)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(inj))
    fb = qnet.apply(variables, batch, method=qnet.forward)
    fp = qnet.apply(variables, patched, method=qnet.forward)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fp))


@pytest.mark.parametrize("model_name,strategy", [
    ("dqn", "1d"), ("lsrl", "1d"),
    # VERDICT r4 #4: RL beyond 1d — grid shards both networks' tables
    # over the flattened (data, model) grid (unique owner per row)
    ("dqn", "grid"), ("lsrl", "grid"),
])
def test_sharded_rl_trainer_matches_single_device(dataset_dir, model_name,
                                                  strategy):
    """RL through the EXPLICIT engine (round 4, the last family): 5 steps
    of ShardedSparseRLTrainer on the (data=4, model=2) mesh match the
    single-device SparseRLTrainer to float reassociation — eval-net
    lookups + row-grad exchange + target-net lookups + periodic sync all
    inside one shard_map."""
    from pytorchrec_tpu.training import (
        ShardedSparseRLTrainer,
        SparseRLTrainer,
    )

    reader = _reader(model_name)
    batch = _train_batch(reader)

    def mk():
        # parity needs deterministic nets (the sharded step folds the data
        # shard index into the dropout stream, like the sequence tests)
        extra = {"dropout": 0.0} if model_name == "lsrl" else {}
        return build_model(model_name, reader, table_row_multiple=8,
                           **SEQ_HPARAMS[model_name], **extra)

    def run(cls, **kw):
        t = cls(mk(), **kw)
        t.compile(optimizer="adam", lr=1e-2, loss="mse",
                  metrics=("ndcg@5",), user_sample_n=10)
        t.init_state(batch, seed=0)
        for _ in range(5):
            out = t._train_step(batch)
            loss = float(out[1] if isinstance(out, tuple) else out)
        return t, loss

    single, ls = run(SparseRLTrainer)
    sharded, lm = run(ShardedSparseRLTrainer, strategy=strategy,
                      mesh=make_mesh(data=4, model=2))
    assert ls == pytest.approx(lm, abs=1e-4)
    fa = traverse_util.flatten_dict(jax.device_get(single.state.params),
                                    sep="/")
    fb = traverse_util.flatten_dict(jax.device_get(sharded.state.params),
                                    sep="/")
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   rtol=2e-4, atol=2e-6, err_msg=k)
    ta = traverse_util.flatten_dict(
        jax.device_get(single.state.target_params), sep="/")
    tb = traverse_util.flatten_dict(
        jax.device_get(sharded.state.target_params), sep="/")
    for k in ta:
        np.testing.assert_allclose(np.asarray(ta[k]), np.asarray(tb[k]),
                                   rtol=2e-4, atol=2e-6, err_msg=k)
    # eval path: candidates score through the engine lookup
    pred, _ = sharded._eval_step(batch)
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.parametrize("strategy", ["1d", "grid"])
def test_sharded_rl_quantized_table_bit_parity(dataset_dir, strategy):
    """RL x quantized x the ENGINE (the final matrix corner): DQN's int8
    byte-row item table through ShardedSparseRLTrainer — both networks'
    lookups ship q||scale bytes, the owner shard requantizes with
    id-keyed rounding, and the table is BIT-equal to the single-device
    SparseRLTrainer after 3 steps (1d AND the (data, model) grid)."""
    from pytorchrec_tpu.ops.quantized_packed import unpack_quantized_table
    from pytorchrec_tpu.training import (
        ShardedSparseRLTrainer,
        SparseRLTrainer,
    )

    reader = _reader("dqn")
    batch = _train_batch(reader)

    def mk():
        return build_model("dqn", reader, table_row_multiple=8,
                           quantized_table=True, **SEQ_HPARAMS["dqn"])

    def run(cls, **kw):
        t = cls(mk(), **kw)
        t.compile(optimizer="adam", lr=1e-2, loss="mse",
                  metrics=("ndcg@5",), user_sample_n=10)
        t.init_state(batch, seed=0)
        for _ in range(3):
            out = t._train_step(batch)
            loss = float(out[1] if isinstance(out, tuple) else out)
        return t, loss

    single, ls = run(SparseRLTrainer)
    sharded, lm = run(ShardedSparseRLTrainer, strategy=strategy,
                      mesh=make_mesh(data=4, model=2))
    assert ls == pytest.approx(lm, abs=1e-4)
    fa = traverse_util.flatten_dict(jax.device_get(single.state.params),
                                    sep="/")["i_q"]
    fb = traverse_util.flatten_dict(jax.device_get(sharded.state.params),
                                    sep="/")["i_q"]
    q1, s1, _ = unpack_quantized_table(jnp.asarray(fa), 8)
    q2, s2, _ = unpack_quantized_table(jnp.asarray(fb), 8)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-7)
    pred, _ = sharded._eval_step(batch)
    assert np.isfinite(np.asarray(pred)).all()


def test_packed_sparse_rl_trainer_matches_classic(dataset_dir):
    """SparseRLTrainer(packed_tables=True): table||m||v in one fast-width
    leaf, both networks' gathers injected — matches the classic layout to
    float reassociation and wins 1.88x over dense Adam at [1M, 64]
    (scripts/rl_sparse_ab.py, RESULTS.md)."""
    from pytorchrec_tpu.training import SparseRLTrainer

    reader = _reader("dqn")
    batch = _train_batch(reader)

    def run(packed):
        t = SparseRLTrainer(build_model("dqn", reader, **SEQ_HPARAMS["dqn"]),
                            packed_tables=packed)
        t.compile(optimizer="adam", lr=1e-2, loss="mse",
                  metrics=("ndcg@5",), user_sample_n=10)
        t.init_state(batch, seed=0)
        for _ in range(5):
            out = t._train_step(batch)
            loss = float(out[1] if isinstance(out, tuple) else out)
        return t, loss

    classic, lc = run(False)
    packed, lp = run(True)
    assert lc == pytest.approx(lp, abs=1e-4)
    fc = traverse_util.flatten_dict(jax.device_get(classic.state.params),
                                    sep="/")["i_embedding/embedding"]
    fp = traverse_util.flatten_dict(jax.device_get(packed.state.params),
                                    sep="/")["i_embedding/embedding"]
    E = SEQ_HPARAMS["dqn"]["emb_size"]
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fp)[:, :E],
                               rtol=1e-5, atol=1e-7)
    pred, _ = packed._eval_step(batch)
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.parametrize("model_name,strategy", [
    ("dqn", "1d"), ("lsrl", "1d"), ("dqn", "grid"),
])
def test_sharded_packed_rl_trainer_matches_single_device(dataset_dir,
                                                         model_name,
                                                         strategy):
    """Packed fast-width RL on the EXPLICIT engine (VERDICT r4 #3): the
    [V, W] table||m||v leaf row-shards over `model`, lookups slice to E
    via out_cols before the return hop (both networks), the owner shard
    applies ONE packed_sparse_update — 5 steps on the (data=4, model=2)
    mesh match the single-device SparseRLTrainer(packed_tables=True),
    packed leaves (moments included) compared column for column."""
    from pytorchrec_tpu.training import (
        ShardedSparseRLTrainer,
        SparseRLTrainer,
    )

    reader = _reader(model_name)
    batch = _train_batch(reader)

    def mk():
        extra = {"dropout": 0.0} if model_name == "lsrl" else {}
        return build_model(model_name, reader, table_row_multiple=8,
                           **SEQ_HPARAMS[model_name], **extra)

    def run(cls, **kw):
        t = cls(mk(), packed_tables=True, **kw)
        t.compile(optimizer="adam", lr=1e-2, loss="mse",
                  metrics=("ndcg@5",), user_sample_n=10)
        t.init_state(batch, seed=0)
        for _ in range(5):
            out = t._train_step(batch)
            loss = float(out[1] if isinstance(out, tuple) else out)
        return t, loss

    single, ls = run(SparseRLTrainer)
    sharded, lm = run(ShardedSparseRLTrainer, strategy=strategy,
                      mesh=make_mesh(data=4, model=2))
    assert ls == pytest.approx(lm, abs=1e-4)
    for tree in ("params", "target_params"):
        fa = traverse_util.flatten_dict(
            jax.device_get(getattr(single.state, tree)), sep="/")
        fb = traverse_util.flatten_dict(
            jax.device_get(getattr(sharded.state, tree)), sep="/")
        assert set(fa) == set(fb)
        for k in fa:
            np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                       rtol=2e-4, atol=2e-6,
                                       err_msg=f"{tree}/{k}")
    pred, _ = sharded._eval_step(batch)
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.parametrize("packed", [False, True])
def test_sharded_rl_hot_cold_matches_single_device(dataset_dir, packed):
    """RL x hot_cold (round 5 — the last strategy x family corner): BOTH
    QNet networks resolve hot ids from replicated fragments and cold ids
    through the all-to-all, the target net's fragments mirror the eval
    net's layout (periodic sync stays a tree copy), and 5 steps on the
    (data=4, model=2) mesh match the single-device SparseRLTrainer after
    merged_params() restores [V, E] row order — classic AND packed."""
    from pytorchrec_tpu.training import (
        ShardedSparseRLTrainer,
        SparseRLTrainer,
    )

    reader = _reader("dqn")
    batch = _train_batch(reader)

    def mk():
        return build_model("dqn", reader, table_row_multiple=8,
                           **SEQ_HPARAMS["dqn"])

    # Zipf traffic counts over the item vocab (the hot_cold sizing input)
    model0 = mk()
    spec = model0.sharded_table_specs(batch)["i"]
    v = int(np.asarray(spec["ids"]).max()) + 1
    rng = np.random.default_rng(5)
    counts = rng.permutation(
        (1e4 / np.arange(1, v + 1) ** 1.1).astype(np.int64) + 1)

    def run(cls, **kw):
        t = cls(mk(), packed_tables=packed, **kw)
        t.compile(optimizer="adam", lr=1e-2, loss="mse",
                  metrics=("ndcg@5",), user_sample_n=10)
        t.init_state(batch, seed=0)
        for _ in range(5):
            out = t._train_step(batch)
            loss = float(out[1] if isinstance(out, tuple) else out)
        return t, loss

    single, ls = run(SparseRLTrainer)
    sharded, lm = run(ShardedSparseRLTrainer, strategy="hot_cold",
                      hot_counts={"i": counts}, hot_rows=16,
                      mesh=make_mesh(data=4, model=2))
    assert ls == pytest.approx(lm, abs=1e-4)

    for tree in ("params", "target_params"):
        sh = traverse_util.flatten_dict(sharded.merged_params(tree), sep="/")
        si_raw = jax.device_get(getattr(single.state, tree))
        si = traverse_util.flatten_dict(si_raw, sep="/")
        E = SEQ_HPARAMS["dqn"]["emb_size"]
        for k in si:
            a, b = np.asarray(si[k]), np.asarray(sh[k])
            if packed and k in single._table_paths:
                a = a[:, :E]  # single-device packed leaf -> table view
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6,
                                       err_msg=f"{tree}/{k}")
    pred, _ = sharded._eval_step(batch)
    assert np.isfinite(np.asarray(pred)).all()
