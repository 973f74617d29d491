"""Row-sparse optimizer tests: dedup math, lazy-Adam parity on touched rows,
and the SparseEmbeddingTrainer end-to-end (learning + untouched rows frozen)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchrec_tpu.ops.sparse_update import (
    dedup_row_grads,
    sparse_adagrad,
    sparse_lazy_adam,
)


def test_dedup_row_grads_sums_duplicates():
    ids = jnp.asarray([3, 1, 3, 7, 1, 3], jnp.int32)
    dvec = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    g = dedup_row_grads(ids, dvec)
    valid = np.asarray(g.mask) > 0
    got = {int(i): r for i, r in zip(np.asarray(g.ids)[valid], np.asarray(g.rows)[valid])}
    assert set(got) == {1, 3, 7}
    np.testing.assert_allclose(got[1], dvec[1] + dvec[4])
    np.testing.assert_allclose(got[3], dvec[0] + dvec[2] + dvec[5])
    np.testing.assert_allclose(got[7], dvec[3])


def test_sparse_lazy_adam_matches_dense_on_touched_rows():
    rng = np.random.default_rng(0)
    V, E = 50, 4
    table = jnp.asarray(rng.normal(size=(V, E)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(V, E)) * 0.1, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=(V, E))) * 0.1, jnp.float32)
    ids = jnp.asarray([5, 9, 5, 30], jnp.int32)
    dvec = jnp.asarray(rng.normal(size=(4, E)), jnp.float32)
    step = jnp.asarray(7, jnp.int32)
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8

    new_table, new_m, new_v = sparse_lazy_adam(table, m, v, ids, dvec, step, lr, b1, b2, eps)

    # dense lazy reference on the touched rows
    dense_g = np.zeros((V, E), np.float32)
    for i, row in zip(np.asarray(ids), np.asarray(dvec)):
        dense_g[i] += row
    touched = np.unique(np.asarray(ids))
    exp_m, exp_v = np.asarray(m).copy(), np.asarray(v).copy()
    exp_t = np.asarray(table).copy()
    for i in touched:
        exp_m[i] = b1 * exp_m[i] + (1 - b1) * dense_g[i]
        exp_v[i] = b2 * exp_v[i] + (1 - b2) * dense_g[i] ** 2
        m_hat = exp_m[i] / (1 - b1 ** 7)
        v_hat = exp_v[i] / (1 - b2 ** 7)
        exp_t[i] -= lr * m_hat / (np.sqrt(v_hat) + eps)

    np.testing.assert_allclose(np.asarray(new_table), exp_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_m), exp_m, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_v), exp_v, rtol=1e-5, atol=1e-6)
    # untouched rows bit-identical
    untouched = np.setdiff1d(np.arange(V), touched)
    np.testing.assert_array_equal(np.asarray(new_table)[untouched], np.asarray(table)[untouched])


def test_sparse_adagrad_touched_rows():
    V, E = 20, 3
    table = jnp.ones((V, E), jnp.float32)
    acc = jnp.zeros((V, E), jnp.float32)
    ids = jnp.asarray([2, 2, 4], jnp.int32)
    dvec = jnp.asarray([[1, 0, 0], [1, 0, 0], [0, 2, 0]], jnp.float32)
    new_table, new_acc = sparse_adagrad(table, acc, ids, dvec, lr=0.1)
    np.testing.assert_allclose(np.asarray(new_acc)[2], [4, 0, 0])
    np.testing.assert_allclose(np.asarray(new_acc)[4], [0, 4, 0])
    np.testing.assert_allclose(np.asarray(new_table)[3], [1, 1, 1])
    assert np.asarray(new_table)[2, 0] < 1.0


def test_sparse_rowwise_adagrad_matches_manual():
    """One f32 accumulator per ROW: acc += mean(g^2); duplicates pre-summed;
    untouched rows frozen; out-of-range/padding ids dropped."""
    from pytorchrec_tpu.ops.sparse_update import sparse_rowwise_adagrad

    V, E = 20, 4
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32))
    acc = jnp.asarray(rng.random(V).astype(np.float32))
    ids = jnp.asarray([2, 2, 4, 19], jnp.int32)
    dvec = jnp.asarray(rng.normal(size=(4, E)).astype(np.float32))
    new_table, new_acc = sparse_rowwise_adagrad(table, acc, ids, dvec, lr=0.1)

    t, a = np.asarray(table).copy(), np.asarray(acc).copy()
    for row in (2, 4, 19):
        g = np.asarray(dvec)[np.asarray(ids) == row].sum(axis=0)
        a[row] += np.mean(g ** 2)
        t[row] -= 0.1 * g / (np.sqrt(a[row]) + 1e-8)
    np.testing.assert_allclose(np.asarray(new_acc), a, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_table), t, rtol=1e-5)
    # untouched rows bit-identical
    mask = np.ones(V, bool)
    mask[[2, 4, 19]] = False
    np.testing.assert_array_equal(np.asarray(new_table)[mask],
                                  np.asarray(table)[mask])


def test_packed_update_matches_lazy_adam_with_long_runs():
    """packed_sparse_update == sparse_lazy_adam on the unpacked view, with
    duplicate runs LONGER than the scan's eager depth (exercises the
    lax.cond tail passes) and with short runs (eager-only path)."""
    from pytorchrec_tpu.ops.sparse_update import (
        pack_table,
        packed_sparse_update,
        unpack_table,
    )

    rng = np.random.default_rng(3)
    V, E = 300, 4
    table = jnp.asarray(rng.normal(size=(V, E)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(V, E)) * 0.1, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=(V, E))) * 0.1, jnp.float32)
    step = jnp.asarray(5, jnp.int32)

    for ids_np in (
        np.concatenate([np.full(100, 7), np.full(40, 13),
                        rng.integers(0, V, size=60)]),  # long runs
        rng.integers(0, V, size=64),                    # short runs
    ):
        ids = jnp.asarray(ids_np.astype(np.int32))
        n = ids.shape[0]
        dvec = jnp.asarray(rng.normal(size=(n, E)), jnp.float32)

        ref_t, ref_m, ref_v = sparse_lazy_adam(table, m, v, ids, dvec, step,
                                               lr=0.01)

        packed = pack_table(table, "adam")
        w = packed.shape[1]
        packed = packed.at[:, E:2 * E].set(m).at[:, 2 * E:3 * E].set(v)
        rows = packed[ids]
        out = packed_sparse_update(packed, rows, ids, dvec, step, lr=0.01)

        np.testing.assert_allclose(np.asarray(unpack_table(out, E)),
                                   np.asarray(ref_t), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[:, E:2 * E]),
                                   np.asarray(ref_m), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[:, 2 * E:3 * E]),
                                   np.asarray(ref_v), rtol=1e-5, atol=1e-6)
        assert out.shape[1] == w


@pytest.mark.parametrize("optimizer", ["adam", "adagrad", "rowwise_adagrad"])
def test_packed_bytes_update_bit_identical_to_f32_packed(optimizer):
    """packed_sparse_update_bytes == packed_sparse_update BIT-for-bit on the
    unpacked view: the byte layout bitcasts the same f32 fields through the
    same op order, so there is no float divergence at all. Covers duplicate
    runs longer than the scan's eager depth and the width accounting
    (rowwise_adagrad at E=16 packs to 192 uint8 cols vs 256 f32 bytes)."""
    from pytorchrec_tpu.ops.sparse_update import (
        PACKED_COLS,
        pack_table,
        pack_table_bytes,
        packed_bytes_width,
        packed_sparse_update,
        packed_sparse_update_bytes,
        unpack_table,
        unpack_table_bytes,
    )

    rng = np.random.default_rng(7)
    V, E = 300, 16
    table = jnp.asarray(rng.normal(size=(V, E)), jnp.float32)
    step = jnp.asarray(4, jnp.int32)
    c = PACKED_COLS[optimizer](E)

    # byte width drops the f32 layout's padding waste for rowwise_adagrad
    assert packed_bytes_width(E, optimizer) == {"adam": 256, "adagrad": 192,
                                                "rowwise_adagrad": 192}[optimizer]

    for ids_np in (
        np.concatenate([np.full(40, 7), rng.integers(0, V, size=88)]),
        rng.integers(0, V, size=64),
    ):
        ids = jnp.asarray(ids_np.astype(np.int32))
        n = ids.shape[0]
        dvec = jnp.asarray(rng.normal(size=(n, E)), jnp.float32)

        # seed both layouts with the SAME nonzero optimizer state
        state_cols = jnp.asarray(
            np.abs(rng.normal(size=(V, c - E))) * 0.1, jnp.float32)
        pk = pack_table(table, optimizer)
        pk = pk.at[:, E:c].set(state_cols)
        from pytorchrec_tpu.ops.sparse_update import f32_to_bytes

        pb = pack_table_bytes(table, optimizer)
        pb = pb.at[:, 4 * E:4 * c].set(f32_to_bytes(state_cols))

        out_f32 = packed_sparse_update(pk, pk[ids], ids, dvec, step, lr=0.01,
                                       optimizer=optimizer)
        out_b = packed_sparse_update_bytes(pb, pb[ids], ids, dvec, step,
                                           lr=0.01, optimizer=optimizer)

        np.testing.assert_array_equal(
            np.asarray(unpack_table_bytes(out_b, E)),
            np.asarray(unpack_table(out_f32, E)))
        # optimizer fields bit-identical too
        from pytorchrec_tpu.ops.sparse_update import bytes_to_f32

        np.testing.assert_array_equal(
            np.asarray(bytes_to_f32(out_b[:, :4 * c])[:, E:]),
            np.asarray(out_f32[:, E:c]))


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml

    tmp = tmp_path_factory.mktemp("wd")
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = str(tmp)
    generate_synthetic_ml("Synthetic-ML-Sparse", n_users=60, n_items=150, seed=31)
    yield str(tmp)
    os.environ.pop("PYTORCHREC_TPU_WORK_DIR", None)


def _reader():
    from pytorchrec_tpu.data import SimpleDataReader, SplitMode, TrainMode

    return SimpleDataReader(
        "Synthetic-ML-Sparse", split_mode=SplitMode.LEAVE_K_OUT, warm_n=5,
        leave_k=1, neg_sample_n=9, train_mode=TrainMode.POINT_WISE,
        random_seed=2020,
    )


def test_sparse_trainer_funksvd_learns(dataset_dir):
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer
    from pytorchrec_tpu.utils import constants as C

    reader = _reader()
    cols = reader.get_feature_column_dict()
    model = FunkSVD(uid_column=cols[C.UID], iid_column=cols[C.IID],
                    label_column=cols[C.LABEL], emb_size=8)
    t = SparseEmbeddingTrainer(model)
    t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",), user_sample_n=10)
    h = t.fit(reader, batch_size=32, epochs=3, verbose=0, dev_freq=1)
    losses = h.history["loss"]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    assert np.isfinite(h.history["hit@5"][-1])
    # table moments exist and only for the two tables
    assert set(t.state.table_moments) == {
        "u_embeddings/embedding", "i_embeddings/embedding",
    }


def test_sparse_trainer_untouched_rows_frozen(dataset_dir):
    """Rows never seen in a batch keep their init values + zero moments."""
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer
    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity

    uid = CategoricalColumnWithIdentity(feature_name="uid", category_num=100)
    iid = CategoricalColumnWithIdentity(feature_name="iid", category_num=100)
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = FunkSVD(uid_column=uid, iid_column=iid, label_column=label, emb_size=4)
    t = SparseEmbeddingTrainer(model)
    t.compile(optimizer="adam", lr=0.1, loss="bce", metrics=("hit@5",))
    batch = {
        "uid": np.asarray([1, 2, 3], np.int32),
        "iid": np.asarray([10, 11, 10], np.int32),
        "label": np.asarray([1, 0, 1], np.int32),
    }
    t.init_state(batch, seed=0)
    before = np.asarray(t.state.params["u_embeddings"]["embedding"]).copy()
    for _ in range(3):
        t._train_step(batch)
    after = np.asarray(t.state.params["u_embeddings"]["embedding"])
    changed = np.any(before != after, axis=1)
    assert changed[[1, 2, 3]].all()
    untouched = np.setdiff1d(np.arange(100), [1, 2, 3])
    np.testing.assert_array_equal(before[untouched], after[untouched])


def test_sparse_trainer_dcn_with_candidate_mode(dataset_dir):
    """CTR family + [B, N] candidate gathers through the scatter-patch."""
    from pytorchrec_tpu.tasks import build_model, build_reader
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer
    from pytorchrec_tpu.data import SplitMode, TrainMode

    reader = build_reader("dcn", "Synthetic-ML-Sparse",
                          split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
                          neg_sample_n=9, train_mode=TrainMode.POINT_WISE,
                          random_seed=2020)
    model = build_model("dcn", reader, emb_size=4)
    t = SparseEmbeddingTrainer(model, table_optimizer="adagrad")
    t.compile(optimizer="adam", lr=0.02, loss="bce", metrics=("ndcg@5",), user_sample_n=10)
    h = t.fit(reader, batch_size=32, epochs=2, verbose=0, dev_freq=1)
    assert all(np.isfinite(h.history["loss"]))
    assert np.isfinite(h.history["ndcg@5"][-1])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_sparse_trainer_on_mesh(dataset_dir):
    """Row-sharded tables + row-sparse updates combined: numerics match the
    single-device sparse trainer."""
    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.parallel import MODEL_AXIS, make_mesh
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    uid = CategoricalColumnWithIdentity(feature_name="uid", category_num=64)
    iid = CategoricalColumnWithIdentity(feature_name="iid", category_num=128)
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    rng = np.random.default_rng(3)
    batch = {
        "uid": rng.integers(0, 64, size=32).astype(np.int32),
        "iid": rng.integers(0, 128, size=32).astype(np.int32),
        "label": rng.integers(0, 2, size=32).astype(np.int32),
    }

    def run(mesh):
        model = FunkSVD(uid_column=uid, iid_column=iid, label_column=label, emb_size=8)
        t = SparseEmbeddingTrainer(model, mesh=mesh)
        t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",))
        t.init_state(batch, seed=0)
        for _ in range(3):
            t._train_step(batch)
        return t

    single = run(None)
    sharded = run(make_mesh(data=4, model=2))
    for a, b in zip(jax.tree_util.tree_leaves(single.state.params),
                    jax.tree_util.tree_leaves(sharded.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
    # tables landed sharded
    spec = sharded.state.params["i_embeddings"]["embedding"].sharding.spec
    assert spec and spec[0] == MODEL_AXIS, spec


def test_unified_embedding_matches_separate_tables(dataset_dir):
    """unified_embedding=True computes the same function family (same arch,
    different param layout); smoke: trains + evaluates finitely, and the
    unified ids place every field in its own offset range."""
    from pytorchrec_tpu.tasks import build_model, build_reader
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer
    from pytorchrec_tpu.data import SplitMode, TrainMode

    reader = build_reader("deepfm", "Synthetic-ML-Sparse",
                          split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
                          neg_sample_n=9, train_mode=TrainMode.POINT_WISE,
                          random_seed=2020)
    model = build_model("deepfm", reader, emb_size=4, layers=(8,),
                        unified_embedding=True)
    # exactly two tables under the sparse trainer
    t = SparseEmbeddingTrainer(model)
    t.compile(optimizer="adam", lr=0.02, loss="bce", metrics=("ndcg@5",), user_sample_n=10)
    h = t.fit(reader, batch_size=32, epochs=2, verbose=0, dev_freq=2)
    assert set(t.state.table_moments) == {"unified_emb/embedding", "unified_lin/embedding"}
    assert all(np.isfinite(h.history["loss"]))
    assert np.isfinite(h.history["ndcg@5"][-1])

    # offsets partition the unified id space
    offsets, total = model._field_offsets()
    sizes = [c.category_num for c in model.sparse_columns]
    assert offsets[0] == 0 and total == sum(sizes)
    for i in range(1, len(offsets)):
        assert offsets[i] == offsets[i - 1] + sizes[i - 1]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_sparse_trainer_unified_on_mesh(dataset_dir):
    """Unified offset-indexed table + row-sharding + sparse updates combined."""
    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity, NumericColumn
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.parallel import make_mesh
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    # vocabs sum to 96 -> divisible by model axis 2
    sparse = (CategoricalColumnWithIdentity(feature_name="c_0", category_num=64),
              CategoricalColumnWithIdentity(feature_name="c_1", category_num=32))
    dense = (NumericColumn(feature_name="d_0"),)
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    rng = np.random.default_rng(5)
    batch = {
        "c_0": rng.integers(0, 64, size=32).astype(np.int32),
        "c_1": rng.integers(0, 32, size=32).astype(np.int32),
        "d_0": rng.normal(size=32).astype(np.float32),
        "label": rng.integers(0, 2, size=32).astype(np.int32),
    }

    def run(mesh):
        model = DCNv2(sparse_columns=sparse, dense_columns=dense,
                      label_column=label, emb_size=4, num_cross_layers=2,
                      layers=(8,), unified_embedding=True)
        t = SparseEmbeddingTrainer(model, mesh=mesh)
        t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("auc",))
        t.init_state(batch, seed=0)
        for _ in range(3):
            t._train_step(batch)
        return t

    single = run(None)
    sharded = run(make_mesh(data=4, model=2))
    for a, b in zip(jax.tree_util.tree_leaves(single.state.params),
                    jax.tree_util.tree_leaves(sharded.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_sparse_trainer_pairwise_candidates(dataset_dir):
    """Pairwise training ([B, 2] candidate gathers) through the
    scatter-patch sparse path."""
    from pytorchrec_tpu.data import SimpleDataReader, SplitMode, TrainMode
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer
    from pytorchrec_tpu.utils import constants as C

    reader = SimpleDataReader(
        "Synthetic-ML-Sparse", split_mode=SplitMode.LEAVE_K_OUT, warm_n=5,
        leave_k=1, neg_sample_n=9, train_mode=TrainMode.PAIR_WISE,
        random_seed=2020,
    )
    cols = reader.get_feature_column_dict()
    model = FunkSVD(uid_column=cols[C.UID], iid_column=cols[C.IID],
                    label_column=cols[C.LABEL], emb_size=8)
    t = SparseEmbeddingTrainer(model)
    t.compile(optimizer="adam", lr=0.05, loss="bpr", metrics=("ndcg@5",),
              user_sample_n=10)
    h = t.fit(reader, batch_size=32, epochs=3, verbose=0, dev_freq=3)
    losses = h.history["loss"]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    assert np.isfinite(h.history["ndcg@5"][-1])


def test_sparse_first_step_equals_dense_everywhere(dataset_dir):
    """At step 1 lazy Adam == dense Adam exactly (zero-gradient rows get a
    zero update in both), so one sparse step must reproduce one dense step
    on EVERY row — including duplicate-id accumulation in the batch."""
    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.training import Trainer
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    uid = CategoricalColumnWithIdentity(feature_name="uid", category_num=30)
    iid = CategoricalColumnWithIdentity(feature_name="iid", category_num=40)
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    batch = {  # heavy duplicates on purpose
        "uid": np.asarray([1, 1, 1, 2, 2, 3, 1, 2], np.int32),
        "iid": np.asarray([5, 5, 7, 5, 9, 7, 5, 9], np.int32),
        "label": np.asarray([1, 0, 1, 1, 0, 1, 0, 1], np.int32),
    }

    def one_step(cls):
        model = FunkSVD(uid_column=uid, iid_column=iid, label_column=label,
                        emb_size=4)
        t = cls(model)
        t.compile(optimizer="adam", lr=0.1, loss="bce", metrics=("hit@5",))
        t.init_state(batch, seed=0)
        t._train_step(batch)
        return t.state.params

    dense = one_step(Trainer)
    sparse = one_step(SparseEmbeddingTrainer)
    for a, b in zip(jax.tree_util.tree_leaves(dense),
                    jax.tree_util.tree_leaves(sparse)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_rows_injection_matches_patch_path(dataset_dir):
    """The injection fast path (no scatter-patch in the train graph) is
    numerically equivalent to the patch path: same params + moments after
    2 epochs of FM training (relu-free model -> tight tolerance)."""
    from pytorchrec_tpu.tasks import build_model
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    def run(inject):
        reader = _reader()
        model = build_model("fm", reader, emb_size=8, unified_embedding=True)
        t = SparseEmbeddingTrainer(model, rows_injection=inject)
        t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",),
                  user_sample_n=10)
        t.fit(reader, batch_size=32, epochs=2, verbose=0, eval_dev=False,
              seed=11)
        assert t.rows_injection is inject
        return t

    patch = run(False)
    inj = run(True)
    for a, b in zip(jax.tree_util.tree_leaves(patch.state.params),
                    jax.tree_util.tree_leaves(inj.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(patch.state.table_moments),
                    jax.tree_util.tree_leaves(inj.state.table_moments)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("table_optimizer", ["adam", "adagrad",
                                             "rowwise_adagrad"])
def test_packed_tables_match_unpacked(dataset_dir, table_optimizer):
    """Packed [V, C] table||moments leaves (3 latency-bound row passes per
    step instead of ~6) are numerically equivalent to the classic
    separate-buffer path: same unpacked params, moments, and eval metrics
    after 2 epochs of unified-FM training. Also covers the packed eval
    injection and serving unpack."""
    from pytorchrec_tpu.ops.sparse_update import unpack_table
    from pytorchrec_tpu.tasks import build_model
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    def run(packed):
        reader = _reader()
        model = build_model("fm", reader, emb_size=8, unified_embedding=True)
        t = SparseEmbeddingTrainer(model, table_optimizer=table_optimizer,
                                   packed_tables=packed)
        t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",),
                  user_sample_n=10)
        t.fit(reader, batch_size=32, epochs=2, verbose=0, eval_dev=False,
              seed=11)
        metrics = t.evaluate(reader, split="dev", batch_size=32)
        return t, reader, metrics

    plain, _, m_plain = run(False)
    pk, reader, m_pk = run(True)

    flat_plain = {"/".join(str(getattr(k, "key", k)) for k in path): leaf
                  for path, leaf in
                  jax.tree_util.tree_flatten_with_path(plain.state.params)[0]}
    flat_pk = {"/".join(str(getattr(k, "key", k)) for k in path): leaf
               for path, leaf in
               jax.tree_util.tree_flatten_with_path(pk.state.params)[0]}
    for path in flat_plain:
        a = np.asarray(flat_plain[path])
        b = np.asarray(flat_pk[path])
        if path in pk._table_paths:
            packed_leaf = flat_pk[path]
            b = np.asarray(unpack_table(packed_leaf, a.shape[1]))
            # moments stored in the packed columns match the classic ones
            mom = plain.state.table_moments[path]
            e = a.shape[1]
            if table_optimizer == "adam":
                np.testing.assert_allclose(
                    np.asarray(packed_leaf)[:, e:2 * e], np.asarray(mom["m"]),
                    rtol=1e-3, atol=1e-7)
                np.testing.assert_allclose(
                    np.asarray(packed_leaf)[:, 2 * e:3 * e],
                    np.asarray(mom["v"]), rtol=1e-3, atol=1e-7)
            elif table_optimizer == "adagrad":
                np.testing.assert_allclose(
                    np.asarray(packed_leaf)[:, e:2 * e],
                    np.asarray(mom["acc"]), rtol=1e-5, atol=1e-7)
            else:
                np.testing.assert_allclose(
                    np.asarray(packed_leaf)[:, e], np.asarray(mom["acc"]),
                    rtol=1e-5, atol=1e-7)
        # adam's sqrt/div amplifies float reassociation between the two
        # step graphs over epochs (same class as test_sharded_trainer's
        # _tree_allclose tolerance; observed max ~2e-4 relative)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-7, err_msg=path)

    for key in m_plain:
        assert float(m_plain[key]) == pytest.approx(float(m_pk[key]),
                                                    abs=1e-6)

    # serving unpacks transparently
    batch = reader.get_batch("train", np.arange(4))
    s_plain = np.asarray(plain.make_serving_fn()(batch))
    s_pk = np.asarray(pk.make_serving_fn()(batch))
    np.testing.assert_allclose(s_plain, s_pk, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("table_optimizer", ["adam", "rowwise_adagrad"])
def test_packed_bytes_trainer_bit_identical(dataset_dir, table_optimizer):
    """SparseEmbeddingTrainer(packed_bytes=True) reproduces the f32 packed
    layout BIT-for-bit end-to-end (fit + eval + serving): the byte rows are
    a pure bit view of the same fields, so even adam's sqrt/div chain can't
    diverge. Also checks the byte leaves really are uint8 and narrower than
    the f32 layout for rowwise_adagrad."""
    from pytorchrec_tpu.ops.sparse_update import unpack_table
    from pytorchrec_tpu.tasks import build_model
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    def run(as_bytes):
        reader = _reader()
        model = build_model("fm", reader, emb_size=8, unified_embedding=True)
        t = SparseEmbeddingTrainer(model, table_optimizer=table_optimizer,
                                   packed_tables=True, packed_bytes=as_bytes)
        t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",),
                  user_sample_n=10)
        t.fit(reader, batch_size=32, epochs=2, verbose=0, eval_dev=False,
              seed=11)
        metrics = t.evaluate(reader, split="dev", batch_size=32)
        return t, reader, metrics

    f32, _, m_f32 = run(False)
    byt, reader, m_byt = run(True)

    flat_f32 = {"/".join(str(getattr(k, "key", k)) for k in path): leaf
                for path, leaf in
                jax.tree_util.tree_flatten_with_path(f32.state.params)[0]}
    flat_byt = {"/".join(str(getattr(k, "key", k)) for k in path): leaf
                for path, leaf in
                jax.tree_util.tree_flatten_with_path(byt.state.params)[0]}
    for path in flat_f32:
        a, b = flat_f32[path], flat_byt[path]
        if path in byt._table_paths:
            e = byt._table_emb_dims[path]
            assert b.dtype == jnp.uint8
            assert b.shape[1] <= 4 * a.shape[1]
            if table_optimizer == "rowwise_adagrad":
                assert b.shape[1] < 4 * a.shape[1]  # padding waste removed
            from pytorchrec_tpu.ops.sparse_update import unpack_table_bytes

            np.testing.assert_array_equal(
                np.asarray(unpack_table_bytes(b, e)),
                np.asarray(unpack_table(a, e)), err_msg=path)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=path)

    for key in m_f32:
        assert float(m_f32[key]) == float(m_byt[key]), key

    batch = reader.get_batch("train", np.arange(4))
    np.testing.assert_array_equal(
        np.asarray(f32.make_serving_fn()(batch)),
        np.asarray(byt.make_serving_fn()(batch)))


@pytest.mark.parametrize("optimizer", ["adam", "adagrad", "rowwise_adagrad"])
def test_packed_bf16_update_bit_predictable(optimizer):
    """bf16 packed rows = EXACTLY f32 optimizer math over bf16-rounded
    inputs, outputs rounded to bf16: running the f32 packed update on
    bf16-rounded table/moments/grads and bf16-rounding its result must
    reproduce the bf16 path bit-for-bit (same ops, same order — the only
    difference is the storage dtype's round-to-nearest-even on read/write)."""
    from pytorchrec_tpu.ops.sparse_update import (
        PACKED_COLS,
        pack_table,
        packed_sparse_update,
    )

    rng = np.random.default_rng(11)
    V, E = 300, 16
    table = jnp.asarray(rng.normal(size=(V, E)), jnp.float32)
    step = jnp.asarray(4, jnp.int32)
    c = PACKED_COLS[optimizer](E)
    state_cols = jnp.asarray(
        np.abs(rng.normal(size=(V, c - E))) * 0.1, jnp.float32)

    for ids_np in (
        np.concatenate([np.full(40, 7), rng.integers(0, V, size=88)]),
        rng.integers(0, V, size=64),
    ):
        ids = jnp.asarray(ids_np.astype(np.int32))
        dvec = jnp.asarray(rng.normal(size=(ids.shape[0], E)), jnp.float32)

        pk16 = pack_table(table, optimizer, dtype=jnp.bfloat16)
        pk16 = pk16.at[:, E:c].set(state_cols.astype(jnp.bfloat16))
        out16 = packed_sparse_update(pk16, pk16[ids], ids, dvec, step,
                                     lr=0.01, optimizer=optimizer)
        assert out16.dtype == jnp.bfloat16

        # f32 twin over bf16-rounded inputs
        pk = pack_table(table.astype(jnp.bfloat16).astype(jnp.float32),
                        optimizer)
        pk = pk.at[:, E:c].set(
            state_cols.astype(jnp.bfloat16).astype(jnp.float32))
        dvec_r = dvec.astype(jnp.bfloat16).astype(jnp.float32)
        out = packed_sparse_update(pk, pk[ids], ids, dvec_r, step,
                                   lr=0.01, optimizer=optimizer)
        np.testing.assert_array_equal(
            np.asarray(out16[:, :c].astype(jnp.float32)),
            np.asarray(out[:, :c].astype(jnp.bfloat16).astype(jnp.float32)))


def test_packed_bf16_trainer_close_to_f32(dataset_dir):
    """SparseEmbeddingTrainer(packed_dtype='bfloat16'): 128-byte rows train
    to eval metrics close to the f32 packed path, table leaves really are
    bf16, and serving exports f32."""
    from pytorchrec_tpu.tasks import build_model
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    def run(dtype):
        reader = _reader()
        model = build_model("fm", reader, emb_size=8, unified_embedding=True)
        t = SparseEmbeddingTrainer(model, packed_tables=True,
                                   packed_dtype=dtype)
        t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",),
                  user_sample_n=10)
        t.fit(reader, batch_size=32, epochs=2, verbose=0, eval_dev=False,
              seed=11)
        return t, reader, t.evaluate(reader, split="dev", batch_size=32)

    f32, _, m_f32 = run(None)
    b16, reader, m_b16 = run("bfloat16")

    flat = {"/".join(str(getattr(k, "key", k)) for k in p): leaf
            for p, leaf in
            jax.tree_util.tree_flatten_with_path(b16.state.params)[0]}
    for path in b16._table_paths:
        assert flat[path].dtype == jnp.bfloat16, path

    for key in m_f32:
        assert float(m_b16[key]) == pytest.approx(float(m_f32[key]), abs=0.1)

    # serving unpacks to f32 and scores close to the f32 trainer
    batch = reader.get_batch("train", np.arange(4))
    s16 = np.asarray(b16.make_serving_fn()(batch))
    s32 = np.asarray(f32.make_serving_fn()(batch))
    assert s16.dtype == np.float32
    np.testing.assert_allclose(s16, s32, atol=0.15)


def test_rows_injection_auto_resolution(dataset_dir):
    """Auto mode: on for unified CTR (all tables injectable), off for the
    per-field layout (sharded_table_specs asserts)."""
    from pytorchrec_tpu.tasks import build_model
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    reader = _reader()
    for unified, expected in ((True, True), (False, False)):
        model = build_model("fm", reader, emb_size=8, unified_embedding=unified)
        t = SparseEmbeddingTrainer(model)
        t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",),
                  user_sample_n=10)
        batch = reader.get_batch("train", np.arange(4))
        t.init_state(batch, seed=0)
        assert t.rows_injection is expected, (unified, t.rows_injection)
        # one step runs on whichever path resolved
        loss = t._train_step(batch)
        assert np.isfinite(float(loss))
