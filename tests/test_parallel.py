"""Parallel-layer tests on the virtual 8-device CPU mesh: sharded embedding
lookup parity (psum + all_to_all strategies), param sharding rules, and
data-parallel training parity vs single-device (SURVEY §5.8 / §7 stage 7)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchrec_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    all_to_all_lookup,
    make_mesh,
    make_sharded_lookup,
    masked_psum_lookup,
    param_shardings,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {DATA_AXIS: 8, MODEL_AXIS: 1}
    mesh = make_mesh(model=4)
    assert mesh.shape == {DATA_AXIS: 2, MODEL_AXIS: 4}


@pytest.mark.parametrize("strategy", ["psum", "all_to_all"])
def test_sharded_lookup_matches_dense_gather(strategy):
    mesh = make_mesh(data=2, model=4)
    rng = np.random.default_rng(0)
    table = rng.normal(size=(64, 16)).astype(np.float32)
    ids = rng.integers(0, 64, size=32).astype(np.int32)

    lookup = make_sharded_lookup(mesh, strategy=strategy)
    result = np.asarray(lookup(jnp.asarray(table), jnp.asarray(ids)))
    np.testing.assert_allclose(result, table[ids], rtol=1e-6)


@pytest.mark.parametrize("strategy", ["psum", "all_to_all"])
def test_sharded_lookup_gradients_flow_to_owner_rows(strategy):
    """Backward: d(sum(lookup))/d(table) puts a count-weighted 1-vector on
    exactly the looked-up rows (sparse-row update semantics)."""
    mesh = make_mesh(data=2, model=4)
    table = jnp.asarray(np.random.default_rng(1).normal(size=(32, 8)), jnp.float32)
    ids = jnp.asarray([0, 5, 5, 31, 16, 2, 7, 8], jnp.int32)

    lookup = make_sharded_lookup(mesh, strategy=strategy)
    grad = jax.grad(lambda t: jnp.sum(lookup(t, ids)))(table)
    expected = np.zeros((32, 8), np.float32)
    for i in np.asarray(ids):
        expected[i] += 1.0
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=1e-6)


def test_param_sharding_rules():
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity

    mesh = make_mesh(data=2, model=4)
    uid = CategoricalColumnWithIdentity(feature_name="uid", category_num=64)
    iid = CategoricalColumnWithIdentity(feature_name="iid", category_num=128)
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = FunkSVD(uid_column=uid, iid_column=iid, label_column=label, emb_size=8)
    batch = {"uid": np.zeros(4, np.int32), "iid": np.zeros(4, np.int32)}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    shardings = param_shardings(params, mesh)

    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    by_name = {"/".join(str(getattr(k, "key", k)) for k in path): s for path, s in flat}
    specs = {name: s.spec for name, s in by_name.items()}
    # both tables row-sharded
    assert any(spec == jax.sharding.PartitionSpec(MODEL_AXIS, None) for spec in specs.values()), specs


def test_data_parallel_training_parity():
    """2 steps of DeepFM-style training on the mesh == single-device, and the
    sharded state actually lands row-sharded."""
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = "/tmp/ptrec_parallel_wd"
    from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
    from pytorchrec_tpu.data import SimpleDataReader, SplitMode, TrainMode
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.training import Trainer
    from pytorchrec_tpu.utils import constants as C

    name = "Synthetic-ML-Parallel"
    if not os.path.exists(os.path.join(C.dataset_dir(), name)):
        # vocab sizes = max_id + 1, so 63/255 users/items give 64/256-row
        # tables divisible by the model axis
        generate_synthetic_ml(name, n_users=63, n_items=255, seed=3)
    reader = SimpleDataReader(
        name, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
        neg_sample_n=9, train_mode=TrainMode.POINT_WISE, random_seed=2020,
    )
    cols = reader.get_feature_column_dict()

    def run(mesh):
        model = FunkSVD(uid_column=cols[C.UID], iid_column=cols[C.IID],
                        label_column=cols[C.LABEL], emb_size=8)
        tr = Trainer(model, mesh=mesh)
        tr.compile(optimizer="adam", lr=0.01, loss="bce",
                   metrics=("hit@5",), user_sample_n=10)
        tr.fit(reader, batch_size=32, epochs=2, verbose=0, eval_dev=False, seed=7)
        return tr

    single = run(None)
    mesh = make_mesh(data=4, model=2)
    sharded = run(mesh)

    # numerically identical training (same data order, same init seed)
    for a, b in zip(
        jax.tree_util.tree_leaves(single.state.params),
        jax.tree_util.tree_leaves(sharded.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)

    # tables are genuinely row-sharded on the mesh
    flat = jax.tree_util.tree_flatten_with_path(sharded.state.params)[0]
    table_shardings = [
        leaf.sharding.spec for path, leaf in flat
        if "embedding" in "/".join(str(getattr(k, "key", k)) for k in path).lower()
        and leaf.ndim == 2
    ]
    assert table_shardings, "no embedding tables found"
    assert any(
        spec and spec[0] == MODEL_AXIS for spec in table_shardings
    ), table_shardings

    # eval works on the mesh too
    logs = sharded.evaluate(reader, split="dev", batch_size=32)
    assert np.isfinite(logs["hit@5"])


def test_hot_cold_layout_and_lookup():
    """RecShard-style split: hottest rows replicated, tail sharded; lookup
    matches a dense gather; gradients flow to both fragments."""
    from pytorchrec_tpu.parallel.hot_cold import (
        build_layout,
        make_hot_cold_lookup,
        split_table,
    )

    rng = np.random.default_rng(0)
    V, E, HOT = 100, 8, 10
    counts = rng.zipf(1.5, size=V).astype(np.int64)
    table = rng.normal(size=(V, E)).astype(np.float32)
    mesh = make_mesh(data=2, model=4)

    layout = build_layout(counts, hot_rows=HOT, pad_cold_to_multiple=4)
    assert layout.cold_rows % 4 == 0
    # hottest rows really are the top-counts
    hot_original = layout.inverse[:HOT]
    assert set(hot_original.tolist()) == set(np.argsort(-counts, kind="stable")[:HOT].tolist())

    hot, cold = split_table(table, layout)
    ids = rng.integers(0, V, size=32).astype(np.int32)
    lookup = make_hot_cold_lookup(mesh)
    out = lookup(jnp.asarray(hot), jnp.asarray(cold),
                 jnp.asarray(layout.perm), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)

    # gradients: d(sum)/d(hot) and d(sum)/d(cold) land on the looked-up rows
    def loss(hot, cold):
        return jnp.sum(lookup(hot, cold, jnp.asarray(layout.perm), jnp.asarray(ids)))

    g_hot, g_cold = jax.grad(loss, argnums=(0, 1))(jnp.asarray(hot), jnp.asarray(cold))
    packed = layout.perm[ids]
    exp_hot = np.zeros_like(hot)
    exp_cold = np.zeros_like(cold)
    for p in packed:
        if p < HOT:
            exp_hot[p] += 1.0
        else:
            exp_cold[p - HOT] += 1.0
    np.testing.assert_allclose(np.asarray(g_hot), exp_hot, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_cold), exp_cold, rtol=1e-6)


def test_hot_cold_training_step_matches_dense():
    """One SGD step on the hot/cold fragments == one SGD step on the dense
    table (merge_table round-trips the updated fragments back to the
    original row order) — training really can run in the RecShard layout."""
    from pytorchrec_tpu.parallel.hot_cold import (
        build_layout,
        make_hot_cold_lookup,
        merge_table,
        split_table,
    )

    rng = np.random.default_rng(3)
    V, E, HOT, B = 64, 8, 6, 16
    counts = rng.zipf(1.5, size=V).astype(np.int64)
    table = rng.normal(size=(V, E)).astype(np.float32)
    target = rng.normal(size=(B, E)).astype(np.float32)
    ids = rng.integers(0, V, size=B).astype(np.int32)
    mesh = make_mesh(data=2, model=4)

    layout = build_layout(counts, hot_rows=HOT, pad_cold_to_multiple=4)
    hot, cold = split_table(table, layout)
    lookup = make_hot_cold_lookup(mesh)
    lr = 0.1

    def hc_loss(hot, cold):
        rows = lookup(hot, cold, jnp.asarray(layout.perm), jnp.asarray(ids))
        return jnp.mean((rows - target) ** 2)

    g_hot, g_cold = jax.grad(hc_loss, argnums=(0, 1))(
        jnp.asarray(hot), jnp.asarray(cold))
    merged = merge_table(np.asarray(hot - lr * g_hot),
                         np.asarray(cold - lr * g_cold), layout)

    def dense_loss(t):
        return jnp.mean((t[ids] - target) ** 2)

    dense_after = np.asarray(
        jnp.asarray(table) - lr * jax.grad(dense_loss)(jnp.asarray(table)))
    np.testing.assert_allclose(merged, dense_after, rtol=1e-5, atol=1e-7)

    # merge_table is the exact inverse of split_table
    np.testing.assert_array_equal(merge_table(*split_table(table, layout),
                                              layout), table)
