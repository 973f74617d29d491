"""Multi-chip full-corpus retrieval (serving/retrieval.py::
make_sharded_retrieve_fn): corpus rows sharded over mesh axes, per-shard
selection, one all_gather of k candidates per shard, exact cross-shard
merge. Parity targets: the single-device exact path.

No reference counterpart (SURVEY §5.8 serving recipe; the reference has no
retrieval or multi-device serving at all).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchrec_tpu.parallel import make_mesh
from pytorchrec_tpu.serving.retrieval import (
    build_item_index,
    make_retrieve_fn,
    make_sharded_retrieve_fn,
    shard_item_index,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _model_and_index(n_items=700, emb=16):
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_two_tower import _make_model

    model = _make_model(n_items=n_items, normalize=False, emb_size=emb)
    batch = {"uid": jnp.arange(8), "iid": jnp.zeros((8,), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), batch, False)
    index = build_item_index(model, params, num_items=n_items,
                             batch_size=128, dtype=jnp.float32)
    return model, params, index


@pytest.mark.parametrize("corpus_axis,n_items", [
    ("model", 700),            # ragged: 700 rows over 4 shards -> pad 0
    ("model", 704),            # clean split
    (("data", "model"), 700),  # whole-mesh corpus, replicated queries
])
def test_sharded_exact_matches_single_device(corpus_axis, n_items):
    model, params, index = _model_and_index(n_items=n_items)
    mesh = make_mesh(data=2, model=4)

    single = make_retrieve_fn(model, chunk_items=256)
    uids = jnp.arange(16)
    s_ref, i_ref = single(params, index, uids, k=10)

    sharded_index = shard_item_index(index, mesh, corpus_axis)
    retrieve = make_sharded_retrieve_fn(model, mesh, num_items=n_items,
                                        chunk_items=128,
                                        corpus_axis=corpus_axis)
    s, i = retrieve(params, sharded_index, uids, k=10)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    assert int(np.asarray(i).max()) < n_items


def test_sharded_fused_scores_exact_recall_high():
    """Fused (bin-max) sharded mode: returned scores are the TRUE scores of
    the returned ids; recall vs exact stays high; pad ids never returned."""
    n_items = 700
    model, params, index = _model_and_index(n_items=n_items)
    mesh = make_mesh(data=2, model=4)

    single = make_retrieve_fn(model, chunk_items=256)
    uids = jnp.arange(16)
    _, i_ref = single(params, index, uids, k=10)

    sharded_index = shard_item_index(index, mesh, "model")
    retrieve = make_sharded_retrieve_fn(model, mesh, num_items=n_items,
                                        approx="fused", fused_group=1,
                                        corpus_axis="model")
    s, i = retrieve(params, sharded_index, uids, k=10)
    i_np = np.asarray(i)
    assert i_np.max() < n_items
    # exact-score property
    uv = np.asarray(model.apply(params, uids, method=model.user_vectors))
    full = uv @ np.asarray(index).T
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(full, i_np, axis=1), rtol=1e-4)
    recall = np.mean([np.isin(i_np[b], np.asarray(i_ref)[b]).mean()
                      for b in range(16)])
    assert recall >= 0.8, recall


def test_sharded_queries_actually_sharded():
    """corpus_axis='model': query batch is split over the data axis (each
    data group computes B/data rows), outputs laid out the same way."""
    n_items = 704
    model, params, index = _model_and_index(n_items=n_items)
    mesh = make_mesh(data=2, model=4)
    sharded_index = shard_item_index(index, mesh, "model")
    retrieve = make_sharded_retrieve_fn(model, mesh, num_items=n_items,
                                        chunk_items=128, corpus_axis="model")
    from jax.sharding import NamedSharding, PartitionSpec

    uids = jax.device_put(jnp.arange(16),
                          NamedSharding(mesh, PartitionSpec("data")))
    s, i = retrieve(params, sharded_index, uids, k=5)
    assert s.sharding.spec == PartitionSpec("data"), s.sharding
    single = make_retrieve_fn(model, chunk_items=256)
    _, i_ref = single(params, index, jnp.arange(16), k=5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
