"""Streaming pipeline tests: sharded parquet files -> fixed-shape shuffled
batches -> step-driven training (the full-Criteo-scale input path)."""

import os

import numpy as np
import pandas as pd
import pytest

from pytorchrec_tpu.data.streaming import StreamingBatchSource


@pytest.fixture()
def shard_dir(tmp_path):
    rng = np.random.default_rng(0)
    for shard in range(4):
        n = 1000
        df = pd.DataFrame({
            "c_0": rng.integers(0, 50, size=n).astype(np.int32),
            "c_1": rng.integers(0, 80, size=n).astype(np.int32),
            "d_0": rng.normal(size=n).astype(np.float32),
            "label": rng.integers(0, 2, size=n).astype(np.int32),
            "shard": np.full(n, shard, dtype=np.int32),
        })
        df.to_parquet(tmp_path / f"part-{shard}.parquet")
    return str(tmp_path)


def test_fixed_shape_batches_and_coverage(shard_dir):
    source = StreamingBatchSource(
        os.path.join(shard_dir, "part-*.parquet"), batch_size=256,
        chunk_rows=300, shuffle_buffer_chunks=3, seed=1,
    )
    total = 0
    shards_seen = set()
    for batch in source.batches(epochs=1):
        assert batch["c_0"].shape == (256,)
        assert set(batch) == {"c_0", "c_1", "d_0", "label", "shard"}
        total += 256
        shards_seen.update(np.unique(batch["shard"]).tolist())
    # 4000 rows, drop-remainder => 15 batches
    assert total == 15 * 256
    assert shards_seen == {0, 1, 2, 3}


def test_shuffling_mixes_chunks(shard_dir):
    source = StreamingBatchSource(
        os.path.join(shard_dir, "part-*.parquet"), batch_size=512,
        chunk_rows=300, shuffle_buffer_chunks=4, seed=2,
    )
    first = next(source.batches(epochs=1))
    # a shuffle buffer of 4x300 rows spans chunks; a batch should mix them
    assert len(np.unique(first["shard"])) >= 2


def test_per_process_file_sharding(shard_dir):
    pattern = os.path.join(shard_dir, "part-*.parquet")
    seen = []
    for pid in range(2):
        source = StreamingBatchSource(pattern, batch_size=100, process_id=pid,
                                      process_count=2, shuffle_files=False)
        shards = set()
        for batch in source.batches(epochs=1):
            shards.update(np.unique(batch["shard"]).tolist())
        seen.append(shards)
    assert seen[0] & seen[1] == set()
    assert seen[0] | seen[1] == {0, 1, 2, 3}


def test_fit_steps_streaming_training(shard_dir):
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DeepFM
    from pytorchrec_tpu.training import Trainer

    sparse = (CategoricalColumnWithIdentity(feature_name="c_0", category_num=50),
              CategoricalColumnWithIdentity(feature_name="c_1", category_num=80))
    dense = (NumericColumn(feature_name="d_0"),)
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = DeepFM(sparse_columns=sparse, dense_columns=dense,
                   label_column=label, emb_size=4, layers=(8,))
    trainer = Trainer(model)
    trainer.compile(optimizer="adam", lr=0.01, loss="bce", metrics=("auc",))

    source = StreamingBatchSource(
        os.path.join(shard_dir, "part-*.parquet"), batch_size=128,
        chunk_rows=500, seed=3,
    )
    history = trainer.fit_steps(source.batches(epochs=None), steps=25, log_every=10,
                                verbose=0)
    losses = history.history["loss"]
    assert len(losses) == 3  # windows at steps 10, 20, 25
    assert all(np.isfinite(losses))


def test_missing_files_error():
    with pytest.raises(AssertionError):
        StreamingBatchSource("/nonexistent/zzz-*.parquet", batch_size=8)


def test_fit_steps_scan_fusion(shard_dir):
    """steps_per_call > 1: K steps fused into one lax.scan call; same
    learning trajectory shape, fewer device calls."""
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DeepFM
    from pytorchrec_tpu.training import Trainer

    sparse = (CategoricalColumnWithIdentity(feature_name="c_0", category_num=50),
              CategoricalColumnWithIdentity(feature_name="c_1", category_num=80))
    dense = (NumericColumn(feature_name="d_0"),)
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)

    def run(steps_per_call):
        model = DeepFM(sparse_columns=sparse, dense_columns=dense,
                       label_column=label, emb_size=4, layers=(8,))
        t = Trainer(model)
        t.compile(optimizer="adam", lr=0.01, loss="bce", metrics=("auc",))
        source = StreamingBatchSource(
            os.path.join(shard_dir, "part-*.parquet"), batch_size=128,
            chunk_rows=500, seed=3, shuffle_files=False,
        )
        h = t.fit_steps(source.batches(epochs=None), steps=23, log_every=10,
                        steps_per_call=steps_per_call, verbose=0)
        return t, h

    t1, h1 = run(1)
    t4, h4 = run(4)
    assert int(t1.state.step) == int(t4.state.step) == 23
    assert all(np.isfinite(h4.history["loss"]))
    # same data order (unshuffled files, same seed) -> same final params
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t4.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
