"""Quantized + bf16 tables through the explicit sharded engine (VERDICT r3
item 1): the packed byte-row q||scale||acc leaves (ops/quantized_packed.py)
row-shard over 1d/grid/hot_cold, ship int8 rows + scales on the lookup
return hop, and update on the owner shard with id-keyed stochastic rounding
— parity-tested against the single-device QuantizedEmbeddingTrainer.

DLRM is the parity twin (``_uses_linear=False``): its only sparse table is
the quantized one, so both trainers treat every table identically. (With a
linear table the single-device quantized trainer trains it via DENSE optax
Adam while the sharded trainer trains it lazy-sparse — semantically fine,
but not a parity twin.)
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchrec_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)

B, V, E = 64, 120, 8


def _columns():
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )

    sparse = [
        CategoricalColumnWithIdentity(feature_name=f"c_{i}", category_num=V)
        for i in range(3)
    ]
    dense = [NumericColumn(feature_name="d_0")]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    return sparse, dense, label


def _batch(seed):
    r = np.random.default_rng(seed)
    b = {f"c_{i}": r.integers(0, V, size=B).astype(np.int32) for i in range(3)}
    b["d_0"] = r.normal(size=B).astype(np.float32)
    b["label"] = r.integers(0, 2, size=B).astype(np.int32)
    return b


def _model(bits=8, G=1, quantized=True):
    from pytorchrec_tpu.models import DLRM

    sparse, dense, label = _columns()
    return DLRM(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                label_column=label, emb_size=E, bottom_layers=(16,),
                top_layers=(16,), unified_embedding=True,
                quantized_embedding=quantized, table_packed=quantized,
                table_bits=bits, scale_col_groups=G, table_row_multiple=8)


def _train(trainer, steps=5):
    trainer.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("auc",))
    trainer.init_state(_batch(0), seed=3)
    loss = None
    for s in range(steps):
        loss = trainer._train_step(_batch(10 + s))
    assert np.isfinite(float(loss))
    return trainer


def _single(bits=8, G=1):
    from pytorchrec_tpu.ops.quantized_packed import unpack_quantized_table
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )

    t = _train(QuantizedEmbeddingTrainer(_model(bits, G), packed_tables=True))
    return unpack_quantized_table(
        jnp.asarray(t.state.params["unified_q"]), E, bits, G)


def _sharded(bits=8, G=1, **kw):
    from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer

    t = _train(ShardedSparseEmbeddingTrainer(
        _model(bits, G), mesh=make_mesh(data=4, model=2), packed_tables=True,
        **kw))
    return t


def _unpack_sharded(t, bits=8, G=1):
    from pytorchrec_tpu.ops.quantized_packed import unpack_quantized_table

    leaf = (t.merged_params() if t.strategy == "hot_cold"
            else jax.device_get(t.state.params))["unified_q"]
    return unpack_quantized_table(jnp.asarray(leaf), E, bits, G)


@pytest.mark.parametrize("case", [
    dict(),                                              # 1d
    dict(strategy="grid"),                               # 2-D grid
    dict(strategy="grid", two_hop=True,
         exchange_capacity=2.0),                         # hierarchical 2-hop
    dict(exchange_capacity=1),                           # forced overflow
])
def test_quantized_sharded_bit_identical_to_single_device(case):
    """5 fit steps through the sharded engine leave the int8 table
    BIT-identical to the single-device packed quantized trainer: the
    id-keyed rounding bits (ops/kernels/quantize.py) make stochastic
    requantization layout-independent, and the exchange is exact."""
    q0, s0, a0 = _single()
    t = _sharded(**case)
    q1, s1, a1 = _unpack_sharded(t)
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
    # scales carry float-reassociation noise (grad sums arrive in exchange
    # order): ulp-level, never a quantization-grid change (q is bit-equal)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                               rtol=1e-5, atol=1e-10)


def test_quantized_sharded_int4_col_groups():
    """int4 nibble-packed rows + per-column-group scales shard the same."""
    q0, s0, a0 = _single(bits=4, G=2)
    t = _sharded(bits=4, G=2)
    q1, s1, a1 = _unpack_sharded(t, bits=4, G=2)
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)


def test_quantized_sharded_hot_cold_within_quanta():
    """hot_cold replicates the Zipf head and shards the cold tail; rounding
    bits key on FRAGMENT-space ids (the packed permutation), so parity vs
    single-device holds to a few quantization steps, with accumulators (the
    f32 optimizer state) matching to float noise."""
    from pytorchrec_tpu.ops.kernels.quantize import dequantize_rows

    q0, s0, a0 = _single()
    counts = np.random.default_rng(7).zipf(1.5, size=3 * V).astype(np.float64)
    t = _sharded(strategy="hot_cold", hot_counts={"unified": counts},
                 hot_rows=0.5)
    q1, s1, a1 = _unpack_sharded(t)
    r0 = dequantize_rows(q0, s0)
    r1 = dequantize_rows(q1, s1)
    quantum = float(np.max(np.asarray(s0)))
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               atol=4 * quantum)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                               rtol=1e-5, atol=1e-10)
    # eval through the fragment-aware lookup runs
    pred, _ = t._eval_step(_batch(99))
    assert np.asarray(pred).shape == (B,)


def test_quantized_sharded_qgrad_exchange_close():
    """int8 row-grad payloads on the backward exchange (qgrad_exchange):
    ~4x less wire bytes at a one-rounding-per-occurrence cost — the final
    table stays within a few quantization steps of the exact-exchange run,
    and accumulators track to the grad-quantization error."""
    from pytorchrec_tpu.ops.kernels.quantize import dequantize_rows

    q0, s0, a0 = _single()
    t = _sharded(qgrad_exchange=True)
    q1, s1, a1 = _unpack_sharded(t)
    r0 = dequantize_rows(q0, s0)
    r1 = dequantize_rows(q1, s1)
    quantum = float(np.max(np.asarray(s0)))
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               atol=4 * quantum)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                               rtol=1e-2, atol=1e-10)


def test_quantized_sharded_eval_and_serving():
    """Eval injects dequantized rows through the sharded lookup; the
    serving export keeps the model-native packed byte rows (the model
    dequantizes at gather time) and scores identically to eval."""
    t = _sharded()
    batch = _batch(42)
    pred, _ = t._eval_step(batch)
    assert np.asarray(pred).shape == (B,)
    serve = t.make_serving_fn()
    pred2 = serve(batch)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred2),
                               rtol=1e-4, atol=1e-5)


def test_quantized_sharded_leaf_layout():
    """The [V, W] uint8 leaf really lands row-sharded (1d: model axis;
    grid: the flattened (data, model) grid)."""
    from jax.sharding import PartitionSpec

    t = _sharded()
    leaf = t.state.params["unified_q"]
    assert leaf.dtype == jnp.uint8
    assert leaf.sharding.spec in (PartitionSpec("model", None),
                                  PartitionSpec("model")), leaf.sharding
    g = _sharded(strategy="grid")
    gleaf = g.state.params["unified_q"]
    assert tuple(gleaf.sharding.spec)[:1] == (("data", "model"),)
    # one owner per row: each device holds V_total/8 rows
    assert all(s.data.shape[0] == gleaf.shape[0] // 8
               for s in gleaf.addressable_shards)


def test_bf16_packed_sharded_matches_single_device():
    """bf16 packed rows (packed_dtype='bfloat16') through the sharded
    engine == the single-device bf16 packed trainer, bit for bit; lookup
    return hops carry bf16 E-columns (half the f32 bytes)."""
    from pytorchrec_tpu.training import (
        ShardedSparseEmbeddingTrainer,
        SparseEmbeddingTrainer,
    )

    def run(mesh):
        m = _model(quantized=False)
        if mesh is None:
            t = SparseEmbeddingTrainer(m, packed_tables=True,
                                       packed_dtype="bfloat16")
        else:
            t = ShardedSparseEmbeddingTrainer(m, mesh=mesh,
                                              packed_tables=True,
                                              packed_dtype="bfloat16")
        return _train(t)

    t0, t1 = run(None), run(make_mesh(data=4, model=2))
    assert t1.state.params["unified_emb"]["embedding"].dtype == jnp.bfloat16
    u0 = t0.unpacked_params()["unified_emb"]["embedding"]
    u1 = t1.unpacked_params()["unified_emb"]["embedding"]
    np.testing.assert_array_equal(np.asarray(u0, np.float32),
                                  np.asarray(u1, np.float32))


def test_quantized_sharded_requires_packed_trainer():
    from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer

    t = ShardedSparseEmbeddingTrainer(_model(), mesh=make_mesh(data=4, model=2),
                                      packed_tables=False)
    t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("auc",))
    with pytest.raises(AssertionError):
        t.init_state(_batch(0), seed=0)


def test_sharded_table_specs_requires_table_packed():
    """quantized_embedding without table_packed cannot shard (the owner
    update needs scale+acc riding in the byte row)."""
    from pytorchrec_tpu.models import DLRM

    sparse, dense, label = _columns()
    m = DLRM(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
             label_column=label, emb_size=E, unified_embedding=True,
             quantized_embedding=True, table_packed=False)
    with pytest.raises(AssertionError):
        m.sharded_table_specs(_batch(0))
