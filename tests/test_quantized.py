"""Quantized-embedding tests: row quantization math, stochastic rounding
unbiasedness, and the int8-table trainer end-to-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchrec_tpu.ops.kernels.quantize import (
    dequantize_rows,
    quantize_rows_pallas,
    quantize_rows_xla,
)


def test_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(scale=0.05, size=(64, 16)), jnp.float32)
    q, scale = quantize_rows_xla(rows)
    assert q.dtype == jnp.int8 and scale.shape == (64,)
    back = dequantize_rows(q, scale)
    # max error per element <= scale/2 (round-to-nearest)
    err = np.abs(np.asarray(back - rows))
    assert (err <= np.asarray(scale)[:, None] / 2 + 1e-7).all()


def test_stochastic_rounding_unbiased():
    """E[quantized] == exact value for a constant row under stochastic
    rounding (the property that keeps sub-scale updates alive)."""
    value = 0.3  # between quantization levels for the chosen scale
    rows = jnp.full((1, 8), value, jnp.float32)
    rows = rows.at[0, 0].set(1.27)  # pins absmax -> scale = 0.01
    key = jax.random.PRNGKey(0)
    total = np.zeros(8)
    n = 400
    for i in range(n):
        bits = jax.random.bits(jax.random.fold_in(key, i), rows.shape, jnp.uint32)
        q, s = quantize_rows_xla(rows, rng_bits=bits)
        total += np.asarray(dequantize_rows(q, s))[0]
    mean = total / n
    np.testing.assert_allclose(mean[1:], value, rtol=2e-3)


def test_pallas_quantize_bit_identical_to_xla():
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.normal(scale=0.1, size=(32, 8)), jnp.float32)
    bits = jax.random.bits(jax.random.PRNGKey(7), rows.shape, jnp.uint32)
    q_pl, s_pl = quantize_rows_pallas(rows, bits, block_rows=16, interpret=True)
    q_x, s_x = quantize_rows_xla(rows, rng_bits=bits)
    np.testing.assert_array_equal(np.asarray(q_pl), np.asarray(q_x))
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_x), rtol=1e-6)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml

    tmp = tmp_path_factory.mktemp("wd")
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = str(tmp)
    generate_synthetic_ml("Synthetic-ML-Quant", n_users=60, n_items=150, seed=41)
    yield str(tmp)
    os.environ.pop("PYTORCHREC_TPU_WORK_DIR", None)


def test_quantized_dcn_trains(dataset_dir):
    from pytorchrec_tpu.tasks import build_model, build_reader
    from pytorchrec_tpu.training.quantized_trainer import QuantizedEmbeddingTrainer
    from pytorchrec_tpu.data import SplitMode, TrainMode

    reader = build_reader("dcn", "Synthetic-ML-Quant",
                          split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
                          neg_sample_n=9, train_mode=TrainMode.POINT_WISE,
                          random_seed=2020)
    model = build_model("dcn", reader, emb_size=8,
                        unified_embedding=True, quantized_embedding=True)
    t = QuantizedEmbeddingTrainer(model)
    t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("ndcg@5",), user_sample_n=10)
    h = t.fit(reader, batch_size=32, epochs=3, verbose=0, dev_freq=3)
    assert all(np.isfinite(h.history["loss"]))
    assert h.history["loss"][-1] < h.history["loss"][0]
    assert np.isfinite(h.history["ndcg@5"][-1])

    # tables really are int8 + per-row scale + rowwise accumulator
    q = t.state.params["unified_q"]
    scale = t.state.params["unified_scale"]
    assert q.dtype == jnp.int8 and scale.dtype == jnp.float32
    assert scale.shape == (q.shape[0],)
    assert set(t.state.table_acc) == {"unified"}
    assert t.state.table_acc["unified"].shape == (q.shape[0],)
    # some rows were touched: accumulator grew somewhere
    assert float(jnp.max(t.state.table_acc["unified"])) > 0

    # eval path works with quantized gathers (no external rows)
    logs = t.evaluate(reader, split="test", batch_size=32)
    assert np.isfinite(logs["ndcg@5"])


def test_quantized_quality_close_to_f32(dataset_dir):
    """Quantized training stays in the same quality ballpark as f32 on the
    synthetic task (not bit-parity — int8 is lossy by design)."""
    from pytorchrec_tpu.tasks import build_model, build_reader
    from pytorchrec_tpu.training import Trainer
    from pytorchrec_tpu.training.quantized_trainer import QuantizedEmbeddingTrainer
    from pytorchrec_tpu.data import SplitMode, TrainMode

    def run(quantized):
        reader = build_reader("fm", "Synthetic-ML-Quant",
                              split_mode=SplitMode.LEAVE_K_OUT, warm_n=5,
                              leave_k=1, neg_sample_n=9,
                              train_mode=TrainMode.POINT_WISE, random_seed=2020)
        model = build_model("fm", reader, emb_size=8, unified_embedding=True,
                            quantized_embedding=quantized)
        t = QuantizedEmbeddingTrainer(model) if quantized else Trainer(model)
        t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",),
                  user_sample_n=10)
        t.fit(reader, batch_size=32, epochs=4, verbose=0, eval_dev=False)
        return t.evaluate(reader, split="dev", batch_size=32)["hit@5"]

    f32 = run(False)
    q8 = run(True)
    assert q8 > 0.5 * f32, (f32, q8)


def test_duplicate_ids_do_not_clobber_last_row():
    """Regression: dedup padding slots alias the LAST unique id; a scatter-SET
    with duplicate indices is last-wins, so the padding slot's stale row used
    to revert that id's update. Craft a batch where the max unified id is
    duplicated (guaranteeing padding slots alias it) and check its row moves."""
    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
    from pytorchrec_tpu.models import FM
    from pytorchrec_tpu.ops.kernels.quantize import dequantize_rows
    from pytorchrec_tpu.training.quantized_trainer import QuantizedEmbeddingTrainer

    cols = [
        CategoricalColumnWithIdentity(feature_name=f"c_{i}", category_num=4)
        for i in range(2)
    ]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = FM(sparse_columns=tuple(cols), label_column=label, emb_size=8,
               unified_embedding=True, quantized_embedding=True)
    # unified ids: c_0 -> 0..3, c_1 -> 4..7. Max id 7 duplicated; with 12 id
    # slots and 7 unique, 5 padding slots alias id 7.
    batch = {
        "c_0": np.array([3, 3, 1, 1, 0, 0], np.int32),
        "c_1": np.array([3, 3, 2, 2, 0, 0], np.int32),
        "label": np.array([1, 0, 1, 0, 1, 0], np.int32),
    }
    t = QuantizedEmbeddingTrainer(model)
    # lr 1.0: adagrad's first step has |delta| ~ lr per touched element, far
    # above the int8 scale, so every touched row must visibly change
    t.compile(optimizer="adam", lr=1.0, loss="bce", metrics=("auc",))
    t.init_state(batch, seed=0)

    def rows():
        q = t.state.params["unified_q"]
        s = t.state.params["unified_scale"]
        return np.asarray(dequantize_rows(q, s))

    before = rows()
    t._train_step(batch)
    after = rows()
    touched = [0, 1, 3, 4, 6, 7]
    for i in touched:
        delta = np.abs(after[i] - before[i]).max()
        assert delta > 0.05, (i, delta)
    # untouched rows unchanged
    np.testing.assert_array_equal(after[2], before[2])
    np.testing.assert_array_equal(after[5], before[5])


def test_int4_pack_unpack_identity():
    from pytorchrec_tpu.ops.kernels.quantize import pack_int4, unpack_int4

    rng = np.random.default_rng(7)
    q = rng.integers(-7, 8, size=(33, 16)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (33, 8) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), q)


def test_int4_quantize_roundtrip_and_stochastic_mean():
    from pytorchrec_tpu.ops.kernels.quantize import (
        dequantize_rows,
        quantize_rows_xla,
    )

    rng = np.random.default_rng(8)
    rows = rng.normal(scale=0.05, size=(64, 16)).astype(np.float32)
    q, scale = quantize_rows_xla(jnp.asarray(rows), bits=4)
    assert q.shape == (64, 8)
    out = np.asarray(dequantize_rows(q, scale, bits=4))
    # round-to-nearest error bounded by scale/2 per element
    assert np.all(np.abs(out - rows) <= np.asarray(scale)[:, None] / 2 + 1e-7)

    # stochastic rounding is unbiased in expectation
    import jax

    key = jax.random.PRNGKey(0)
    acc = np.zeros_like(rows)
    n = 64
    for i in range(n):
        bits_arr = jax.random.bits(jax.random.fold_in(key, i), rows.shape,
                                   jnp.uint32)
        qi, si = quantize_rows_xla(jnp.asarray(rows), rng_bits=bits_arr, bits=4)
        acc += np.asarray(dequantize_rows(qi, si, bits=4))
    mean_err = np.abs(acc / n - rows).mean()
    det_err = np.abs(out - rows).mean()
    assert mean_err < det_err  # averaging recovers sub-scale structure


def test_int4_dcn_trains(dataset_dir):
    from pytorchrec_tpu.data import SplitMode, TrainMode
    from pytorchrec_tpu.tasks import build_model, build_reader
    from pytorchrec_tpu.training.quantized_trainer import QuantizedEmbeddingTrainer

    reader = build_reader("dcn", "Synthetic-ML-Quant",
                          split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
                          neg_sample_n=9, train_mode=TrainMode.POINT_WISE,
                          random_seed=2020)
    model = build_model("dcn", reader, emb_size=8,
                        unified_embedding=True, quantized_embedding=True,
                        table_bits=4)
    t = QuantizedEmbeddingTrainer(model)
    t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("ndcg@5",),
              user_sample_n=10)
    # 16-level quantization is noisier than int8: needs a longer horizon
    h = t.fit(reader, batch_size=32, epochs=6, verbose=0, dev_freq=6)
    assert all(np.isfinite(h.history["loss"]))
    assert h.history["loss"][-1] < h.history["loss"][0]

    # packed storage: half the bytes of the int8 table
    q = t.state.params["unified_q"]
    assert q.dtype == jnp.int8 and q.shape[1] == 4  # emb 8 -> 4 bytes/row
    logs = t.evaluate(reader, split="test", batch_size=32)
    assert np.isfinite(logs["ndcg@5"])


def test_col_group_scales_roundtrip_and_outlier_win():
    """Per-column-group scales: exactness bound per group + a planted
    outlier column only degrades its own group, not the whole row."""
    rng = np.random.default_rng(5)
    rows = rng.normal(scale=0.02, size=(32, 16)).astype(np.float32)
    rows[:, 0] = 1.0  # outlier column inflates group-0's scale only

    q1, s1 = quantize_rows_xla(jnp.asarray(rows), bits=4, col_groups=1)
    q4, s4 = quantize_rows_xla(jnp.asarray(rows), bits=4, col_groups=4)
    assert s1.shape == (32,) and s4.shape == (32, 4)
    back1 = np.asarray(dequantize_rows(q1, s1, bits=4, col_groups=1))
    back4 = np.asarray(dequantize_rows(q4, s4, bits=4, col_groups=4))

    # per-group error bound: |err| <= group_scale / 2
    per_col_scale = np.repeat(np.asarray(s4), 4, axis=-1)
    assert np.all(np.abs(back4 - rows) <= per_col_scale / 2 + 1e-7)

    # the outlier-free columns are far more accurate with group scales
    err1 = np.abs(back1[:, 4:] - rows[:, 4:]).mean()
    err4 = np.abs(back4[:, 4:] - rows[:, 4:]).mean()
    assert err4 < err1 / 3


def test_col_group_scales_int8_matches_groupwise_reference():
    """G-group quantization == quantizing each column block independently."""
    rng = np.random.default_rng(6)
    rows = jnp.asarray(rng.normal(scale=0.1, size=(16, 12)), jnp.float32)
    q, s = quantize_rows_xla(rows, bits=8, col_groups=3)
    for g in range(3):
        block = rows[:, g * 4:(g + 1) * 4]
        qg, sg = quantize_rows_xla(block, bits=8, col_groups=1)
        np.testing.assert_array_equal(np.asarray(q[:, g * 4:(g + 1) * 4]),
                                      np.asarray(qg))
        np.testing.assert_allclose(np.asarray(s[:, g]), np.asarray(sg), rtol=1e-6)


def test_col_group_int4_dcn_trains(dataset_dir):
    from pytorchrec_tpu.data import SplitMode, TrainMode
    from pytorchrec_tpu.tasks import build_model, build_reader
    from pytorchrec_tpu.training.quantized_trainer import QuantizedEmbeddingTrainer

    reader = build_reader("dcn", "Synthetic-ML-Quant",
                          split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
                          neg_sample_n=9, train_mode=TrainMode.POINT_WISE,
                          random_seed=2020)
    model = build_model("dcn", reader, emb_size=8,
                        unified_embedding=True, quantized_embedding=True,
                        table_bits=4, scale_col_groups=2)
    t = QuantizedEmbeddingTrainer(model)
    t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("ndcg@5",),
              user_sample_n=10)
    h = t.fit(reader, batch_size=32, epochs=4, verbose=0, dev_freq=4)
    assert all(np.isfinite(h.history["loss"]))
    assert h.history["loss"][-1] < h.history["loss"][0]
    assert t.state.params["unified_scale"].shape[-1] == 2
