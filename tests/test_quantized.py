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


class TestPackedQuantized:
    """Packed byte-row quantized tables (ops/quantized_packed.py)."""

    def _mk(self, V=50, E=8, bits=8, G=1, seed=0):
        rng = np.random.default_rng(seed)
        rows = rng.normal(size=(V, E)).astype(np.float32)
        from pytorchrec_tpu.ops.kernels.quantize import quantize_rows_xla
        q, s = quantize_rows_xla(jnp.asarray(rows), bits=bits, col_groups=G)
        acc = jnp.asarray(np.abs(rng.normal(size=V)).astype(np.float32))
        return q, s, acc

    @pytest.mark.parametrize("bits,G", [(8, 1), (4, 1), (8, 2), (4, 4)])
    def test_pack_unpack_roundtrip(self, bits, G):
        from pytorchrec_tpu.ops.quantized_packed import (
            dequant_packed_rows,
            pack_quantized_table,
            packed_q_width,
            unpack_quantized_table,
        )
        from pytorchrec_tpu.ops.kernels.quantize import dequantize_rows

        V, E = 50, 8
        q, s, acc = self._mk(V, E, bits, G)
        packed = pack_quantized_table(q, s, acc, E, bits, G)
        assert packed.shape == (V, packed_q_width(E, bits, G))
        assert packed.dtype == jnp.uint8
        q2, s2, acc2 = unpack_quantized_table(packed, E, bits, G)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q2))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(acc2))
        # row dequant through the packed view == plain dequant
        ids = np.array([0, 3, 3, 49], np.int32)
        want = dequantize_rows(q[ids], s[ids], bits=bits, col_groups=G)
        got = dequant_packed_rows(packed[jnp.asarray(ids)], E, bits, G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)

    @pytest.mark.parametrize("bits,G", [(8, 1), (4, 1), (8, 2)])
    def test_update_matches_classic_math(self, bits, G):
        """packed_quantized_update == the classic quantized trainer's
        dequant -> rowwise-Adagrad -> requantize sequence (deterministic
        rounding; duplicate ids combined identically up to f32
        reassociation in the segmented scan)."""
        from pytorchrec_tpu.ops.kernels.quantize import (
            dequantize_rows,
            quantize_rows_xla,
        )
        from pytorchrec_tpu.ops.quantized_packed import (
            pack_quantized_table,
            packed_quantized_update,
            unpack_quantized_table,
        )
        from pytorchrec_tpu.ops.sparse_update import dedup_row_grads

        V, E, lr, eps = 60, 8, 0.05, 1e-6
        rng = np.random.default_rng(7)
        q, s, acc = self._mk(V, E, bits, G, seed=1)
        ids_np = np.concatenate([np.full(9, 17), rng.integers(0, V, 23)])
        ids = jnp.asarray(ids_np.astype(np.int32))
        dvec = jnp.asarray(rng.normal(size=(len(ids_np), E)).astype(np.float32))

        # classic sequence (training/quantized_trainer.py:147-178, rng=None)
        g = dedup_row_grads(ids, dvec)
        acc_rows = acc[g.ids]
        acc_new = acc_rows + jnp.mean(jnp.square(g.rows), axis=-1)
        delta = lr * g.rows / (jnp.sqrt(acc_new)[:, None] + eps)
        current = dequantize_rows(q[g.ids], s[g.ids], bits=bits, col_groups=G)
        qn, sn = quantize_rows_xla(current - delta, bits=bits, col_groups=G)
        safe = jnp.where(g.mask > 0, g.ids, V)
        want_q = q.at[safe].set(qn, mode="drop")
        want_s = s.at[safe].set(sn, mode="drop")
        want_acc = acc.at[g.ids].add((acc_new - acc_rows) * g.mask)

        packed = pack_quantized_table(q, s, acc, E, bits, G)
        rows = packed[ids]
        out = packed_quantized_update(packed, rows, ids, dvec, None, lr,
                                      bits=bits, col_groups=G, eps=eps)
        got_q, got_s, got_acc = unpack_quantized_table(out, E, bits, G)
        # scan-vs-segment_sum reassociation can flip a stochastic-free
        # rounding boundary only if a value lands exactly on .5 — compare
        # dequantized values with a tolerance of one quantization step
        want_rows = dequantize_rows(want_q, want_s, bits=bits, col_groups=G)
        got_rows = dequantize_rows(got_q, got_s, bits=bits, col_groups=G)
        step = np.asarray(want_s).max() * 1.01
        np.testing.assert_allclose(np.asarray(got_rows),
                                   np.asarray(want_rows), atol=float(step))
        np.testing.assert_allclose(np.asarray(got_acc), np.asarray(want_acc),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=1e-4, atol=1e-7)

    def test_update_unique_ids_bit_identical(self):
        """With no duplicate ids and shared rounding bits the packed update
        is BIT-identical to the classic sequence."""
        from pytorchrec_tpu.ops.kernels.quantize import (
            dequantize_rows,
            quantize_rows_xla,
        )
        from pytorchrec_tpu.ops.quantized_packed import (
            pack_quantized_table,
            packed_quantized_update,
            unpack_quantized_table,
        )

        V, E, lr, eps = 40, 8, 0.05, 1e-6
        rng = np.random.default_rng(3)
        q, s, acc = self._mk(V, E, seed=2)
        ids_np = rng.permutation(V)[:16].astype(np.int32)  # unique
        ids = jnp.asarray(ids_np)
        dvec = jnp.asarray(rng.normal(size=(16, E)).astype(np.float32))
        bits_arr = jnp.asarray(
            rng.integers(0, 2**32, size=(16, E), dtype=np.uint64)
            .astype(np.uint32))

        acc_new = acc[ids] + jnp.mean(jnp.square(dvec), axis=-1)
        delta = lr * dvec / (jnp.sqrt(acc_new)[:, None] + eps)
        current = dequantize_rows(q[ids], s[ids], bits=8)
        # the packed path consumes rounding bits in id-sorted slot order
        order = np.argsort(ids_np, kind="stable")
        qn, sn = quantize_rows_xla((current - delta)[order],
                                   rng_bits=bits_arr)
        want_q = q.at[ids[order]].set(qn)
        want_s = s.at[ids[order]].set(sn)

        packed = pack_quantized_table(q, s, acc, E)
        out = packed_quantized_update(packed, packed[ids], ids, dvec,
                                      bits_arr, lr, eps=eps)
        got_q, got_s, got_acc = unpack_quantized_table(out, E)
        np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
        np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
        np.testing.assert_allclose(np.asarray(got_acc),
                                   np.asarray(acc.at[ids].set(acc_new)),
                                   rtol=1e-6)


@pytest.mark.parametrize("bits", [8, 4])
def test_packed_quantized_dcn_trains(dataset_dir, bits):
    """table_packed=True + QuantizedEmbeddingTrainer(packed_tables=True):
    fit end-to-end on the packed byte-row leaf; eval dequantizes from the
    model's own packed gather; unpacked_quantized() restores the classic
    (q, scale, acc) triple for interop."""
    from pytorchrec_tpu.ops.quantized_packed import packed_q_width
    from pytorchrec_tpu.tasks import build_model, build_reader
    from pytorchrec_tpu.training.quantized_trainer import QuantizedEmbeddingTrainer
    from pytorchrec_tpu.data import SplitMode, TrainMode

    reader = build_reader("dcn", "Synthetic-ML-Quant",
                          split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
                          neg_sample_n=9, train_mode=TrainMode.POINT_WISE,
                          random_seed=2020)
    model = build_model("dcn", reader, emb_size=8,
                        unified_embedding=True, quantized_embedding=True,
                        table_bits=bits, table_packed=True)
    t = QuantizedEmbeddingTrainer(model, packed_tables=True)
    t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("ndcg@5",),
              user_sample_n=10)
    h = t.fit(reader, batch_size=32, epochs=3, verbose=0, dev_freq=3)
    assert all(np.isfinite(h.history["loss"]))
    assert h.history["loss"][-1] < h.history["loss"][0]

    packed = t.state.params["unified_q"]
    assert packed.dtype == jnp.uint8
    assert packed.shape[1] == packed_q_width(8, bits, 1)
    assert "unified_scale" not in t.state.params  # lives inside the rows
    assert t.state.table_acc["unified"].shape == (1,)  # orbax-saveable placeholder

    logs = t.evaluate(reader, split="test", batch_size=32)
    assert np.isfinite(logs["ndcg@5"])

    q, s, acc = t.unpacked_quantized()["unified"]
    assert q.dtype == jnp.int8
    assert q.shape == (packed.shape[0], 8 if bits == 8 else 4)
    assert s.shape == (packed.shape[0],)
    assert float(jnp.max(acc)) > 0  # rows were touched
    assert t.make_serving_fn() is not None



def test_packed_quantized_step_bit_identical_on_unique_ids(dataset_dir):
    """With duplicate-free per-field ids, one packed train step is
    BIT-identical to the classic quantized trainer's step: both consume the
    same stochastic-rounding bits at the same id-sorted slots."""
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.ops.quantized_packed import unpack_quantized_table
    from pytorchrec_tpu.training.quantized_trainer import QuantizedEmbeddingTrainer

    rng = np.random.default_rng(5)
    B, V = 32, 300
    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=V) for i in range(3)]
    dense = [NumericColumn(feature_name="d_0")]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    batch = {f"c_{i}": rng.permutation(V)[:B].astype(np.int32)
             for i in range(3)}  # unique per field
    batch["d_0"] = rng.normal(size=B).astype(np.float32)
    batch["label"] = rng.integers(0, 2, size=B).astype(np.int32)

    # classic and packed inits draw q/scale differently; equalize the
    # starting table so the step comparison is exact
    from pytorchrec_tpu.ops.quantized_packed import pack_quantized_table
    init_tables = {}

    def one_step(packed_flag):
        model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                      label_column=label, emb_size=8, num_cross_layers=2,
                      layers=(16,), unified_embedding=True,
                      quantized_embedding=True, table_packed=packed_flag)
        t = QuantizedEmbeddingTrainer(model, packed_tables=packed_flag)
        t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("auc",))
        t.init_state(batch, seed=3)
        if not packed_flag:
            # host copies: the donated train step deletes the originals
            init_tables["q"] = np.asarray(t.state.params["unified_q"])
            init_tables["s"] = np.asarray(t.state.params["unified_scale"])
        else:
            repacked = pack_quantized_table(
                jnp.asarray(init_tables["q"]), jnp.asarray(init_tables["s"]),
                jnp.zeros(init_tables["q"].shape[0], jnp.float32), 8, 8, 1)
            params = dict(t.state.params)
            params["unified_q"] = repacked
            t.state = t.state.replace(params=params)
        t._train_step(batch)
        if packed_flag:
            q, s, acc = unpack_quantized_table(
                jnp.asarray(t.state.params["unified_q"]), 8, 8, 1)
            return np.asarray(q), np.asarray(s), np.asarray(acc)
        return (np.asarray(t.state.params["unified_q"]),
                np.asarray(t.state.params["unified_scale"]),
                np.asarray(t.state.table_acc["unified"]))

    q0, s0, a0 = one_step(False)
    q1, s1, a1 = one_step(True)
    np.testing.assert_array_equal(q0, q1)
    np.testing.assert_array_equal(s0, s1)
    np.testing.assert_allclose(a0, a1, rtol=1e-6, atol=1e-8)


def test_packed_flag_mismatch_is_an_error():
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.quantized_trainer import QuantizedEmbeddingTrainer

    rng = np.random.default_rng(0)
    sparse = [CategoricalColumnWithIdentity(feature_name="c_0", category_num=40)]
    dense = [NumericColumn(feature_name="d_0")]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    batch = {"c_0": rng.integers(0, 40, size=8).astype(np.int32),
             "d_0": rng.normal(size=8).astype(np.float32),
             "label": rng.integers(0, 2, size=8).astype(np.int32)}
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=8, unified_embedding=True,
                  quantized_embedding=True, table_packed=True)
    t = QuantizedEmbeddingTrainer(model, packed_tables=False)
    t.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("auc",))
    with pytest.raises(AssertionError):
        t.init_state(batch, seed=0)


def test_requantize_kernel_variant_parity(monkeypatch):
    """PYTORCHREC_TPU_QPACK_VARIANT=kernel (the measured-negative Pallas
    requantize, RESULTS.md round 5): interpret-mode q bytes are
    BIT-identical to the XLA chain; scale/acc within 1 ulp (reduce-tree
    order differs across shapes, by construction)."""
    import os

    import jax.numpy as jnp

    from pytorchrec_tpu.ops.kernels.quantize import quantize_rows_xla
    from pytorchrec_tpu.ops.quantized_packed import (
        pack_quantized_table,
        packed_quantized_update,
        unpack_quantized_table,
    )

    rng = np.random.default_rng(0)
    V, E, n = 300, 16, 200
    rows_f = rng.normal(size=(V, E)).astype(np.float32) * 0.01
    q, s = quantize_rows_xla(jnp.asarray(rows_f))
    packed = pack_quantized_table(q, s, jnp.zeros((V,), jnp.float32), E)
    ids = jnp.asarray(rng.integers(0, V, size=n).astype(np.int32))
    dvec = jnp.asarray(rng.normal(size=(n, E)).astype(np.float32))

    def run(variant):
        monkeypatch.setenv("PYTORCHREC_TPU_QPACK_VARIANT", variant)
        out = packed_quantized_update(packed, packed[ids], ids, dvec, None,
                                      0.01, rng_salt=jnp.uint32(99),
                                      ids_offset=11)
        return unpack_quantized_table(np.asarray(out), E)

    qb, sb, ab = run("base")
    qk, sk, ak = run("kernel")
    np.testing.assert_array_equal(np.asarray(qb), np.asarray(qk))
    np.testing.assert_allclose(np.asarray(sb), np.asarray(sk), rtol=3e-7)
    np.testing.assert_allclose(np.asarray(ab), np.asarray(ak), rtol=3e-7)
