"""Unit tests for losses and metrics vs numpy/torch-free references.

Parity targets: reference loss semantics (loss/BPRLoss.py, loss/Top1Loss.py)
and metric semantics (metric/IMetric.py:17-26, NDCG.py, Hit.py).
"""

import numpy as np
import pytest

from pytorchrec_tpu.loss import bce_loss, bpr_loss, get_loss, mse_loss, top1_loss
from pytorchrec_tpu.metric import AUC, Hit, LogLoss, MetricList, NDCG, get_metric, pos_rank_from_scores


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestLosses:
    def test_bpr_matches_softplus(self):
        rng = np.random.default_rng(0)
        pairs = rng.normal(size=(64, 2)).astype(np.float32)
        got = float(bpr_loss(pairs))
        want = np.mean(np.log1p(np.exp(-(pairs[:, 0] - pairs[:, 1]))))
        assert got == pytest.approx(want, rel=1e-5)

    def test_bpr_numerically_stable(self):
        pairs = np.array([[100.0, -100.0], [-100.0, 100.0]], dtype=np.float32)
        got = float(bpr_loss(pairs))
        assert np.isfinite(got)
        # one pair with a huge margin (≈0 loss), one badly wrong (≈200)
        assert got == pytest.approx(100.0, rel=1e-3)

    def test_top1(self):
        rng = np.random.default_rng(1)
        pairs = rng.normal(size=(32, 2)).astype(np.float32)
        got = float(top1_loss(pairs))
        want = np.mean(_sigmoid(pairs[:, 1] - pairs[:, 0]) + _sigmoid(pairs[:, 1] ** 2))
        assert got == pytest.approx(want, rel=1e-5)

    def test_mse(self):
        pred = np.array([1.0, 2.0, 3.0], dtype=np.float32)
        target = np.array([0.0, 2.0, 5.0], dtype=np.float32)
        assert float(mse_loss(pred, target)) == pytest.approx(5.0 / 3.0, rel=1e-6)

    def test_bce_matches_formula(self):
        rng = np.random.default_rng(2)
        logits = rng.normal(size=100).astype(np.float32)
        labels = (rng.random(100) > 0.5).astype(np.float32)
        got = float(bce_loss(logits, labels))
        p = _sigmoid(logits)
        want = -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))
        assert got == pytest.approx(want, rel=1e-4)

    def test_registry(self):
        assert get_loss("bpr") is bpr_loss
        with pytest.raises(ValueError):
            get_loss("nope")


class TestRankMetrics:
    def _argsort_rank(self, scores):
        """The reference algorithm verbatim in numpy (IMetric.py:17-26)."""
        sort_idx = (-scores).argsort()
        return np.argwhere(sort_idx == 0)[:, 1] + 1

    def test_pos_rank_matches_argsort_reference(self):
        rng = np.random.default_rng(3)
        scores = rng.normal(size=(50, 100)).astype(np.float32)
        want = self._argsort_rank(scores)
        got = np.asarray(pos_rank_from_scores(scores, 100))
        np.testing.assert_array_equal(got, want)

    def test_pos_rank_tie_semantics(self):
        # ties: stable argsort on -scores puts index 0 first among equals
        scores = np.array([[0.5, 0.5, 0.4, 0.6]], dtype=np.float32)
        want = self._argsort_rank(scores)
        got = np.asarray(pos_rank_from_scores(scores, 4))
        np.testing.assert_array_equal(got, want)
        assert got[0] == 2  # only the 0.6 beats the positive

    def test_ndcg_hit(self):
        ranks = np.array([1, 2, 11, 3])
        ndcg = NDCG(user_sample_n=100, k=10)
        hit = Hit(user_sample_n=100, k=10)
        want_ndcg = (1 / np.log2(2) + 1 / np.log2(3) + 1 / np.log2(4)) / 4
        assert float(ndcg.fast_calc(ranks)) == pytest.approx(want_ndcg, rel=1e-4)
        assert float(hit.fast_calc(ranks)) == pytest.approx(0.75)

    def test_metric_list_shares_rank(self):
        rng = np.random.default_rng(4)
        scores = rng.normal(size=(20, 100)).astype(np.float32)
        ml = MetricList(["ndcg@10", "hit@5"], user_sample_n=100)
        logs = ml(scores)
        assert set(logs) == {"ndcg@10", "hit@5"}
        ranks = self._argsort_rank(scores)
        want = float(np.sum(1 / np.log2(ranks[ranks <= 10] + 1)) / len(ranks))
        assert logs["ndcg@10"] == pytest.approx(want, rel=1e-5)


class TestPointwiseMetrics:
    def test_auc_perfect_and_random(self):
        labels = np.array([1, 1, 0, 0], dtype=np.float32)
        assert AUC()( np.array([0.9, 0.8, 0.2, 0.1]), labels) == pytest.approx(1.0)
        assert AUC()(np.array([0.1, 0.2, 0.8, 0.9]), labels) == pytest.approx(0.0)

    def test_auc_matches_sklearn_formula(self):
        rng = np.random.default_rng(5)
        scores = rng.normal(size=500)
        labels = (rng.random(500) > 0.7).astype(np.float32)
        got = AUC()(scores, labels)
        # brute force pairwise AUC
        pos = scores[labels > 0.5]
        neg = scores[labels <= 0.5]
        cmp = (pos[:, None] > neg[None, :]).sum() + 0.5 * (pos[:, None] == neg[None, :]).sum()
        want = cmp / (len(pos) * len(neg))
        assert got == pytest.approx(want, rel=1e-9)

    def test_logloss(self):
        logits = np.array([0.0, 2.0], dtype=np.float32)
        labels = np.array([1.0, 0.0], dtype=np.float32)
        p = _sigmoid(logits)
        want = -np.mean([np.log(p[0]), np.log(1 - p[1])])
        assert LogLoss()(logits, labels) == pytest.approx(want, rel=1e-5)

    def test_mse_metric(self):
        from pytorchrec_tpu.metric.metrics import MSE

        pred = np.array([1.0, 2.0, 0.5], dtype=np.float32)
        labels = np.array([1.0, 0.0, 1.0], dtype=np.float32)
        want = np.mean((pred - labels) ** 2)
        assert MSE()(pred, labels) == pytest.approx(want, rel=1e-6)
        assert isinstance(get_metric("mse"), MSE)

    def test_get_metric_parsing(self):
        assert get_metric("ndcg@10").k == 10
        assert get_metric("hit@5").k == 5
        assert isinstance(get_metric("auc"), AUC)
        with pytest.raises(ValueError):
            get_metric("map@10")


class TestStreamingPartials:
    """Streaming metric accumulation (SURVEY §5.8 eval recipe): chunked
    partial_update must reproduce the one-shot MetricList values — exactly
    for rank metrics and logloss/mse, within bin resolution for AUC."""

    def _accumulate(self, ml, prediction, target, chunks, pad_to=None):
        import jax.numpy as jnp

        state = ml.partial_init()
        for pred_c, tgt_c in chunks:
            valid = len(pred_c)
            if pad_to is not None and valid < pad_to:
                pad = pad_to - valid
                pred_c = np.concatenate([pred_c, np.full((pad,) + pred_c.shape[1:], 7.7, pred_c.dtype)])
                if tgt_c is not None:
                    tgt_c = np.concatenate([tgt_c, np.ones((pad,) + tgt_c.shape[1:], tgt_c.dtype)])
            state = ml.partial_update(state, pred_c, tgt_c, jnp.asarray(valid))
        return ml.partial_finalize(state)

    def test_rank_metrics_exact(self):
        rng = np.random.default_rng(0)
        scores = rng.normal(size=(50, 10)).astype(np.float32)
        ml = MetricList(["ndcg@5", "hit@3"], user_sample_n=10)
        exact = ml(scores)
        chunks = [(scores[i:i + 16], None) for i in range(0, 50, 16)]
        got = self._accumulate(ml, scores, None, chunks, pad_to=16)
        assert set(got) == set(exact)
        for k in exact:  # f64 histogram path vs f32 one-shot path
            assert got[k] == pytest.approx(exact[k], abs=1e-6)

    def test_pointwise_exact_and_auc_close(self):
        rng = np.random.default_rng(1)
        logits = rng.normal(size=999).astype(np.float32)
        labels = (rng.random(999) < 0.3).astype(np.float32)
        ml = MetricList(["auc", "logloss", "mse"], user_sample_n=1)
        exact = ml(logits, labels)
        chunks = [(logits[i:i + 256], labels[i:i + 256]) for i in range(0, 999, 256)]
        got = self._accumulate(ml, logits, labels, chunks, pad_to=256)
        assert got["logloss"] == pytest.approx(exact["logloss"], abs=1e-5)
        assert got["mse"] == pytest.approx(exact["mse"], abs=1e-5)
        assert got["auc"] == pytest.approx(exact["auc"], abs=2e-3)

    def test_auc_with_heavy_ties(self):
        # discrete scores land whole tie groups in single bins: the 0.5
        # within-bin correction must reproduce exact tie-aware AUC
        rng = np.random.default_rng(2)
        logits = rng.integers(-3, 4, size=400).astype(np.float32)
        labels = (rng.random(400) < 0.4).astype(np.float32)
        ml = MetricList(["auc"], user_sample_n=1)
        exact = ml(logits, labels)
        chunks = [(logits[i:i + 128], labels[i:i + 128]) for i in range(0, 400, 128)]
        got = self._accumulate(ml, logits, labels, chunks, pad_to=128)
        assert got["auc"] == pytest.approx(exact["auc"], abs=1e-6)

    def test_pointwise_candidate_matrix_row_masking(self):
        # CTR eval feeds [users, 1+neg] candidate matrices; `valid` counts
        # rows, so padded-row masking must cover whole rows, not flat elems
        rng = np.random.default_rng(3)
        scores = rng.normal(size=(30, 8)).astype(np.float32)
        labels = np.zeros((30, 8), dtype=np.float32)
        labels[:, 0] = 1.0
        ml = MetricList(["auc", "logloss"], user_sample_n=8)
        exact = ml(scores, labels)
        chunks = [((scores[i:i + 16], labels[i:i + 16])) for i in range(0, 30, 16)]
        got = self._accumulate(ml, scores, labels, chunks, pad_to=16)
        assert got["logloss"] == pytest.approx(exact["logloss"], abs=1e-5)
        assert got["auc"] == pytest.approx(exact["auc"], abs=2e-3)
