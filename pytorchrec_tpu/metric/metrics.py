"""Ranking / CTR metrics, computed on device.

Capability parity with the reference metric layer (metric/IMetric.py:17-35,
NDCG.py:21-24, Hit.py:20-23, MetricList.py:13-15, metrics.py:6-17) plus AUC and
logloss for CTR parity targets.

TPU-first rank computation: the reference argsorts each ``[user, 1+N]``
candidate row and locates column 0 (IMetric.py:17-26). On TPU, a full argsort
per row is wasted work — with one positive per row, its rank is
``1 + #{j>0 : score_j > score_0}``, an O(N) vectorized comparison that also
reproduces numpy argsort's tie behavior exactly (stable sort on ``-scores``
places the positive, index 0, before any tied negative).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import jax.numpy as jnp
import numpy as np


def pos_rank_from_scores(prediction, user_sample_n: int):
    """``[rows]`` or ``[users, user_sample_n]`` scores -> 1-based rank of col 0."""
    scores = jnp.asarray(prediction).reshape(-1, user_sample_n)
    pos = scores[:, :1]
    return 1 + jnp.sum(scores[:, 1:] > pos, axis=1)


class Metric:
    """Base metric. ``fast_calc`` consumes precomputed positive ranks."""

    name = "metric"

    def __init__(self, user_sample_n: int):
        self.user_sample_n = int(user_sample_n)

    # rank-based metrics implement fast_calc; pointwise ones override __call__
    def fast_calc(self, pos_ranks):
        raise NotImplementedError

    def __call__(self, prediction, target=None):
        return float(self.fast_calc(pos_rank_from_scores(prediction, self.user_sample_n)))


class NDCG(Metric):
    """NDCG@k under the 1-positive-first layout (reference NDCG.py:21-24)."""

    def __init__(self, user_sample_n: int, k: int):
        super().__init__(user_sample_n)
        self.k = int(k)
        self.name = f"ndcg@{self.k}"

    def fast_calc(self, pos_ranks):
        pos_ranks = jnp.asarray(pos_ranks)
        gains = jnp.where(pos_ranks <= self.k, 1.0 / jnp.log2(pos_ranks + 1.0), 0.0)
        return jnp.mean(gains)


class Hit(Metric):
    """Hit@k (reference Hit.py:20-23)."""

    def __init__(self, user_sample_n: int, k: int):
        super().__init__(user_sample_n)
        self.k = int(k)
        self.name = f"hit@{self.k}"

    def fast_calc(self, pos_ranks):
        pos_ranks = jnp.asarray(pos_ranks)
        return jnp.mean((pos_ranks <= self.k).astype(jnp.float32))


class AUC(Metric):
    """Pointwise ROC-AUC over (sigmoid(prediction), target) pairs.

    No reference counterpart (stated per SURVEY §2.7); required for the CTR
    parity targets in BASELINE.md. Tie-aware rank formulation.
    """

    name = "auc"

    def __init__(self, user_sample_n: int = 1):
        super().__init__(user_sample_n)

    def fast_calc(self, pos_ranks):  # pragma: no cover - not rank based
        raise NotImplementedError("AUC is computed from (prediction, target)")

    def __call__(self, prediction, target):
        scores = np.asarray(prediction).reshape(-1)
        labels = np.asarray(target).reshape(-1)
        n = len(scores)
        order = np.argsort(scores, kind="mergesort")
        sorted_scores = scores[order]
        # vectorized average-rank-over-ties: group boundaries via diff, each
        # element gets the mean 1-based rank of its tie group
        boundaries = np.empty(n, dtype=bool)
        boundaries[0] = True
        boundaries[1:] = sorted_scores[1:] != sorted_scores[:-1]
        group_ids = np.cumsum(boundaries) - 1
        group_starts = np.flatnonzero(boundaries)
        group_ends = np.append(group_starts[1:], n)  # exclusive
        mean_rank = 0.5 * (group_starts + group_ends - 1) + 1.0
        ranks = mean_rank[group_ids]
        pos_mask = labels[order] > 0.5
        n_pos = int(pos_mask.sum())
        n_neg = n - n_pos
        if n_pos == 0 or n_neg == 0:
            return 0.5
        return float((ranks[pos_mask].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


class LogLoss(Metric):
    """Pointwise binary logloss on logits."""

    name = "logloss"

    def __init__(self, user_sample_n: int = 1):
        super().__init__(user_sample_n)

    def fast_calc(self, pos_ranks):  # pragma: no cover - not rank based
        raise NotImplementedError("LogLoss is computed from (prediction, target)")

    def __call__(self, prediction, target):
        logits = jnp.asarray(prediction).reshape(-1)
        labels = jnp.asarray(target).reshape(-1)
        import jax

        loss = -(labels * jax.nn.log_sigmoid(logits) + (1 - labels) * jax.nn.log_sigmoid(-logits))
        return float(jnp.mean(loss))


class MSE(Metric):
    """Pointwise mean squared error on raw predictions (the reference's only
    point-wise training loss is ``MSELoss`` — loss/losses.py:8-12; this is
    its eval twin for sequential-split regression protocols)."""

    name = "mse"

    def __init__(self, user_sample_n: int = 1):
        super().__init__(user_sample_n)

    def fast_calc(self, pos_ranks):  # pragma: no cover - not rank based
        raise NotImplementedError("MSE is computed from (prediction, target)")

    def __call__(self, prediction, target):
        pred = jnp.asarray(prediction).reshape(-1)
        labels = jnp.asarray(target).reshape(-1)
        return float(jnp.mean(jnp.square(pred - labels)))


RANK_METRICS = {"ndcg": NDCG, "hit": Hit}
POINTWISE_METRICS = {"auc": AUC, "logloss": LogLoss, "mse": MSE}


class TaskSlice(Metric):
    """Per-task view of a pointwise metric over multi-task ``[..., T]``
    predictions/targets (models/multitask.py): ``auc/0`` = AUC of task 0's
    column. No reference counterpart (the reference is single-objective)."""

    def __init__(self, inner: Metric, task: int):
        super().__init__(inner.user_sample_n)
        self.inner = inner
        self.task = int(task)
        self.name = f"{inner.name}/{self.task}"

    def fast_calc(self, pos_ranks):  # pragma: no cover - not rank based
        raise NotImplementedError(f"{self.name} is pointwise")

    def __call__(self, prediction, target):
        import numpy as np

        p = np.asarray(prediction)
        t = np.asarray(target)
        assert p.ndim >= 2, (
            f"{self.name} needs multi-task [..., T] predictions, got {p.shape}")
        return self.inner(p[..., self.task], t[..., self.task])


def _is_pointwise(metric: Metric) -> bool:
    return (type(metric) in POINTWISE_METRICS.values()
            or isinstance(metric, TaskSlice))


def get_metric(metric_name: str, user_sample_n: int = 100) -> Metric:
    """Parse ``"ndcg@10"`` / ``"hit@5"`` / ``"auc"`` / ``"logloss"`` /
    ``"auc/1"`` (task-sliced pointwise metric for multi-task models).

    The reference hardcodes ``user_sample_n=99`` (metrics.py:13-14) even though
    eval rows hold 1 positive + 99 negatives = 100 candidates; here the
    candidate-row width is explicit and defaults to 100.
    """
    name = metric_name.strip().lower()
    if "/" in name:
        base, task = name.split("/")
        if base not in POINTWISE_METRICS:
            raise ValueError(
                f"unknown metric {metric_name!r} (task slices apply to "
                f"pointwise metrics: {sorted(POINTWISE_METRICS)})")
        return TaskSlice(POINTWISE_METRICS[base](user_sample_n), int(task))
    if "@" in name:
        cls_name, k = name.split("@")
        if cls_name not in RANK_METRICS:
            raise ValueError(f"unknown metric {metric_name!r}")
        return RANK_METRICS[cls_name](user_sample_n, int(k))
    if name in POINTWISE_METRICS:
        return POINTWISE_METRICS[name](user_sample_n)
    raise ValueError(f"unknown metric {metric_name!r}")


class MetricList:
    """Computes positive ranks once and fans out (reference MetricList.py:13-15),
    with pointwise metrics (AUC/logloss) handled separately."""

    def __init__(self, metrics: Sequence[Union[Metric, str]], user_sample_n: int = 100):
        self.metrics: List[Metric] = [
            get_metric(m, user_sample_n) if isinstance(m, str) else m for m in metrics
        ]
        # fail loudly on the silent-flatten misconfiguration (ADVICE r3 #5):
        # a plain pointwise metric next to TaskSlice metrics would pool both
        # task columns of a multi-task [B, T] prediction into one blended
        # number — slice every pointwise metric ("auc/0") instead.
        # Deferred to call time (ADVICE r4): single-task [B] predictions
        # pooled next to 'auc/0' are harmless, and prediction arity is only
        # known once a prediction arrives.
        self._plain_with_slices: List[str] = []
        if any(isinstance(m, TaskSlice) for m in self.metrics):
            self._plain_with_slices = [
                m.name for m in self.metrics
                if _is_pointwise(m) and not isinstance(m, TaskSlice)]
        rank_metrics = [m for m in self.metrics if type(m) in RANK_METRICS.values()]
        if rank_metrics:
            self.user_sample_n = rank_metrics[0].user_sample_n
            for metric in rank_metrics:
                assert metric.user_sample_n == self.user_sample_n, (
                    "all rank metrics must share user_sample_n"
                )
        else:
            self.user_sample_n = user_sample_n

    def _check_slice_mixing(self, prediction) -> None:
        if self._plain_with_slices and getattr(prediction, "ndim", 1) >= 2 \
                and prediction.shape[-1] > 1:
            raise AssertionError(
                f"plain pointwise metrics {self._plain_with_slices} cannot "
                "be combined with task-sliced metrics on multi-task [B, T] "
                "predictions — use their sliced forms (e.g. 'auc/0')")

    def __call__(self, prediction, target=None) -> Dict[str, float]:
        # the guard only reads ndim/shape — no device round-trip needed
        self._check_slice_mixing(np.asarray(prediction))
        logs: Dict[str, float] = {}
        pos_ranks = None
        for metric in self.metrics:
            if _is_pointwise(metric):
                logs[metric.name] = float(metric(prediction, target))
            else:
                if pos_ranks is None:
                    pos_ranks = pos_rank_from_scores(prediction, self.user_sample_n)
                logs[metric.name] = float(metric.fast_calc(pos_ranks))
        return logs

    # ------------------------------------------------------------------
    # streaming partials (SURVEY §5.8 "metric partials, psum to host 0")
    # ------------------------------------------------------------------
    #
    # Fixed-size on-device accumulator so evaluate() memory is independent
    # of split size (the reference concatenates every prediction to host
    # first — IModel.py:247-255):
    #   * rank metrics: a [user_sample_n] histogram of positive ranks.
    #     EXACT — NDCG@k / Hit@k are pure functions of the rank histogram.
    #   * logloss / mse: running (sum, count). EXACT.
    #   * auc: pos/neg histograms over AUC_BINS sigmoid-score bins, AUC from
    #     cumulative counts with within-bin tie correction. Approximate with
    #     error O(1/AUC_BINS); at 16384 bins the delta vs the exact
    #     tie-aware AUC is ~1e-4 on continuous scores.

    AUC_BINS = 16384

    def _has(self, *classes) -> bool:
        return any(type(m) in classes for m in self.metrics)

    def partial_init(self) -> Dict[str, "jnp.ndarray"]:
        """Zeroed accumulator pytree (all float64-free, psum-safe)."""
        state: Dict[str, jnp.ndarray] = {}
        if self._has(*RANK_METRICS.values()):
            state["rank_hist"] = jnp.zeros(self.user_sample_n, dtype=jnp.float32)
        if self._has(AUC):
            state["auc_pos"] = jnp.zeros(self.AUC_BINS, dtype=jnp.float32)
            state["auc_neg"] = jnp.zeros(self.AUC_BINS, dtype=jnp.float32)
        if self._has(LogLoss):
            state["logloss_sum"] = jnp.zeros((), dtype=jnp.float32)
        if self._has(MSE):
            state["mse_sum"] = jnp.zeros((), dtype=jnp.float32)
        if self._has(LogLoss, MSE):
            state["n_points"] = jnp.zeros((), dtype=jnp.float32)
        # task-sliced pointwise metrics: own accumulators per metric name
        for m in self.metrics:
            if isinstance(m, TaskSlice):
                if isinstance(m.inner, AUC):
                    state[f"{m.name}|pos"] = jnp.zeros(self.AUC_BINS,
                                                       dtype=jnp.float32)
                    state[f"{m.name}|neg"] = jnp.zeros(self.AUC_BINS,
                                                       dtype=jnp.float32)
                else:
                    state[f"{m.name}|sum"] = jnp.zeros((), dtype=jnp.float32)
                state["slice_rows"] = jnp.zeros((), dtype=jnp.float32)
        return state

    def partial_update(self, state, prediction, target, valid):
        """Pure jittable accumulation of one eval batch.

        ``valid`` counts real leading-dim rows (final batches are padded —
        data/loader.py eval contract); padded rows are masked out.
        """
        import jax

        state = dict(state)
        prediction = jnp.asarray(prediction)
        self._check_slice_mixing(prediction)
        if "rank_hist" in state:
            scores = prediction.reshape(-1, self.user_sample_n)
            row_ok = jnp.arange(scores.shape[0]) < valid
            ranks = 1 + jnp.sum(scores[:, 1:] > scores[:, :1], axis=1)
            idx = jnp.where(row_ok, ranks - 1, self.user_sample_n)  # pad -> drop
            state["rank_hist"] = state["rank_hist"].at[idx].add(
                row_ok.astype(jnp.float32), mode="drop"
            )
        needs_pointwise = {"auc_pos", "logloss_sum", "mse_sum"} & state.keys()
        if needs_pointwise:
            # valid counts LEADING-dim rows (users/examples); predictions may
            # be [rows] or a [rows, candidates] matrix — mask whole rows
            lead = prediction.shape[0]
            row_ok = jnp.arange(lead) < valid
            ok = jnp.broadcast_to(
                row_ok.reshape((lead,) + (1,) * (prediction.ndim - 1)),
                prediction.shape,
            ).reshape(-1).astype(jnp.float32)
            logits = prediction.reshape(-1)
            labels = jnp.asarray(target).reshape(-1)
            if "auc_pos" in state:
                p = jax.nn.sigmoid(logits)
                bins = jnp.clip((p * self.AUC_BINS).astype(jnp.int32), 0, self.AUC_BINS - 1)
                is_pos = (labels > 0.5).astype(jnp.float32)
                state["auc_pos"] = state["auc_pos"].at[bins].add(ok * is_pos)
                state["auc_neg"] = state["auc_neg"].at[bins].add(ok * (1.0 - is_pos))
            if "logloss_sum" in state:
                ll = -(labels * jax.nn.log_sigmoid(logits)
                       + (1 - labels) * jax.nn.log_sigmoid(-logits))
                state["logloss_sum"] = state["logloss_sum"] + jnp.sum(ok * ll)
            if "mse_sum" in state:
                state["mse_sum"] = state["mse_sum"] + jnp.sum(ok * jnp.square(logits - labels))
            if "n_points" in state:
                state["n_points"] = state["n_points"] + jnp.sum(ok)
        slices = [m for m in self.metrics if isinstance(m, TaskSlice)]
        if slices:
            # multi-task [rows, T] predictions; valid masks leading rows
            row_ok = (jnp.arange(prediction.shape[0]) < valid).astype(
                jnp.float32)
            labels_full = jnp.asarray(target)
            for m in slices:
                logits = prediction[..., m.task]
                labels = labels_full[..., m.task]
                if isinstance(m.inner, AUC):
                    p = jax.nn.sigmoid(logits)
                    bins = jnp.clip((p * self.AUC_BINS).astype(jnp.int32),
                                    0, self.AUC_BINS - 1)
                    is_pos = (labels > 0.5).astype(jnp.float32)
                    state[f"{m.name}|pos"] = state[f"{m.name}|pos"].at[
                        bins].add(row_ok * is_pos)
                    state[f"{m.name}|neg"] = state[f"{m.name}|neg"].at[
                        bins].add(row_ok * (1.0 - is_pos))
                elif isinstance(m.inner, LogLoss):
                    ll = -(labels * jax.nn.log_sigmoid(logits)
                           + (1 - labels) * jax.nn.log_sigmoid(-logits))
                    state[f"{m.name}|sum"] = (state[f"{m.name}|sum"]
                                              + jnp.sum(row_ok * ll))
                else:  # MSE
                    state[f"{m.name}|sum"] = state[f"{m.name}|sum"] + jnp.sum(
                        row_ok * jnp.square(logits - labels))
            state["slice_rows"] = state["slice_rows"] + jnp.sum(row_ok)
        return state

    def partial_finalize(self, state) -> Dict[str, float]:
        """Small host-side reduction of the accumulator into metric logs."""
        state = {k: np.asarray(v) for k, v in state.items()}
        logs: Dict[str, float] = {}
        for metric in self.metrics:
            if isinstance(metric, (NDCG, Hit)):
                hist = state["rank_hist"]
                total = hist.sum()
                ranks = np.arange(1, self.user_sample_n + 1)
                if isinstance(metric, NDCG):
                    gains = np.where(ranks <= metric.k, 1.0 / np.log2(ranks + 1.0), 0.0)
                else:
                    gains = (ranks <= metric.k).astype(np.float64)
                logs[metric.name] = float((hist * gains).sum() / max(total, 1.0))
            elif isinstance(metric, AUC):
                pos, neg = state["auc_pos"].astype(np.float64), state["auc_neg"].astype(np.float64)
                n_pos, n_neg = pos.sum(), neg.sum()
                if n_pos == 0 or n_neg == 0:
                    logs[metric.name] = 0.5
                else:
                    cum_neg_below = np.concatenate([[0.0], np.cumsum(neg)[:-1]])
                    # within-bin ties contribute half a concordance
                    logs[metric.name] = float(
                        (pos * (cum_neg_below + 0.5 * neg)).sum() / (n_pos * n_neg)
                    )
            elif isinstance(metric, TaskSlice):
                if isinstance(metric.inner, AUC):
                    pos = state[f"{metric.name}|pos"].astype(np.float64)
                    neg = state[f"{metric.name}|neg"].astype(np.float64)
                    n_pos, n_neg = pos.sum(), neg.sum()
                    if n_pos == 0 or n_neg == 0:
                        logs[metric.name] = 0.5
                    else:
                        cum_neg_below = np.concatenate(
                            [[0.0], np.cumsum(neg)[:-1]])
                        logs[metric.name] = float(
                            (pos * (cum_neg_below + 0.5 * neg)).sum()
                            / (n_pos * n_neg))
                else:
                    logs[metric.name] = float(
                        state[f"{metric.name}|sum"]
                        / max(state["slice_rows"], 1.0))
            elif isinstance(metric, LogLoss):
                logs[metric.name] = float(state["logloss_sum"] / max(state["n_points"], 1.0))
            elif isinstance(metric, MSE):
                logs[metric.name] = float(state["mse_sum"] / max(state["n_points"], 1.0))
        return logs
