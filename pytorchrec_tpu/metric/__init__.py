from pytorchrec_tpu.metric.metrics import (
    AUC,
    Hit,
    LogLoss,
    Metric,
    MetricList,
    NDCG,
    get_metric,
    pos_rank_from_scores,
)

__all__ = [
    "Metric",
    "MetricList",
    "NDCG",
    "Hit",
    "AUC",
    "LogLoss",
    "get_metric",
    "pos_rank_from_scores",
]
