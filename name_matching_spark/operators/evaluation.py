"""Evaluation: precision / recall / F1 over labeled pairs.

Reference semantics (``src/evaluation.py:6-101``): predicted positive =
``predicted_score >= match_threshold``; actual positive =
``true_label == "match"``. The north-rule gate evaluates labeled pairs AT
SHARED BLOCKING KEYS (pairs the blocking stage actually generated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from name_matching_spark.core.scoring import DEFAULT_MATCH_THRESHOLD

__all__ = ["confusion_counts", "pairwise_metrics"]


def confusion_counts(
    scored_labeled: DataFrame,
    match_threshold: float = DEFAULT_MATCH_THRESHOLD,
    score_col: str = "score",
    label_col: str = "true_label",
) -> DataFrame:
    """TP/FP/FN/TN as a one-row aggregation (``src/evaluation.py:68-90``)."""
    pred = F.col(score_col) >= match_threshold
    actual = F.col(label_col) == "match"
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return scored_labeled.agg(
        one(pred & actual).alias("tp"),
        one(pred & ~actual).alias("fp"),
        one(~pred & actual).alias("fn"),
        one(~pred & ~actual).alias("tn"),
    )


def pairwise_metrics(
    scored: DataFrame,
    labeled: DataFrame,
    match_threshold: float = DEFAULT_MATCH_THRESHOLD,
    restrict_to_blocked: bool = True,
) -> dict[str, float]:
    """Join labeled pairs with scored pairs on (id1, id2) and compute
    precision/recall/F1 at ``match_threshold``.

    ``restrict_to_blocked=True`` (the north-rule gate): evaluate only labeled
    pairs the blocking stage generated (inner join). With False, labeled
    pairs missing from ``scored`` count as predicted-negative (score 0) — so
    blocking misses show up as recall loss.
    """
    how = "inner" if restrict_to_blocked else "left"
    joined = labeled.join(
        scored.select("id1", "id2", "score"), on=["id1", "id2"], how=how
    ).withColumn("score", F.coalesce(F.col("score"), F.lit(0.0)))
    row = confusion_counts(joined, match_threshold).collect()[0]
    tp, fp, fn, tn = (row[c] or 0 for c in ("tp", "fp", "fn", "tn"))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
        "threshold": match_threshold,
    }
