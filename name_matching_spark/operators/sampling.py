"""Deterministic dataset splitting/sampling for training-data pipelines.

``randomSplit`` is partitioning-dependent (it samples per partition with a
seeded RNG, so the assignment changes when the input is repartitioned) —
useless for reproducible corpus curation. The operators here hash row
CONTENT (a key column) instead: the split of a given record is a pure
function of its key, stable across runs, engines, partitionings, and
incremental re-processing (a re-ingested record lands in the same split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "stratified_split"]

_BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "split") -> Column:
    """Uniform bucket in [0, 1e6) from the first 32 md5 bits of
    ``salt|key`` — portable (the SQL oracle reproduces it verbatim) and
    decorrelated from any other md5 use via the salt."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), key.cast("string"))), 1, 8),
            16, 10,
        ).cast("bigint")
        % _BUCKETS
    )


def stratified_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label (e.g. train/val/test) by content
    hash: label boundaries are cumulative-weight cutoffs over the
    million-bucket hash space (integer-exact, no float comparisons in the
    plan). Weights must sum to 1 (+-1e-9); label order follows the dict.

    Narrow map — zero shuffles; works identically on a stream.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1 (got {total})")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    bounds = []
    cum = 0.0
    for label, w in weights.items():
        cum += w
        bounds.append((label, round(cum * _BUCKETS)))
    bounds[-1] = (bounds[-1][0], _BUCKETS)  # close the range exactly

    b = hash_bucket(F.col(key_col), salt)
    expr = None
    for label, hi in bounds:
        cond = b < F.lit(hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(out_col, expr)
