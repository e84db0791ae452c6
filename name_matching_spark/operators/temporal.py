"""Temporal joins: as-of (point-in-time) join — a first-class time-series
operator the DataFrame API lacks natively, composed from union + one window
(NO range/theta join, no per-row Python).

Reference scope note: Kirachon/Name_Matching is batch record linkage with no
temporal operators; this module is part of the engine's OLAP/pipeline
extension surface (same tier as CUBE / session windows / exact median).

Semantics (pandas ``merge_asof`` / kdb ``aj`` style): for every left row,
attach the single right row with the same ``by`` keys whose ``on`` value is
the latest <= left's (``direction="backward"``) or the earliest >= left's
(``"forward"``), optionally bounded by ``tolerance``.

Plan shape at scale: tag both sides, union, ONE window over (by, on) with a
running ``last(..., ignorenulls=True)`` — a single shuffle on the ``by``
keys, no row explosion, no join at all. The classic sort-merge-asof in one
windowed pass; skewed keys are ordinary window skew (AQE-splittable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | None = None,
    grain_seconds: int = 900,
) -> DataFrame:
    """Join point rows to every interval row containing them
    (``start <= point < end``, half-open), scalably.

    A naive theta join is a per-key cross product. Instead both sides are
    bucketized on a fixed time grain: each interval explodes into the
    buckets it covers (``len/grain + 1`` rows — bounded for bounded
    intervals), each point lands in ONE bucket, and the join becomes an
    equi-join on (by..., bucket) plus a residual containment filter. A
    point matches each containing interval exactly once (its bucket occurs
    once per interval). Pick ``grain_seconds`` near the typical interval
    length: too coarse inflates the residual filter's input, too fine
    inflates the interval explode.

    Column names of ``points`` and ``intervals`` must be disjoint apart
    from ``by``. Empty/negative intervals (``end <= start``) never match.
    """
    by = list(by or [])
    overlap = set(points.columns) & set(intervals.columns) - set(by)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    grain_us = F.lit(int(grain_seconds) * 1_000_000)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    pb = points.withColumn("_b", F.floor(us(on) / grain_us))
    iv = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(us(start_col) / grain_us),
                    F.floor((us(end_col) - 1) / grain_us),
                )
            ),
        )
    )
    return (
        pb.join(iv, [*by, "_b"])
        .filter((F.col(on) >= F.col(start_col)) & (F.col(on) < F.col(end_col)))
        .drop("_b")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    tie_break: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on ordering column ``on`` within
    ``by`` groups.

    Output: every left row + the matched right row's columns renamed
    ``<col><suffix>`` (``on``/``by`` not duplicated) — NULLs when no right
    row qualifies. ``tolerance`` (a Column interval/duration or literal
    accepted by ``on``'s subtraction, e.g. ``F.expr("INTERVAL 30
    MINUTES")``) bounds ``|left.on - right.on|``. When several right rows
    share the boundary ``on`` value, ``tie_break`` (a right column name,
    max wins) makes the choice deterministic — without it the pick among
    exact ties is unspecified, like ``merge_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by or [])
    shared = set(by) | {on}
    right_cols = [c for c in right.columns if c not in shared]
    if tie_break is not None and tie_break not in right_cols:
        raise ValueError(f"tie_break {tie_break!r} must be a right payload column")

    rpay = F.struct(
        F.col(on).alias("_r_on"), *[F.col(c) for c in right_cols]
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        rpay.alias("_rpay"),
        F.lit(0).alias("_side"),
        (F.col(tie_break) if tie_break else F.lit(0)).alias("_tie"),
    )
    l_tagged = left.select(
        "*",
        F.lit(None).cast(r_tagged.schema["_rpay"].dataType).alias("_rpay"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_tie"].dataType).alias("_tie"),
    )
    # align right to left's column set (left payload nulled on right rows)
    l_payload = [c for c in left.columns if c not in shared]
    r_aligned = r_tagged.select(
        *[F.col(c) for c in by],
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        "_rpay", "_side", "_tie",
    )
    u = l_tagged.select(
        *[F.col(c) for c in by], F.col(on), *l_payload, "_rpay", "_side", "_tie"
    ).unionByName(r_aligned)

    if direction == "backward":
        # rights sort BEFORE lefts at equal `on` (side 0 < 1) so an
        # equal-timestamp right is visible; among equal rights the max
        # tie_break sorts last and wins the running last()
        order = [F.col(on).asc(), F.col("_side").asc(), F.col("_tie").asc()]
    else:
        # forward: scan descending; rights at equal `on` still first; max
        # tie_break wins
        order = [F.col(on).desc(), F.col("_side").asc(), F.col("_tie").asc()]
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("_rpay"), ignorenulls=True).over(w)
    out = (
        u.withColumn("_m", matched)
        .filter(F.col("_side") == 1)
        .drop("_rpay", "_side", "_tie")
    )
    if tolerance is not None:
        gap = (
            (F.col(on) - F.col("_m._r_on"))
            if direction == "backward"
            else (F.col("_m._r_on") - F.col(on))
        )
        out = out.withColumn(
            "_m", F.when(gap <= tolerance, F.col("_m"))
        )
    return out.select(
        *[F.col(c) for c in by],
        F.col(on),
        *l_payload,
        F.col("_m._r_on").alias(f"{on}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
