"""The flagship plan: read -> normalize -> block -> salted pair join ->
fused scoring -> threshold filter -> (top-k) -> results.

One Spark job, no driver loops — the reference's ``match_db_tables`` path
(``src/name_matcher.py:496-578``) re-crossed the blocked frames
(``:553-554``, a known over-comparison); this plan keeps the pair structure
through scoring while preserving per-pair score semantics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from name_matching_spark.operators.blocking import (
    BlockingConfig,
    blocking_key_column,
    candidate_pairs_cross,
    candidate_pairs_self,
)
from name_matching_spark.operators.normalize import LinkageSchema, normalize_records
from name_matching_spark.operators.score_pairs import (
    MatcherConfig,
    payload_select_exprs,
    score_pairs,
    scoring_struct_cols,
    top_k_per_record,
)

__all__ = ["dedup_table", "link_tables", "prepare_linkage_frame"]


def prepare_linkage_frame(
    df: DataFrame, schema: LinkageSchema | None, matcher: MatcherConfig
) -> DataFrame:
    """normalize + project to (record_id, scoring payload, blocking inputs).

    The schema (which input columns exist) and the matcher (which fields are
    scored) encode overlapping facts — validate them against each other up
    front so misalignment fails with a clear message instead of an
    UNRESOLVED_COLUMN AnalysisException deep inside the pair join.
    """
    schema = schema or LinkageSchema()
    if matcher.use_birthdate and not schema.birthdate:
        raise ValueError(
            "matcher.use_birthdate=True but schema.birthdate is None — "
            "set LinkageSchema(birthdate=...) or MatcherConfig(use_birthdate=False)"
        )
    missing_geo = [g for g in matcher.geo_fields if g not in schema.geo_fields]
    if missing_geo:
        raise ValueError(
            f"matcher.geo_fields {missing_geo} not in schema.geo_fields "
            f"{schema.geo_fields} — align the two configs"
        )
    # a small/single-file source arrives as one partition and the normalize
    # UDF chain (parse + per-field standardize + soundex downstream) would
    # run serially on one core — spread BEFORE the UDFs, not just before
    # the pair join (profiled: 5s -> <1s for the sf0.1 normalize pass)
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    norm = normalize_records(df, schema)
    # sorted_full is a blocking input (token_sorted pass), carried on the
    # RECORD frame only — it is not part of the pair payload (the scoring
    # UDF re-derives it from the components batch-side)
    return norm.select(
        F.col("record_id"),
        F.col("sorted_full"),
        *payload_select_exprs(matcher),
    )


def _multi_pass_pairs(
    work: DataFrame,
    payload_cols: list[str],
    blocking: BlockingConfig,
    other: DataFrame | None = None,
) -> DataFrame:
    frames = []
    for p in blocking.passes:
        keyed = work.withColumn("block_key", blocking_key_column(p))
        # A small/single-file source arrives as very few partitions; every
        # narrow op (and a broadcast pair join) preserves that, so scoring
        # would serialize onto one core. Spread to cluster parallelism
        # first — a no-op shuffle-wise when the input is already wide.
        sc = keyed.sparkSession.sparkContext
        target = sc.defaultParallelism
        if keyed.rdd.getNumPartitions() < target:
            keyed = keyed.repartition(target)
        # the keyed frame is consumed 3x (hot census + both join arms); a
        # lazy local checkpoint materializes the normalize/parse UDF chain
        # once instead of re-running it per consumer, and keeps the pair-join
        # plan small
        keyed = keyed.localCheckpoint(eager=False)
        if other is None:
            frames.append(
                candidate_pairs_self(keyed, payload_cols, cap=blocking.hot_block_cap)
            )
        else:
            keyed2 = other.withColumn("block_key", blocking_key_column(p))
            keyed2 = keyed2.localCheckpoint(eager=False)
            frames.append(
                candidate_pairs_cross(keyed, keyed2, payload_cols, cap=blocking.hot_block_cap)
            )
    pairs = reduce(lambda a, b: a.unionByName(b), frames)
    if len(frames) > 1:
        # a pair found by several passes is scored once (pair-uniqueness
        # constraint, src/db/models.py:189-191)
        pairs = pairs.dropDuplicates(["id1", "id2"])
    return pairs


def dedup_table(
    df: DataFrame,
    schema: LinkageSchema | None = None,
    blocking: BlockingConfig | None = None,
    matcher: MatcherConfig | None = None,
    top_k: int | None = None,
    keep_non_match: bool = False,
) -> DataFrame:
    """Self-linkage of one table: all within-block pairs, scored + classified.

    Non-matches are dropped from the result (``src/name_matcher.py:325-332``)
    unless ``keep_non_match``; ``top_k`` keeps the best k matches per id1
    (``:334-337``).
    """
    matcher = matcher or MatcherConfig()
    blocking = blocking or BlockingConfig()
    work = prepare_linkage_frame(df, schema, matcher)
    pairs = _multi_pass_pairs(work, scoring_struct_cols(matcher), blocking)
    results = score_pairs(pairs, matcher)
    if not keep_non_match:
        results = results.filter(F.col("classification") != "non_match")
    if top_k:
        results = top_k_per_record(results, top_k)
    return results


def link_tables(
    df1: DataFrame,
    df2: DataFrame,
    schema1: LinkageSchema | None = None,
    schema2: LinkageSchema | None = None,
    blocking: BlockingConfig | None = None,
    matcher: MatcherConfig | None = None,
    top_k: int | None = None,
    keep_non_match: bool = False,
) -> DataFrame:
    """Cross-linkage of two tables (the ``match_db_tables`` shape,
    ``src/name_matcher.py:496-578``). Side 1 = df1 (orientation fixed —
    Monge-Elkan is asymmetric)."""
    matcher = matcher or MatcherConfig()
    blocking = blocking or BlockingConfig()
    work1 = prepare_linkage_frame(df1, schema1, matcher)
    work2 = prepare_linkage_frame(df2, schema2, matcher)
    pairs = _multi_pass_pairs(work1, scoring_struct_cols(matcher), blocking, other=work2)
    results = score_pairs(pairs, matcher)
    if not keep_non_match:
        results = results.filter(F.col("classification") != "non_match")
    if top_k:
        results = top_k_per_record(results, top_k)
    return results
