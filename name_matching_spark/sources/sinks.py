"""Sinks (S6-S8 of SURVEY.md §2.1).

The reference's sinks are MySQL INSERTs (``src/db/operations.py:118-197``)
and small CSV reports. Here: parquet/table appends with pair-uniqueness
enforcement (the DB uniqueness constraint ``src/db/models.py:189-191``
becomes a dropDuplicates before write), partitioned layouts for the match
table, and a tiny CSV report writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_match_results", "write_report_csv", "write_bucketed_table"]


def write_match_results(
    matches: DataFrame,
    path_or_table: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Append match results with the pair-uniqueness constraint enforced.
    A path writes parquet; a catalog name writes via writeTo (Iceberg when
    the catalog is Iceberg — snapshot-per-write gives the lineage the
    checkpoint manifests reference)."""
    unique = matches.dropDuplicates(["id1", "id2"])
    if "/" in path_or_table:
        w = unique.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path_or_table)
        return
    try:
        unique.writeTo(path_or_table).append()
    except Exception as e:  # pragma: no cover - branch exercised in tests
        # the DataFrameWriterV2 append only resolves against V2 catalogs
        # (Iceberg et al.); a V1 session-catalog table raises
        # "Cannot write into v1 table" — fall back to the V1 by-name append
        if "v1 table" not in str(e):
            raise
        unique.write.mode("append").saveAsTable(path_or_table)


def write_report_csv(df: DataFrame, path: str, max_rows: int = 100_000) -> None:
    """Small human-facing CSV report (S8; ``src/cli.py:108-110`` analog).
    Guarded by a row cap — reports are driver-sized by definition."""
    df.limit(max_rows).toPandas().to_csv(path, index=False)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a frame as a BUCKETED (hash-clustered) managed table — the
    co-located-join layout for keys that are joined repeatedly at scale.

    Two tables bucketed the same way on the join key equi-join with ZERO
    exchange on either side (verified by ``tests/test_bucketed_join.py``:
    the physical plan has no ShuffleExchange); at 10^12 rows that deletes
    the dominant cost of every recurring record-id join (rerank joins,
    membership joins, incremental-linkage anchor joins). ``sort_cols``
    additionally sorts within buckets so sort-merge join skips its sort.

    Bucketing requires a catalog table (``saveAsTable``) — plain parquet
    paths cannot carry bucket metadata.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
