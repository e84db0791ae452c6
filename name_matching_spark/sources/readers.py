"""Readers with the reference's ingest semantics.

S1-S3 of SURVEY.md §2.1: CSV scan + user column remapping
(``src/csv_handler.py:15-40``, CLI ``Name=first_name`` syntax), schema/value
validation (``csv_handler.py:43-126``) as DataFrame predicates (validation
runs distributed; bad rows are counted/split, never iterated on the driver).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from name_matching_spark.operators.normalize import DATE_FORMATS

__all__ = [
    "IngestSpec",
    "read_csv_mapped",
    "read_jsonl_mapped",
    "read_table",
    "validate_records",
    "default_validators",
]


@dataclass
class IngestSpec:
    """Column mapping (source name -> canonical name) + required canonical
    columns, mirroring ``read_csv_to_dataframe``'s contract."""

    column_mapping: dict[str, str] = field(default_factory=dict)
    required: list[str] = field(
        default_factory=lambda: ["first_name", "middle_name_last_name"]
    )


def read_csv_mapped(spark: SparkSession, path: str, spec: IngestSpec | None = None) -> DataFrame:
    """Header CSV scan + canonical renaming. Missing required columns raise
    immediately (schema-time, not run-time)."""
    spec = spec or IngestSpec()
    df = spark.read.option("header", True).csv(path)
    if spec.column_mapping:
        df = df.withColumnsRenamed(spec.column_mapping)
    missing = [c for c in spec.required if c not in df.columns]
    if missing:
        raise ValueError(f"missing required columns after mapping: {missing}")
    return df


def read_table(spark: SparkSession, name_or_path: str) -> DataFrame:
    """Catalog table or parquet path scan (S4/S5). Iceberg tables resolve
    through the catalog when an Iceberg catalog is configured on the
    session; filters/limits compose via ordinary DataFrame ops and push
    down to the scan."""
    if "/" in name_or_path:
        return spark.read.parquet(name_or_path)
    return spark.read.table(name_or_path)


def default_validators() -> dict[str, Column]:
    """Reference default validators (``csv_handler.py:81-126``): names
    non-empty, birthdate parseable in one of the 5 accepted formats (or
    absent)."""
    non_empty = lambda c: F.col(c).isNotNull() & (F.length(F.trim(F.col(c))) > 0)  # noqa: E731
    date_ok = F.col("birthdate").isNull() | F.coalesce(
        *[F.try_to_date(F.col("birthdate"), fmt) for fmt in DATE_FORMATS]
    ).isNotNull()
    return {
        "first_name": non_empty("first_name"),
        "middle_name_last_name": non_empty("middle_name_last_name"),
        "birthdate": date_ok,
    }


def validate_records(
    df: DataFrame, validators: dict[str, Column] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split (valid, invalid) by the conjunction of per-column predicates —
    the distributed form of ``validate_dataframe``'s row loop
    (``csv_handler.py:43-78``). ``invalid`` carries a ``_violations`` array
    naming the failed checks."""
    validators = validators or default_validators()
    applicable = {k: v for k, v in validators.items() if k in df.columns or "(" in k}
    viol = F.array_compact(
        F.array(
            *[
                F.when(~pred, F.lit(name)).otherwise(F.lit(None))
                for name, pred in applicable.items()
            ]
        )
    )
    tagged = df.withColumn("_violations", viol)
    valid = tagged.filter(F.size("_violations") == 0).drop("_violations")
    invalid = tagged.filter(F.size("_violations") > 0)
    return valid, invalid


def read_jsonl_mapped(
    spark: SparkSession,
    path: str,
    spec: IngestSpec | None = None,
    schema: str | None = None,
) -> DataFrame:
    """JSON-lines scan with the same remap/required contract as
    :func:`read_csv_mapped` — the ingest format of choice for document
    corpora. Pass an explicit ``schema`` DDL string at scale: schema
    inference costs a full extra pass over the input, which at 100 TB is
    the difference between one scan and two. Corrupt lines land in
    ``_corrupt_record`` (PERMISSIVE mode) so ingestion never aborts on a
    bad line — filter them into the invalid stream with
    :func:`validate_records`.
    """
    spec = spec or IngestSpec()
    reader = spark.read
    if schema is not None:
        sch = schema
        if "_corrupt_record" not in sch:
            sch = sch + ", _corrupt_record STRING"
        reader = reader.schema(sch)
    df = reader.option("mode", "PERMISSIVE").json(path)
    if spec.column_mapping:
        df = df.withColumnsRenamed(spec.column_mapping)
    missing = [c for c in spec.required if c not in df.columns]
    if missing:
        raise ValueError(f"missing required columns after mapping: {missing}")
    return df
