"""Operational entry point: checkpoint-resumable linkage via spark-submit.

Cluster launch (the north-rule operational mode)::

    spark-submit --py-files nms.zip scripts/run_linkage.py \
        --input /data/source_files --output /data/matches \
        --ranges 64 --passes phonetic token_sorted --cap 1000

``nms.zip`` = ``zip -r nms.zip name_matching_spark``. Locally the script
runs on an existing/implicit local master. Resume is automatic: ranges with
a complete manifest under ``<output>/_manifest`` are skipped.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="blocked fuzzy linkage (resumable)")
    ap.add_argument("--input", required=True, help="parquet path or catalog table")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--ranges", type=int, default=16)
    ap.add_argument("--passes", nargs="+", default=["phonetic"])
    ap.add_argument("--cap", type=int, default=1000)
    ap.add_argument("--id-col", default="record_id")
    ap.add_argument("--first-col", default="first_name")
    ap.add_argument("--mnl-col", default="middle_name_last_name")
    ap.add_argument("--birthdate-col", default=None)
    ap.add_argument("--geo-cols", nargs="*", default=[])
    ap.add_argument("--match-threshold", type=float, default=0.75)
    ap.add_argument("--non-match-threshold", type=float, default=0.55)
    ap.add_argument("--base-similarity", default="jaro_winkler",
                    choices=["jaro_winkler", "damerau_levenshtein"])
    ap.add_argument("--cluster", action="store_true",
                    help="also write transitive cluster assignments")
    args = ap.parse_args(argv)

    from name_matching_spark.operators.blocking import BlockingConfig
    from name_matching_spark.operators.normalize import LinkageSchema
    from name_matching_spark.operators.score_pairs import MatcherConfig
    from name_matching_spark.plans.checkpoint import CheckpointedLinkage
    from name_matching_spark.session import get_spark
    from name_matching_spark.sources.readers import read_table

    spark = get_spark("nms-linkage")
    df = read_table(spark, args.input)

    schema = LinkageSchema(
        id_col=args.id_col,
        first_name=args.first_col,
        middle_name_last_name=args.mnl_col,
        birthdate=args.birthdate_col,
        geo_fields=args.geo_cols,
    )
    additional = {}
    if args.birthdate_col:
        additional["birthdate"] = 0.3
    if args.geo_cols:
        additional["geography"] = 0.3
    matcher = MatcherConfig(
        base_similarity=args.base_similarity,
        match_threshold=args.match_threshold,
        non_match_threshold=args.non_match_threshold,
        use_birthdate=bool(args.birthdate_col),
        geo_fields=args.geo_cols,
        additional_weights=additional,
    )
    runner = CheckpointedLinkage(
        args.output,
        num_ranges=args.ranges,
        schema=schema,
        blocking=BlockingConfig(passes=args.passes, hot_block_cap=args.cap),
        matcher=matcher,
    )
    executed = runner.run(df)
    print(json.dumps({"ranges_executed": executed, "skipped": args.ranges - len(executed)}))

    if args.cluster:
        from name_matching_spark.operators.clustering import assign_clusters
        from pyspark.sql import functions as F

        matches = runner.results(spark).filter(F.col("classification") == "match")
        records = df.select(F.col(args.id_col).alias("record_id"))
        clusters = assign_clusters(records, matches)
        clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
        print(json.dumps({"clusters_written": True}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
