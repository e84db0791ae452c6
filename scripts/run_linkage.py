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
    ap.add_argument("--config", default=None,
                    help="INI config file (see config.ini.sample); precedence "
                         "defaults < file < explicit CLI flags")
    # None defaults so only explicitly-given flags override the config file
    ap.add_argument("--ranges", type=int, default=None)
    ap.add_argument("--passes", nargs="+", default=None)
    ap.add_argument("--cap", type=int, default=None)
    ap.add_argument("--id-col", default=None)
    ap.add_argument("--first-col", default=None)
    ap.add_argument("--mnl-col", default=None)
    ap.add_argument("--birthdate-col", default=None)
    ap.add_argument("--geo-cols", nargs="*", default=None)
    ap.add_argument("--match-threshold", type=float, default=None)
    ap.add_argument("--non-match-threshold", type=float, default=None)
    ap.add_argument("--base-similarity", default=None,
                    choices=["jaro_winkler", "damerau_levenshtein"])
    ap.add_argument("--cluster", action="store_true",
                    help="also write transitive cluster assignments")
    args = ap.parse_args(argv)

    from name_matching_spark.config import apply_overrides, load_linkage_config
    from name_matching_spark.plans.checkpoint import CheckpointedLinkage
    from name_matching_spark.session import get_spark
    from name_matching_spark.sources.readers import read_table

    job = load_linkage_config(args.config)
    # preserve the old flag-only behavior: without a config file, bare CLI
    # defaults still disable birthdate/geo unless the flags are passed
    if args.config is None:
        if args.id_col is None:
            args.id_col = "record_id"
        if args.birthdate_col is None:
            args.birthdate_col = ""
        if args.geo_cols is None:
            args.geo_cols = []
    apply_overrides(
        job,
        id_col=args.id_col,
        first_col=args.first_col,
        mnl_col=args.mnl_col,
        birthdate_col=args.birthdate_col,
        geo_cols=args.geo_cols,
        match_threshold=args.match_threshold,
        non_match_threshold=args.non_match_threshold,
        base_similarity=args.base_similarity,
        passes=args.passes,
        cap=args.cap,
        ranges=args.ranges,
    )
    # additional-field weights participate only for configured fields
    job.matcher.additional_weights = {
        k: v for k, v in job.matcher.additional_weights.items()
        if (k == "birthdate" and job.matcher.use_birthdate)
        or (k == "geography" and job.matcher.geo_fields)
    }

    spark = get_spark("nms-linkage")
    df = read_table(spark, args.input)

    runner = CheckpointedLinkage(
        args.output,
        num_ranges=job.num_ranges,
        schema=job.schema,
        blocking=job.blocking,
        matcher=job.matcher,
        dict_encode=job.dict_encode,
        dict_max_classes=job.dict_max_classes,
    )
    executed = runner.run(df)
    print(json.dumps({"ranges_executed": executed, "skipped": job.num_ranges - len(executed)}))

    if args.cluster:
        from name_matching_spark.operators.clustering import assign_clusters
        from pyspark.sql import functions as F

        matches = runner.results(spark).filter(F.col("classification") == "match")
        records = df.select(F.col(job.schema.id_col).alias("record_id"))
        clusters = assign_clusters(records, matches)
        clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
        print(json.dumps({"clusters_written": True}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
