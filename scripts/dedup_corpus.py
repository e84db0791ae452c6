"""Operational entry point: corpus near-dup dedup via spark-submit.

The production pipeline shape (q45/q58): banded MinHash LSH candidates ->
exact shingle-Jaccard rerank -> connected components -> canonical keeper.
Writes three parquet outputs under ``--output``:

- ``pairs/``     id1, id2, intersection, size1, size2, jaccard
- ``clusters/``  doc_id, cluster_id, n_members, is_kept
- ``keepers/``   the deduplicated corpus (keeper rows only, original columns)

Cluster launch::

    spark-submit --py-files nms.zip scripts/dedup_corpus.py \
        --input /data/docs --output /data/deduped \
        --threshold 0.8 --num-hashes 32 --bands 8 --shingle-len 5

Every stage is candidate-linear (no all-pairs shape); clustering shuffles
only the edge list. See SCALING.md "Dedup / similarity at corpus scale".
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="LSH near-dup corpus dedup")
    ap.add_argument("--input", required=True, help="parquet path of documents")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--num-hashes", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--shingle-len", type=int, default=5)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from name_matching_spark.operators.clustering import assign_clusters
    from name_matching_spark.operators.dedup import (
        minhash_lsh_pairs,
        shingle_jaccard_rerank,
    )
    from name_matching_spark.session import get_spark

    spark = get_spark("dedup-corpus")
    docs = spark.read.parquet(args.input)

    cand = minhash_lsh_pairs(
        docs,
        num_hashes=args.num_hashes,
        bands=args.bands,
        shingle_len=args.shingle_len,
        text_col=args.text_col,
        id_col=args.id_col,
    )
    pairs = shingle_jaccard_rerank(
        docs,
        cand,
        threshold=args.threshold,
        shingle_len=args.shingle_len,
        text_col=args.text_col,
        id_col=args.id_col,
    )
    pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")
    pairs = spark.read.parquet(f"{args.output}/pairs")

    comp = assign_clusters(
        docs.select(F.col(args.id_col).alias("record_id")),
        pairs.select("id1", "id2"),
    ).select(F.col("record_id").alias(args.id_col), "cluster_id")
    members = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    clusters = comp.join(members, "cluster_id").select(
        args.id_col,
        "cluster_id",
        "n_members",
        F.when(F.col(args.id_col) == F.col("cluster_id"), 1)
        .otherwise(0)
        .alias("is_kept"),
    )
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    clusters = spark.read.parquet(f"{args.output}/clusters")

    keepers = docs.join(
        clusters.filter(F.col("is_kept") == 1).select(args.id_col),
        args.id_col,
        "semi",
    )
    keepers.write.mode("overwrite").parquet(f"{args.output}/keepers")

    n_docs = docs.count()
    n_keep = spark.read.parquet(f"{args.output}/keepers").count()
    print(f"docs={n_docs} keepers={n_keep} removed={n_docs - n_keep}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
