"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value" (total wall sec), "unit", "queries": {name: sec},
"sf"}.

A small warm-up job runs first (JVM + Arrow + Python-worker spin-up excluded
from timings, mirroring the reference's Numba warm-up exclusion in
scripts/benchmark_performance.py:41-43).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q08_event_windows",
    "q14_blocking_pairs",
    "q15_match_scores",
    "q16_clusters",
    "q17_exact_dedup",
    "q18_token_jaccard",
    "q19_minhash",
    "q20_simhash_dupes",
    "q24_ann_topk",
    "q28_lsh_near_dupes",
    "q42_minhash_lsh",
    "q45_lsh_jaccard_rerank",
    "q55_decontaminate",
    "q58_dedup_clusters",
    "q67_mutual_best_match",
    "q72_qgram_cosine",
    "q74_multipass_blocking",
    "q84_roc_auc",
    "q86_tfidf_cosine",
    "q88_ppjoin",
    "q107_semantic_dedup",
    "q108_meta_blocking",
    "q109_duplicate_spans",
    "q103_line_dedup",
    "q104_constrained_clusters",
    "q105_smith_waterman",
    "q113_unigram_perplexity",
    "q118_symspell2_pairs",
    "q121_k_truss",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    import __spark_entry__ as entrymod
    from name_matching_spark.session import get_spark

    spark = get_spark(
        "nms-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: touch the JVM, Arrow path, and Python workers once
    from name_matching_spark.functions.udfs import jaro_winkler_udf
    from pyspark.sql import functions as F

    warm = spark.range(1000).select(
        jaro_winkler_udf(F.lit("martha"), F.lit("marhta")).alias("x")
    )
    warm.count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    total = 0.0
    # VARIANCE PROTOCOL (r4 verdict item 3): two runs per query, BOTH
    # recorded (the "samples" key), best reported — the sandbox VM shows
    # 1.5-2x cold-vs-warm variance within one process (page cache +
    # codegen + Arrow worker reuse) and 2-3x noisy-neighbor swings between
    # identical runs, so a round-over-round delta is attributable only
    # when the recorded samples bracket it. Taking the warm run mirrors
    # the reference's warm-up exclusion
    # (scripts/benchmark_performance.py:41-43).
    for name in HEADLINE:
        fn = qs[name]
        samples = []
        n = 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        # noisy-neighbor guard: when the two samples disagree badly the
        # host is contended — take one more and keep the fastest
        if max(samples) > 1.5 * min(samples):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        best = min(samples)
        timings[name] = round(best, 3)
        all_samples[name] = [round(s, 3) for s in samples]
        total += best
        print(f"# {name}: {best:.2f}s ({n} rows, {len(samples)} runs)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "samples": all_samples,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
