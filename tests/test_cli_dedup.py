"""dedup_corpus CLI: end-to-end pipeline over a tmp parquet corpus."""

import sys

sys.path.insert(0, "scripts")


def test_dedup_corpus_cli(spark, tmp_path):
    import dedup_corpus

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "the quick brown fox jumps over the lazy dog again today!"),
            (3, "completely different content with no overlap whatsoever"),
            (4, "the quick brown fox jumps over the lazy dog again today"),
        ],
        "doc_id long, text string",
    )
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    docs.write.parquet(inp)

    rc = dedup_corpus.main(
        ["--input", inp, "--output", out, "--threshold", "0.6"]
    )
    assert rc == 0

    clusters = {
        r.doc_id: r for r in spark.read.parquet(f"{out}/clusters").collect()
    }
    # 1, 2, 4 are near/exact dups -> one cluster rooted at min id 1
    assert clusters[1].cluster_id == clusters[2].cluster_id == 1
    assert clusters[4].cluster_id == 1
    assert clusters[3].cluster_id == 3
    assert (clusters[1].is_kept, clusters[2].is_kept, clusters[4].is_kept) == (1, 0, 0)

    keepers = {r.doc_id for r in spark.read.parquet(f"{out}/keepers").collect()}
    assert keepers == {1, 3}

    pairs = spark.read.parquet(f"{out}/pairs").collect()
    assert all(r.jaccard >= 0.6 for r in pairs)
