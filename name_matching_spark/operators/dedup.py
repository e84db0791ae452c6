"""Document deduplication operators for large-scale corpus pipelines.

Beyond the reference's record-linkage scope: the dedup toolkit a 100 TB
training-data pipeline needs, expressed Spark-first. Everything below is
built from JVM-side primitives (split/explode/groupBy/join + md5) — no
Python in any hot path — so each operator is one or two shuffles whose keys
are explicitly chosen (doc_id or token/band buckets).

Hashes use md5 (not Spark's ``hash``) so results are portable across
engines and stable across Spark versions — the correctness oracle runs the
same md5 logic in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "tokenize_docs",
    "token_cap_census",
    "token_jaccard_pairs",
    "shingle_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_near_dupes",
    "winnowing_fingerprints",
]


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-content dedup by md5 groupBy: one row per distinct content with
    the minimum id as the keeper + duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def tokenize_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, token) pairs, lowercased, distinct — the relational token-set
    representation used by Jaccard and MinHash below."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )


def token_cap_census(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token_df: int | str = "auto",
) -> DataFrame:
    """No-silent-caps companion to :func:`token_jaccard_pairs`: one row
    reporting how many distinct tokens the skew guard excludes from
    candidate generation at the given ``max_token_df`` (``"auto"`` mirrors
    the operator's default cap = max(1000, ceil(1% of docs))).

    ``n_capped_tokens > 0`` means the guard is live — a pair can be missed
    iff EVERY shared token is capped. Run this (cheap: one token census)
    when auditing recall on a new corpus."""
    toks = tokenize_docs(df, text_col, id_col)
    df_counts = toks.groupBy("token").count()
    if max_token_df == "auto":
        n_docs = toks.select(id_col).distinct().select(
            F.count("*").alias("_n_docs")
        )
        with_cap = df_counts.join(F.broadcast(n_docs)).withColumn(
            "_cap", F.greatest(F.lit(1000), F.ceil(F.col("_n_docs") * 0.01))
        )
    else:
        with_cap = df_counts.withColumn("_cap", F.lit(int(max_token_df)))
    return with_cap.agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("count") > F.col("_cap"), 1).otherwise(0)).alias(
            "n_capped_tokens"
        ),
        F.max("_cap").alias("cap"),
    )


def token_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    max_token_df: int | str | None = "auto",
) -> DataFrame:
    """All document pairs with token-set Jaccard >= threshold, computed
    relationally: explode tokens -> self-join on token (the blocking key is
    the token itself) -> count intersections -> |A∪B| = |A|+|B|-|A∩B|.

    Skew guard (ON by default): a token appearing in k docs contributes k²
    join rows, so one stop-word makes the candidate join quadratic at corpus
    scale. ``max_token_df`` caps the document frequency of tokens used for
    CANDIDATE GENERATION only:

    - ``"auto"`` (default): cap = max(1000, ceil(1% of corpus docs)),
      derived IN-PLAN from a broadcast one-row census — no driver action,
      holds at any scale.
    - an int: explicit cap.
    - ``None``: guard off (single-pass join; only for corpora known to have
      no hot tokens).

    Jaccard VALUES stay exact under the guard: candidates come from the
    capped token join, but intersections are re-counted against the FULL
    token sets via id-keyed joins (bounded by candidates x doc size — no
    token-skew). The only semantic delta vs the unguarded form is recall:
    a pair is missed iff EVERY shared token exceeds the cap (pinned by
    tests/test_dedup_text.py). :func:`token_cap_census` reports how many
    tokens the guard excludes on a given corpus — no silent caps.

    ``group_col`` restricts candidates to a partition (e.g. language).
    Semantics: token-set Jaccard per the reference's ``jaccard_similarity``
    (``src/matcher.py:453-485``) lifted from one pair to all-pairs.
    """
    toks = tokenize_docs(df, text_col, id_col)
    if group_col:
        toks = toks.join(df.select(id_col, group_col), id_col)

    join_toks = toks
    guarded = max_token_df is not None
    if guarded:
        df_counts = toks.groupBy("token").count()
        if max_token_df == "auto":
            n_docs = toks.select(id_col).distinct().select(
                F.count("*").alias("_n_docs")
            )
            keep = (
                df_counts.join(F.broadcast(n_docs))
                .filter(
                    F.col("count")
                    <= F.greatest(F.lit(1000), F.ceil(F.col("_n_docs") * 0.01))
                )
                .select("token")
            )
        else:
            keep = df_counts.filter(F.col("count") <= int(max_token_df)).select("token")
        join_toks = toks.join(keep, "token")

    sizes = toks.groupBy(id_col).agg(F.count("*").alias("set_size"))

    join_keys = ["token"] + ([group_col] if group_col else [])
    a = join_toks.select(
        F.col(id_col).alias("id1"), *[F.col(c) for c in join_keys]
    )
    b = join_toks.select(
        F.col(id_col).alias("id2"), *[F.col(c) for c in join_keys]
    )
    if guarded:
        # candidates from the capped join; exact intersections re-counted on
        # the full token sets (id-keyed joins — candidate x doc-size bound)
        cand = (
            a.join(b, join_keys)
            .filter(F.col("id1") < F.col("id2"))
            .select("id1", "id2")
            .distinct()
        )
        t1 = toks.select(F.col(id_col).alias("id1"), "token")
        t2 = toks.select(F.col(id_col).alias("id2"), "token")
        inter = (
            cand.join(t1, "id1")
            .join(t2, ["id2", "token"])
            .groupBy("id1", "id2")
            .agg(F.count("*").alias("intersection"))
        )
    else:
        inter = (
            a.join(b, join_keys)
            .filter(F.col("id1") < F.col("id2"))
            .groupBy("id1", "id2")
            .agg(F.count("*").alias("intersection"))
        )
    out = (
        inter.join(sizes.withColumnsRenamed({id_col: "id1", "set_size": "size1"}), "id1")
        .join(sizes.withColumnsRenamed({id_col: "id2", "set_size": "size2"}), "id2")
        .withColumn(
            "jaccard",
            F.col("intersection")
            / (F.col("size1") + F.col("size2") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "intersection", "size1", "size2", "jaccard")
    )
    return out


def shingle_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """All document pairs with CHARACTER n-gram (shingle) set Jaccard >=
    threshold — the order-sensitive complement of the token-set form
    (:func:`token_jaccard_pairs`): word reordering changes shingles but not
    tokens, minor in-word edits change few shingles.

    Same relational shape: distinct shingles -> self-join on shingle ->
    intersection counts -> sizes. ``max_shingle_df`` (default 1000) prunes
    ultra-common shingles from CANDIDATE GENERATION only; intersections are
    re-counted on the full shingle sets (exact values; a pair is missed only
    if EVERY shared shingle exceeds the cap).
    """
    sh = _shingles(df, text_col, id_col, shingle_len)
    join_sh = sh
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle").count()
            .filter(F.col("count") <= int(max_shingle_df))
            .select("shingle")
        )
        join_sh = sh.join(keep, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    a = join_sh.select(F.col(id_col).alias("id1"), "shingle")
    b = join_sh.select(F.col(id_col).alias("id2"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    t1 = sh.select(F.col(id_col).alias("id1"), "shingle")
    t2 = sh.select(F.col(id_col).alias("id2"), "shingle")
    inter = (
        cand.join(t1, "id1")
        .join(t2, ["id2", "shingle"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("intersection"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({id_col: "id1", "set_size": "size1"}), "id1")
        .join(sizes.withColumnsRenamed({id_col: "id2", "set_size": "size2"}), "id2")
        .withColumn(
            "jaccard",
            F.col("intersection")
            / (F.col("size1") + F.col("size2") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "intersection", "size1", "size2", "jaccard")
    )


def winnowing_fingerprints(
    df: DataFrame,
    shingle_len: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every character k-gram (rolling-hash analog: first 16 md5 hex chars,
    portable), slide a ``window``-hash window, keep the minimum hash of
    each full window, emit the DISTINCT selected hashes per document.

    Guarantee: any two documents sharing a run of ``window + shingle_len - 1``
    identical characters share at least one fingerprint — the standard
    near-dup/plagiarism index at a fraction of the shingle count (expected
    density 2/(window+1)). Pure column expressions + one window function;
    the DuckDB oracle reproduces it exactly.
    """
    from pyspark.sql.window import Window

    sh = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, greatest(length(lower(regexp_replace({text_col}, '\\\\s+', ' '))) - {shingle_len - 1}, 1)), "
                    f"i -> substring(lower(regexp_replace({text_col}, '\\\\s+', ' ')), i, {shingle_len}))"
                )
            ).alias("pos", "shingle"),
        )
    ).select(
        id_col, "pos",
        F.substring(F.md5(F.col("shingle")), 1, 16).alias("h"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    n = Window.partitionBy(id_col)
    return (
        sh.withColumn("wmin", F.min("h").over(w))
        .withColumn("nsh", F.count("*").over(n))
        .filter(F.col("pos") <= F.col("nsh") - window)  # pos is 0-based
        .select(F.col(id_col), F.col("wmin").alias("fingerprint"))
        .distinct()
    )


def _shingles(df: DataFrame, text_col: str, id_col: str, shingle_len: int) -> DataFrame:
    """Distinct character shingles per doc via sequence+transform (JVM-side,
    no UDF)."""
    # substring with a column start needs SQL expr; the whole shingle set is
    # one JVM-side transform over a position sequence
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length(lower(regexp_replace({text_col}, '\\\\s+', ' '))) - {shingle_len - 1}, 1)), "
                    f"i -> substring(lower(regexp_replace({text_col}, '\\\\s+', ' ')), i, {shingle_len}))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per doc: h_i(doc) = min over shingles of
    md5(i || shingle) (first 16 hex chars, compared as strings — portable
    across engines).

    Implementation is a single groupBy after exploding (shingle x hash_index)
    — map-side partial min keeps shuffle volume at num_hashes rows per doc.
    """
    sh = _shingles(df, text_col, id_col, shingle_len)
    exploded = sh.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h"),
        F.col("shingle"),
    )
    hashed = exploded.select(
        id_col,
        "h",
        F.substring(F.md5(F.concat_ws("|", F.col("h").cast("string"), F.col("shingle"))), 1, 16).alias("hv"),
    )
    return hashed.groupBy(id_col, "h").agg(F.min("hv").alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    rows_per_band = num_hashes/bands; docs sharing ONE full band signature
    become candidates (classic banding estimate: threshold ~
    (1/bands)^(1/rows_per_band)). Output: (id1, id2, n_shared_bands).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    sig = minhash_signatures(df, num_hashes, shingle_len, text_col, id_col)
    # the band signature must be the h-ORDERED vector of minhashes (sorting
    # by value would make it a multiset and create spurious collisions
    # between bands that agree on no hash function); collect_list order is
    # nondeterministic, so sort the (h, minhash) structs by h
    banded = (
        sig.withColumn("band", (F.col("h") / (num_hashes // bands)).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("h", "minhash"))),
                    lambda s: s["minhash"],
                ),
                ",",
            ).alias("band_sig")
        )
    )
    a = banded.select(F.col(id_col).alias("id1"), "band", "band_sig")
    b = banded.select(F.col(id_col).alias("id2"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def simhash_signatures(
    df: DataFrame,
    bits: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash per doc over distinct lowercase word tokens.

    Token hash = first 16 hex chars of md5 (64 bits, portable); bit b of the
    signature is 1 iff more distinct tokens have bit b set than unset.
    Output column ``simhash`` is a bigint (bit 63 interpreted as sign —
    comparisons only ever use XOR popcount, so sign is irrelevant).

    Computed in ONE Arrow-batch pass per partition (``kernels.batch_simhash``)
    — a narrow map with ZERO shuffles. The previous relational form exploded
    (token x 64 bits) rows — a 64x amplification feeding two groupBys —
    whose semantics the DuckDB oracle still mirrors (q20), pinning the UDF.
    Docs with no tokens are filtered, matching the relational form's
    absent-row behavior.
    """
    from pyspark.sql.types import LongType

    from name_matching_spark.functions import kernels as K

    @F.pandas_udf(LongType())
    def simhash_udf(texts):  # type: ignore[no-untyped-def]
        import pandas as pd

        return pd.Series(K.batch_simhash(texts, bits=bits), index=texts.index)

    # "has at least one token" — F.trim strips spaces only, so strip the
    # full \s class to mirror the tokenizer exactly (tab-only docs).
    # asNondeterministic: deterministic in fact, but stops CollapseProject
    # from inlining one UDF call per downstream consumer (same guard as the
    # fused scoring UDF; tests/test_plan_properties.py)
    return df.filter(F.regexp_replace(F.col(text_col), r"\s+", "") != "").select(
        F.col(id_col),
        simhash_udf.asNondeterministic()(F.col(text_col)).alias("simhash"),
    )


def simhash_near_dupes(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    n_chunks: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs with Hamming distance <= max_hamming between
    simhashes, using the chunk-pigeonhole trick: split the signature into
    ``n_chunks`` pieces; any pair within distance < n_chunks must agree on at
    least one full chunk, which becomes the blocking key.

    Requires ``max_hamming < n_chunks`` for completeness.
    """
    if max_hamming >= n_chunks:
        raise ValueError("completeness requires max_hamming < n_chunks")
    # both join arms consume the signatures — materialize the UDF pass once
    sig = simhash_signatures(df, bits, text_col, id_col).localCheckpoint(eager=False)
    chunk_bits = bits // n_chunks
    mask = (1 << chunk_bits) - 1
    chunks = sig.select(
        id_col,
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("c"),
    ).withColumn(
        "chunk_val",
        F.expr(f"shiftrightunsigned(simhash, c * {chunk_bits}) & {mask}"),
    )
    a = chunks.select(F.col(id_col).alias("id1"), F.col("simhash").alias("sh1"), "c", "chunk_val")
    b = chunks.select(F.col(id_col).alias("id2"), F.col("simhash").alias("sh2"), "c", "chunk_val")
    cand = (
        a.join(b, ["c", "chunk_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "sh1", "sh2")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )
