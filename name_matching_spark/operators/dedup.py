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
    "shingle_jaccard_rerank",
    "tfidf_cosine_rerank",
    "ppjoin_prefix_pairs",
    "shingle_containment_rerank",
    "minhash_coefficients",
    "minhash_signatures",
    "minhash_band_signatures",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_near_dupes",
    "winnowing_fingerprints",
    "duplicate_spans",
    "remove_duplicate_spans",
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
    hot = None
    guarded = max_token_df is not None
    if guarded:
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
        keep = with_cap.filter(F.col("count") <= F.col("_cap")).select("token")
        hot = with_cap.filter(F.col("count") > F.col("_cap")).select("token")
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
        # exact intersections WITHOUT re-expanding candidates by full token
        # sets (candidates x doc-size blows up on near-dup-heavy corpora —
        # measured 10^9 join rows at sf0.1): |A∩B| = |shared UNCAPPED|
        # (free from the capped candidate join's groupBy) + |shared CAPPED|
        # (candidates joined against the capped postings only — a doc has
        # FEW capped tokens, so the expansion is candidates x hot-per-doc)
        uncapped = (
            a.join(b, join_keys)
            .filter(F.col("id1") < F.col("id2"))
            .groupBy("id1", "id2")
            .agg(F.count("*").alias("_n_uncapped"))
        )
        hot_toks = toks.join(F.broadcast(hot), "token")
        h1 = hot_toks.select(F.col(id_col).alias("id1"), "token")
        h2 = hot_toks.select(F.col(id_col).alias("id2"), "token")
        hot_inter = (
            uncapped.select("id1", "id2")
            .join(h1, "id1")
            .join(h2, ["id2", "token"])
            .groupBy("id1", "id2")
            .agg(F.count("*").alias("_n_capped"))
        )
        inter = (
            uncapped.join(hot_inter, ["id1", "id2"], "left")
            .withColumn(
                "intersection",
                F.col("_n_uncapped") + F.coalesce(F.col("_n_capped"), F.lit(0)),
            )
            .select("id1", "id2", "intersection")
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
    ultra-common shingles from CANDIDATE GENERATION only; a pair is missed
    only if EVERY shared shingle exceeds the cap, and surviving pairs get
    exact values.

    SCALE CAVEAT: this is the exact ALL-PAIRS baseline — the candidate
    join emits sum-of-df^2 rows over shingle postings, and no df cap
    bounds that total on a near-dup-heavy corpus (a shingle shared by 500
    docs contributes 125k pairs even under the cap). The production path
    is ``minhash_lsh_pairs`` -> :func:`shingle_jaccard_rerank`, which is
    linear in candidates.
    """
    sh = _shingles(df, text_col, id_col, shingle_len)
    join_sh = sh
    hot = None
    if max_shingle_df is not None:
        counts = sh.groupBy("shingle").count()
        keep = counts.filter(F.col("count") <= int(max_shingle_df)).select("shingle")
        hot = counts.filter(F.col("count") > int(max_shingle_df)).select("shingle")
        join_sh = sh.join(keep, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    a = join_sh.select(F.col(id_col).alias("id1"), "shingle")
    b = join_sh.select(F.col(id_col).alias("id2"), "shingle")
    # |A∩B| = |shared uncapped| (from the candidate join itself) +
    # |shared capped| (candidates x the FEW hot shingles per doc) — never
    # candidates x full shingle sets, which explodes on near-dup corpora
    uncapped = (
        a.join(b, "shingle")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("_n_uncapped"))
    )
    if hot is not None:
        hot_sh = sh.join(F.broadcast(hot), "shingle")
        h1 = hot_sh.select(F.col(id_col).alias("id1"), "shingle")
        h2 = hot_sh.select(F.col(id_col).alias("id2"), "shingle")
        hot_inter = (
            uncapped.select("id1", "id2")
            .join(h1, "id1")
            .join(h2, ["id2", "shingle"])
            .groupBy("id1", "id2")
            .agg(F.count("*").alias("_n_capped"))
        )
        inter = (
            uncapped.join(hot_inter, ["id1", "id2"], "left")
            .withColumn(
                "intersection",
                F.col("_n_uncapped") + F.coalesce(F.col("_n_capped"), F.lit(0)),
            )
            .select("id1", "id2", "intersection")
        )
    else:
        inter = uncapped.withColumnRenamed("_n_uncapped", "intersection")
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


# cap for broadcasting the per-doc shingle-id arrays into the rerank
# kernel closure: total int64 elements across all docs (32 MB at the
# default) — same adaptive pattern as similarity_search's vector broadcast
BROADCAST_SHINGLE_ELEMENTS = 4_000_000


def _collect_shingle_dict(
    df: DataFrame, text_col: str, id_col: str, shingle_len: int
):
    """{doc_id: sorted int64 array of dense shingle ids}. Only called
    once the cheap size probe in :func:`shingle_jaccard_rerank` has
    bounded the total under ``BROADCAST_SHINGLE_ELEMENTS``.

    ONE shuffle (collect_set doubles as the per-doc distinct — no
    separate distinct job, no dictionary join); shingling stays JVM-side
    so both rerank paths see byte-identical shingle semantics. Dense ids
    are assigned driver-side in encounter order — any bijection
    shingle->id preserves intersection sizes, so the nondeterministic
    set order is irrelevant and the counts stay provably collision-free
    (unlike hashing the shingle string)."""
    import numpy as np

    rows = (
        df.select(
            F.col(id_col),
            F.explode(_shingle_array(text_col, shingle_len)).alias("shingle"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("_sh"))
        .collect()
    )
    ids: dict = {}
    out = {}
    for r in rows:
        shingles = r[1]
        arr = np.empty(len(shingles), dtype=np.int64)
        for j, s in enumerate(shingles):
            v = ids.get(s)
            if v is None:
                v = len(ids)
                ids[s] = v
            arr[j] = v
        arr.sort()
        out[r[0]] = arr
    return out


def _pair_intersections_from_dict(cand: DataFrame, sets: dict) -> DataFrame:
    """Append exact (intersection, size1, size2) looked up from the
    closure-broadcast shingle-set dictionary — the rerank ships only the
    id pair, never the postings. Pairs where either doc has no shingles
    are DROPPED (mirrors the join path's inner join against the sizes
    frame). Counts are exact integers (dense ids, no hash collisions)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import LongType, StructField, StructType

    fields = list(cand.schema.fields)
    out_schema = StructType(
        fields
        + [
            StructField("intersection", LongType()),
            StructField("size1", LongType()),
            StructField("size2", LongType()),
        ]
    )
    names = [f.name for f in fields]

    def compute(batches):
        for b in batches:
            i1 = b.column(b.schema.get_field_index("id1")).to_pylist()
            i2 = b.column(b.schema.get_field_index("id2")).to_pylist()
            n = b.num_rows
            inter = np.zeros(n, dtype=np.int64)
            s1 = np.zeros(n, dtype=np.int64)
            s2 = np.zeros(n, dtype=np.int64)
            keep = np.zeros(n, dtype=bool)
            for i in range(n):
                a = sets.get(i1[i])
                c = sets.get(i2[i])
                if a is None or c is None:
                    continue
                keep[i] = True
                s1[i] = a.size
                s2[i] = c.size
                inter[i] = np.intersect1d(a, c, assume_unique=True).size
            mask = pa.array(keep)
            arrays = [b.column(j).filter(mask) for j in range(b.num_columns)]
            arrays.append(pa.array(inter[keep], type=pa.int64()))
            arrays.append(pa.array(s1[keep], type=pa.int64()))
            arrays.append(pa.array(s2[keep], type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                arrays, names + ["intersection", "size1", "size2"]
            )

    return cand.mapInArrow(compute, out_schema)


def shingle_jaccard_rerank(
    df: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.5,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_shingles: bool | None = None,
) -> DataFrame:
    """EXACT shingle-set Jaccard for GIVEN candidate pairs — the rerank
    stage of the production near-dup pipeline
    (``minhash_lsh_pairs`` -> ``shingle_jaccard_rerank``).

    :func:`shingle_jaccard_pairs` is the exact all-pairs baseline; its
    candidate join is inherently sum-of-df^2 over shingle postings and no
    df cap bounds that total on a near-dup-heavy corpus (measured: did not
    finish at sf0.1). Banded MinHash bounds candidates instead, and this
    rerank is candidates x shingles-per-doc — linear in both.

    ``pairs`` needs columns (id1, id2); Jaccard values are exact (full
    shingle sets, including pairs whose intersection is 0 via the left
    join). Output matches ``shingle_jaccard_pairs``.

    ``broadcast_shingles`` (None = auto when the corpus's total shingle
    count fits ``BROADCAST_SHINGLE_ELEMENTS``): the pair stage ships only
    the id pair and intersects dense-id shingle sets from the kernel
    closure instead of joining candidates to the postings — exact counts
    (dictionary ids, no hash collisions), identical output incl. the
    jaccard division (same integer columns, same single IEEE division in
    the plan). Big corpora fall back to the postings-join path
    automatically — the scale-safe shape.
    """
    sh = _shingles(df, text_col, id_col, shingle_len)
    cand = pairs.select("id1", "id2")
    sets = None
    if broadcast_shingles or broadcast_shingles is None:
        # cheap narrow probe: sum(length(text)) upper-bounds the distinct
        # shingle total (len-k+1 or 1 per doc, each <= len), so the
        # decision to bail never pays the shingling scan itself
        bound = df.select(F.sum(F.length(text_col))).first()[0] or 0
        if bound <= BROADCAST_SHINGLE_ELEMENTS:
            sets = _collect_shingle_dict(df, text_col, id_col, shingle_len)
        elif broadcast_shingles:
            raise ValueError("corpus exceeds BROADCAST_SHINGLE_ELEMENTS")
    if sets is not None:
        counted = _pair_intersections_from_dict(cand, sets)
    else:
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
        t1 = sh.select(F.col(id_col).alias("id1"), "shingle")
        t2 = sh.select(F.col(id_col).alias("id2"), "shingle")
        inter = (
            cand.join(t1, "id1")
            .join(t2, ["id2", "shingle"])
            .groupBy("id1", "id2")
            .agg(F.count("*").alias("intersection"))
        )
        counted = (
            cand.join(inter, ["id1", "id2"], "left")
            .withColumn(
                "intersection", F.coalesce(F.col("intersection"), F.lit(0))
            )
            .join(
                sizes.withColumnsRenamed({id_col: "id1", "set_size": "size1"}),
                "id1",
            )
            .join(
                sizes.withColumnsRenamed({id_col: "id2", "set_size": "size2"}),
                "id2",
            )
        )
    return (
        counted.withColumn(
            "jaccard",
            F.col("intersection")
            / (F.col("size1") + F.col("size2") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "intersection", "size1", "size2", "jaccard")
    )


def shingle_containment_rerank(
    df: DataFrame,
    pairs: DataFrame,
    threshold_ppm: int = 500_000,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Asymmetric shingle containment C(A,B) = |A ∩ B| / |A| for GIVEN
    candidate pairs — catches *sub-document* duplication (a file embedded
    in a larger one, quoted passages, vendored snippets) that symmetric
    Jaccard dilutes: a 50-shingle file fully contained in a 5000-shingle
    one has Jaccard ≈ 0.01 but containment 1.0.

    Same scale shape as :func:`shingle_jaccard_rerank` (candidates ×
    shingles-per-doc). Containment is emitted per direction as exact
    parts-per-million integers (``intersection * 1e6 DIV size`` — engine-
    exact, the q09 lesson); a pair is kept when the larger direction
    reaches ``threshold_ppm``.
    """
    sh = _shingles(df, text_col, id_col, shingle_len)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    t1 = sh.select(F.col(id_col).alias("id1"), "shingle")
    t2 = sh.select(F.col(id_col).alias("id2"), "shingle")
    cand = pairs.select("id1", "id2")
    inter = (
        cand.join(t1, "id1")
        .join(t2, ["id2", "shingle"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("intersection"))
    )
    return (
        cand.join(inter, ["id1", "id2"], "left")
        .withColumn("intersection", F.coalesce(F.col("intersection"), F.lit(0)))
        .join(sizes.withColumnsRenamed({id_col: "id1", "set_size": "size1"}), "id1")
        .join(sizes.withColumnsRenamed({id_col: "id2", "set_size": "size2"}), "id2")
        .withColumn(
            "containment1_ppm",
            F.expr("CAST(intersection * 1000000 DIV size1 AS BIGINT)"),
        )
        .withColumn(
            "containment2_ppm",
            F.expr("CAST(intersection * 1000000 DIV size2 AS BIGINT)"),
        )
        .filter(
            F.greatest("containment1_ppm", "containment2_ppm")
            >= F.lit(int(threshold_ppm))
        )
        .select(
            "id1", "id2", "intersection", "size1", "size2",
            "containment1_ppm", "containment2_ppm",
        )
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
            F.posexplode(_shingle_array(text_col, shingle_len)).alias(
                "pos", "shingle"
            ),
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


def _shingle_array(text_col: str, shingle_len: int):
    """All character ``shingle_len``-grams of the normalized text as ONE
    array column: a single ``regexp_extract_all`` pass with a lookahead
    pattern ``(?=(.{k})).`` — every position emits its k-gram capture.

    The previous sequence+transform form re-evaluated
    ``lower(regexp_replace(text))`` INSIDE the position lambda (CollapseProject
    inlines the alias), i.e. O(len^2) work and allocation per document —
    measured 15.8s just to shingle 5k docs at sf0.1; this form is one regex
    scan per row. Documents shorter than ``shingle_len`` emit themselves
    (the relational oracles' ``greatest(len - k + 1, 1)`` behavior)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    grams = F.expr(
        f"regexp_extract_all(lower(regexp_replace({text_col}, '\\\\s+', ' ')), "
        f"'(?=(.{{{shingle_len}}})).', 1)"
    )
    return F.when(F.length(norm) < shingle_len, F.array(norm)).otherwise(grams)


def _shingles(df: DataFrame, text_col: str, id_col: str, shingle_len: int) -> DataFrame:
    """Distinct character shingles per doc (JVM-side, no UDF, one regex
    pass per row — see :func:`_shingle_array`)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(_shingle_array(text_col, shingle_len)).alias("shingle"),
        )
        .distinct()
    )


MINHASH_PRIME = 2147483647  # 2^31 - 1: a*hb + b stays < 2^62 (ANSI-safe)


def minhash_coefficients(num_hashes: int, seed: int = 7) -> tuple[list[int], list[int]]:
    """Seeded affine-permutation coefficients (a_i in [1, p), b_i in
    [0, p)) shared by the Spark plan and the SQL oracle."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_PRIME, size=num_hashes)
    b = rng.integers(0, MINHASH_PRIME, size=num_hashes)
    return [int(x) for x in a], [int(x) for x in b]


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """MinHash signature per doc via the standard one-base-hash + affine
    permutation scheme: hb(shingle) = first 32 md5 bits mod p, then
    h_i(doc) = min over shingles of (a_i * hb + b_i) mod p with seeded
    (a_i, b_i) and p = 2^31 - 1. Output: (id, h, minhash bigint).

    ONE md5 per distinct (doc, shingle); the ``num_hashes`` permutations
    are integer column expressions aggregated in a single groupBy(doc) —
    no (shingle x hash_index) explode at all, so shuffle input is one row
    per shingle and shuffle output ``num_hashes`` ints per doc. (The
    previous md5-per-(h, shingle) form cost num_hashes x the md5 work and
    a num_hashes x row amplification: 18.6s -> ~4s at sf0.1.) All
    arithmetic stays < 2^62, exact in any engine.
    """
    a, b = minhash_coefficients(num_hashes, seed)
    sh = _shingles(df, text_col, id_col, shingle_len)
    hb = (
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("bigint")
        % MINHASH_PRIME
    )
    based = sh.select(F.col(id_col), hb.alias("hb"))
    mins = based.groupBy(id_col).agg(
        *[
            F.min((F.lit(a[i]) * F.col("hb") + F.lit(b[i])) % MINHASH_PRIME).alias(
                f"_mh{i}"
            )
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"_mh{i}") for i in range(num_hashes)])).alias(
            "h", "minhash"
        ),
    )


def minhash_band_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_sig) banded MinHash signatures — the shared LSH
    key frame behind :func:`minhash_lsh_pairs` and the streaming
    near-dedup signature store (``streaming/dedup.py``)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    sig = minhash_signatures(df, num_hashes, shingle_len, text_col, id_col)
    # the band signature must be the h-ORDERED vector of minhashes (sorting
    # by value would make it a multiset and create spurious collisions
    # between bands that agree on no hash function); collect_list order is
    # nondeterministic, so sort the (h, minhash) structs by h
    return (
        sig.withColumn("band", (F.col("h") / (num_hashes // bands)).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("h", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                ",",
            ).alias("band_sig")
        )
    )


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
    banded = minhash_band_signatures(
        df, num_hashes, bands, shingle_len, text_col, id_col
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


def tfidf_cosine_rerank(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf_scale: int = 1_000_000,
) -> DataFrame:
    """EXACT TF-IDF cosine similarity for GIVEN candidate pairs — the
    weighted companion of :func:`shingle_jaccard_rerank` (rare tokens
    dominate, boilerplate tokens barely count; the standard corpus-dedup
    rerank when near-dups share rare content but differ in stopwords).

    Engine-exact by integer quantization: ``idf_q = idf_scale DIV df``
    (document frequency over the FULL corpus) and per-(doc, token) weight
    ``w = tf * idf_q`` keep dot products and squared norms in exact BIGINT
    arithmetic; the final cosine performs one IEEE sqrt/multiply/divide on
    exact integers — bit-identical in any engine.

    Plan shape: one token census (tf), one df census, postings joined to
    the candidate pairs (candidates x tokens-per-doc — linear in candidate
    postings, never all-pairs), plus a per-doc norm frame joined back by
    id. Output: ``id1, id2, dot, norm1, norm2, cosine`` (pairs with no
    shared token keep dot = 0 via the left join).
    """
    tf = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = tf.join(dfreq, "token").select(
        F.col(id_col),
        "token",
        (F.col("tf") * F.expr(f"{int(idf_scale)} DIV df")).alias("w"),
    )
    norms = w.groupBy(id_col).agg(F.sum(F.col("w") * F.col("w")).alias("norm2"))
    t1 = w.select(F.col(id_col).alias("id1"), "token", F.col("w").alias("w1"))
    t2 = w.select(F.col(id_col).alias("id2"), "token", F.col("w").alias("w2"))
    cand = pairs.select("id1", "id2")
    dots = (
        cand.join(t1, "id1")
        .join(t2, ["id2", "token"])
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    return (
        cand.join(dots, ["id1", "id2"], "left")
        .withColumn("dot", F.coalesce(F.col("dot"), F.lit(0)).cast("long"))
        .join(norms.withColumnsRenamed({id_col: "id1", "norm2": "norm1"}), "id1")
        .join(norms.withColumnsRenamed({id_col: "id2"}), "id2")
        .select(
            "id1",
            "id2",
            "dot",
            F.col("norm1").cast("long").alias("norm1"),
            F.col("norm2").cast("long").alias("norm2"),
            (
                F.col("dot")
                / (
                    F.sqrt(F.col("norm1").cast("double"))
                    * F.sqrt(F.col("norm2").cast("double"))
                )
            ).alias("cosine"),
        )
    )


def ppjoin_prefix_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT token-set Jaccard similarity self-join via PPJoin-style prefix
    filtering (Xiao et al., WWW'08) — recall = 1 WITHOUT LSH and without
    ``token_jaccard_pairs``'s df-cap guard (which trades recall for skew
    safety).

    Prefix-filter theorem: order every document's tokens by one global
    total order (document frequency asc, then token asc — rarest first)
    and keep each document's first ``|x| - ceil(t*|x|) + 1`` tokens; any
    pair with J >= t MUST share a prefix token, so the equi-join on prefix
    tokens is a complete candidate set. Jaccard is then re-computed on the
    FULL token sets, so emitted values are exact.

    Skew shape: prefix tokens are each document's RAREST tokens, so the
    candidate join's postings are small by construction — the hot
    boilerplate tokens that blow up a naive token join never enter a
    prefix (that is the point of the df-ascending order). Stages: token
    census, one rank window per document (bounded by document length), one
    prefix equi-join, one intersection join over candidates — all
    candidate-linear.

    Output: ``id1, id2, intersection, size1, size2, jaccard`` with
    ``jaccard >= threshold``.
    """
    from pyspark.sql import Window

    toks = tokenize_docs(df, text_col, id_col)
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    w = Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("token"))
    pref = (
        toks.join(dfreq, "token")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, id_col)
        .filter(
            F.col("pos")
            <= F.col("set_size")
            - F.ceil(F.lit(float(threshold)) * F.col("set_size"))
            + 1
        )
        .select(F.col(id_col).alias("_pid"), "token")
    )
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "token")
        .filter(F.col("a._pid") < F.col("b._pid"))
        .select(F.col("a._pid").alias("id1"), F.col("b._pid").alias("id2"))
        .distinct()
    )
    t1 = toks.select(F.col(id_col).alias("id1"), "token")
    t2 = toks.select(F.col(id_col).alias("id2"), "token")
    inter = (
        cand.join(t1, "id1")
        .join(t2, ["id2", "token"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    return (
        inter.join(
            sizes.withColumnsRenamed({id_col: "id1", "set_size": "size1"}), "id1"
        )
        .join(sizes.withColumnsRenamed({id_col: "id2", "set_size": "size2"}), "id2")
        .withColumn(
            "jaccard",
            F.col("intersection")
            / (F.col("size1") + F.col("size2") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= float(threshold))
        .select("id1", "id2", "intersection", "size1", "size2", "jaccard")
    )


def duplicate_spans(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr-style duplicate-span detection (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): every ``k``-char substring of the normalized text
    (lowercased, whitespace collapsed — the shingle family's canonical
    form) that occurs at least TWICE anywhere in the corpus — another doc
    or elsewhere in the same doc — marks its window; overlapping or
    adjacent marked windows merge into maximal spans.

    Output: ``(doc_id, span_start, span_end, span_len)`` with 1-based
    inclusive character offsets into the NORMALIZED text. Docs shorter
    than ``k`` (after normalization) contribute and receive nothing.

    Scale shape: one position-explode (a row per character — the
    relational analog of the paper's suffix array), one census groupBy on
    the k-gram, one semi-join keeping duplicated positions, and a per-doc
    window for island merging (partition-local by doc; rows at that point
    are only the duplicated positions). No pair stage anywhere — cost is
    linear in corpus characters, never in duplicate pairs, which is what
    makes ExactSubstr viable where pairwise dedup is not.
    """
    from pyspark.sql.window import Window

    grams = F.expr(
        f"regexp_extract_all(lower(regexp_replace({text_col}, '\\\\s+', ' ')), "
        f"'(?=(.{{{k}}})).', 1)"
    )
    pos = df.select(F.col(id_col), F.posexplode(grams).alias("_p0", "gram"))
    dup = (
        pos.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("gram")
    )
    hits = pos.join(dup, "gram", "left_semi").select(
        F.col(id_col), (F.col("_p0") + 1).alias("pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        hits.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_brk",
            (
                F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > k)
            ).cast("int"),
        )
        .withColumn(
            "_grp",
            F.sum("_brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(id_col, "_grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k - 1).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr dedup, removal step (arXiv:2107.06499 §4: the paper
    CUTS every duplicated span, accepting mid-sentence splices): rebuild
    each document's NORMALIZED text with all :func:`duplicate_spans`
    spans removed.

    Output: ``(id_col, n_spans, n_removed, text_dedup)`` for EVERY doc —
    ``n_removed`` counts removed characters; docs without spans keep their
    normalized text verbatim.

    Scale shape: spans (small — merged islands, not positions) are pinned
    once with localCheckpoint and consumed by three keyed aggregations;
    surviving segments are cut with lag-over-spans + one substring join
    against the doc text and re-joined by one groupBy(doc). Per-doc work
    only; no pair stage, no corpus-global state beyond the k-gram census
    inside :func:`duplicate_spans`.
    """
    from pyspark.sql.window import Window

    spans = duplicate_spans(df, k, text_col, id_col).localCheckpoint(eager=False)
    norm_df = df.select(
        F.col(id_col),
        F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")).alias("_norm"),
    )
    w = Window.partitionBy(id_col).orderBy("span_start")
    mids = spans.withColumn("_pe", F.lag("span_end").over(w)).select(
        F.col(id_col),
        (F.coalesce("_pe", F.lit(0)) + 1).alias("_ss"),
        (F.col("span_start") - F.coalesce("_pe", F.lit(0)) - 1).alias("_sl"),
    )
    tails = spans.groupBy(id_col).agg(
        (F.max("span_end") + 1).alias("_ss")
    ).withColumn("_sl", F.lit(None).cast("long"))
    segs = mids.unionByName(tails)
    cut = segs.join(norm_df, id_col).select(
        F.col(id_col),
        "_ss",
        F.when(F.col("_sl").isNull(), F.expr("substring(_norm, _ss)"))
        .otherwise(F.expr("substring(_norm, _ss, greatest(_sl, 0))"))
        .alias("_seg"),
    )
    reb = cut.groupBy(id_col).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ss", "_seg"))),
                lambda s: s["_seg"],
            ),
        ).alias("text_dedup")
    )
    stat = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("n_removed"),
    )
    return (
        norm_df.join(reb, id_col, "left")
        .join(stat, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.coalesce("text_dedup", F.col("_norm")).alias("text_dedup"),
        )
    )
