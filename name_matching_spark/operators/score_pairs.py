"""Pairwise scoring of candidate pairs: fused Arrow UDF + column arithmetic.

Spark shape of ``src/name_matcher.py:129-247`` (match_names) applied to a
pair DataFrame: one vectorized UDF emits every component score per batch;
the weighted ensemble, additional-field blend, and classification are plain
column expressions that stay inside whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from name_matching_spark.core.scoring import (
    DEFAULT_ADDITIONAL_WEIGHTS,
    DEFAULT_MATCH_THRESHOLD,
    DEFAULT_NAME_WEIGHTS,
    DEFAULT_NON_MATCH_THRESHOLD,
)
from name_matching_spark.functions.udfs import make_component_scores_udf

__all__ = [
    "MatcherConfig",
    "scoring_struct_cols",
    "score_pairs",
    "top_k_per_record",
    "mutual_best_match",
    "one_to_one_matching",
    "qgram_cosine_pairs",
    "soft_tfidf_pairs",
]


@dataclass
class MatcherConfig:
    """Pluggable knobs mirroring ``NameMatcher.__init__``
    (``src/name_matcher.py:67-107``)."""

    base_similarity: str = "jaro_winkler"
    name_weights: dict[str, float] = field(default_factory=lambda: dict(DEFAULT_NAME_WEIGHTS))
    additional_weights: dict[str, float] = field(
        default_factory=lambda: dict(DEFAULT_ADDITIONAL_WEIGHTS)
    )
    match_threshold: float = DEFAULT_MATCH_THRESHOLD
    non_match_threshold: float = DEFAULT_NON_MATCH_THRESHOLD
    use_birthdate: bool = True
    geo_fields: list[str] = field(default_factory=lambda: ["province_name", "city_name"])


def scoring_struct_cols(config: MatcherConfig) -> list[str]:
    """Payload columns each pair side must carry (names match the normalized
    frame; geo fields are positional aliases)."""
    cols = ["first_std", "middle_std", "last_std"]
    cols += [f"geo{i}" for i in range(len(config.geo_fields))]
    if config.use_birthdate:
        cols.append("birthdate_std")
    return cols


def payload_select_exprs(config: MatcherConfig) -> list:
    """Normalized-frame columns -> scoring payload columns (geo fields get
    positional ``geo{i}`` aliases so the fused UDF is schema-stable)."""
    # full_std / sorted_full are NOT shipped through the pair join — the
    # fused UDF derives them from the components per batch (with
    # factorize-level memoization), cutting the Arrow payload per pair from
    # 2x(5+geo) strings to 2x(3+geo)
    exprs = [
        F.col("first_std"),
        F.col("middle_std"),
        F.col("last_std"),
    ]
    exprs += [F.col(f"{g}_std").alias(f"geo{i}") for i, g in enumerate(config.geo_fields)]
    if config.use_birthdate:
        exprs.append(F.col("birthdate_std"))
    return exprs


def score_pairs(
    pairs: DataFrame,
    config: MatcherConfig | None = None,
    class_dict: dict | None = None,
) -> DataFrame:
    """Score a candidate-pair frame (columns ``id1, id2, s1, s2`` with
    payload structs) and classify.

    Emits the MatchResult shape (``src/db/models.py:145-191`` /
    ``src/name_matcher.py:326-332``): flat ``score_*`` columns, overall
    ``score``, ``classification``.

    ``class_dict``: dictionary-encoded scoring (SURVEY §2.11's
    dedup-score idea taken to its transfer-bound conclusion). When set,
    the pair structs carry a bigint ``class_id`` per side instead of the
    string payload, and the fused UDF receives the two id columns plus the
    (closure-broadcast) id->payload dictionary — see
    ``make_component_scores_dict_udf``. The scoring stage is measured
    Arrow-TRANSFER-bound (a constant UDF over the struct payload costs
    ~95% of the real one at sf0.1), so shrinking the per-pair transfer to
    two ints is the win; per-batch kernel work also drops to one
    evaluation per distinct (class1, class2). Values are bit-identical to
    the direct path (shared computation core). ``plans.linkage`` builds
    the encoding adaptively — only when the distinct-payload count fits a
    driver-side dictionary.
    """
    config = config or MatcherConfig()
    geo_count = len(config.geo_fields)
    # the Spark path scores the fixed component set of the fused UDF; the
    # scalar oracle would treat unknown weighted components as 0.0, but
    # silently diverging is worse than refusing
    known = {"first_name", "middle_name", "last_name", "full_name_sorted",
             "monge_elkan_dl", "monge_elkan_jw"}
    unknown = [k for k in config.name_weights if k not in known]
    if unknown:
        raise ValueError(
            f"name_weights components {unknown} are not produced by the "
            f"scoring UDF (available: {sorted(known)})"
        )
    if class_dict is not None:
        from name_matching_spark.functions.udfs import make_component_scores_dict_udf

        dict_udf = make_component_scores_dict_udf(
            config.base_similarity, geo_count, class_dict
        )
        # Score each DISTINCT (class1, class2) ONCE globally, then join the
        # score struct back onto the pair stream. The dedup shuffle ships
        # two bigints per pair (cheap); the UDF stage shrinks from
        # |pairs| to |distinct class pairs| (measured 3.4M -> 106k at
        # sf0.1: scoring stage 4.2s -> 1.6s), and AQE broadcasts the small
        # scored frame for the join-back. Values are bit-identical to
        # scoring in-stream — same kernel, one evaluation per class pair
        # (the r3 attempt at this with STRING payloads lost to the wide
        # dedup shuffle; bigint class ids are what make it pay).
        class_pairs = pairs.select(
            F.col("s1.class_id").alias("_c1"), F.col("s2.class_id").alias("_c2")
        ).dropDuplicates()
        scored_classes = class_pairs.withColumn(
            "_cs", dict_udf(F.col("_c1"), F.col("_c2"))
        )
        scored = pairs.join(
            scored_classes,
            (F.col("s1.class_id") == F.col("_c1"))
            & (F.col("s2.class_id") == F.col("_c2")),
        ).drop("_c1", "_c2")
    else:
        udf = make_component_scores_udf(config.base_similarity, geo_count)
        struct_fields = ["first_std", "middle_std", "last_std"] + [
            f"geo{i}" for i in range(geo_count)
        ]
        side1 = F.struct(*[F.col(f"s1.{f}") for f in struct_fields])
        side2 = F.struct(*[F.col(f"s2.{f}") for f in struct_fields])
        scored = pairs.withColumn("_cs", udf(side1, side2))

    # weighted name score (src/scorer.py:19-54): missing weighted components
    # score 0 but keep full denominator — with the standard four components
    # all present, this is a plain weighted sum / sum(weights).
    total_w = sum(config.name_weights.values())
    name_score = None
    for comp, w in config.name_weights.items():
        term = F.col(f"_cs.{comp}") * F.lit(w)
        name_score = term if name_score is None else name_score + term
    name_score = (name_score / F.lit(total_w)) if total_w > 0 else F.lit(0.0)
    scored = scored.withColumn("score_name_score", name_score)

    # additional fields (src/name_matcher.py:204-234): birthdate = exact
    # string equality with NULL==NULL (reference compares possibly-None
    # values with ==); geography = mean of per-field JW (from the fused UDF).
    additional: dict[str, F.Column] = {}
    if config.use_birthdate:
        additional["birthdate"] = F.when(
            F.col("s1.birthdate_std").eqNullSafe(F.col("s2.birthdate_std")), 1.0
        ).otherwise(0.0)
    if geo_count > 0:
        additional["geography"] = F.col("_cs.geography")

    if additional:
        # name_weight = 1 - sum(ALL configured additional weights); absent
        # fields' mass drops, per scorer.py:109-117
        name_weight = 1.0 - sum(config.additional_weights.values())
        overall = F.col("score_name_score") * F.lit(name_weight)
        for fname, score_col in additional.items():
            w = config.additional_weights.get(fname)
            if w is not None:
                overall = overall + score_col * F.lit(w)
    else:
        overall = F.col("score_name_score")

    scored = scored.withColumn("score", overall)
    scored = scored.withColumn(
        "classification",
        F.when(F.col("score") >= config.match_threshold, "match")
        .when(F.col("score") < config.non_match_threshold, "non_match")
        .otherwise("manual_review"),
    )

    out_cols = [
        F.col("id1"),
        F.col("id2"),
        F.col("score"),
        F.col("classification"),
        F.col("_cs.first_name").alias("score_first_name"),
        F.col("_cs.middle_name").alias("score_middle_name"),
        F.col("_cs.last_name").alias("score_last_name"),
        F.col("_cs.full_name_sorted").alias("score_full_name_sorted"),
        F.col("_cs.monge_elkan_dl").alias("score_monge_elkan_dl"),
        F.col("_cs.monge_elkan_jw").alias("score_monge_elkan_jw"),
        F.col("score_name_score"),
    ]
    if config.use_birthdate:
        out_cols.append(additional["birthdate"].alias("score_birthdate"))
    if geo_count > 0:
        out_cols.append(F.col("_cs.geography").alias("score_geography"))
    if "block_key" in pairs.columns:
        out_cols.insert(0, F.col("block_key"))
    return scored.select(*out_cols)


def top_k_per_record(
    matches: DataFrame, k: int, id_col: str = "id1", score_col: str = "score"
) -> DataFrame:
    """Per-left-record top-k by score (``src/name_matcher.py:334-337``) as a
    rank window — ties broken by id2 for determinism."""
    w = Window.partitionBy(id_col).orderBy(F.desc(score_col), F.asc("id2"))
    return (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mutual_best_match(
    pairs: DataFrame,
    score_col: str = "score",
    id1_col: str = "id1",
    id2_col: str = "id2",
    symmetric: bool = True,
) -> DataFrame:
    """Reciprocal top-1 (one-to-one) matching over scored pairs.

    The reference keeps every pair above the threshold
    (``src/name_matcher.py:216-247``); deduplication and person-merge
    workflows additionally need an *assignment*: each record linked to at
    most one partner, both sides agreeing. The standard scalable relaxation
    of optimal bipartite assignment is reciprocal best match — keep (a, b)
    iff b is a's best-scoring partner AND a is b's.

    ``symmetric=True`` treats undirected dedup pairs (``id1 < id2``): each
    pair is mirrored into both directions first so a record's best partner
    is taken over *all* pairs touching it, whichever side it appeared on.
    With ``symmetric=False`` the input is bipartite (left ids never appear
    on the right) and the mirror step is skipped.

    Ties broken by partner id ascending — deterministic in any engine.
    Two window shuffles (one per direction) on the pair frame; no joins
    back to the records. Scale shape: both windows partition by a record
    id, so skew is bounded by a record's candidate count, not block size.
    """
    a, b, s = F.col(id1_col), F.col(id2_col), F.col(score_col)
    if not symmetric:
        # bipartite: rank each side's preferences directly on the pair frame
        w1 = Window.partitionBy(id1_col).orderBy(F.desc(score_col), F.asc(id2_col))
        w2 = Window.partitionBy(id2_col).orderBy(F.desc(score_col), F.asc(id1_col))
        return (
            pairs.withColumn("_r1", F.row_number().over(w1))
            .withColumn("_r2", F.row_number().over(w2))
            .filter((F.col("_r1") == 1) & (F.col("_r2") == 1))
            .drop("_r1", "_r2")
        )
    # mirror via explode, not union: one scan of the (possibly expensive)
    # pair frame instead of two recomputations of its upstream
    directed = pairs.select(
        s.alias("_s"),
        F.explode(
            F.array(
                F.struct(a.alias("_src"), b.alias("_dst")),
                F.struct(b.alias("_src"), a.alias("_dst")),
            )
        ).alias("_e"),
    ).select(F.col("_e._src").alias("_src"), F.col("_e._dst").alias("_dst"), "_s")
    # per-record best via min_by on the (-score, partner) struct — same
    # (score desc, partner asc) tie-break as a ranking window, but an
    # AGGREGATE: map-side partial combining ships one row per record per
    # mapper instead of sorting the whole mirrored pair stream through
    # one shuffle (the window carries every row)
    best = directed.groupBy("_src").agg(
        F.min_by(
            F.struct(F.col("_dst"), F.col("_s")),
            F.struct((-F.col("_s")).alias("_negs"), F.col("_dst")),
        ).alias("_b")
    ).select(
        "_src", F.col("_b._dst").alias("_dst"), F.col("_b._s").alias("_s")
    )
    # a reciprocal pair contributes exactly two best-edges — one per
    # orientation, from two distinct _src partitions — so grouping by the
    # canonical pair and keeping count == 2 IS the reciprocity test: one
    # pass over `best`, no self-join (which would recompute the whole
    # upstream pair pipeline once per join arm)
    return (
        best.groupBy(
            F.least("_src", "_dst").alias(id1_col),
            F.greatest("_src", "_dst").alias(id2_col),
        )
        .agg(
            F.count(F.lit(1)).alias("_n_dir"),
            F.max("_s").alias(score_col),
        )
        .filter(F.col("_n_dir") == 2)
        .drop("_n_dir")
    )


def qgram_cosine_pairs(
    records: DataFrame,
    pairs: DataFrame,
    name_col: str,
    id_col: str = "record_id",
    q: int = 2,
) -> DataFrame:
    """Character q-gram multiset cosine similarity for candidate pairs —
    the vector-space member of the string-similarity family (alongside
    edit-distance JW/DL and token-set Jaccard): profile each name as its
    q-gram count vector, score a pair by the cosine of the two vectors.
    Order-insensitive at the gram level, so it tolerates transpositions
    spanning token boundaries that JW penalizes.

    Fully relational: explode positions (one row per gram), count per
    (record, gram), join candidate pairs to both gram tables for the dot
    product, join per-record squared norms back. All arithmetic stays in
    exact integers until the final ``dot / (sqrt(sq1) * sqrt(sq2))`` — the
    same doubles in any engine. Names shorter than ``q`` have no profile
    and drop from the output (inner norm join).

    Scale shape: gram postings are |records| × (len−q+1) rows; the dot
    join shuffles on (record, gram) — bounded by pair count × grams per
    name, never corpus².
    """
    grams = (
        records.select(F.col(id_col).alias("_rid"), F.col(name_col).alias("_nm"))
        .filter(F.length("_nm") >= q)
        .select(
            "_rid",
            "_nm",
            F.explode(
                F.sequence(F.lit(1), F.length("_nm") - (q - 1))
            ).alias("_i"),
        )
        .select("_rid", F.expr(f"substring(_nm, _i, {q})").alias("gram"))
        .groupBy("_rid", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    norms = grams.groupBy("_rid").agg(
        F.sum(F.col("c") * F.col("c")).alias("sq")
    )
    g1 = grams.select(F.col("_rid").alias("id1"), "gram", F.col("c").alias("c1"))
    g2 = grams.select(F.col("_rid").alias("id2"), "gram", F.col("c").alias("c2"))
    dot = (
        pairs.select("id1", "id2")
        .join(g1, "id1")
        .join(g2, ["id2", "gram"])
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("c1") * F.col("c2")).alias("dot"))
    )
    return (
        pairs.select("id1", "id2")
        .join(dot, ["id1", "id2"], "left")
        .withColumn("dot", F.coalesce(F.col("dot"), F.lit(0)))
        .join(norms.withColumnsRenamed({"_rid": "id1", "sq": "sq1"}), "id1")
        .join(norms.withColumnsRenamed({"_rid": "id2", "sq": "sq2"}), "id2")
        .withColumn(
            "qgram_cosine",
            F.col("dot") / (F.sqrt(F.col("sq1")) * F.sqrt(F.col("sq2"))),
        )
        .select("id1", "id2", "dot", "sq1", "sq2", "qgram_cosine")
    )


# 2^20 / 2^40: fixed-point scales making Soft TF-IDF exact across engines.
# A power-of-two multiply only shifts the IEEE exponent, so floor(x * 2^k)
# is the same integer everywhere and aggregation becomes exact bigint math
# (no float summation-order dependence) — the same pattern as
# similarity_search.centroid_update.
_STFIDF_W_SCALE = float(1 << 20)
_STFIDF_C_SCALE = float(1 << 40)


def soft_tfidf_pairs(
    records: DataFrame,
    pairs: DataFrame,
    name_col: str,
    id_col: str = "record_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Soft TF-IDF (Cohen, Ravikumar & Fienberg 2003) for candidate pairs
    — the hybrid string similarity that consistently tops ER benchmarks:
    token-level TF-IDF cosine, but tokens match *softly* via a secondary
    similarity (Jaro-Winkler here) at ``threshold``:

        score(s, t) = Σ_{w ∈ CLOSE(s,t)} V'(w,s) · V'(best(w,t),t) · JW(w, best)

    with ``V(w,s) = ln(tf+1) · ln(N/df)`` L2-normalized per record and
    ``best(w,t)`` the t-token maximizing JW (ties to the lexicographically
    smaller token).

    Engine-exact by construction: tf/df/N are integers, the raw weight is
    one fixed expression over them, weights quantize to 2^-20 fixed point
    (integer norm sums), JW comes from the bit-exact kernel/CTE pair, and
    per-pair contributions quantize to 2^-40 before the final integer sum
    — no step depends on float summation order.

    Plan shape: token postings joined to pairs (bounded by pair count ×
    tokens-per-name²), JW computed once per DISTINCT token pair (the
    memoization the repo's kernels apply per batch, lifted to the plan),
    one argmax window, one aggregation. Pairs with no close tokens emit
    score 0.
    """
    from name_matching_spark.functions.udfs import jaro_winkler_udf

    n_records = records.count()
    tok = (
        records.select(
            F.col(id_col).alias("_rid"),
            F.explode(F.split(F.col(name_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("_rid", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = tok.join(dfreq, "token").withColumn(
        "vq",
        F.floor(
            F.log(F.col("tf").cast("double") + F.lit(1.0))
            * F.log(F.lit(float(n_records)) / F.col("df").cast("double"))
            * F.lit(_STFIDF_W_SCALE)
        ).cast("bigint"),
    )
    norms = w.groupBy("_rid").agg(
        F.sum(F.col("vq") * F.col("vq")).alias("sq")
    )
    wn = w.join(norms, "_rid").withColumn(
        "vn",
        F.when(
            F.col("sq") > 0,
            F.col("vq").cast("double") / F.sqrt(F.col("sq").cast("double")),
        ).otherwise(F.lit(0.0)),
    )
    w1 = wn.select(
        F.col("_rid").alias("id1"),
        F.col("token").alias("t1"),
        F.col("vn").alias("vn1"),
    )
    w2 = wn.select(
        F.col("_rid").alias("id2"),
        F.col("token").alias("t2"),
        F.col("vn").alias("vn2"),
    )
    tp = pairs.select("id1", "id2").join(w1, "id1").join(w2, "id2")
    dist = tp.select("t1", "t2").distinct().withColumn(
        "jw", jaro_winkler_udf(F.col("t1"), F.col("t2"))
    )
    scored_tok = tp.join(dist, ["t1", "t2"])
    best_w = Window.partitionBy("id1", "id2", "t1").orderBy(
        F.desc("jw"), F.asc("t2")
    )
    close = (
        scored_tok.withColumn("_bn", F.row_number().over(best_w))
        .filter((F.col("_bn") == 1) & (F.col("jw") >= F.lit(float(threshold))))
        .withColumn(
            "cq",
            F.floor(
                F.col("vn1") * F.col("vn2") * F.col("jw")
                * F.lit(_STFIDF_C_SCALE)
            ).cast("bigint"),
        )
    )
    agg = close.groupBy("id1", "id2").agg(
        F.count(F.lit(1)).alias("n_close"),
        F.sum("cq").alias("_csum"),
    )
    return (
        pairs.select("id1", "id2")
        .join(agg, ["id1", "id2"], "left")
        .select(
            "id1",
            "id2",
            F.coalesce(F.col("n_close"), F.lit(0)).alias("n_close"),
            (
                F.coalesce(F.col("_csum"), F.lit(0)).cast("double")
                / F.lit(_STFIDF_C_SCALE)
            ).alias("soft_tfidf"),
        )
    )


def one_to_one_matching(
    pairs: DataFrame,
    score_col: str = "score",
    id1_col: str = "id1",
    id2_col: str = "id2",
    rounds: int = 3,
    symmetric: bool = False,
    checkpoint: bool = True,
) -> DataFrame:
    """Greedy one-to-one assignment by ITERATED reciprocal best match —
    the scalable relaxation of optimal bipartite assignment (Hungarian is
    inherently sequential; iterated mutual-best is the standard
    distributed greedy and is within a factor 2 of optimal weight). Each
    round keeps the pairs where both endpoints prefer each other
    (:func:`mutual_best_match`), then removes every pair touching a
    matched endpoint; records freed up this way get matched to their
    next-best partner in a later round.

    A FIXED round count (default 3 — round 1 matches the bulk, later
    rounds mop up preference chains) keeps the operator deterministic and
    lets the SQL oracle unroll the same rounds. Ties break by partner id
    ascending, so the assignment is unique in any engine.

    Output: matched pairs with all input columns plus ``round``
    (1-based). Scale shape per round: two window shuffles partitioned by
    a record id plus two anti-joins against the (matched-nodes-sized)
    endpoint set; ``checkpoint`` (default True) localCheckpoints the
    shrinking remainder each round so round r's plan does not re-rank
    rounds 1..r-1 (disable only for tiny inputs).
    """
    out = None
    remaining = pairs
    if checkpoint:
        remaining = remaining.localCheckpoint(eager=False)
    for rnd in range(1, rounds + 1):
        m = mutual_best_match(
            remaining, score_col, id1_col, id2_col, symmetric=symmetric
        )
        if checkpoint:
            m = m.localCheckpoint(eager=False)
        tagged = m.withColumn("round", F.lit(rnd).cast("long"))
        out = tagged if out is None else out.unionByName(tagged)
        if symmetric:
            # one shared id namespace: drop pairs touching either endpoint
            nodes = (
                m.select(F.col(id1_col).alias("_n"))
                .unionAll(m.select(F.col(id2_col).alias("_n")))
                .distinct()
            )
            remaining = remaining.join(
                nodes.withColumnRenamed("_n", id1_col), id1_col, "left_anti"
            ).join(nodes.withColumnRenamed("_n", id2_col), id2_col, "left_anti")
        else:
            # bipartite: the two sides are separate namespaces (possibly
            # different types) — remove each side against its own column
            remaining = remaining.join(
                m.select(id1_col), id1_col, "left_anti"
            ).join(m.select(id2_col), id2_col, "left_anti")
        if checkpoint:
            remaining = remaining.localCheckpoint(eager=False)
    return out
