"""Fellegi-Sunter probabilistic record linkage (m/u weights).

The reference scores pairs with a fixed weighted ensemble
(``src/scorer.py:24-78``); the classical alternative the record-linkage
literature (Fellegi & Sunter 1969) and modern tools build on is
*probabilistic*: for each comparison field estimate

- ``m`` = P(field agrees | pair is a match)
- ``u`` = P(field agrees | pair is a non-match)

and score a pair by the sum of per-field log-likelihood-ratio weights:
``log2(m/u)`` when the field agrees, ``log2((1-m)/(1-u))`` when it
disagrees. Both stages are plain aggregations/joins — no UDFs, two
shuffles total, trivially scale-safe.

Engine-exactness: counts and the Laplace-smoothed probabilities are emitted
as parts-per-million via pure integer arithmetic (``x * 1000000 DIV n`` —
the q09 lesson); the log2 weights are then computed from those exact ppm
integers, so both engines feed bit-identical doubles into log2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "estimate_mu_weights",
    "fs_score_pairs",
    "value_frequency_weights",
    "frequency_weighted_pairs",
    "em_estimate",
    "em_match_probability",
]


def estimate_mu_weights(
    labeled_pairs: DataFrame,
    agreement_cols: list[str],
    label_col: str = "true_label",
) -> DataFrame:
    """Estimate per-field m/u probabilities from labeled candidate pairs.

    ``labeled_pairs``: one row per candidate pair with boolean agreement
    columns and ``label_col`` in {"match", "non-match"}. One aggregation
    computes every field's agreement counts in a single scan (map-side
    partial aggregation; the shuffle carries one partial row per task);
    the result is unpivoted to one row per field.

    Laplace(+1) smoothing keeps every weight finite:
    ``m_ppm = (agree_m + 1) * 1e6 DIV (n_match + 2)`` (same form for u).

    Output: ``field, n_match, n_nonmatch, agree_m, agree_u, m_ppm, u_ppm,
    agree_weight, disagree_weight`` — weights are log2 likelihood ratios.
    """
    is_match = F.col(label_col) == "match"
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    aggs = [
        cnt(is_match).alias("n_match"),
        cnt(~is_match).alias("n_nonmatch"),
    ]
    for c in agreement_cols:
        a = F.col(c)
        aggs.append(cnt(is_match & a).alias(f"_m_{c}"))
        aggs.append(cnt(~is_match & a).alias(f"_u_{c}"))
    counts = labeled_pairs.agg(*aggs)

    stack_expr = "stack({n}, {args}) AS (field, agree_m, agree_u)".format(
        n=len(agreement_cols),
        args=", ".join(f"'{c}', _m_{c}, _u_{c}" for c in agreement_cols),
    )
    long = counts.select("n_match", "n_nonmatch", F.expr(stack_expr))
    m_ppm = F.expr("CAST((agree_m + 1) * 1000000 DIV (n_match + 2) AS BIGINT)")
    u_ppm = F.expr("CAST((agree_u + 1) * 1000000 DIV (n_nonmatch + 2) AS BIGINT)")
    out = long.select(
        "field", "n_match", "n_nonmatch", "agree_m", "agree_u",
        m_ppm.alias("m_ppm"), u_ppm.alias("u_ppm"),
    )
    # weights from the exact ppm integers: identical doubles in any engine.
    # The ppm quantization can floor a probability to 0 (u < 1 ppm happens
    # whenever a rare field agreement meets >1M non-match pairs) — clamp at
    # 1 ppm with INTEGER greatest before the division so every weight stays
    # finite and the clamp itself is engine-exact.
    clamped = lambda c: F.greatest(c, F.lit(1)).cast("double")  # noqa: E731
    return out.select(
        "*",
        F.log2(
            clamped(F.col("m_ppm")) / clamped(F.col("u_ppm"))
        ).alias("agree_weight"),
        F.log2(
            clamped(F.lit(1000000) - F.col("m_ppm"))
            / clamped(F.lit(1000000) - F.col("u_ppm"))
        ).alias("disagree_weight"),
    )


def fs_score_pairs(
    pairs: DataFrame,
    weights: DataFrame,
    agreement_cols: list[str],
) -> DataFrame:
    """Total Fellegi-Sunter log2 weight per pair.

    ``weights`` (one row per field, from :func:`estimate_mu_weights`) is
    collected to the driver — it is ``len(agreement_cols)`` rows — and
    inlined into a single fixed-order column expression, so the sum is
    evaluated left-to-right identically in any engine and the pair frame
    needs no extra join or shuffle.

    Adds ``fs_weight`` (double) and ``fs_match`` (weight > 0).
    """
    w = {r["field"]: (r["agree_weight"], r["disagree_weight"]) for r in weights.collect()}
    missing = [c for c in agreement_cols if c not in w]
    if missing:
        raise ValueError(f"no weights for fields: {missing}")
    total = None
    for c in agreement_cols:
        wa, wd = w[c]
        term = F.when(F.col(c), F.lit(float(wa))).otherwise(F.lit(float(wd)))
        total = term if total is None else total + term
    return pairs.withColumn("fs_weight", total).withColumn(
        "fs_match", (F.col("fs_weight") > 0).cast("int")
    )


def value_frequency_weights(
    records: DataFrame, fields: list[str], id_col: str = "record_id"
) -> DataFrame:
    """Per-field VALUE-SPECIFIC agreement weights (Winkler's refinement of
    global Fellegi-Sunter u-probabilities): agreeing on a rare surname is
    far stronger evidence than agreeing on a frequent one, so the weight
    of an agreement on value ``v`` is ``-log2(u(v))`` with
    ``u(v) = freq(v) / n`` — the probability a random record carries
    ``v``.

    One census aggregation per field, unpivoted to
    ``(field, value, n_value, u_ppm, weight)``. ``u_ppm`` is the exact
    integer parts-per-million (clamped to >= 1 so the weight stays
    finite); ``weight = log2(1e6 / u_ppm)`` is computed from that exact
    integer — identical doubles in any engine. NULL values get no weight
    row (NULL agreement is not evidence).
    """
    n = records.count()
    out = None
    for f in fields:
        census = (
            records.filter(F.col(f).isNotNull())
            .groupBy(F.col(f).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).alias("n_value"))
            .select(
                F.lit(f).alias("field"),
                "value",
                "n_value",
                F.expr(
                    f"greatest(CAST(n_value * 1000000 DIV {n} AS BIGINT), 1)"
                ).alias("u_ppm"),
            )
        )
        out = census if out is None else out.unionAll(census)
    return out.withColumn(
        "weight",
        F.log2(F.lit(1000000.0) / F.col("u_ppm").cast("double")),
    )


def frequency_weighted_pairs(
    records: DataFrame,
    pairs: DataFrame,
    fields: list[str],
    id_col: str = "record_id",
) -> DataFrame:
    """Score candidate pairs by summed value-specific agreement weights.

    Each record is augmented once with its per-field ``u_ppm`` (one
    broadcast-sized census join per field — distinct values, not
    records); a pair earns field ``f``'s weight iff both sides agree on a
    non-null value, in which case both sides carry the SAME census row,
    so only side 1's needs to ride the pair join. Disagreement scores 0
    (the value-specific scheme refines agreement evidence; global
    disagreement weights stay with :func:`estimate_mu_weights`).

    Output: ``id1, id2`` + ``w_<field>`` per field + ``vf_weight``.
    """
    n = records.count()
    aug = records
    for f in fields:
        census = (
            records.filter(F.col(f).isNotNull())
            .groupBy(f)
            .agg(F.count(F.lit(1)).alias("_n"))
            .select(
                F.col(f),
                F.expr(
                    f"greatest(CAST(_n * 1000000 DIV {n} AS BIGINT), 1)"
                ).alias(f"_uppm_{f}"),
            )
        )
        aug = aug.join(F.broadcast(census), f, "left")
    keep = [F.col(id_col)] + [F.col(f) for f in fields] + [
        F.col(f"_uppm_{f}") for f in fields
    ]
    aug = aug.select(*keep)
    s1 = aug.select(
        F.col(id_col).alias("id1"),
        *[F.col(f).alias(f"_{f}_1") for f in fields],
        *[F.col(f"_uppm_{f}").alias(f"_uppm_{f}_1") for f in fields],
    )
    s2 = aug.select(
        F.col(id_col).alias("id2"),
        *[F.col(f).alias(f"_{f}_2") for f in fields],
    )
    j = pairs.select("id1", "id2").join(s1, "id1").join(s2, "id2")
    total = None
    cols = [F.col("id1"), F.col("id2")]
    for f in fields:
        agree = (
            F.col(f"_{f}_1").isNotNull()
            & F.col(f"_{f}_2").isNotNull()
            & (F.col(f"_{f}_1") == F.col(f"_{f}_2"))
        )
        w = F.when(
            agree,
            F.log2(
                F.lit(1000000.0) / F.col(f"_uppm_{f}_1").cast("double")
            ),
        ).otherwise(F.lit(0.0))
        cols.append(w.alias(f"w_{f}"))
        total = w if total is None else total + w
    cols.append(total.alias("vf_weight"))
    return j.select(*cols)


# 2^30: fixed-point scale for EM responsibilities — the engine-exact
# distributed-sum pattern (power-of-two scaling is IEEE-exact; see
# similarity_search.centroid_update). The quantized complement (S - pq)
# stands in for (1 - p): exact in the integer domain, deterministic.
_EM_P_SCALE = 1 << 30


def em_estimate(
    pairs: DataFrame,
    agreement_cols: list[str],
    n_iter: int = 2,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.1,
    weight_col: str | None = None,
) -> DataFrame:
    """UNSUPERVISED Fellegi-Sunter parameter estimation via
    expectation-maximization (the Splink/fastLink core): no labels — the
    two-class mixture over agreement patterns is fit directly.

    E-step: each pair's match responsibility under current parameters,
        p_i = λ·Π_f m-term / (λ·Π_f m-term + (1-λ)·Π_f u-term)
    (independence a la naive Bayes, the standard FS assumption).
    M-step: m_f = Σ p_i·agree / Σ p_i, u_f likewise with (1-p_i), λ = mean p.

    A FIXED iteration count keeps the job deterministic; each iteration is
    one scan + one aggregation (map-side combine — the shuffle carries one
    partial row per task), with responsibilities quantized to 2^-30 fixed
    point so every sum is exact bigint arithmetic and updated parameters
    are single divisions of exact integers — identical doubles in any
    engine, no float summation-order dependence. Parameter scalars ride
    the driver between iterations (2 one-row collects for n_iter=2).

    Scale bound: the bigint sums need ``n_pairs * 2^30 < 2^63`` (~8.6e9
    pairs). Beyond that, estimate on a deterministic blocked sample (the
    standard Splink practice) and apply the parameters to the full pair
    frame with :func:`em_match_probability` (literal inlining — no join).

    ``weight_col``: fit from a GAMMA-PATTERN CENSUS instead of the pair
    stream — ``pairs`` then has one row per distinct agreement pattern
    with its pair count in ``weight_col``. Because the E-step
    responsibility (and its 2^-30 quantization) depends ONLY on the
    pattern, every M-step sum over rows equals the census-weighted sum
    exactly — bit-identical parameters — while each EM iteration scans
    <= 2^|fields| rows instead of the (possibly billions-row) pair frame.
    Build the census once (one groupBy of the pair stream) and fit any
    number of iterations against it.

    Output: one row per field — ``field, m, u, lam, n_pairs`` (+
    ``agree_weight``/``disagree_weight`` log2 likelihood ratios, directly
    usable by :func:`fs_score_pairs`).
    """
    cols = list(agreement_cols)
    m = {f: float(init_m) for f in cols}
    u = {f: float(init_u) for f in cols}
    lam = float(init_lambda)
    n_pairs = None
    S = _EM_P_SCALE

    for _ in range(n_iter):
        pm = F.lit(lam)
        pu = F.lit(1.0 - lam)
        for f in cols:
            pm = pm * F.when(F.col(f), F.lit(m[f])).otherwise(F.lit(1.0 - m[f]))
            pu = pu * F.when(F.col(f), F.lit(u[f])).otherwise(F.lit(1.0 - u[f]))
        p = pm / (pm + pu)
        e = pairs.withColumn(
            "_pq", F.floor(p * F.lit(float(S))).cast("bigint")
        )
        w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
        aggs = [
            F.sum(w).alias("n"),
            F.sum(w * F.col("_pq")).alias("s"),
        ]
        for f in cols:
            a = F.col(f).cast("bigint")
            aggs.append(F.sum(w * F.col("_pq") * a).alias(f"_sm_{f}"))
            aggs.append(F.sum(w * (F.lit(S) - F.col("_pq")) * a).alias(f"_su_{f}"))
        row = e.agg(*aggs).collect()[0]
        n_pairs, s = int(row["n"]), int(row["s"])
        tot_u = n_pairs * S - s
        # Laplace(+1 pseudo-pair, i.e. +S in the quantized domain) keeps
        # every parameter strictly inside (0, 1): a field the blocking key
        # forces to always-agree (e.g. exact-last-name blocks) would
        # otherwise drive m = u = 1 and the log2 weights to 0/0
        for f in cols:
            m[f] = float(row[f"_sm_{f}"] + S) / float(s + 2 * S)
            u[f] = float(row[f"_su_{f}"] + S) / float(tot_u + 2 * S)
        lam = float(s + S) / float(n_pairs * S + 2 * S)

    spark = pairs.sparkSession
    out_rows = [
        (f, m[f], u[f], lam, n_pairs) for f in cols
    ]
    res = spark.createDataFrame(
        out_rows, "field string, m double, u double, lam double, n_pairs long"
    )
    lg = lambda c: F.log2(c)  # noqa: E731
    return res.select(
        "*",
        lg(F.col("m") / F.col("u")).alias("agree_weight"),
        lg((F.lit(1.0) - F.col("m")) / (F.lit(1.0) - F.col("u"))).alias(
            "disagree_weight"
        ),
    )


def em_match_probability(
    pairs: DataFrame,
    params: DataFrame,
    agreement_cols: list[str],
) -> DataFrame:
    """The predict step over EM-estimated parameters (Splink's
    ``predict()``): per-pair posterior match probability under the fitted
    naive-Bayes mixture,

        P(match | pattern) = λ·Π m-term / (λ·Π m-term + (1-λ)·Π u-term).

    ``params`` is :func:`em_estimate` output (one row per field + the
    shared λ) — collected (|fields| rows) and inlined as literals, so the
    pair frame needs no join. The probability is also emitted as an exact
    2^-30 fixed-point integer (``match_ppb``-style), giving a
    deterministic sort/threshold key.
    """
    rows = {r["field"]: r for r in params.collect()}
    missing = [c for c in agreement_cols if c not in rows]
    if missing:
        raise ValueError(f"no EM params for fields: {missing}")
    lam = float(next(iter(rows.values()))["lam"])
    pm = F.lit(lam)
    pu = F.lit(1.0 - lam)
    for f in agreement_cols:
        m = float(rows[f]["m"])
        u = float(rows[f]["u"])
        pm = pm * F.when(F.col(f), F.lit(m)).otherwise(F.lit(1.0 - m))
        pu = pu * F.when(F.col(f), F.lit(u)).otherwise(F.lit(1.0 - u))
    p = pm / (pm + pu)
    return pairs.withColumn(
        "match_probability", p
    ).withColumn(
        "match_q30",
        F.floor(F.col("match_probability") * F.lit(float(_EM_P_SCALE))).cast(
            "bigint"
        ),
    )
