"""Text analysis operators over a documents table — all JVM-side expressions.

Language-ID, quality scoring, token counting, fingerprinting. Every operator
is a deterministic column expression (regexp/split/md5) so the DuckDB oracle
can reproduce it exactly; no UDFs, no model weights.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _is_any(word: Column, values: list[str]) -> Column:
    """OR-chain equality — lambda variables inside higher-order functions
    don't support Column.isin."""
    return reduce(or_, [word == v for v in values])

__all__ = [
    "token_count",
    "bpe_ish_token_stats",
    "quality_features",
    "quality_filter",
    "language_id",
    "fingerprint",
    "bm25_scores",
    "word_ngram_array",
    "ngram_decontaminate",
    "repetition_signals",
    "bigram_novelty",
    "unigram_cross_entropy",
    "bigram_cross_entropy",
    "mixing_weights",
    "tfidf_keywords",
    "chunk_documents",
    "fold_confusables",
    "CONFUSABLES_FROM",
    "CONFUSABLES_TO",
    "pii_scrub",
    "PII_PATTERNS",
    "LANG_MARKERS",
]

# GPT-2-style pre-tokenizer approximation, lookahead-free so the SAME
# pattern runs under Java regex (Spark) and RE2 (DuckDB): contractions,
# optionally-space-prefixed letter runs / digit runs / punctuation runs,
# residual whitespace. (The real GPT-2 pattern's \s+(?!\S) needs lookahead;
# its absence only shifts how trailing whitespace groups, not counts.)
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish proxy: splits on whitespace after
    trimming; empty text -> 0)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", 0).otherwise(F.size(F.split(trimmed, r"\s+")))


def bpe_ish_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token accounting for LLM-corpus budgeting: whitespace tokens AND a
    BPE-ish pre-tokenizer count (``BPE_ISH_PATTERN``, GPT-2-flavored,
    whitespace pieces excluded) per document, plus their ratio (a proxy for
    tokens-per-word expansion). Pure ``regexp_extract_all`` column
    expressions — no tokenizer library, identical under Java regex and
    RE2 so the oracle is exact."""
    # F.lit pattern (not F.expr string-splicing) so backslashes reach the
    # regex engine untouched
    pieces = F.filter(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0)),
        lambda x: F.trim(x) != "",
    )
    bpe = F.size(pieces)
    ws = token_count(F.col(text_col))
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
        (bpe / F.greatest(ws, F.lit(1))).alias("tokens_per_word"),
    )


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality features: length, token count, mean token length,
    punctuation ratio, digit ratio, uppercase ratio, stopword ratio.

    A composite ``quality_score`` in [0,1] penalizes extreme punctuation /
    digit density and very short documents — the usual cheap pre-filter in
    corpus pipelines.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    safe_chars = F.greatest(n_chars, F.lit(1))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_stop = F.size(
        F.filter(
            F.split(F.lower(F.trim(t)), r"\s+"),
            lambda w: _is_any(w, ["the", "a", "an", "and", "or", "of", "to", "in", "is"]),
        )
    )
    punct_ratio = n_punct / safe_chars
    digit_ratio = n_digit / safe_chars
    upper_ratio = n_upper / safe_chars
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    mean_token_len = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(0.0)

    quality = (
        F.lit(1.0)
        - F.least(punct_ratio * 2, F.lit(0.5))
        - F.least(digit_ratio, F.lit(0.3))
        - F.when(n_tokens < 5, 0.2).otherwise(0.0)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_token_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(F.greatest(quality, F.lit(0.0)), 6).alias("quality_score"),
    )


# Deterministic marker-word lists per language (heuristic n-gram/stopword
# lang-ID). Tiny by design: the operator's contract is determinism, not
# linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "es": ["el", "la", "de", "que", "los", "por"],
    "de": ["der", "die", "und", "das", "ist", "mit"],
    "fr": ["le", "la", "les", "des", "est", "avec"],
}


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Argmax over per-language marker-token hit counts; ties and zero hits
    -> "und" (undetermined). Deterministic tie-break: higher count wins,
    then lexicographically smaller language code."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    def _marker_pred(markers: list[str]):
        # single-arg lambda: a second (defaulted) parameter would make
        # F.filter pass the element INDEX into it
        return lambda w: _is_any(w, markers)

    counts = [
        F.size(F.filter(toks, _marker_pred(m))).alias(lang)
        for lang, m in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), F.col(text_col), *counts)
    # argmax via a greatest-chain in lexicographic lang order: a later lang
    # replaces only on STRICTLY greater count, so ties keep the
    # lexicographically smallest language; zero hits keep "und"
    langs = sorted(LANG_MARKERS)
    best_lang = F.lit("und")
    best_count = F.lit(0)
    for lang in langs:
        c = F.col(lang)
        best_lang = F.when(c > best_count, F.lit(lang)).otherwise(best_lang)
        best_count = F.greatest(c, best_count)
    return scored.select(
        F.col(id_col),
        *[F.col(lang).alias(f"hits_{lang}") for lang in langs],
        best_lang.alias("lang_pred"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document fingerprint: md5 of the whitespace/case-normalized text plus
    a sorted-token fingerprint (token-order-insensitive)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    sorted_tokens = F.array_join(F.array_sort(F.split(norm, " ")), " ")
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("content_fingerprint"),
        F.md5(sorted_tokens).alias("token_fingerprint"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance of every document to a bag-of-terms query,
    entirely relational (no UDF):

        score(D, Q) = sum over t in Q of
            idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * |D| / avgdl))
        idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))

    tf counts repeated tokens (the token frame here is NOT distinct);
    |D| is the whitespace token count and avgdl/N come from one broadcast
    one-row aggregate. Shuffle shape: one explode -> groupBy (doc, token),
    one groupBy token for df, one broadcast of the (tiny) query-term
    postings stats, one final groupBy doc. Documents matching no query
    term are absent (score would be 0); raw doubles are emitted (the
    driver gate's %.6f absorbs ln() ULP differences across engines).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("token").agg(F.count("*").alias("df_t"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    scored = (
        tf.join(F.broadcast(df_t), "token")
        .join(dl, id_col)
        .join(F.broadcast(corpus))
        .withColumn(
            "term_score",
            idf
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("term_score").alias("bm25"),
            F.count("*").alias("n_matched_terms"),
        )
    )


def word_ngram_array(text_col: str, n: int):
    """All word ``n``-grams of the whitespace/case-normalized text as ONE
    array column — a single ``regexp_extract_all`` pass with a lookahead
    capture at every word start (the word-level twin of
    ``dedup._shingle_array``; same rationale: the sequence+transform form
    re-evaluates the normalized string per position, O(len^2)). Documents
    with fewer than ``n`` words emit an empty array: they cannot carry an
    ``n``-gram. Java-regex only (lookahead); the DuckDB oracle uses the
    list-slice form over ``string_split``."""
    if n < 1:
        raise ValueError("n must be >= 1")
    norm = f"regexp_replace(trim(lower({text_col})), '\\\\s+', ' ')"
    return F.expr(
        f"regexp_extract_all({norm}, "
        f"'(?=((?:\\\\S+ ){{{n - 1}}}\\\\S+))\\\\S+ ?', 1)"
    )


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    ``n``-gram with an evaluation set (the published corpus-hygiene rule —
    GPT-3 appendix C / PaLM-style 13-gram overlap).

    Emits one row per training document: distinct n-gram count, number of
    those n-grams also present anywhere in the eval set, a 0/1
    ``contaminated`` flag, and the contaminated fraction.

    Scale shape (100 TB corpus, benchmark eval sets are tiny): the eval
    n-gram set is ONE distinct-aggregate then **broadcast** — the
    train-side probe is map-side, no shuffle of the corpus postings; the
    only corpus-wide shuffle is the final groupBy(doc). Set
    ``broadcast_eval=False`` when the eval side is itself huge (falls back
    to a shuffle hash join on the gram key).
    """
    grams = F.array_distinct(word_ngram_array(text_col, n))
    tg = train.select(F.col(id_col), F.explode_outer(grams).alias("gram"))
    eg = (
        eval_df.select(F.explode(grams).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_eval:
        eg = F.broadcast(eg)
    joined = tg.join(eg, "gram", "left")
    agg = joined.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
    )
    return agg.select(
        id_col,
        "n_grams",
        "n_contaminated",
        (F.col("n_contaminated") > 0).cast("int").alias("contaminated"),
        F.when(F.col("n_grams") == 0, F.lit(0.0))
        .otherwise(
            F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double")
        )
        .alias("contamination_frac"),
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1 adapted to word units): total words, fraction held by the
    single most frequent word, fraction of word-bigram instances that are
    repeats, and fraction held by the most frequent bigram. High values
    mark boilerplate/degenerate text for corpus filtering.

    Shuffle shape: two explode -> groupBy(doc, unit) -> groupBy(doc)
    chains joined back on the doc key — every shuffle is keyed by doc_id
    (or (doc_id, unit)), so the plan scales as a per-document rollup with
    no corpus-global state. Documents with no words / no bigrams emit 0.0
    fractions rather than dropping out."""
    norm = F.lower(F.trim(F.col(text_col)))
    toks = (
        df.select(F.col(id_col), F.explode(F.split(norm, r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    wc = toks.groupBy(id_col, "w").agg(F.count("*").alias("c"))
    wagg = wc.groupBy(id_col).agg(
        F.sum("c").alias("n_words"), F.max("c").alias("top_word_n")
    )
    bg = df.select(
        F.col(id_col), F.explode(word_ngram_array(text_col, 2)).alias("g")
    )
    bgc = bg.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    bagg = bgc.groupBy(id_col).agg(
        F.sum("c").alias("n_bigrams"),
        F.count("*").alias("n_distinct_bigrams"),
        F.max("c").alias("top_bigram_n"),
    )

    def _frac(num, den):
        den = F.coalesce(den, F.lit(0))
        return F.when(den == 0, F.lit(0.0)).otherwise(
            F.coalesce(num, F.lit(0)).cast("double") / den.cast("double")
        )

    return (
        df.select(id_col)
        .join(wagg, id_col, "left")
        .join(bagg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            _frac(F.col("top_word_n"), F.col("n_words")).alias("top_word_frac"),
            _frac(
                F.col("n_bigrams") - F.col("n_distinct_bigrams"),
                F.col("n_bigrams"),
            ).alias("dup_bigram_frac"),
            _frac(F.col("top_bigram_n"), F.col("n_bigrams")).alias(
                "top_bigram_frac"
            ),
        )
    )


# PII patterns shared by the engine and the oracle: ASCII-only classes, no
# lookaround, no backrefs — identical semantics under Java regex and RE2.
# Ordered: emails first (an address contains dot-runs an IP pattern could
# otherwise nibble at).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{4}-\d{4}\b", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4 addresses / phone-shaped numbers from a corpus
    (the privacy-scrub pass of a training-data pipeline) and count what was
    removed per category. Pure ``regexp_replace`` / ``regexp_extract_all``
    column expressions inside whole-stage codegen — map-only, no shuffle,
    no UDF; at 100 TB this is a streaming-friendly projection."""
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


def bigram_novelty(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-corpus bigram novelty: the fraction of a document's distinct
    token bigrams that appear in NO other document — a cheap proxy for
    "original content vs boilerplate" (near-zero novelty flags template/
    spun text; the complement of the repetition signals, which are
    within-document).

    Fully relational: positional tokens (posexplode keeps split-array
    ordinality; empty split artifacts are filtered on BOTH engines, so a
    bigram spans two adjacent non-empty positions of the raw split array),
    bigrams by a (doc, pos+1) self-join, document frequency over distinct
    (doc, bigram), one final per-doc aggregation. Pure integers; novelty
    as exact ppm. Documents with fewer than two tokens have no bigrams and
    drop from the output.

    Scale shape: the bigram self-join is keyed on (doc, position) — per-
    document work, no cross-document blowup; the df census shuffles on the
    bigram string (skew bounded by the most common bigram's df, and only
    counts flow, never postings x postings).
    """
    toks = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
    )
    t2 = toks.select(
        F.col(id_col),
        (F.col("pos") - 1).alias("pos"),
        F.col("token").alias("token2"),
    )
    doc_bigrams = (
        toks.join(t2, [id_col, "pos"])
        .select(
            F.col(id_col),
            F.concat_ws(" ", "token", "token2").alias("bigram"),
        )
        .distinct()
    )
    dfreq = doc_bigrams.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("df")
    )
    return (
        doc_bigrams.join(dfreq, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum((F.col("df") == 1).cast("bigint")).alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("CAST(n_novel * 1000000 DIV n_bigrams AS BIGINT)"),
        )
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """Corpus-level line deduplication (CCNet / RefinedWeb-style boilerplate
    removal): a non-empty line whose normalized form (lower + trim) appears
    in >= ``min_df`` DISTINCT documents is boilerplate; every instance of
    it is removed from every document. Complements
    :func:`repetition_signals`, which measures repetition WITHIN one
    document — this operator removes repetition ACROSS documents (cookie
    banners, share widgets, licence footers).

    Output: ``id_col``, ``n_lines`` (original), ``n_removed`` (line
    instances dropped), ``text_dedup`` (surviving lines re-joined in
    original order; '' when everything was boilerplate). Empty /
    whitespace-only lines are document structure, never boilerplate — they
    are exempt from the census and always kept.

    Scale shape: the boilerplate census is one distinct + groupBy keyed by
    the normalized line, the removal is a left-anti join keyed by
    ``md5(norm)`` (16-byte key regardless of line length — the long line
    string never rides a shuffle twice), and reassembly is one
    groupBy(doc) with an in-group sort by line position. No corpus-global
    state, no driver loop; every stage is keyed by line-hash or doc id.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.lower(F.trim("line")))
    boilerplate = (
        lines.filter(F.col("norm") != "")
        .select(id_col, "norm")
        .distinct()
        .groupBy("norm")
        .agg(F.count(F.lit(1)).alias("line_df"))
        .filter(F.col("line_df") >= min_df)
        .select(F.md5("norm").alias("_h"))
    )
    keyed = lines.select(id_col, "pos", "line", F.md5("norm").alias("_h"))
    kept = keyed.join(boilerplate, "_h", "left_anti")
    stats = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_dedup"),
    )
    return (
        df.select(id_col)
        .join(stats, id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.col("n_lines").cast("long").alias("n_lines"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


def unigram_cross_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram-LM cross-entropy quality score (the CCNet/Gopher-style
    perplexity filter, with the n-gram LM reduced to its unigram census so
    it is exactly reproducible in SQL): train a Laplace-smoothed unigram
    model on the corpus itself, then score every document by its per-token
    negative log-likelihood.  Low cross-entropy = stereotypical/boilerplate
    text, high = rare-token noise; quality pipelines keep the middle band.

    p(tok) = (n_tok + 1) / (T + V) over the whitespace-token census
    (lowercased, the q97 Zipf convention), ce = -(1/n) sum ln p, ppl =
    exp(ce).  Documents with no tokens drop from the output.

    Scale shape: one groupBy on (doc, token) with map-side combine, one
    vocabulary-sized census, one join keyed on the token string (counts
    only — postings never cross-multiply), a 1-row totals broadcast, and a
    per-doc reaggregation.  O(tokens) end to end; the census join's skew is
    bounded by the hottest token's document count, not its occurrence
    count, because doc-local counts are pre-combined.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    doc_tok = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("k"))
    census = doc_tok.groupBy("token").agg(F.sum("k").alias("n"))
    totals = census.agg(
        F.sum("n").alias("_t"), F.count(F.lit(1)).alias("_v")
    )
    logp = F.log(
        (F.col("n").cast("double") + F.lit(1.0))
        / (F.col("_t") + F.col("_v")).cast("double")
    )
    per_doc = (
        doc_tok.join(census, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("_nt"),
            F.sum(F.col("k") * logp).alias("_slp"),
        )
    )
    ce = -(F.col("_slp") / F.col("_nt").cast("double"))
    return per_doc.select(
        F.col(id_col),
        F.col("_nt").cast("long").alias("n_tokens"),
        ce.alias("cross_entropy_nats"),
        F.exp(ce).alias("perplexity"),
    )


def mixing_weights(
    df: DataFrame,
    domain_cols: tuple = ("lang", "source"),
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled domain sampling weights — the data-mixing step of
    a pretraining pipeline (multilingual/multi-source rebalancing a la
    exponential smoothing: w_d ∝ n_d^alpha, alpha < 1 upsamples the tail,
    alpha = 1 is natural sampling).  Per domain: document and token counts,
    the natural token share (exact ppm), the normalized sampling weight,
    and the boost factor (weight / natural share — >1 means the domain is
    upsampled).

    Scale shape: one map-side-combined aggregation to domain granularity
    (the census is domains-sized, tiny), a 1-row totals broadcast, and a
    final narrow projection.  The only float reductions are over the domain
    census, so cross-engine summation-order drift is bounded by the domain
    count, not the corpus size.
    """
    toks = token_count(F.col(text_col))
    dom = df.groupBy(*[F.col(c) for c in domain_cols]).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    scaled = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    tot = dom.agg(
        F.sum("n_tokens").alias("_t"), F.sum(scaled).alias("_s")
    )
    weight = scaled / F.col("_s")
    return dom.crossJoin(F.broadcast(tot)).select(
        *[F.col(c) for c in domain_cols],
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr("CAST(n_tokens * 1000000 DIV _t AS BIGINT)").alias("natural_ppm"),
        weight.alias("sample_weight"),
        (weight * F.col("_t").cast("double") / F.col("n_tokens").cast("double")).alias(
            "boost"
        ),
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Per-document keyword extraction: the ``top_k`` tokens by tf·idf
    (idf = ln(N/df), the classic unsmoothed form — a corpus-wide token
    scores 0 and never surfaces). Ties break (score desc, token asc), so
    the ranking is unique in any engine. The summarization/labeling step a
    corpus pipeline runs after dedup.

    Scale shape: one (doc, token) groupBy with map-side combine, one
    vocabulary-sized df census joined back on the token string, a 1-row
    count broadcast, and a per-doc window over that doc's distinct tokens
    (bounded by doc vocabulary, not corpus size).
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * F.log(F.col("_n").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            id_col,
            F.col("rank").cast("long").alias("rank"),
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking — the embedding-preparation step
    of a RAG/retrieval pipeline: chunk k covers token positions
    [k*stride, k*stride + chunk_tokens) of the whitespace token sequence,
    so consecutive chunks overlap by ``chunk_tokens - stride`` tokens and
    no boundary sentence is lost.

    Requires ``stride <= chunk_tokens < 2*stride`` so every token belongs
    to at most two chunks — each token then EMITS its one or two chunk ids
    directly (k = p DIV stride, plus k-1 when p % stride < overlap), a
    narrow map with no range join and no per-doc quadratic stage; chunk
    reassembly is one (doc, chunk)-keyed aggregation with in-order
    concat (the line-dedup convention).

    Output: (doc_id, chunk_id, n_tokens, chunk_text); documents shorter
    than one chunk yield a single chunk 0.
    """
    if not stride <= chunk_tokens < 2 * stride:
        raise ValueError("need stride <= chunk_tokens < 2*stride")
    overlap = chunk_tokens - stride
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
        ).alias("p", "tok"),
    )
    k = F.expr(f"CAST(p DIV {stride} AS BIGINT)")
    assigned = toks.select(
        id_col,
        "p",
        "tok",
        F.explode(
            F.when(
                (F.col("p") % stride < overlap) & (F.col("p") >= stride),
                F.array(k - 1, k),
            ).otherwise(F.array(k))
        ).alias("chunk_id"),
    )
    return (
        assigned.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        .select(id_col, "chunk_id", "n_tokens", "chunk_text")
    )

# Unicode confusables (homoglyphs) that survive NFKC — the dedup-evasion
# characters a normalization pass must fold BEFORE hashing: Cyrillic and
# Greek look-alikes of Latin letters. NFKC (batch_standardize) handles
# fullwidth/compatibility forms; it does NOT fold these.
CONFUSABLES_FROM = "\u0430\u0435\u043e\u0440\u0441\u0445\u0443\u0391\u0392\u0395\u039f\u03bf"
CONFUSABLES_TO = "aeopcxyABEOo"


def fold_confusables(col: Column) -> Column:
    """Fold common Cyrillic/Greek homoglyphs onto their Latin look-alikes
    (codepoint-for-codepoint ``translate`` — identical semantics in Spark
    and DuckDB). Run after NFKC standardization and before any
    content-hash dedup: a single swapped а/a defeats md5 dedup while being
    invisible to a reader."""
    return F.translate(col, CONFUSABLES_FROM, CONFUSABLES_TO)



def quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style composite KEEP/DROP verdict — the actual filtering
    decision on top of :func:`quality_features`, with every rule stated as
    an INTEGER cross-multiplication so no float threshold can diverge
    between engines:

      R1 token count in [5, 10000]
      R2 mean token length in [2, 12]   (non-whitespace chars vs 2n..12n)
      R3 punctuation <= 20% of chars    (n_punct * 5 <= n_chars)
      R4 digits <= 20% of chars         (n_digit * 5 <= n_chars)
      R5 stopwords >= 2% of tokens      (n_stop * 50 >= n_tokens)

    Verdict = the FIRST failing rule's name ('keep' if none) — ordered
    evaluation, so the report doubles as a drop-reason census. One narrow
    map, no shuffle.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_stop = F.size(
        F.filter(
            F.split(F.lower(F.trim(t)), r"\s+"),
            lambda w: _is_any(
                w, ["the", "a", "an", "and", "or", "of", "to", "in", "is"]
            ),
        )
    )
    # token character count measured directly (strip ALL whitespace) —
    # n_chars - (n_tokens - 1) assumes exactly one separator char per gap
    # and none leading/trailing, inflating mean token length on documents
    # with runs of spaces or newlines (r4 advice item)
    token_chars = F.length(F.regexp_replace(t, r"\s", ""))
    verdict = (
        F.when((n_tokens < 5) | (n_tokens > 10000), "token_count")
        .when(
            (token_chars < 2 * n_tokens) | (token_chars > 12 * n_tokens),
            "mean_token_length",
        )
        .when(n_punct * 5 > n_chars, "punctuation")
        .when(n_digit * 5 > n_chars, "digits")
        .when(n_stop * 50 < n_tokens, "stopwords")
        .otherwise("keep")
    )
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        verdict.alias("verdict"),
        (verdict == "keep").cast("int").alias("kept"),
    )


def bigram_cross_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram-LM cross-entropy — the q113 unigram filter upgraded to the
    2-gram conditional the CCNet-style perplexity filter actually
    approximates: p(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V), trained on the
    corpus itself with add-one smoothing (c(w1·) = occurrences of w1 as a
    non-final token, V = unigram vocabulary size). Per doc:
    ce = -(1/n_bigrams) sum ln p over its bigram stream; documents with
    fewer than two tokens drop.

    Relational end to end: positional tokens, bigrams by the (doc, pos+1)
    self-join (the bigram_novelty idiom), corpus censuses keyed on the
    bigram/token strings, a 1-row totals broadcast, one per-doc
    reaggregation. O(tokens); census-join skew bounded by the hottest
    bigram's doc count (doc-local counts pre-combine).
    """
    toks = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("pos", "w1"),
        )
        .filter(F.col("w1") != "")
    )
    nxt = toks.select(
        F.col(id_col),
        (F.col("pos") - 1).alias("pos"),
        F.col("w1").alias("w2"),
    )
    doc_bg = (
        toks.join(nxt, [id_col, "pos"])
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    c12 = doc_bg.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t")
        )
        .filter(F.col("t") != "")
        .agg(F.count_distinct("t").alias("_v"))
    )
    logp = F.log(
        (F.col("c12").cast("double") + F.lit(1.0))
        / (F.col("c1") + F.col("_v")).cast("double")
    )
    per_doc = (
        doc_bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("_nb"),
            F.sum(F.col("k") * logp).alias("_slp"),
        )
    )
    ce = -(F.col("_slp") / F.col("_nb").cast("double"))
    return per_doc.select(
        F.col(id_col),
        F.col("_nb").cast("long").alias("n_bigrams"),
        ce.alias("cross_entropy_nats"),
        F.exp(ce).alias("perplexity"),
    )
