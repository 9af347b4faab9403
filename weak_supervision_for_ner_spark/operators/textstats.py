"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

Everything is built-in-function SQL (codegen'd, zero Python) so the
DuckDB oracle can reproduce results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Tiny deterministic stopword profiles for n-gram-free language ID.
_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "du"],
}


def _profile_hits(words_col, lang: str):
    profile = F.array(*[F.lit(w) for w in _LANG_PROFILES[lang]])
    return F.size(F.array_intersect(words_col, profile))


def language_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language guess: argmax over per-language hit
    counts of distinct lowercase tokens (greatest + chained when)."""
    df = documents.withColumn(
        "wrds", F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    )
    for lang in _LANG_PROFILES:
        df = df.withColumn(f"hits_{lang}", _profile_hits(F.col("wrds"), lang))
    best = F.greatest(*[F.col(f"hits_{l}") for l in _LANG_PROFILES])
    # deterministic tie-break: alphabetically-first language at the max
    expr = F.lit("und")
    for lang in sorted(_LANG_PROFILES, reverse=True):
        expr = F.when((best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)).otherwise(expr)
    return documents.select("doc_id").join(
        df.select("doc_id", expr.alias("lang_guess")), "doc_id"
    )


def quality_scores(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features per doc: length, token count, mean
    token length, punctuation ratio, stopword ratio, digit ratio,
    uppercase ratio and a composite [0,1] score."""
    stop = F.array(*[F.lit(w) for w in _LANG_PROFILES["en"]])
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chars = F.length(text_col)
    n_tokens = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(F.size(toks))
    n_punct = n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(text_col, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text_col, r"[A-Z]", ""))
    n_stop = F.size(F.array_intersect(F.split(F.lower(F.col(text_col)), r"\s+"), stop))

    df = documents.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4).alias("mean_token_len"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_digit / F.greatest(n_chars, F.lit(1)), 4).alias("digit_ratio"),
        F.round(n_upper / F.greatest(n_chars, F.lit(1)), 4).alias("upper_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
    )
    score = (
        F.when(F.col("n_tokens") >= 5, 0.25).otherwise(0.0)
        + F.when((F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 12), 0.25).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.25).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.05, 0.25).otherwise(0.0)
    )
    return df.withColumn("quality", F.round(score, 2))


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens plus a BPE-ish subword estimate
    (ceil(chars/4) is the classic approximation)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    ws = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(F.size(toks))
    return documents.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        F.ceil(F.length(text_col) / F.lit(4.0)).cast("long").alias("bpe_estimate"),
    )


def form_frequencies(documents: DataFrame, text_col: str = "text",
                     min_count: int = 2) -> DataFrame:
    """Corpus-level casing statistics: for every lowercase form, the
    majority surface casing and counts. This is the Spark-built
    replacement for the reference's static ``form_frequencies.json``
    (spacy_wrapper.py:67-69) feeding the truecasing pass — at scale the
    dictionary is *derived from the corpus itself* with one groupBy,
    then broadcast back."""
    from pyspark.sql import Window

    toks = (
        documents
        .select(F.explode(F.split(F.col(text_col), r"\s+")).alias("form"))
        .filter(F.length("form") > 0)
        .filter(F.col("form").rlike(r"^[A-Za-z]+$"))
    )
    counts = (
        toks.groupBy(F.lower(F.col("form")).alias("lform"), F.col("form"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy("lform").agg(F.sum("n").alias("n_total"))
    w = Window.partitionBy("lform").orderBy(F.desc("n"), F.asc("form"))
    majority = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lform", F.col("form").alias("majority_form"), F.col("n").alias("n_majority"))
    )
    return (
        majority.join(totals, "lform")
        .filter(F.col("n_total") >= min_count)
        .select("lform", "majority_form", "n_majority", "n_total")
    )


def collect_form_frequency_dict(
    documents: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    max_entries: int = 500_000,
) -> dict[str, dict[str, int]]:
    """Driver-side casing dictionary ``{lform: {form: count}}`` feeding
    the truecasing pass (functions/truecase.py) — the corpus-derived
    replacement for the reference's static ``form_frequencies.json``.

    Scale design: the vocabulary of alphabetic forms grows ~O(sqrt)
    with corpus size (Heaps' law), and the collect is capped at
    ``max_entries`` lowercase forms ordered by corpus frequency, so the
    broadcast stays bounded (~tens of MB) even at 100 TB. Forms seen
    fewer than ``min_count`` times carry no reliable casing signal and
    are dropped before the cap.
    """
    toks = (
        documents
        .select(F.explode(F.split(F.col(text_col), r"\s+")).alias("form"))
        .filter(F.length("form") > 0)
        .filter(F.col("form").rlike(r"^[A-Za-z]+$"))
    )
    counts = (
        toks.groupBy(F.lower(F.col("form")).alias("lform"), F.col("form"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    kept = (
        counts.groupBy("lform")
        .agg(
            F.sum("n").alias("n_total"),
            F.map_from_entries(F.collect_list(F.struct("form", "n"))).alias("forms"),
        )
        .filter(F.col("n_total") >= min_count)
        .orderBy(F.desc("n_total"), F.asc("lform"))
        .limit(max_entries)
        .select("lform", "forms")
        .collect()
    )
    return {row["lform"]: dict(row["forms"]) for row in kept}


def fingerprints(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable document fingerprints: full-text md5 plus a
    normalized-content md5 (lowercase, collapsed whitespace) that
    survives formatting changes — the rolling-hash analogue."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return documents.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("md5_exact"),
        F.md5(F.trim(norm)).alias("md5_normalized"),
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data pipeline op: scrub a pretraining corpus
# before tokenization). Pure built-ins — regexp_replace chains run in
# whole-stage codegen, and the patterns stay within the regex subset
# Java (Spark) and RE2 (DuckDB) interpret identically so the driver
# oracle can reproduce the scrub byte-for-byte.
# ---------------------------------------------------------------------------

# applied IN THIS ORDER (emails contain dots that would otherwise feed
# the looser patterns; order must match any reimplementation exactly)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
)


def redact_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails, IPv4 addresses and international-format phone
    numbers from ``text_col``: (doc_id, redacted, n_email, n_ipv4,
    n_phone). Counts are per-doc match counts BEFORE scrubbing, so the
    redaction volume is observable in lineage, never silent.

    One codegen'd projection — no UDF, no shuffle; at 100 TB this is a
    pure map over the corpus scan. The conservative phone pattern
    (+-prefixed, >= 9 digits/separators) trades recall for a near-zero
    false-positive rate on numerics-heavy web text; swap patterns per
    policy, keeping to the Java∩RE2 regex subset if the DuckDB oracle
    must keep certifying the scrub."""
    out = documents.select(F.col("doc_id"), F.col(text_col).alias("redacted"))
    counts = []
    for name, pattern, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all("redacted", F.lit(pattern), F.lit(0)))
            .alias(f"n_{name}")
        )
    # counts computed on the ORIGINAL text (sequentially-scrubbed text
    # would hide overlaps), scrub applied in declared order
    out = out.select("doc_id", "redacted", *counts)
    for name, pattern, token in PII_PATTERNS:
        out = out.withColumn("redacted", F.regexp_replace("redacted", pattern, token))
    return out.select("doc_id", "redacted", "n_email", "n_ipv4", "n_phone")
