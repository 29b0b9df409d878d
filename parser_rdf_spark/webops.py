"""Web-corpus hygiene operators: line-level dedup, PII redaction,
URL/domain stats, and a corpus-trained char-bigram LM quality score.

These extend the LLM-training-data pipeline surface (textops.py) with the
operators a C4/RefinedWeb-style web crawl cleanup needs. Everything is
pure Column/SQL expressions (JVM-side, codegen'd) — no Python UDFs — and
every regex sticks to the Java∩RE2 common dialect (`\\d`, `\\b`, bounded
repetition, plain character classes) so a DuckDB oracle computes
byte-identical results.

Scale notes are per-operator; the common theme is: corpus-wide state
(line first-occurrence, bigram model) is built with a map-side-partial
groupBy (never a window over a skewed key) and joined back, with the
small model sides broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# C4-style corpus-wide line dedup
# ---------------------------------------------------------------------------

def line_dedup(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Corpus-wide line deduplication (the C4 cleanup rule: a line that
    occurs anywhere else in the corpus is kept only at its first
    occurrence, ordered by (doc_id, line position)).

    Returns one row per document: ``doc_id``, ``n_lines``, ``n_kept``,
    and ``clean_text`` (the kept lines re-joined by ``delim`` in their
    original order; empty string when every line was removed).

    Scale shape: posexplode → ONE groupBy(line) with min(struct(doc_id,
    pos)) — partial aggregation collapses hot lines (boilerplate,
    empty lines) map-side, so the frequent-line skew that would sink a
    window-over-line never reaches the shuffle — then one equi-join back
    on line and one groupBy(doc) to reassemble. At 100 TB the line-key
    join is a plain shuffled hash/SMJ with AQE skew split; no driver
    state, no window over a skewed key.
    """
    lines = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), F.lit(delim), -1)).alias("pos", "line"),
    )
    first = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_occ")
    )
    kept = lines.join(first, "line").withColumn(
        "keep", F.struct("doc_id", "pos") == F.col("first_occ")
    )
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            delim,
        ).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Java∩RE2 common-dialect patterns, applied in a FIXED order (email →
# SSN → phone → IPv4) so redaction output is deterministic even when a
# pattern's placeholder could partially feed a later pattern. Counts are
# measured on the ORIGINAL text, per pattern, independently.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def pii_redact(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Detect-and-redact PII spans (emails, SSNs, US phone numbers,
    IPv4 addresses) with per-kind counts.

    Returns ``doc_id``, ``n_email``, ``n_ssn``, ``n_phone``, ``n_ipv4``,
    ``redacted_text``. Pure regexp Column expressions — narrow, no
    shuffle at all; at 100 TB this is a map-only stage that fuses into
    whatever scan precedes it.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat, _ in PII_PATTERNS
    ]
    redacted = F.col(text_col)
    for _, pat, placeholder in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, placeholder.replace("$", "\\$"))
    return documents.select(
        F.col(id_col).alias("doc_id"), *counts, redacted.alias("redacted_text")
    )


# ---------------------------------------------------------------------------
# URL / domain statistics
# ---------------------------------------------------------------------------

_URL_RE = r"https?://[^ \t\n]+"
_HOST_RE = r"^https?://([^/ \t\n]+)"


def url_domain_stats(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-domain URL statistics over the corpus: for every host
    appearing in an ``http(s)://`` URL, the number of URL mentions, the
    number of distinct documents mentioning it, and its TLD.

    Returns ``host``, ``tld``, ``n_urls``, ``n_docs``. Scale shape:
    regexp explode (narrow) → one groupBy(host) with map-side partial
    agg. Host keys follow a Zipf over sites — count_distinct(doc_id)
    keeps partial aggregation effective, and AQE splits a runaway host.
    """
    urls = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(_URL_RE), F.lit(0))
        ).alias("url"),
    ).select(
        "doc_id", F.regexp_extract(F.col("url"), _HOST_RE, 1).alias("host")
    )
    return (
        urls.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .select(
            "host",
            F.regexp_extract(F.col("host"), r"\.([A-Za-z]+)$", 1).alias("tld"),
            "n_urls",
            "n_docs",
        )
    )


# ---------------------------------------------------------------------------
# corpus-trained char-bigram LM quality score
# ---------------------------------------------------------------------------

def char_bigrams(text_col: str) -> F.Column:
    """Array of character bigrams of a string column (length-1 or empty
    strings yield an empty array).

    The short-string guard must be an explicit `if`: Spark's
    ``sequence(1, 0)`` counts DOWN to [1, 0] (unlike DuckDB's empty
    ``generate_series``), which would fabricate two empty bigrams for a
    length-≤1 string."""
    return F.expr(
        f"if(length({text_col}) >= 2, "
        f"transform(sequence(1, length({text_col}) - 1), "
        f"i -> substring({text_col}, i, 2)), "
        f"array())"
    )


def bigram_lm_quality(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Char-bigram language-model score, with the model trained on the
    corpus itself (the standard cheap fluency / gibberish signal: random
    byte soup scores far below in-distribution text).

    Model: P(bigram) = corpus_count / corpus_total. Per-bigram
    log-probabilities are micro-rounded to integers BEFORE summing
    (``round(ln(p)·1e6)``) so the per-document sum is integer arithmetic
    and engine-portable (same discipline as textops.tfidf_top_terms —
    a 1-ulp ln() divergence cannot accumulate across a sum).

    Returns ``doc_id``, ``n_bigrams``, ``sum_logp_micro`` and
    ``avg_logp_micro`` (integer division; 0 for empty docs).

    Scale shape: one explode + groupBy(bigram) builds the model (vocab²
    rows — tiny), broadcast-joined back to the exploded corpus, then one
    groupBy(doc). Two shuffles total plus a broadcast; the model build's
    partial agg collapses each partition to ≤vocab² rows map-side.
    """
    grams = documents.select(
        F.col(id_col).alias("doc_id"), F.explode(char_bigrams(text_col)).alias("bg")
    )
    model = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("bg_count"))
    total = grams.agg(F.count(F.lit(1)).alias("bg_total"))
    scored = grams.join(F.broadcast(model), "bg").crossJoin(F.broadcast(total)).select(
        "doc_id",
        F.round(
            F.log(F.col("bg_count").cast("double") / F.col("bg_total").cast("double"))
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("logp_micro"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("logp_micro").alias("sum_logp_micro"),
    )
    # left join back so zero-bigram docs still get a row
    base = documents.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("sum_logp_micro"), F.lit(0)).alias("sum_logp_micro"),
        # integer `div` (== DuckDB `//`): exact at any sum magnitude,
        # unlike float divide-and-cast
        F.when(F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
               F.expr("sum_logp_micro div n_bigrams"))
        .otherwise(F.lit(0))
        .alias("avg_logp_micro"),
    )
