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
# composed cleanup pipeline + attrition accounting
# ---------------------------------------------------------------------------

def _clean_stages(
    documents: DataFrame,
    min_quality: int,
    id_col: str,
    text_col: str,
) -> dict[str, DataFrame]:
    """Shared stage frames for clean_corpus / attrition_report:
    raw → quality gate → PII redact → exact dedup keep-first on the
    redacted text → corpus line dedup (drop emptied docs).

    Exact doc-dedup runs BEFORE line dedup (the C4 ordering): it is the
    cheap whole-doc collapse, and the other order would make it a
    structural no-op — after global line dedup two documents can never
    retain identical line sequences (each line survives exactly once
    corpus-wide)."""
    from parser_rdf_spark import textops

    docs = documents.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    quality = textops.quality_score(docs).select("doc_id", "quality")
    gated = docs.join(
        quality.filter(F.col("quality") >= min_quality), "doc_id"
    )
    redacted = pii_redact(gated).select(
        "doc_id", F.col("redacted_text").alias("text")
    )
    first = redacted.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("first_doc_id")
    )
    unique = (
        redacted.withColumn("text_md5", F.md5("text"))
        .join(first, "text_md5")
        .filter(F.col("doc_id") == F.col("first_doc_id"))
        .drop("text_md5", "first_doc_id")
    )
    deduped = line_dedup(unique)
    nonempty = deduped.filter(F.col("clean_text") != "")
    return {
        "raw": docs,
        "gated": gated,
        "unique": unique,
        "nonempty": nonempty,
        "quality": quality,
    }


def clean_corpus(
    documents: DataFrame,
    min_quality: int = 70,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The composed pretraining-cleanup pipeline, end to end: quality
    gate (integer heuristic ≥ ``min_quality``) → PII redaction → exact
    dedup keeping the lowest doc_id per identical redacted text →
    corpus-wide line dedup (documents whose every line was removed drop
    out).

    Returns surviving documents only: ``doc_id``, ``quality``,
    ``n_lines``, ``n_kept``, ``clean_text``. Each stage is one of the
    already-scale-shaped operators; the composition adds two hash joins
    on doc_id and nothing driver-side, so the whole pipeline stays a
    DAG of narrow maps + keyed aggregates at 100 TB.
    """
    s = _clean_stages(documents, min_quality, id_col, text_col)
    return s["nonempty"].join(s["quality"], "doc_id").select(
        "doc_id", "quality", "n_lines", "n_kept", "clean_text"
    )


def attrition_report(
    documents: DataFrame,
    min_quality: int = 70,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stage data-attrition accounting for the cleanup pipeline:
    one row per stage (``raw``, ``quality_gate``, ``exact_dedup``,
    ``line_dedup``) with surviving ``n_docs`` and ``n_tokens``
    (space-delimited tokens of the stage's text column — newlines do
    NOT split tokens, identically in any SQL engine).

    The observability table every production pipeline keeps: where did
    the corpus go. Four single-row aggregates unioned — each is a
    partial-agg count over an already-needed stage frame.
    """
    s = _clean_stages(documents, min_quality, id_col, text_col)

    def agg(df: DataFrame, stage: str, col: str) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.size(F.split(F.col(col), F.lit(" "), -1))), F.lit(0)
            ).alias("n_tokens"),
        )

    return (
        agg(s["raw"], "raw", "text")
        .unionAll(agg(s["gated"], "quality_gate", "text"))
        .unionAll(agg(s["unique"], "exact_dedup", "text"))
        .unionAll(agg(s["nonempty"], "line_dedup", "clean_text"))
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


_TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid|msclkid|ref|ref_src)="


def canonicalize_urls(
    pages: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
) -> DataFrame:
    """Crawl-level URL canonicalization — the identity step BEFORE any
    url-keyed dedup or grouping: the same page arrives as
    ``HTTP://Example.COM:80/a?utm_source=x&b=2&a=1#frag`` and
    ``http://example.com/a?a=1&b=2``, and without normalization every
    url-keyed operator double-counts it.

    Rules (each a pure Column expression — no UDF, no shuffle):
    scheme and host lowercased; default ports stripped (:80 http,
    :443 https); fragment dropped; tracking parameters removed
    (utm_*, gclid, fbclid, msclkid, ref, ref_src); remaining query
    parameters SORTED (byte order); empty path normalized to '/'.
    Non-URL-shaped values pass through unchanged (returned verbatim in
    ``out_col``), so the column is total."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.expr(f"substring(lower(regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.\\\\-]*://([^/?#]*)', 1)), 1, length(regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.\\\\-]*://([^/?#]*)', 1)) - 3)"),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.expr(f"substring(lower(regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.\\\\-]*://([^/?#]*)', 1)), 1, length(regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.\\\\-]*://([^/?#]*)', 1)) - 4)"),
    ).otherwise(hostport)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(u, r"\?([^#]*)", 1)
    q = F.array_join(
        F.array_sort(F.filter(
            F.split(rawq, "&"),
            lambda x: (x != "") & ~x.rlike(_TRACKING_PARAM_RE),
        )),
        "&",
    )
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return pages.withColumn(
        out_col, F.when(scheme == "", u).otherwise(canon)
    )
