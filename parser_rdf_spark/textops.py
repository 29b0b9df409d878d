"""Training-data pipeline operators over a documents/embeddings corpus.

Beyond the reference's operator set, a 100-TB KG/webtext pipeline needs
dedup, similarity search, and text analysis as first-class operators.
Everything here is pure Column/SQL expressions (JVM-side, codegen'd)
except SimHash, which uses a vectorized Arrow pandas_udf for 64-bit
bit-voting (awkward as 64 SQL aggregates, natural in numpy).

Operator inventory:
- exact dedup: md5-hash groupBy (one shuffle, partial agg)
- near-dup: MinHash+LSH (see linking.minhash_lsh_blocking), SimHash,
  word-n-gram Jaccard verification on candidate pairs
- similarity: brute-force cosine top-k (baseline) and LSH-bucketed
  candidate scoring (scale path)
- text analysis: token stats, integer-arithmetic quality score,
  marker-based language ID, md5 fingerprints

Scale notes: all groupBys key on doc_id/hash (high cardinality, no skew);
the brute-force ANN is a deliberate small-dim crossJoin baseline — the
LSH path is the one that survives 100×.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Exact-duplicate groups by md5(text): (text_md5, n_docs, first_doc_id)."""
    return (
        documents.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


def dedup_keep_first(documents: DataFrame) -> DataFrame:
    """Exact dedup keeping the lowest doc_id per identical text."""
    return (
        documents.withColumn("text_md5", F.md5("text"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text_md5")
    )


def substring_dup_windows(
    documents: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr-style duplicate-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    k-token span occurring verbatim in more than one document is a
    duplicate span. The paper's suffix array is a single-machine
    structure; the distributed equivalent is window-hash matching at
    k-token granularity — emit every k-token sliding window, keep the
    windows present in ≥2 DISTINCT documents (cross-document semantics;
    a doc repeating itself is not a corpus duplicate), and report per
    document how much of it is duplicated elsewhere.

    Returns (doc_id, n_windows, dup_windows, first_dup_pos) for
    documents with ≥1 duplicated window; ``first_dup_pos`` is the
    0-based token offset where the earliest duplicated window starts
    (the removal cut point a cleaner would use).

    Scale shape: explode(sequence) fans each doc into ~n_tokens rows —
    corpus-token weight class, same as line_dedup — keyed by xxhash64 of
    the window text (8 bytes, never the string) into ONE groupBy with
    min/max partial agg (hot boilerplate windows collapse map-side; the
    dup test is min(doc)≠max(doc), cheaper and fully combinable vs a
    count-distinct sketch), then one semi-join back and one groupBy(doc).
    No window-function over a skewed key, no driver state.
    """
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
        ).alias("t"),
    ).filter(F.size("t") >= k)
    wins = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.size("t") - k)).alias("pos"),
        "t",
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.xxhash64(F.concat_ws(" ", F.slice("t", F.col("pos") + 1, k))).alias("h"),
    )
    shared = (
        wins.groupBy("h")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("h")
    )
    dup = wins.join(shared, "h", "left_semi").select("doc_id", "pos")
    per_doc = dup.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dup_windows"),
        F.min("pos").alias("first_dup_pos"),
    )
    # true span extents (round 5): maximal spans from the same dup
    # relation — n_spans + total covered tokens per doc
    span_doc = _merge_spans(dup, k).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
    )
    totals = toks.select(
        "doc_id", (F.size("t") - k + 1).cast("long").alias("n_windows")
    )
    return (
        totals.join(per_doc, "doc_id").join(span_doc, "doc_id")
        .select("doc_id", "n_windows", "dup_windows", "first_dup_pos",
                "n_spans", "dup_tokens")
    )


def _merge_spans(dup_positions: DataFrame, k: int) -> DataFrame:
    """Merge duplicated k-window start positions into MAXIMAL spans per
    document (sequence-gap grouping over sorted positions — the
    sessionize discipline): window at ``pos`` covers tokens
    ``[pos, pos+k-1]``, and two windows chain into one span iff the gap
    between starts is ≤ k (overlapping or exactly adjacent coverage).
    Returns (doc_id, span_start, span_end, n_windows) with INCLUSIVE
    token bounds.

    Scale shape: the only window function partitions by doc_id — per-doc
    work is bounded by that document's token count, never corpus-sized,
    so skew is capped by the longest single document (the same bound the
    parse stage already carries)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        dup_positions
        .withColumn(
            "new_span",
            F.coalesce(
                (F.col("pos") - F.lag("pos").over(w)) > k, F.lit(True)
            ).cast("int"),
        )
        .withColumn("span_id", F.sum("new_span").over(w))
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("span_id")
    )


def substring_dup_spans(
    documents: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated spans (round 5 ExactSubstr refinement):
    :func:`substring_dup_windows` reports window COUNTS; this reports
    the true extents Lee et al.'s suffix-array method would — every
    run of overlapping/adjacent cross-document duplicated k-windows
    merged into one maximal span, with its exact text sliced back out
    of the token array (byte-exact against the oracle).

    Returns (doc_id, span_start, span_end, n_windows, span_text):
    inclusive 0-based token bounds, the number of k-windows merged into
    the span, and the span's text (tokens joined by single spaces).

    Scale shape: the window-hash dup relation of
    :func:`substring_dup_windows` (ONE map-combinable groupBy on
    xxhash64), then :func:`_merge_spans`' per-doc gap merge and one
    equi-join back to the token arrays to slice the text — output-sized
    beyond the shared window scan."""
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
        ).alias("t"),
    ).filter(F.size("t") >= k)
    wins = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.size("t") - k)).alias("pos"),
        "t",
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.xxhash64(F.concat_ws(" ", F.slice("t", F.col("pos") + 1, k))).alias("h"),
    )
    shared = (
        wins.groupBy("h")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("h")
    )
    dup = wins.join(shared, "h", "left_semi").select("doc_id", "pos")
    spans = _merge_spans(dup, k)
    return spans.join(toks, "doc_id").select(
        "doc_id", "span_start", "span_end", "n_windows",
        F.concat_ws(
            " ",
            F.slice(
                "t",
                F.col("span_start") + 1,
                F.col("span_end") - F.col("span_start") + 1,
            ),
        ).alias("span_text"),
    )


def substring_dedup_clean(
    documents: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CLEANING half of ExactSubstr dedup (Lee et al. 2022): remove
    every k-token span that occurs verbatim elsewhere in the corpus,
    keeping the GLOBAL FIRST occurrence — the earliest (doc_id, window
    position) — of each duplicated window. Documents shorter than k
    tokens pass through untouched.

    Returns (doc_id, n_tokens, n_kept, clean_text): tokens covered by
    any removed window are dropped and the survivors re-joined by a
    single space in original order (tokenization is whitespace-
    collapsing, so re-joining is the canonical form of what it keeps).

    Scale shape: the window relation of :func:`substring_dup_windows`
    (corpus-token weight), ONE min-struct groupBy per window hash
    (keep-first exactly like webops.line_dedup's line rule — partial agg
    collapses hot boilerplate), an equi-join back, then an explode of
    the REMOVED windows' k positions (bounded by k × removed, not by
    corpus size) anti-joined against the token relation, and one
    groupBy(doc) to reassemble via sort_array — no window function over
    any skewed key, no driver state."""
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
        ).alias("t"),
    )
    long_docs = toks.filter(F.size("t") >= k)
    wins = long_docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.size("t") - k)).alias("pos"),
        "t",
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.xxhash64(F.concat_ws(" ", F.slice("t", F.col("pos") + 1, k))).alias("h"),
    )
    first = wins.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_occ"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    )
    removed = (
        wins.join(first, "h")
        # duplicated across ≥2 docs AND not the global first occurrence
        .filter((F.col("lo") != F.col("hi"))
                & (F.struct("doc_id", "pos") != F.col("first_occ")))
        .select("doc_id", "pos")
    )
    covered = removed.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("tok_pos"),
    ).distinct()
    tokens = toks.select(
        "doc_id",
        F.posexplode("t").alias("tok_pos", "token"),
    ).withColumn("tok_pos", F.col("tok_pos").cast("long"))
    kept = tokens.join(covered, ["doc_id", "tok_pos"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("tok_pos", "token"))),
                lambda s: s["token"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return (
        totals.join(reassembled, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    candidates: DataFrame | None = None,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Word-n-gram Jaccard similarity for near-dup verification.

    With ``candidates`` (id_a, id_b — e.g. from MinHash-LSH blocking) this
    verifies only the candidate pairs (the scale path); without, it
    brute-forces all pairs (test/baseline path). Jaccard is computed
    JVM-side on distinct n-gram arrays.
    """
    grams = documents.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, greatest(1, size(split({text_col}, ' ')) - {n - 1})), "
                f"i -> array_join(slice(split({text_col}, ' '), i, {n}), ' '))"
            )
        ).alias("grams"),
    )
    a = grams.select(F.col("id").alias("id_a"), F.col("grams").alias("grams_a"))
    b = grams.select(F.col("id").alias("id_b"), F.col("grams").alias("grams_b"))
    if candidates is not None:
        pairs = candidates.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return (
        pairs.withColumn("n_inter", inter)
        .withColumn("n_union", union)
        .withColumn("jaccard", F.col("n_inter") / F.col("n_union"))
        .filter(F.col("jaccard") >= threshold)
        # n_inter/n_union let callers derive exact integer similarity
        # (n_inter*10000 div n_union) — float-free oracle comparisons
        .select("id_a", "id_b", "jaccard", "n_inter", "n_union")
    )


def simhash(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens (vectorized pandas_udf:
    per-token 64-bit hashes vote on each bit; sign of the vote vector is
    the fingerprint). Near-dups have small Hamming distance."""

    @F.pandas_udf(LongType())
    def _simhash(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import hashlib

        import numpy as np

        shifts = np.arange(64, dtype=np.uint64)

        for s in texts:
            tok_lists = [t.split() for t in s.fillna("")]
            n_docs = len(tok_lists)
            lens = np.fromiter((len(tl) for tl in tok_lists), dtype=np.int64, count=n_docs)
            total = int(lens.sum())
            if total == 0:
                yield pd.Series(np.zeros(n_docs, dtype=np.int64))
                continue
            flat = np.empty(total, dtype=object)
            pos = 0
            for tl in tok_lists:
                flat[pos : pos + len(tl)] = tl
                pos += len(tl)
            # hash each UNIQUE token once per batch (web text repeats its
            # vocabulary heavily, so the Python-side blake2b loop runs on
            # |vocab| ≪ |tokens| items). pd.factorize is a C hash table —
            # NOT np.unique, whose object-dtype sort would do O(T log T)
            # Python string comparisons.
            codes, uniq = pd.factorize(flat, sort=False)
            uh = np.fromiter(
                (
                    int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
                    for t in uniq
                ),
                dtype=np.uint64,
                count=len(uniq),
            )
            hs = uh[codes]
            starts = np.cumsum(lens) - lens
            nz = lens > 0
            starts_nz = starts[nz]
            # per-bit 1-D reduceat: 64 contiguous C passes (shift, mask,
            # segment-sum). Benchmarked ~50× faster than the obvious
            # unpackbits + 2-D axis-0 reduceat, whose strided row
            # reduction is pathologically slow in numpy.
            ones = np.zeros((n_docs, 64), dtype=np.int64)
            for j in range(64):
                ones[nz, j] = np.add.reduceat((hs >> np.uint64(j)) & np.uint64(1), starts_nz)
            # vote_j > 0  ⟺  2·(count of 1-bits) > n_tokens
            fps = ((2 * ones > lens[:, None]).astype(np.uint64) << shifts).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.Series(fps.view(np.int64), dtype="int64")

    return documents.select(F.col(id_col).alias("doc_id"), _simhash(F.col(text_col)).alias("simhash"))


def simhash_near_dups(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on
    ``max_hamming + 1`` bit-bands: a pair within distance d ≤ max_hamming
    differs in at most d bands (pigeonhole), so it shares at least one —
    the band count DERIVES from the threshold, keeping recall exact for
    any max_hamming up to 63 (a 64-bit fingerprint supports at most 64
    bands; beyond that the guarantee is impossible and we raise)."""
    if max_hamming >= 64:
        raise ValueError("max_hamming must be < 64 for a 64-bit SimHash")
    n_bands = max_hamming + 1
    width = max(64 // n_bands, 1)
    sh = simhash(documents)
    if n_bands == 1:
        bands = [F.col("simhash")]
    else:
        bands = [
            F.expr(
                f"(simhash >> {b * width}) & "
                f"{(1 << (64 - b * width)) - 1 if b == n_bands - 1 else (1 << width) - 1}"
            )
            for b in range(n_bands)
        ]
    banded = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*bands)).alias("band", "key"),
    )
    a = banded.select(F.col("band").alias("b1"), F.col("key").alias("k1"),
                      F.col("doc_id").alias("id_a"), F.col("simhash").alias("s1"))
    b = banded.select(F.col("band").alias("b2"), F.col("key").alias("k2"),
                      F.col("doc_id").alias("id_b"), F.col("simhash").alias("s2"))
    pairs = (
        a.join(b, (F.col("b1") == F.col("b2")) & (F.col("k1") == F.col("k2"))
               & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", F.bit_count(F.expr("s1 ^ s2")).alias("hamming"))
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

def _cosine(a: str, b: str) -> F.Column:
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)")
    na = F.expr(f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))")
    nb = F.expr(f"sqrt(aggregate({b}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))")
    return dot / (na * nb)


def ann_bruteforce_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, neighbor_id, rank). The
    baseline path — O(Q×N) crossJoin with JVM-side fold arithmetic; use
    :func:`ann_lsh_topk` at scale."""
    from pyspark.sql.window import Window

    qs = (queries if queries is not None else embeddings).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    base = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        qs.crossJoin(base)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine("qv", "nv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _lsh_buckets(
    embeddings: DataFrame,
    n_planes: int,
    id_col: str,
    vec_col: str,
    seed: int,
    n_tables: int = 1,
) -> DataFrame:
    """Random-hyperplane LSH signatures → (id, v, table, bucket), one row
    per (vector, table). Deterministic planes derived from
    blake2b(seed, table, plane, dim) — no rand(), resume-safe.

    ``n_tables`` is OR-amplification: each table hashes with its own
    ``n_planes`` independent hyperplanes, and downstream joins union the
    per-table collisions. A pair with cosine angle θ collides in one
    table with p^n_planes (p = 1 − θ/π) but in ≥1 of L tables with
    1 − (1 − p^n_planes)^L — the standard construction that keeps recall
    high for genuinely-similar pairs while each table stays selective.
    Single-table (L=1) hyperplane LSH has near-zero recall for anything
    but extreme cosine; measured in the ann_lsh_recall contract query.
    """
    dim_df = embeddings.select(F.size(vec_col).alias("d")).first()
    d = dim_df["d"]
    # deterministic pseudo-random plane matrix as a SQL literal array
    import hashlib

    def h(*xs) -> float:
        raw = hashlib.blake2b("-".join(map(str, xs)).encode(), digest_size=8).digest()
        return (int.from_bytes(raw, "big") / 2**63) - 1.0  # [-1, 1)

    table_sigs = []
    for t in range(n_tables):
        planes = [[h(seed, t, p, i) for i in range(d)] for p in range(n_planes)]
        planes_sql = "array(" + ", ".join(
            "array(" + ", ".join(f"{v}D" for v in row) + ")" for row in planes
        ) + ")"
        table_sigs.append(
            F.expr(
                f"aggregate(transform({planes_sql}, pl -> "
                f"CASE WHEN aggregate(zip_with(pl, {vec_col}, (p, v) -> p * cast(v as double)), 0D, (a, x) -> a + x) >= 0 THEN 1L ELSE 0L END), "
                f"0L, (acc, b) -> acc * 2 + b)"
            )
        )
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.posexplode(F.array(*table_sigs)).alias("table", "bucket"),
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 1,
) -> DataFrame:
    """Scale path: random-hyperplane LSH bucketing, then exact cosine only
    within buckets. The candidate set shrinks O(N²) → O(L·N²/2^planes).

    Use ``n_tables`` > 1 (OR-amplification) for usable recall: a
    high-cosine neighbor missed by one table's planes is caught by
    another's. Candidates are deduped across tables BEFORE scoring so
    each surviving pair pays the cosine exactly once."""
    from pyspark.sql.window import Window

    bucketed = _lsh_buckets(embeddings, n_planes, id_col, vec_col, seed, n_tables)
    a = bucketed.select("table", "bucket", F.col("id").alias("query_id"))
    b = bucketed.select("table", "bucket", F.col("id").alias("neighbor_id"))
    cand = (
        a.join(b, ["table", "bucket"])  # equi-join ⇒ shuffle keyed on (table, bucket)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vecs = embeddings.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    scored = (
        cand.join(vecs.withColumnRenamed("_vid", "query_id").withColumnRenamed("_v", "qv"), "query_id")
        .join(vecs.withColumnRenamed("_vid", "neighbor_id").withColumnRenamed("_v", "nv"), "neighbor_id")
        .withColumn("cosine", _cosine("qv", "nv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_iters: int = 8,
) -> DataFrame:
    """IVF-flat ANN: a Lloyd's-iteration coarse quantizer partitions
    vectors into ``n_lists`` inverted lists; each query scores exact
    cosine only against the ``n_probe`` nearest lists. The classic
    alternative to LSH bucketing — recall degrades gracefully with
    n_probe, and the per-query candidate set is ~n_probe/n_lists of the
    corpus. Centroids broadcast (tiny); the probe join keys on list id,
    a high-cardinality-enough key at real n_lists (#lists ~ sqrt(N)).

    The quantizer is DETERMINISTIC and partition-independent (so the
    same corpus always yields the same lists, a resume/audit property
    KMeans with float partial sums cannot give): init picks the
    ``n_lists`` vectors with the smallest ``xxhash64(id, seed)``, and
    each Lloyd iteration recomputes centroids from INTEGER-quantized
    coordinates (``floor(vn*1e6 + 0.5)`` as long) whose sums are exact
    and associative — no float partial-aggregation order dependence.
    At web scale run the quantizer on a hash-sample of the corpus (the
    standard IVF recipe); assignment/probing below is a full pass either
    way."""
    from pyspark.sql.window import Window

    # cluster on L2-NORMALIZED vectors: for unit vectors, squared L2
    # distance is 2 − 2·cosine, so the Lloyd partition matches the
    # cosine metric the probe step ranks by (un-normalized input would
    # cluster by magnitude, not direction)
    normed = (
        f"transform({vec_col}, x -> cast(x as double) / "
        f"sqrt(aggregate({vec_col}, 0D, (a, y) -> a + cast(y as double) * cast(y as double))))"
    )
    feat = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.expr(normed).alias("vn"),
    ).persist()

    # deterministic init: the n_lists vectors with smallest xxhash64(id, seed)
    init_rows = (
        feat.select("id", "vn", F.xxhash64(F.col("id"), F.lit(seed).cast("long")).alias("hk"))
        .orderBy("hk", "id")
        .limit(n_lists)
        .collect()
    )
    centers = [list(map(float, r.vn)) for r in init_rows]

    def _dist_sq(vec_col_name: str, center: list[float]) -> F.Column:
        c_sql = "array(" + ", ".join(f"{x}D" for x in center) + ")"
        return F.expr(
            f"aggregate(zip_with({c_sql}, {vec_col_name}, (c, x) -> (c - cast(x as double)) * (c - cast(x as double))), 0D, (a, d) -> a + d)"
        )

    # Lloyd's iterations: assign to argmin centroid, recompute centroids
    # from exact integer sums (one small shuffle per iteration; centroids
    # come back to the driver — n_lists × dim values — like PageRank's
    # loop-carried rank vector)
    for _ in range(n_iters):
        dists = F.array(*[_dist_sq("vn", c) for c in centers])
        assigned_it = feat.select(
            dists.alias("dists"),
            F.expr(
                "transform(vn, x -> cast(floor(x * 1000000D + 0.5D) as long))"
            ).alias("q"),
        ).select(
            F.expr("CAST(array_position(dists, array_min(dists)) AS INT) - 1").alias("list_id"),
            "q",
        )
        sums = (
            assigned_it.select("list_id", F.posexplode("q").alias("dim", "qv"))
            .groupBy("list_id", "dim")
            .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_centers = [list(c) for c in centers]  # empty lists keep previous
        by_list: dict[int, list] = {}
        for r in sums:
            by_list.setdefault(r.list_id, []).append(r)
        for lid, rows in by_list.items():
            for r in rows:
                new_centers[lid][r.dim] = float(r.s) / float(r.n) / 1000000.0
        centers = new_centers
    feat.unpersist()

    dists = F.array(*[_dist_sq("vn", c) for c in centers])
    # inverted-list assignment = argmin distance; probe lists = n_probe smallest
    assigned = feat.select("id", "v", dists.alias("dists")).select(
        "id", "v",
        F.expr("CAST(array_position(dists, array_min(dists)) AS INT) - 1").alias("list_id"),
        "dists",
    )
    base = assigned.select(F.col("list_id").alias("b_list"), F.col("id").alias("neighbor_id"), F.col("v").alias("nv"))
    probes = assigned.select(
        "id", "v",
        F.explode(
            F.expr(
                f"transform(slice(array_sort(transform(dists, (d, i) -> struct(d AS d, i AS i))), 1, {n_probe}), s -> s.i)"
            )
        ).alias("p_list"),
    ).select(F.col("id").alias("query_id"), F.col("v").alias("qv"), "p_list")
    scored = (
        probes.join(base, (F.col("p_list") == F.col("b_list")) & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("cosine", _cosine("qv", "nv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    seed: int = 42,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b) with
    cosine ≥ threshold, id_a < id_b.

    Baseline path (``n_planes=None``): all-pairs crossJoin with JVM-side
    fold arithmetic — exact, O(N²), the DuckDB-oracle surface. Scale
    path: pass ``n_planes`` to pre-block pairs with ``n_tables``
    OR-amplified random-hyperplane LSH tables (a cosine-θ pair shares a
    bucket in ≥1 table with 1 − (1 − p^planes)^tables, p = 1 − θ/π);
    candidates are deduped across tables, then checked with the exact
    cosine. At threshold 0.95 / 8 planes / 8 tables the catch
    probability is ≥0.98 while random pairs thin by ~2^planes per
    table; measured by the embedding_near_dup_lsh contract query."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if n_planes is None:
        pairs = (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", _cosine("va", "vb"))
        )
    else:
        bucketed = _lsh_buckets(embeddings, n_planes, id_col, vec_col, seed, n_tables)
        pa = bucketed.select("table", "bucket", F.col("id").alias("id_a"))
        pb = bucketed.select("table", "bucket", F.col("id").alias("id_b"))
        cand = (
            pa.join(pb, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        vecs = embeddings.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
        pairs = (
            cand.join(vecs.withColumnRenamed("_vid", "id_a").withColumnRenamed("_v", "va"), "id_a")
            .join(vecs.withColumnRenamed("_vid", "id_b").withColumnRenamed("_v", "vb"), "id_b")
            .withColumn("cosine", _cosine("va", "vb"))
        )
    return pairs.filter(F.col("cosine") >= threshold).select("id_a", "id_b")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, avg_token_len_x100) — all
    integers so a SQL oracle hashes identically."""
    toks = F.split(F.col("text"), " ")
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (
            (F.length("text") - F.size(toks) + 1) * 100 / F.size(toks)
        ).cast("long").alias("avg_token_len_x100"),
    )


_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_stats(documents: DataFrame) -> DataFrame:
    """BPE-ish regex token counting (letter runs / digit runs / single
    symbols — the shape GPT-2-style pre-tokenizers split on), alongside
    the class breakdown. All JVM-side regexp_extract_all; counts are the
    pre-tokenizer upper bound on BPE token count."""
    def n(pat: str) -> F.Column:
        # F.lit pattern column — no SQL string-literal escape mangling
        return F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))

    return documents.select(
        "doc_id",
        n(_BPE_ISH).alias("n_bpe_tokens"),
        n("[A-Za-z]+").alias("n_word_tokens"),
        n("[0-9]+").alias("n_number_tokens"),
        n(r"[^A-Za-z0-9\s]").alias("n_symbol_tokens"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Integer-arithmetic quality heuristic (0-100): length band +
    stopword-ratio band + repetition band. Deliberately int-only so the
    DuckDB oracle is bit-identical."""
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    n_distinct = F.size(F.array_distinct(toks))
    length_band = F.when(F.length("text") >= 200, 40).when(F.length("text") >= 50, 25).otherwise(5)
    stop_band = F.when(n_stop >= 2, 30).when(n_stop >= 1, 15).otherwise(0)
    distinct_band = (n_distinct * 30 / F.greatest(n_tokens, F.lit(1))).cast("long")
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopword_types"),
        (length_band + stop_band + distinct_band).cast("long").alias("quality"),
    )


_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "es": ["el", "que", "los"],
    "fr": ["le", "les", "des"],
    "zh": ["的", "是", "了"],
}


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-token language guess: the language with the most marker hits
    wins (ties → 'und'). A deliberately simple, SQL-expressible heuristic
    — the production path would plug a real model in via mapInPandas."""
    toks = F.array_distinct(F.split(F.col("text"), " "))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in ms]))).alias(f"s_{lang}")
        for lang, ms in _LANG_MARKERS.items()
    ]
    df = documents.select("doc_id", "lang", *scores)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{l}") for l in langs])
    guess = F.lit("und")
    for l in reversed(langs):  # earlier languages win ties
        guess = F.when((F.col(f"s_{l}") == best) & (best > 0), F.lit(l)).otherwise(guess)
    return df.select("doc_id", "lang", guess.alias("lang_guess"))


def fingerprints(documents: DataFrame) -> DataFrame:
    """Document fingerprints: full-text md5 + normalized md5 (lower+trim,
    whitespace-collapsed) — the exact-dup and near-normalization keys."""
    return documents.select(
        "doc_id",
        F.md5("text").alias("md5_exact"),
        F.md5(F.regexp_replace(F.lower(F.trim("text")), "\\s+", " ")).alias("md5_normalized"),
    )


def tfidf_top_terms(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by TF-IDF.

    Tokens are ASCII `[A-Za-z]+` runs, lowercased — extracted from the
    RAW text so Spark and any SQL oracle tokenize byte-identically
    (Unicode lowercasing differs across engines; ASCII lowering doesn't).
    score = tf · ln(N/df) with N = number of documents; ``score_micro``
    is the score rounded at 1e-6 so ranking and comparison are integer
    arithmetic (ln() may differ by 1 ulp across engines, which the
    micro-rounding absorbs). Rank orders by (score_micro DESC, term ASC)
    — fully deterministic.

    Scale shape: explode → two key-hashed aggs (tf on (doc, term), df on
    term) → one shuffle join on term → one window by doc. N is kept
    distributed via a broadcast 1-row crossJoin, not a driver collect.
    High-df stopwords get ln(N/df) → 0 and fall out of the top-k
    naturally; no skewed groupBy key exceeds corpus document frequency.
    """
    from pyspark.sql.window import Window

    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(f"transform(regexp_extract_all({text_col}, '[A-Za-z]+', 0), t -> lower(t))")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")) * F.lit(1000000.0)
            )
            .cast("long")
            .alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score_micro", "rank")
    )


# ---------------------------------------------------------------------------
# pipeline hygiene: decontamination, repetition signals, deterministic sampling
# ---------------------------------------------------------------------------

def _word_ngrams(text_col: str, n: int) -> F.Column:
    """Distinct word-n-gram array (space tokens). Documents shorter than
    ``n`` tokens contribute their truncated grams (slice clamps at the
    array end) — the same edge semantics as ngram_jaccard_pairs, and
    mirrored exactly by the DuckDB oracle's 1-based inclusive list slice."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(1, size(split({text_col}, ' ')) - {n - 1})), "
            f"i -> array_join(slice(split({text_col}, ' '), i, {n}), ' '))"
        )
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of its
    distinct word-n-grams appear anywhere in a held-out benchmark set.

    Returns (doc_id, n_grams, n_hit, contaminated) — the standard
    pretraining-hygiene gate (any shared n-gram ⇒ drop or audit the doc).

    Scale shape: the benchmark gram set is tiny relative to a 100-TB
    corpus (eval suites are MBs), so it is distinct-ed once and
    broadcast; the corpus side explodes distinct grams and does a
    broadcast left join + one doc_id-keyed aggregation — no corpus-side
    shuffle besides the final high-cardinality groupBy. Pass
    ``broadcast_benchmark=False`` to fall back to a shuffle join if the
    "benchmark" is itself huge (cross-corpus leakage checks).
    """
    doc_grams = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_ngrams(text_col, n)).alias("gram"),
    )
    bench = benchmark.select(F.explode(_word_ngrams(text_col, n)).alias("gram")).distinct()
    bench = bench.withColumn("_hit", F.lit(1))
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    return (
        doc_grams.join(bench, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
        .withColumn("contaminated", (F.col("n_hit") > 0).cast("int"))
    )


def repetition_stats(documents: DataFrame, n: int = 2) -> DataFrame:
    """Gopher-style within-document repetition signals:
    (doc_id, n_tokens, top_token_frac_x10000, dup_ngram_frac_x10000).

    - top_token_frac: occurrences of the single most frequent space-token
      over total tokens (boilerplate/spam marker);
    - dup_ngram_frac: 1 - distinct/total word-n-grams — the fraction of
      n-gram slots that repeat an earlier n-gram.

    Both are returned as integer x10000 (floor) so a SQL oracle hashes
    identically. Scale shape: the token path is explode → (doc_id, token)
    count → doc_id max/sum (two key-hashed partial-agg shuffles, no skew
    beyond document length); the n-gram path is a pure Column expression
    (no explode) joined back on doc_id.
    """
    toks = documents.select(
        F.col("doc_id"),
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    )
    tok_stats = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tokens"), F.max("c").alias("top_c"))
    )
    grams_all = F.expr(
        f"transform(sequence(1, greatest(1, size(split(text, ' ')) - {n - 1})), "
        f"i -> array_join(slice(split(text, ' '), i, {n}), ' '))"
    )
    gram_stats = documents.select(
        "doc_id",
        F.size(grams_all).alias("_g_total"),
        F.size(F.array_distinct(grams_all)).alias("_g_distinct"),
    )
    return (
        tok_stats.join(gram_stats, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            # `div` (exact integer floor division) — not `/` + cast, whose
            # double rounding can disagree with a SQL oracle's `//`
            F.expr("top_c * 10000 div n_tokens").alias("top_token_frac_x10000"),
            F.expr("(_g_total - _g_distinct) * 10000 div _g_total").alias(
                "dup_ngram_frac_x10000"
            ),
        )
    )


def hash_sample(
    documents: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic hash sampling: keep rows whose md5(key || salt)
    4-hex-digit prefix falls below floor(fraction * 65536).

    Unlike df.sample(), this is (a) stable across runs, partitionings and
    engines (md5 of the decimal key string is engine-portable), (b) a
    pure filter — no shuffle, pushed past column pruning, (c) coordinated:
    the same key draws the same verdict in every table it appears in, so
    sampled fact/dim tables stay joinable. Salt gives independent draws.
    Granularity is 1/65536; fraction >= 1 keeps everything.
    """
    if fraction >= 1.0:
        return documents
    thr = format(max(0, int(fraction * 65536)), "04x")
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    return documents.filter(F.substring(F.md5(key), 1, 4) < F.lit(thr))


def stratified_sample(
    documents: DataFrame,
    fractions: dict,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic hash sampling (e.g. rebalance languages
    or sources in a pretraining mix): ``fractions`` maps stratum value →
    keep fraction; strata not listed keep ``default_fraction``.

    Same md5-prefix draw as hash_sample, so it is a single narrow filter
    (no shuffle, no per-stratum passes) and the draw for a key is
    independent of its stratum — changing the mix never reshuffles which
    rows survive within a stratum.
    """
    hexpfx = F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 4)

    def thr(frac: float) -> str:
        return format(max(0, min(65536, int(frac * 65536))), "04x") if frac < 1.0 else "zzzz"

    cond = F.lit(thr(default_fraction))
    for value, frac in sorted(fractions.items(), reverse=True):
        cond = F.when(F.col(stratum_col) == value, F.lit(thr(frac))).otherwise(cond)
    return documents.filter(hexpfx < cond)


def mixture_report(documents: DataFrame, strata: tuple = ("lang", "source")) -> DataFrame:
    """Pretraining-mix report: per stratum combination, document and
    (space-)token counts plus basis-point shares of the corpus
    (doc_share_bp, token_share_bp — integer x10000 floor division, so a
    SQL oracle hashes identically).

    Scale shape: one partial-agg groupBy over the strata (low
    cardinality, map-side combined), then the grand totals join back as
    a broadcast of a single row — no second scan, no single-partition
    window (the `SUM() OVER ()` formulation a SQL engine uses would
    funnel everything through one task at 100 TB).
    """
    per = documents.groupBy(*[F.col(c) for c in strata]).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    totals = per.agg(
        F.sum("n_docs").alias("_td"), F.sum("n_tokens").alias("_tt")
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            *strata,
            "n_docs",
            "n_tokens",
            F.expr("n_docs * 10000 div _td").alias("doc_share_bp"),
            F.expr("n_tokens * 10000 div _tt").alias("token_share_bp"),
        )
    )


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into token-bounded overlapping chunks — the
    standard pretraining/embedding prep step. Chunk ``i`` covers space
    tokens ``[i*step, i*step + chunk_tokens)`` with
    ``step = chunk_tokens - overlap``; chunks are emitted while their
    start lies inside the document, so the final chunk may be short and
    every document yields at least one chunk.

    Returns (doc_id, chunk_id, chunk_text, n_tokens). Pure Column
    expressions: a sequence() of chunk starts posexploded JVM-side — the
    token array is built once per row, no UDF, no shuffle (chunking is a
    narrow map; downstream groupBys key on doc_id/chunk_id).
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be > 0")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    starts = F.expr(
        f"sequence(0, int(floor((size(split({text_col}, ' ')) - 1) / {step})))"
    )
    exploded = documents.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_t"),
        F.posexplode(starts).alias("chunk_id", "_i"),
    )
    piece = F.slice(F.col("_t"), F.col("_i") * step + 1, chunk_tokens)
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def sq8_quantize(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Per-dimension int8 scalar quantization — the ANN memory path: a
    float32 corpus shrinks 4× (100 TB of embeddings stops fitting long
    before compute runs out). Returns ``(params, codes)``: ``params`` is
    ONE row of (mins, scales) double arrays, ``codes`` is (id, codes)
    with each component mapped to 0..255 by the corpus-wide per-dimension
    range. Fully deterministic — no sampling, no RNG.

    Scale shape: one posexplode + D-row aggregate for the ranges (D =
    embedding width), a broadcast of the 1-row params, and a narrow
    transform for the codes — no shuffle on the corpus itself."""
    stats = (
        embeddings.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min(F.col("x").cast("double")).alias("mn"),
             F.max(F.col("x").cast("double")).alias("mx"))
    )
    params = stats.agg(
        F.expr("transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)"
               ).alias("mins"),
        F.expr("transform(array_sort(collect_list(struct(pos, mx, mn))), "
               "s -> greatest(s.mx - s.mn, cast(1e-12 as double)))").alias("scales"),
    )
    codes = embeddings.crossJoin(F.broadcast(params)).select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, (x, i) -> "
            "cast(round((cast(x as double) - mins[i]) / scales[i] * 255.0) as int))"
        ).alias("codes"),
    )
    return params, codes


def ann_sq8_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over the int8-quantized corpus: the
    CORPUS is stored as codes and dequantized on the fly; queries stay
    full-precision (standard ADC — halves the quantization noise in the
    dot product vs symmetric code-to-code). Same output contract as
    :func:`ann_bruteforce_topk`; compose with the LSH/IVF blockers to
    bound the candidate set when N is large."""
    params, codes = sq8_quantize(embeddings, id_col=id_col, vec_col=vec_col)
    deq = codes.crossJoin(F.broadcast(params)).select(
        F.col(id_col),
        F.expr(
            "transform(codes, (c, i) -> "
            "cast(mins[i] + (c / 255.0) * scales[i] as float))"
        ).alias(vec_col),
    )
    return ann_bruteforce_topk(
        deq, queries=queries if queries is not None else embeddings,
        k=k, id_col=id_col, vec_col=vec_col,
    )
