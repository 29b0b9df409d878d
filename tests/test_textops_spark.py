"""Near-dup operators: embedding-cosine pairs and SimHash Hamming pairs."""

import pytest

from parser_rdf_spark import textops


@pytest.fixture(scope="module")
def emb(spark):
    # 0 and 1 identical; 2 nearly identical to 0; 3 orthogonal
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_near_dup_bruteforce(spark, emb):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in textops.embedding_near_dup(emb, threshold=0.99).collect()
    }
    assert pairs == {(0, 1), (0, 2), (1, 2)}


def test_embedding_near_dup_lsh_blocks_identical_vectors(spark, emb):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in textops.embedding_near_dup(emb, threshold=0.99, n_planes=6).collect()
    }
    # identical vectors always share every hyperplane side ⇒ same bucket
    assert (0, 1) in pairs
    assert pairs <= {(0, 1), (0, 2), (1, 2)}


def test_ann_ivf_full_probe_equals_exact(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in textops.ann_bruteforce_topk(emb, k=2).collect()
    }
    # probing every inverted list == exhaustive search
    full = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in textops.ann_ivf_topk(emb, k=2, n_lists=4, n_probe=4).collect()
    }
    assert full == exact
    # partial probe: a valid top-k per query, recall below-but-near exact
    part = textops.ann_ivf_topk(emb, k=2, n_lists=4, n_probe=2).collect()
    per_q = {}
    for r in part:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2] for v in per_q.values())


def test_simhash_near_dups_finds_edited_doc(spark):
    base = " ".join(f"tok{i}" for i in range(200))
    edited = base.replace("tok42", "tok42x")
    other = " ".join(f"zzz{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(0, base), (1, edited), (2, other)], "doc_id long, text string"
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in textops.simhash_near_dups(docs, max_hamming=8).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_vectorized_matches_per_token_reference(spark):
    """The batched/vocab-deduped SimHash must be bit-identical to the
    straightforward per-token definition (64-bit blake2b per token, bits
    vote, sign of vote is the fingerprint)."""
    import hashlib

    def reference_simhash(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        votes = [0] * 64
        for tok in toks:
            h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        fp = 0
        for i in range(64):
            if votes[i] > 0:
                fp |= 1 << i
        # two's-complement into int64 (Spark LongType)
        return fp - (1 << 64) if fp >= (1 << 63) else fp

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, ""),
        (2, "single"),
        (3, "repeat repeat repeat repeat different"),
        (4, "unicode tökens über ますこと mixed in"),
        (5, "  leading and   multiple   spaces  "),
        (6, "the quick brown fox jumps over the lazy cat"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in textops.simhash(df).collect()}
    want = {i: reference_simhash(t) for i, t in docs}
    assert got == want


def test_tfidf_top_terms_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry apple DATE date, date!"),
        ],
        "doc_id long, text string",
    )
    out = textops.tfidf_top_terms(docs, k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tf, r.score_micro))
    for v in by_doc.values():
        v.sort()
    # ln(3/2)*1e6 = 405465.108..., ln(3)*1e6 = 1098612.288...
    assert by_doc[1] == [(1, "apple", 2, 810930), (2, "banana", 1, 405465)]
    assert by_doc[2] == [(1, "banana", 1, 405465), (2, "cherry", 1, 405465)]
    # date: case-folded + punctuation-split, tf=3, df=1 -> 3*ln(3)
    assert by_doc[3] == [
        (1, "date", 3, 3295837),
        (2, "apple", 1, 405465),
        (3, "cherry", 1, 405465),
    ]


def test_decontaminate_flags_shared_ngrams(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words nothing shared here at all"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox keeps appearing in benchmarks")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.decontaminate(train, bench, n=3).collect()}
    # doc 1 shares exactly one distinct 3-gram: "quick brown fox"
    assert got[1]["contaminated"] == 1 and got[1]["n_hit"] == 1
    assert got[1]["n_grams"] == 7  # 9 tokens -> 7 trigrams, all distinct
    assert got[2]["contaminated"] == 0 and got[2]["n_hit"] == 0
    # sub-n doc contributes its truncated gram, no hit
    assert got[3]["n_grams"] == 1 and got[3]["contaminated"] == 0


def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),      # top token 3/4; bigrams [a a, a a, a b] -> 1 dup of 3
            (2, "x y z"),        # no repetition
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.repetition_stats(docs, n=2).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["top_token_frac_x10000"] == 7500
    assert got[1]["dup_ngram_frac_x10000"] == 3333
    assert got[2]["top_token_frac_x10000"] == 3333
    assert got[2]["dup_ngram_frac_x10000"] == 0


def test_hash_sample_deterministic_and_coordinated(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    a = sorted(r["doc_id"] for r in textops.hash_sample(docs, 0.25).collect())
    b = sorted(r["doc_id"] for r in textops.hash_sample(docs, 0.25).collect())
    assert a == b  # stable across runs
    assert 20 <= len(a) <= 80  # ~50 of 200 expected
    # a larger fraction strictly contains the smaller one (same draw)
    big = sorted(r["doc_id"] for r in textops.hash_sample(docs, 0.5).collect())
    assert set(a) <= set(big)
    assert sorted(r["doc_id"] for r in textops.hash_sample(docs, 1.0).collect()) == list(range(200))
    # salting changes the draw
    c = sorted(r["doc_id"] for r in textops.hash_sample(docs, 0.25, salt="s1").collect())
    assert c != a


def test_stratified_sample_respects_per_stratum_fractions(spark):
    rows = [(i, "t", "en" if i % 2 == 0 else "de") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = textops.stratified_sample(docs, {"en": 1.0, "de": 0.0}, stratum_col="lang")
    got = [r["lang"] for r in out.collect()]
    assert len(got) == 200 and set(got) == {"en"}
    # unlisted strata keep default_fraction
    out2 = textops.stratified_sample(docs, {}, stratum_col="lang", default_fraction=1.0)
    assert out2.count() == 400


def test_mixture_report_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1"),   # 3 tokens
            (2, "d e", "en", "s1"),     # 2 tokens
            (3, "f g h i j", "de", "s2"),  # 5 tokens
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r["lang"], r["source"]): r
        for r in textops.mixture_report(docs).collect()
    }
    en = got[("en", "s1")]
    de = got[("de", "s2")]
    assert en["n_docs"] == 2 and en["n_tokens"] == 5
    assert de["n_docs"] == 1 and de["n_tokens"] == 5
    assert en["doc_share_bp"] == 6666 and de["doc_share_bp"] == 3333
    assert en["token_share_bp"] == 5000 and de["token_share_bp"] == 5000


def test_chunk_documents_hand_traced(spark):
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x")], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in textops.chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    )
    # step 3: starts at tokens 0, 3, 6; final chunk short; doc 2 -> one chunk
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "d e f g", 4),
        (1, 2, "g", 1),
        (2, 0, "x", 1),
    ]
    with _pytest.raises(ValueError):
        textops.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_sq8_quantize_reconstruction_error(spark):
    from parser_rdf_spark.textops import sq8_quantize

    emb = spark.createDataFrame(
        [(i, [float(i) / 10.0, -1.0 + i * 0.2, 42.0]) for i in range(11)],
        "vec_id bigint, embedding array<float>",
    )
    params, codes = sq8_quantize(emb)
    [p] = params.collect()
    assert p.mins == [0.0, -1.0, 42.0]
    rows = {r.vec_id: r.codes for r in codes.collect()}
    assert rows[0] == [0, 0, 0] and rows[10] == [255, 255, 0]
    # every code reconstructs within half a quantization step
    for i, cs in rows.items():
        orig = [i / 10.0, -1.0 + i * 0.2, 42.0]
        for d in range(3):
            approx = p.mins[d] + cs[d] / 255.0 * p.scales[d]
            step = p.scales[d] / 255.0
            assert abs(approx - orig[d]) <= step / 2 + 1e-9


def test_ann_sq8_topk_finds_planted_twin(spark):
    import math

    from parser_rdf_spark.textops import ann_bruteforce_topk, ann_sq8_topk

    def unit(seed, d=8):
        vals = [math.sin(seed * 31 + j * 7) for j in range(d)]
        n = math.sqrt(sum(v * v for v in vals))
        return [float(v / n) for v in vals]

    rows = [(i, unit(i)) for i in range(20)]
    rows += [(100 + i, [float(v + 0.01) for v in unit(i)]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    sq = {r.query_id: r.neighbor_id
          for r in ann_sq8_topk(emb, k=1).filter("query_id >= 100").collect()}
    bf = {r.query_id: r.neighbor_id
          for r in ann_bruteforce_topk(emb, k=1).filter("query_id >= 100").collect()}
    assert sq == bf == {100 + i: i for i in range(5)}


def test_substring_dup_windows_planted_span(spark):
    from parser_rdf_spark.textops import substring_dup_windows

    shared = " ".join(f"w{i}" for i in range(6))          # a 6-token span
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),      # span at pos 2
            (2, f"{shared} tail1 tail2 tail3 tail4"),     # span at pos 0
            (3, "totally unrelated words only here now"), # no dup
            (4, "short doc"),                             # < k tokens: excluded
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in substring_dup_windows(docs, k=6).collect()}
    assert set(out) == {1, 2}
    # doc 1: 10 tokens → 5 windows; only the one starting at the span dups
    assert out[1].n_windows == 5 and out[1].dup_windows == 1
    assert out[1].first_dup_pos == 2
    assert out[2].n_windows == 5 and out[2].dup_windows == 1
    assert out[2].first_dup_pos == 0


def test_substring_dup_windows_within_doc_repeat_not_flagged(spark):
    from parser_rdf_spark.textops import substring_dup_windows

    span = " ".join(f"x{i}" for i in range(4))
    docs = spark.createDataFrame(
        [(1, f"{span} mid1 mid2 {span}"), (2, "other words here beyond four")],
        "doc_id bigint, text string",
    )
    # the repeat is inside ONE doc: cross-document semantics → no rows
    assert substring_dup_windows(docs, k=4).count() == 0


def test_substring_dedup_clean_keeps_global_first(spark):
    from parser_rdf_spark.textops import substring_dedup_clean

    span = " ".join(f"w{i}" for i in range(4))
    docs = spark.createDataFrame(
        [
            (1, f"{span} a1 a2"),          # first occurrence (doc 1, pos 0)
            (2, f"b1 {span} b2"),          # later occurrence → removed
            (3, "unrelated words here x"), # untouched
            (4, "tiny"),                   # < k: untouched, passes through
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in substring_dedup_clean(docs, k=4).collect()}
    assert out[1].clean_text == f"{span} a1 a2"          # keep-first
    assert out[2].clean_text == "b1 b2"                  # span cut
    assert out[2].n_tokens == 6 and out[2].n_kept == 2
    assert out[3].clean_text == "unrelated words here x"
    assert out[4].clean_text == "tiny" and out[4].n_kept == 1


def test_substring_dedup_clean_overlapping_windows(spark):
    from parser_rdf_spark.textops import substring_dedup_clean

    # doc 2 shares a 5-token run → two overlapping 4-windows in doc 2;
    # covered positions must union, not double-remove
    run = "r0 r1 r2 r3 r4"
    docs = spark.createDataFrame(
        [(1, f"{run} x y"), (2, f"p {run} q")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in substring_dedup_clean(docs, k=4).collect()}
    assert out[1].clean_text == f"{run} x y"
    assert out[2].clean_text == "p q"
    assert out[2].n_kept == 2


def test_substring_dup_spans_merges_maximal(spark):
    """Round 5 (VERDICT task 5): overlapping/adjacent duplicated windows
    merge into ONE maximal span with byte-exact bounds + text; disjoint
    duplicated regions stay separate spans."""
    from parser_rdf_spark.textops import substring_dup_spans

    run = " ".join(f"w{i}" for i in range(8))   # 8-token shared run
    tail = " ".join(f"z{i}" for i in range(6))  # second, disjoint 6-run
    docs = spark.createDataFrame(
        [
            # doc 1: filler(4) + run(8) + filler(5) + tail(6)
            (1, "a b c d " + run + " p q r s t " + tail),
            (2, run + " other tokens here only"),
            (3, "unrelated start here " + tail),
        ],
        "doc_id long, text string",
    )
    spans = {(r.doc_id, r.span_start, r.span_end): r
             for r in substring_dup_spans(docs, k=4).collect()}
    # doc 1: run occupies tokens 4..11 → 5 overlapping 4-windows
    # (starts 4..8) merged into ONE span; tail occupies 17..22 →
    # 3 windows (17..19) merged into a SECOND span
    assert set(spans) == {(1, 4, 11), (1, 17, 22),
                          (2, 0, 7), (3, 3, 8)}
    assert spans[(1, 4, 11)].n_windows == 5
    assert spans[(1, 4, 11)].span_text == run
    assert spans[(1, 17, 22)].span_text == tail
    assert spans[(2, 0, 7)].span_text == run
    assert spans[(3, 3, 8)].span_text == tail


def test_substring_dup_windows_span_rollup(spark):
    """n_spans / dup_tokens agree with the maximal-span merge."""
    from pyspark.sql import functions as F

    from parser_rdf_spark.textops import (substring_dup_spans,
                                          substring_dup_windows)

    run = " ".join(f"w{i}" for i in range(8))
    tail = " ".join(f"z{i}" for i in range(6))
    docs = spark.createDataFrame(
        [
            (1, "a b c d " + run + " p q r s t " + tail),
            (2, run + " other tokens here only"),
            (3, "unrelated start here " + tail),
        ],
        "doc_id long, text string",
    )
    w = {r.doc_id: r for r in substring_dup_windows(docs, k=4).collect()}
    assert w[1].n_spans == 2 and w[1].dup_tokens == (11 - 4 + 1) + (22 - 17 + 1)
    assert w[2].n_spans == 1 and w[2].dup_tokens == 8
    assert w[3].n_spans == 1 and w[3].dup_tokens == 6
    # rollup law vs the span relation itself
    sp = substring_dup_spans(docs, k=4).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("tok")).collect()
    for r in sp:
        assert w[r.doc_id].n_spans == r.n
        assert w[r.doc_id].dup_tokens == r.tok


def test_substring_clean_cuts_exactly_the_maximal_spans(spark):
    """Clean-op law re-pin (round 5): for a document holding NO global-
    first occurrence, the removed token set is EXACTLY the union of its
    maximal duplicated spans — span-shaped cuts, not window-rounded."""
    from parser_rdf_spark.textops import (substring_dedup_clean,
                                          substring_dup_spans)

    run = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, run + " early unique suffix tokens"),        # global first
            (2, "late doc prefix " + run + " trailing bits"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_dedup_clean(docs, k=4).collect()}
    spans = [r for r in substring_dup_spans(docs, k=4).collect()
             if r.doc_id == 2]
    assert len(spans) == 1 and (spans[0].span_start, spans[0].span_end) == (3, 10)
    toks = ("late doc prefix " + run + " trailing bits").split()
    expect = [t for i, t in enumerate(toks) if not 3 <= i <= 10]
    assert out[2].clean_text == " ".join(expect)
    assert out[2].n_kept == len(expect)
    # the global-first doc is untouched
    assert out[1].n_kept == out[1].n_tokens
