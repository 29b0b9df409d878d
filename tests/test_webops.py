"""Unit tests for the web-corpus hygiene operators (webops.py) on small
hand-computed frames — the contract queries cover the corpus-scale DuckDB
equivalence; these pin the edge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from parser_rdf_spark import webops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# line_dedup


def test_line_dedup_first_occurrence_wins(spark):
    rows = [
        (1, "alpha\nshared\nbeta"),
        (2, "shared\ngamma"),
        (3, "shared\nshared"),
    ]
    out = {
        r["doc_id"]: r
        for r in webops.line_dedup(_docs(spark, rows)).collect()
    }
    # 'shared' survives only at (doc 1, pos 1)
    assert out[1]["clean_text"] == "alpha\nshared\nbeta"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 3)
    assert out[2]["clean_text"] == "gamma"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 1)
    # doc 3 loses BOTH copies (within-doc dup of a line owned by doc 1)
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (2, 0)


def test_line_dedup_within_doc_duplicates(spark):
    rows = [(7, "x\ny\nx\nx")]
    out = webops.line_dedup(_docs(spark, rows)).collect()[0]
    assert out["clean_text"] == "x\ny"
    assert (out["n_lines"], out["n_kept"]) == (4, 2)


def test_line_dedup_empty_and_blank_lines(spark):
    # empty lines are lines too: corpus-wide there is one survivor
    rows = [(1, "a\n\nb"), (2, "\n\nc")]
    out = {r["doc_id"]: r for r in webops.line_dedup(_docs(spark, rows)).collect()}
    assert out[1]["clean_text"] == "a\n\nb"
    assert out[2]["clean_text"] == "c"
    assert out[2]["n_kept"] == 1


# ---------------------------------------------------------------------------
# pii_redact


def test_pii_redact_all_kinds(spark):
    text = (
        "reach me at jo.doe+x@mail.example.co or 555-123-4567, "
        "ssn 078-05-1120, host 192.168.0.1 end"
    )
    out = webops.pii_redact(_docs(spark, [(1, text)])).collect()[0]
    assert (out["n_email"], out["n_ssn"], out["n_phone"], out["n_ipv4"]) == (1, 1, 1, 1)
    assert out["redacted_text"] == (
        "reach me at [EMAIL] or [PHONE], ssn [SSN], host [IP] end"
    )


def test_pii_redact_boundaries_and_negatives(spark):
    # no word-boundary match inside longer digit runs; no PII → identity
    rows = [
        (1, "digits 12345-67-8901 are not an ssn run"),
        (2, "plain text without identifiers"),
        (3, "a@b.co"),  # minimal email, whole string
    ]
    out = {r["doc_id"]: r for r in webops.pii_redact(_docs(spark, rows)).collect()}
    assert out[1]["n_ssn"] == 0 and out[1]["redacted_text"] == rows[0][1]
    assert out[2]["redacted_text"] == rows[1][1]
    assert out[3]["n_email"] == 1 and out[3]["redacted_text"] == "[EMAIL]"


def test_pii_redact_counts_are_independent_of_order(spark):
    # an IPv4 inside a URL-ish string still counts; the SSN placeholder
    # from an earlier pass must not create a phone match
    text = "ip 10.0.0.1 and 123-45-6789"
    out = webops.pii_redact(_docs(spark, [(1, text)])).collect()[0]
    assert (out["n_ssn"], out["n_phone"], out["n_ipv4"]) == (1, 0, 1)
    assert out["redacted_text"] == "ip [IP] and [SSN]"


# ---------------------------------------------------------------------------
# url_domain_stats


def test_url_domain_stats_counts(spark):
    rows = [
        (1, "see http://a.example.com/x and https://a.example.com/y plus http://b.example.org/"),
        (2, "again http://a.example.com/z"),
        (3, "no urls here"),
    ]
    out = {r["host"]: r for r in webops.url_domain_stats(_docs(spark, rows)).collect()}
    assert set(out) == {"a.example.com", "b.example.org"}
    assert (out["a.example.com"]["n_urls"], out["a.example.com"]["n_docs"]) == (3, 2)
    assert out["a.example.com"]["tld"] == "com"
    assert (out["b.example.org"]["n_urls"], out["b.example.org"]["n_docs"]) == (1, 1)
    assert out["b.example.org"]["tld"] == "org"


def test_url_domain_stats_host_edge_shapes(spark):
    rows = [(1, "http://no-path-host.net http://host.with.port:8080/p")]
    out = {r["host"]: r for r in webops.url_domain_stats(_docs(spark, rows)).collect()}
    # URL without a path ends at whitespace; port stays part of the host
    # token and breaks the trailing-TLD regex → empty tld, still counted
    assert (out["no-path-host.net"]["tld"], out["no-path-host.net"]["n_urls"]) == ("net", 1)
    assert out["host.with.port:8080"]["tld"] == ""


# ---------------------------------------------------------------------------
# bigram_lm_quality


def test_bigram_lm_quality_hand_computed(spark):
    import math

    # corpus: "aa" (1 bigram: aa), "aab" (2 bigrams: aa, ab)
    rows = [(1, "aa"), (2, "aab")]
    out = {r["doc_id"]: r for r in webops.bigram_lm_quality(_docs(spark, rows)).collect()}
    # model: aa→2, ab→1, total 3
    lp_aa = round(math.log(2 / 3) * 1_000_000)
    lp_ab = round(math.log(1 / 3) * 1_000_000)
    assert out[1]["n_bigrams"] == 1 and out[1]["sum_logp_micro"] == lp_aa
    assert out[2]["n_bigrams"] == 2 and out[2]["sum_logp_micro"] == lp_aa + lp_ab
    # integer div truncates toward zero (matches DuckDB //)
    assert out[2]["avg_logp_micro"] == int((lp_aa + lp_ab) / 2)


def test_bigram_lm_quality_degenerate_docs(spark):
    rows = [(1, ""), (2, "x"), (3, "xy")]
    out = {r["doc_id"]: r for r in webops.bigram_lm_quality(_docs(spark, rows)).collect()}
    for d in (1, 2):  # empty and single-char docs: zero bigrams, row kept
        assert (out[d]["n_bigrams"], out[d]["sum_logp_micro"], out[d]["avg_logp_micro"]) == (0, 0, 0)
    assert out[3]["n_bigrams"] == 1
    assert out[3]["sum_logp_micro"] == 0  # ln(1/1) = 0


def test_bigram_lm_gibberish_scores_below_fluent(spark):
    fluent = "the cat sat on the mat and the dog sat on the log " * 4
    gibberish = "qzxj vkqw zzqx jjqv wwzx qqjv " * 7
    rows = [(1, fluent), (2, gibberish)]
    out = {r["doc_id"]: r for r in webops.bigram_lm_quality(_docs(spark, rows)).collect()}
    assert out[2]["avg_logp_micro"] < out[1]["avg_logp_micro"]


# ---------------------------------------------------------------------------
# plan-shape regression (the 100-TB-relevant physical properties)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_line_dedup_plan_no_window_over_line_key(spark):
    rows = [(i, f"a\nb{i}\nshared") for i in range(20)]
    plan = _plan(webops.line_dedup(_docs(spark, rows)))
    # first-occurrence selection must be the min-struct groupBy + join,
    # never a Window partitioned by the skewed line key
    assert "Window" not in plan, plan[:2000]
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_pii_redact_plan_is_map_only(spark):
    rows = [(1, "a@b.co and 10.0.0.1")]
    plan = _plan(webops.pii_redact(_docs(spark, rows)))
    for op in ("Exchange", "SortMergeJoin", "BroadcastHashJoin", "Window"):
        assert op not in plan, plan[:2000]


def test_bigram_lm_plan_broadcasts_model(spark):
    rows = [(i, "abcabc" * 3) for i in range(10)]
    plan = _plan(webops.bigram_lm_quality(_docs(spark, rows)))
    # the vocab-sized model and the 1-row total must join via broadcast;
    # the only sort-merge join allowed is the final per-doc left join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan, plan[:2000]


# ---------------------------------------------------------------------------
# composed cleanup pipeline + attrition


def _clean_rows():
    # doc 1: fluent, unique           → survives everything
    # doc 2: exact duplicate of 1 (after redaction differs pre-redaction
    #        only in the email)       → removed by exact dedup
    # doc 3: gibberish, low quality   → removed by the quality gate
    # doc 4: shares line 'shared boilerplate line' with doc 1 → loses it
    base = (
        "the quick brown fox jumps over a lazy dog and runs to the old stone "
        "bridge while many small birds watch from tall green trees in autumn "
        "weather near quiet paths of fallen golden leaves today"
    )
    return [
        (1, base + "\nshared boilerplate line\nmail a@b.co"),
        (2, base + "\nshared boilerplate line\nmail c@d.org"),
        (3, "zz qq zz qq zz"),
        (4, base + " again\nshared boilerplate line"),
    ]


def test_clean_corpus_stages_compose(spark):
    out = {
        r["doc_id"]: r
        for r in webops.clean_corpus(_docs(spark, _clean_rows()), min_quality=70).collect()
    }
    assert set(out) == {1, 4}  # 2 deduped, 3 quality-gated
    assert out[1]["n_kept"] == 3 and "[EMAIL]" in out[1]["clean_text"]
    # doc 4 loses the shared boilerplate line to doc 1
    assert out[4]["n_kept"] == 1
    assert "shared boilerplate" not in out[4]["clean_text"]


def test_attrition_report_monotone_and_labeled(spark):
    rows = {
        r["stage"]: r
        for r in webops.attrition_report(_docs(spark, _clean_rows()), min_quality=70).collect()
    }
    assert list(rows) == ["raw", "quality_gate", "exact_dedup", "line_dedup"]
    docs = [rows[s]["n_docs"] for s in ("raw", "quality_gate", "exact_dedup", "line_dedup")]
    toks = [rows[s]["n_tokens"] for s in ("raw", "quality_gate", "exact_dedup", "line_dedup")]
    assert docs == [4, 3, 2, 2]
    assert toks[0] >= toks[1] >= toks[2] >= toks[3]


def test_canonicalize_urls(spark):
    from parser_rdf_spark.webops import canonicalize_urls

    rows = [
        ("HTTP://Example.COM:80/a?utm_source=x&b=2&a=1#frag",),
        ("http://example.com/a?a=1&b=2",),
        ("https://Host.org:443/",),
        ("https://host.org:8443/keep-port",),
        ("http://h/",),
        ("http://h",),                        # empty path -> '/'
        ("not a url at all",),                # passes through verbatim
        ("http://h/x?gclid=9&ref=z",),        # all params tracking -> no '?'
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [r.canonical_url for r in canonicalize_urls(df).collect()]
    assert got == [
        "http://example.com/a?a=1&b=2",
        "http://example.com/a?a=1&b=2",
        "https://host.org/",
        "https://host.org:8443/keep-port",
        "http://h/",
        "http://h/",
        "not a url at all",
        "http://h/x",
    ]
    # the first two inputs now collide on the canonical key
    assert canonicalize_urls(df).select("canonical_url").distinct().count() == 6
