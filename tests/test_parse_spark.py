"""Stage-2 fused parse stage on Spark: conformance embedded as pages rows.

One job parses all 70 W3C cases + the cross-format quartet + guard docs in
parallel (doc-parallel conformance, FIXTURES.md §1), asserting the same
decisions the reference's suite pins: positives ⇒ golden triples,
negatives ⇒ 0 triples + an errors row, filler ⇒ format_detection error.
"""

import pytest

from parser_rdf_spark import w3c_fixtures as w3c
from parser_rdf_spark.formats import FormatDetectionError
from parser_rdf_spark.ntriples import parse_document as nt_parse
from parser_rdf_spark.parse import (
    detected_of,
    docmeta_of,
    errors_of,
    parse_pages,
    prefixes_of,
    triples_of,
)

from conftest import pages_df


def _url(name: str) -> str:
    return f"https://fixtures.example.org/w3c/{name}"


@pytest.fixture(scope="module")
def parsed_all(spark):
    """W3C docs parsed with the explicit n-triples override (the reference's
    conformance suite invokes NTriplesHandler directly, bypassing detection
    — nt-syntax-subm-01 has >10 leading comment lines and would not sniff);
    the quartet + guard docs go through auto-detection."""
    w3c_docs = {_url(n): w3c.FIXTURES[n] for n in w3c.POSITIVE + w3c.NEGATIVE}
    auto_docs = {
        f"https://fixtures.example.org/integration/{n}": c for n, c in w3c.SAMPLES.items()
    }
    auto_docs["https://filler.example.org/plain"] = "just some plain text, no rdf at all"
    auto_docs["https://filler.example.org/empty"] = "   "
    parsed = (
        parse_pages(pages_df(spark, w3c_docs), fmt="n-triples")
        .unionByName(parse_pages(pages_df(spark, auto_docs), fmt=None))
        .cache()
    )
    yield parsed
    parsed.unpersist()


def test_positive_docs_match_pure_python_golden(parsed_all):
    """Spark output must equal the (independently conformance-verified)
    pure-Python parse per positive fixture — triple multisets included."""
    triples = (
        triples_of(parsed_all)
        .filter("doc_url like '%/w3c/%'")
        .select("doc_url", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype")
        .collect()
    )
    got: dict[str, list] = {}
    for r in triples:
        got.setdefault(r.doc_url.rsplit("/", 1)[1], []).append(
            (r.subj, r.pred, r.obj_kind, r.obj_value, r.obj_lang, r.obj_datatype)
        )
    for name in w3c.POSITIVE:
        golden = nt_parse(w3c.FIXTURES[name])
        # spark output has doc-scoped bnodes; strip the scope for comparison
        def unscope(term):
            if term.startswith("_:d") and "-" in term:
                return "_:" + term.split("-", 1)[1]
            return term

        nkey = lambda t: tuple("" if x is None else x for x in t)  # noqa: E731
        got_set = sorted(
            (
                (unscope(s), p, k, unscope(v) if k == "bnode" else v, l, d)
                for (s, p, k, v, l, d) in got.get(name, [])
            ),
            key=nkey,
        )
        want_set = sorted(
            (
                (t.subj, t.pred, t.obj_kind, t.obj_value, t.obj_lang, t.obj_datatype)
                for t in golden
            ),
            key=nkey,
        )
        assert got_set == want_set, f"{name}: {got_set} != {want_set}"


def test_negative_docs_yield_zero_triples_and_error_rows(parsed_all):
    neg_urls = {_url(n) for n in w3c.NEGATIVE}
    triples = triples_of(parsed_all).filter("doc_url like '%/w3c/nt-syntax-bad%'").count()
    # every negative fixture is named nt-syntax-bad-*
    assert triples == 0
    errs = {r.doc_url for r in errors_of(parsed_all).collect() if r.doc_url in neg_urls}
    assert errs == neg_urls


def test_error_rows_carry_stage_and_line(parsed_all):
    errs = {r.doc_url: r for r in errors_of(parsed_all).collect()}
    bad_lang = errs[_url("nt-syntax-bad-lang-01")]
    assert bad_lang.stage == "validate"
    assert bad_lang.line == 2  # line 1 is a comment
    assert "language tag" in bad_lang.message


def test_cross_format_quartet_identical_triples(parsed_all):
    rows = (
        triples_of(parsed_all)
        .filter("doc_url like '%/integration/%'")
        .collect()
    )
    by_doc: dict[str, set] = {}
    for r in rows:
        by_doc.setdefault(r.doc_url.rsplit("/", 1)[1], set()).add(
            (r.subj, r.pred, r.obj_kind, r.obj_value, r.obj_lang, r.obj_datatype)
        )
    base = by_doc["sample.nt"]
    assert len(base) == 5
    for name in ("sample.ttl", "sample.jsonld", "sample.rdf"):
        assert by_doc[name] == base, name


def test_format_detection_assignments(parsed_all):
    det = {r.url: (r.format, r.error) for r in detected_of(parsed_all).collect()}
    assert det["https://fixtures.example.org/integration/sample.nt"][0] == "n-triples"
    assert det["https://fixtures.example.org/integration/sample.ttl"][0] == "turtle"
    assert det["https://fixtures.example.org/integration/sample.jsonld"][0] == "json-ld"
    assert det["https://fixtures.example.org/integration/sample.rdf"][0] == "rdf/xml"
    assert det["https://filler.example.org/plain"] == (None, "format_detection")
    assert det["https://filler.example.org/empty"] == (None, "empty")


def test_docmeta_resource_counts(parsed_all):
    meta = {
        r.doc_url: r
        for r in docmeta_of(parsed_all).filter("doc_url like '%/integration/%'").collect()
    }
    nt = meta["https://fixtures.example.org/integration/sample.nt"]
    assert nt.resource_count == 4  # Person, name, Class, Property
    assert nt.n_triples == 5


def test_prefixes_long_form(parsed_all):
    rows = prefixes_of(parsed_all).filter(
        "doc_url = 'https://fixtures.example.org/integration/sample.ttl'"
    ).collect()
    got = {r.prefix: r.namespace for r in rows}
    assert got["ex"] == "http://example.org/"
    assert got["rdf"] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    assert got["rdfs"] == "http://www.w3.org/2000/01/rdf-schema#"


def test_explicit_format_override(spark):
    # D2: the Turtle-looking doc parsed as n-triples must fail validation
    docs = {"https://x.example.org/1": "@prefix ex: <http://example.org/> ."}
    parsed = parse_pages(pages_df(spark, docs), fmt="n-triples")
    errs = errors_of(parsed).collect()
    assert len(errs) == 1 and errs[0].stage in ("validate", "parse")
    with pytest.raises(FormatDetectionError):
        parse_pages(pages_df(spark, docs), fmt="nosuch")


def test_bnode_scoping_prevents_cross_doc_collisions(spark):
    doc = "_:a <http://example.org/p> <http://example.org/o> ."
    docs = {"https://a.example.org/1": doc, "https://b.example.org/2": doc}
    subjects = {
        r.subj
        for r in triples_of(parse_pages(pages_df(spark, docs))).collect()
    }
    assert len(subjects) == 2  # same label, two docs → two distinct scoped bnodes


def test_lone_surrogate_page_becomes_error_row_not_job_kill(spark):
    """A \\uD800 escape passes the hex-only V10 check and yields a Python
    lone-surrogate string; Arrow refuses it. The batch must survive with
    the hostile doc as an error row and its neighbors intact."""
    from conftest import pages_df
    from parser_rdf_spark.parse import docmeta_of, parse_pages, triples_of

    docs = {
        "https://d/good": "<http://e/s> <http://e/p> <http://e/o> .",
        "https://d/evil": '<http://e/s> <http://e/p> "\\uD800" .',
        "https://d/good2": '<http://e/s2> <http://e/p> "fine" .',
    }
    parsed = parse_pages(pages_df(spark, docs))
    meta = {r["doc_url"]: r for r in docmeta_of(parsed).collect()}
    assert meta["https://d/good"]["n_triples"] == 1
    assert meta["https://d/good2"]["n_triples"] == 1
    assert meta["https://d/evil"]["error_stage"] == "parse"
    assert "surrogate" in meta["https://d/evil"]["error_message"]
    assert triples_of(parsed).count() == 2
