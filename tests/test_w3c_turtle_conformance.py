"""W3C RDF 1.1 Turtle test-suite conformance, scoped to the reference's
documented Turtle subset (reference: docs/spec-completeness.md:137-148;
the N-Triples analogue is tests/Conformance/W3cNTriplesConformanceTest.php).

Pure-Python core assertions run per-case; the Spark block verifies the
same decisions survive the distributed fused-parse stage.
"""

import pytest

from parser_rdf_spark import w3c_turtle_fixtures as wt
from parser_rdf_spark.turtle import TurtleError, parse_document

from conftest import pages_df


@pytest.mark.parametrize("name", wt.POSITIVE)
def test_positive_accepted_with_expected_count(name):
    triples, _ = parse_document(wt.FIXTURES[name])
    assert len(triples) == wt.EXPECTED_COUNT[name]


@pytest.mark.parametrize("name", sorted(wt.EXPECTED_TRIPLES))
def test_eval_exact_triples(name):
    triples, _ = parse_document(wt.FIXTURES[name])
    got = {
        (t.subj, t.pred, t.obj_kind, t.obj_value, t.obj_lang, t.obj_datatype)
        for t in triples
    }
    assert got == wt.EXPECTED_TRIPLES[name]


@pytest.mark.parametrize("name", wt.NEGATIVE)
def test_negative_rejected(name):
    with pytest.raises(TurtleError):
        parse_document(wt.FIXTURES[name])


@pytest.mark.parametrize("name", sorted(wt.OUT_OF_SCOPE_REJECTED))
def test_out_of_scope_rejected_by_design(name):
    """W3C-positive base-directive cases are rejected ON PURPOSE: the
    reference never implemented @base/BASE (spec-completeness.md:147) and
    this engine pins the same omission with an explicit error."""
    with pytest.raises(TurtleError, match="base is not supported"):
        parse_document(wt.FIXTURES[name])


def test_anonymous_bnode_cases_produce_fresh_bnodes():
    """Structural pin for bnode-producing eval cases (labels are
    generator-assigned, so exact tuples can't be pinned)."""
    triples, _ = parse_document(wt.FIXTURES["anonymous_blank_node_subject"])
    (t,) = triples
    assert t.subj.startswith("_:") and t.obj_kind == "iri"
    triples, _ = parse_document(wt.FIXTURES["anonymous_blank_node_object"])
    (t,) = triples
    assert t.obj_kind == "bnode" and t.obj_value.startswith("_:")
    # collection chain shape: (1 "2" :o) = spine triple + 3 first + 3 rest
    triples, _ = parse_document(wt.FIXTURES["turtle-syntax-lists-02"])
    preds = [t.pred for t in triples]
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    assert preds.count(RDF + "first") == 3 and preds.count(RDF + "rest") == 3


def test_spark_path_matches_pure_decisions(spark):
    """The fused mapInArrow parse stage must make the identical
    accept/reject decision and triple count for every suite case."""
    from pyspark.sql import functions as F

    from parser_rdf_spark.parse import docmeta_of, parse_pages

    names = wt.POSITIVE + wt.NEGATIVE + sorted(wt.OUT_OF_SCOPE_REJECTED)
    pages = pages_df(
        spark, {f"https://w3c.example.org/ttl/{n}": wt.FIXTURES[n] for n in names}
    )
    meta = docmeta_of(parse_pages(pages, fmt="turtle", empty_guard=False))
    rows = {
        r.fixture: r
        for r in meta.select(
            F.substring_index("doc_url", "/", -1).alias("fixture"),
            F.coalesce("n_triples", F.lit(0)).alias("n_triples"),
            F.col("error_stage").isNotNull().alias("rejected"),
        ).collect()
    }
    assert len(rows) == len(names)
    for n in wt.POSITIVE:
        assert not rows[n].rejected and rows[n].n_triples == wt.EXPECTED_COUNT[n], n
    for n in list(wt.NEGATIVE) + sorted(wt.OUT_OF_SCOPE_REJECTED):
        assert rows[n].rejected, n
