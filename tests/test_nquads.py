"""N-Quads: the N-Triples grammar + a fourth graph term → real named
graphs (E21) in the triples relation."""

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from parser_rdf_spark import nquads
from parser_rdf_spark.ntriples import NTriplesError, parse_document as nt_parse
from parser_rdf_spark.parse import DEFAULT_GRAPH, docmeta_of, parse_pages, triples_of
from parser_rdf_spark.schemas import PAGES

NQ_DOC = """\
<http://e/s1> <http://e/p> <http://e/o1> <http://g/one> .
<http://e/s2> <http://e/p> "plain default graph" .
_:b1 <http://e/p> "in a bnode graph" _:g .
# comment line
<http://e/s3> <http://e/p> "typed"^^<http://www.w3.org/2001/XMLSchema#string> <http://g/one> .
"""


def test_pure_python_quad_parse():
    quads = nquads.parse_document(NQ_DOC)[0]
    graphs = [q.graph for q in quads]
    assert graphs == ["http://g/one", None, "_:g", "http://g/one"]
    assert quads[1].obj_value == "plain default graph"


def test_ntriples_strict_rejects_four_terms():
    with pytest.raises(NTriplesError):
        nt_parse('<http://e/s> <http://e/p> <http://e/o> <http://g/x> .')


def test_sniffer_requires_a_quad_line():
    assert nquads.can_handle(NQ_DOC)
    assert not nquads.can_handle('<http://e/s> <http://e/p> <http://e/o> .')
    assert not nquads.can_handle('<http://e/s> <http://e/p> "see <http://x>" .')


def test_spark_quads_via_detection_fallback(spark):
    """N-Quads docs sniff as n-triples (reference-pinned D5 regex), fail
    the strict parse, and are retried as n-quads by the fused stage."""
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    pages = spark.createDataFrame(
        [("https://q/doc", ts, None, NQ_DOC, "en"),
         ("https://q/nt", ts, None, "<http://e/a> <http://e/p> <http://e/b> .", "en")],
        schema=PAGES,
    )
    parsed = parse_pages(pages)
    meta = {r["doc_url"]: r["format"] for r in docmeta_of(parsed).collect()}
    assert meta == {"https://q/doc": "n-quads", "https://q/nt": "n-triples"}

    t = triples_of(parsed)
    by_subj = {r["subj"]: r["graph"] for r in t.filter(F.col("doc_url") == "https://q/doc").collect()}
    assert by_subj["http://e/s1"] == "http://g/one"
    assert by_subj["http://e/s2"] == DEFAULT_GRAPH
    # bnode graph labels are doc-scoped like any other bnode
    bnode_graph = [g for s, g in by_subj.items() if s.startswith("_:")][0]
    assert bnode_graph.startswith("_:d") and bnode_graph.endswith("-g")
    # plain n-triples doc keeps the default graph
    nt_rows = t.filter(F.col("doc_url") == "https://q/nt").collect()
    assert nt_rows[0]["graph"] == DEFAULT_GRAPH


def test_spark_explicit_format_override(spark):
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    pages = spark.createDataFrame(
        [("https://q/d2", ts, None, NQ_DOC, "en")], schema=PAGES
    )
    parsed = parse_pages(pages, fmt="n-quads")
    assert docmeta_of(parsed).collect()[0]["format"] == "n-quads"
    assert triples_of(parsed).count() == 4


def test_bad_quad_line_is_error_row(spark):
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    bad = '<http://e/s> <http://e/p> <http://e/o> <http://g/x> "junk" .'
    pages = spark.createDataFrame(
        [("https://q/bad", ts, None, bad, "en")], schema=PAGES
    )
    meta = docmeta_of(parse_pages(pages)).collect()[0]
    assert meta["error_stage"] is not None
