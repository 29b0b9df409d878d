"""W3C SPARQL result-format laws (results.py): RFC 4180 CSV quoting,
TSV term syntax + escapes, SRJ bindings with unbound-variable omission,
and the bounded single-document form."""

import json

import pytest

from parser_rdf_spark.results import (
    sparql_json_document,
    to_sparql_csv,
    to_sparql_json_bindings,
    to_sparql_tsv,
)


@pytest.fixture(scope="module")
def sols(spark):
    rows = [
        ("http://e/x", "plain", "_:b0"),
        ("urn:item:2", 'with,comma and "quote"', None),
        ("http://e/y", "tab\there", "_:b1"),
    ]
    return spark.createDataFrame(rows, "s string, label string, node string")


def _lines(df):
    return [r.line for r in df.orderBy("pos", "line").collect()]


def test_csv_header_and_quoting(sols):
    lines = _lines(to_sparql_csv(sols))
    assert lines[0] == "s,label,node"
    body = set(lines[1:])
    # RFC 4180: embedded comma/quote → quoted field with doubled quotes
    assert 'urn:item:2,"with,comma and ""quote""",' in body
    assert "http://e/x,plain,_:b0" in body


def test_tsv_term_syntax_and_escapes(sols):
    lines = _lines(to_sparql_tsv(sols))
    assert lines[0] == "?s\t?label\t?node"
    body = set(lines[1:])
    assert '<http://e/x>\t"plain"\t_:b0' in body
    # unbound → empty field; quote escaped with backslash
    assert '<urn:item:2>\t"with,comma and \\"quote\\""\t' in body
    # tab inside a literal is escaped, so every line has exactly 2 tabs
    for ln in body:
        assert ln.count("\t") == 2
    assert any('\\t' in ln for ln in body)


def test_kinds_override(spark):
    df = spark.createDataFrame([("http://not-an-iri really",)], "v string")
    auto = _lines(to_sparql_tsv(df))[1]
    assert auto.startswith('"')  # whitespace disqualifies the IRI shape
    forced = _lines(to_sparql_tsv(
        spark.createDataFrame([("http://e/x",)], "v string"),
        kinds={"v": "literal"}))[1]
    assert forced == '"http://e/x"'
    with pytest.raises(ValueError, match="unknown columns"):
        to_sparql_tsv(df, kinds={"nope": "iri"})


def test_json_bindings_types_and_unbound_omission(sols):
    objs = [json.loads(r.binding)
            for r in to_sparql_json_bindings(sols).collect()]
    by_s = {o["s"]["value"]: o for o in objs}
    assert by_s["http://e/x"]["s"]["type"] == "uri"
    assert by_s["http://e/x"]["node"] == {"type": "bnode", "value": "b0"}
    assert by_s["http://e/x"]["label"]["type"] == "literal"
    assert "node" not in by_s["urn:item:2"]  # unbound omitted per spec


def test_json_document_bounded(sols):
    doc = json.loads(sparql_json_document(sols))
    assert doc["head"]["vars"] == ["s", "label", "node"]
    assert len(doc["results"]["bindings"]) == 3
    with pytest.raises(ValueError, match="max_rows"):
        sparql_json_document(sols, max_rows=2)


def test_formats_are_map_only(sols):
    for df in (to_sparql_csv(sols), to_sparql_tsv(sols),
               to_sparql_json_bindings(sols)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # no shuffle: pure projection (+union)


def test_xml_results_and_document(sols):
    from parser_rdf_spark.results import (
        sparql_xml_document, to_sparql_xml_results)

    els = [r.result for r in to_sparql_xml_results(sols).collect()]
    assert all(e.startswith("<result>") and e.endswith("</result>") for e in els)
    joined = "".join(els)
    assert '<binding name="s"><uri>http://e/x</uri></binding>' in joined
    assert '<bnode>b0</bnode>' in joined
    # unbound binding omitted entirely
    assert joined.count('<binding name="node">') == 2
    doc = sparql_xml_document(sols)
    assert doc.startswith('<?xml version="1.0"?>')
    assert '<variable name="label"/>' in doc
    import re
    assert len(re.findall("<result>", doc)) == 3
    with pytest.raises(ValueError, match="max_rows"):
        sparql_xml_document(sols, max_rows=1)


def test_xml_escaping(spark):
    from parser_rdf_spark.results import to_sparql_xml_results

    df = spark.createDataFrame([("a <&> b",)], "v string")
    el = to_sparql_xml_results(df).collect()[0].result
    assert "<literal>a &lt;&amp;&gt; b</literal>" in el


@pytest.fixture(scope="module")
def term_sols(spark):
    rows = [
        ("<http://e/a>", '"Alice"@en'),
        ("<http://e/b>", '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("_:n1", '"say \\"hi\\"\\\\x"'),     # encoded escapes: " and backslash
        ("<http://e/c>", None),
    ]
    return spark.createDataFrame(rows, "s string, o string")


def test_term_kind_json_bindings_lossless(term_sols):
    km = {"s": "term", "o": "term"}
    got = [json.loads(r.binding)
           for r in to_sparql_json_bindings(term_sols, km).collect()]
    by_s = {b["s"]["value"]: b for b in got if "s" in b}
    a = by_s["http://e/a"]
    assert a["s"]["type"] == "uri"
    assert a["o"] == {"type": "literal", "value": "Alice", "xml:lang": "en"}
    b = by_s["http://e/b"]
    assert b["o"] == {"type": "literal", "value": "42",
                      "datatype": "http://www.w3.org/2001/XMLSchema#integer"}
    n = by_s["n1"]
    assert n["s"]["type"] == "bnode"
    assert n["o"]["value"] == 'say "hi"\\x'      # unescaped exactly
    assert "o" not in by_s["http://e/c"]          # unbound omitted


def test_term_kind_tsv_verbatim(term_sols):
    lines = [r.line for r in
             to_sparql_tsv(term_sols, {"s": "term", "o": "term"})
             .orderBy("pos", "line").collect()]
    assert lines[0] == "?s\t?o"
    assert '<http://e/a>\t"Alice"@en' in lines    # encoding IS the TSV form


def test_term_kind_xml_attributes(term_sols):
    from parser_rdf_spark.results import to_sparql_xml_results

    res = [r.result for r in to_sparql_xml_results(
        term_sols, {"s": "term", "o": "term"}).collect()]
    joined = "".join(res)
    assert '<literal xml:lang="en">Alice</literal>' in joined
    assert ('<literal datatype="http://www.w3.org/2001/XMLSchema#integer">'
            "42</literal>") in joined
    assert "<bnode>n1</bnode>" in joined
    assert "<uri>http://e/a</uri>" in joined
