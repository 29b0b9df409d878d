"""TriG: the fourth text syntax (Turtle + named-graph blocks).

No reference counterpart (reference docs/spec-completeness.md:131 scopes
quads formats out); engine extension completing the quads matrix next to
N-Quads. Pure-parser decisions, sniffer matrix, detection-chain
integration through the full Spark parse stage, and the serializer
round-trip law parse(to_trig(t)) == t.
"""

import pytest

from parser_rdf_spark import trig
from parser_rdf_spark.trig import TrigError

from conftest import pages_df

EX = "http://example.org/"


def quads(doc):
    ts, _ = trig.parse_document(doc)
    return [(t.subj, t.pred, t.obj_kind, t.obj_value, t.graph) for t in ts]


# ---------------------------------------------------------------------------
# pure parser: positive decisions
# ---------------------------------------------------------------------------

def test_graph_keyword_block():
    doc = f"GRAPH <{EX}g> {{ <{EX}a> <{EX}p> <{EX}b> . }}"
    assert quads(doc) == [(EX + "a", EX + "p", "iri", EX + "b", EX + "g")]


def test_label_form_iri_pname_and_bnode():
    doc = (
        "@prefix ex: <http://example.org/> .\n"
        f"<{EX}g1> {{ ex:a ex:p ex:b . }}\n"
        "ex:g2 { ex:c ex:p ex:d . }\n"
        "_:bg { ex:e ex:p ex:f . }\n"
    )
    assert quads(doc) == [
        (EX + "a", EX + "p", "iri", EX + "b", EX + "g1"),
        (EX + "c", EX + "p", "iri", EX + "d", EX + "g2"),
        (EX + "e", EX + "p", "iri", EX + "f", "_:bg"),
    ]


def test_default_graph_top_level_and_anonymous_block():
    doc = (
        f"<{EX}a> <{EX}p> <{EX}b> .\n"
        f"{{ <{EX}c> <{EX}p> <{EX}d> . }}\n"
    )
    assert quads(doc) == [
        (EX + "a", EX + "p", "iri", EX + "b", None),
        (EX + "c", EX + "p", "iri", EX + "d", None),
    ]


def test_final_dot_optional_inside_block():
    # TriG triplesBlock: last statement's '.' may be omitted
    doc = f"GRAPH <{EX}g> {{ <{EX}a> <{EX}p> <{EX}b> ; <{EX}q> <{EX}c> }}"
    assert quads(doc) == [
        (EX + "a", EX + "p", "iri", EX + "b", EX + "g"),
        (EX + "a", EX + "q", "iri", EX + "c", EX + "g"),
    ]


def test_turtle_surface_inside_block():
    # predicate-object lists, object lists, 'a', literals, datatypes all
    # inherit from the Turtle subset
    doc = (
        "@prefix ex: <http://example.org/> .\n"
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
        "GRAPH ex:g {\n"
        '  ex:a a ex:T ; ex:name "Alice"@en , "Alicia"@es ; ex:age 42 .\n'
        '  ex:b ex:score "3.5"^^xsd:decimal\n'
        "}\n"
    )
    got = quads(doc)
    assert (EX + "a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "iri", EX + "T", EX + "g") in got
    langs = [(t.obj_value, t.obj_lang) for t in trig.parse_document(doc)[0]
             if t.pred == EX + "name"]
    assert sorted(langs) == [("Alice", "en"), ("Alicia", "es")]
    assert (EX + "b", EX + "score", "literal", "3.5", EX + "g") in got


def test_mixed_default_and_named_multiple_blocks():
    doc = (
        "@prefix ex: <http://example.org/> .\n"
        'ex:top ex:p "default" .\n'
        "GRAPH ex:g1 { ex:a ex:p ex:b . }\n"
        'ex:mid ex:p "default2" .\n'
        "ex:g1 { ex:c ex:p ex:d . }\n"  # re-opening a graph is legal
    )
    assert [q[4] for q in quads(doc)] == [None, EX + "g1", None, EX + "g1"]


def test_prefixes_and_comments():
    doc = (
        "# leading comment\n"
        "@prefix ex: <http://example.org/> . # trailing\n"
        "GRAPH ex:g { # comment in block\n"
        "  ex:a ex:p ex:b . # after statement\n"
        "}\n"
    )
    ts, prefixes = trig.parse_document(doc)
    assert prefixes == {"ex": EX}
    assert len(ts) == 1


def test_empty_graph_block_emits_nothing():
    assert quads(f"GRAPH <{EX}g> {{ }}") == []
    assert quads("{ }") == []


# ---------------------------------------------------------------------------
# pure parser: negative decisions
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("doc", [
    "GRAPH <http://e/g> { GRAPH <http://e/h> { } }",     # nested GRAPH
    "GRAPH <http://e/g> { { } }",                        # nested anon block
    "GRAPH <http://e/g> { <http://a> <http://b> <http://c> ",  # unterminated
    "GRAPH { <http://a> <http://b> <http://c> . }",      # missing label
    "ex:g { ex:a ex:b ex:c . }",                         # undeclared prefix
    "GRAPH <http://e/g> { <http://a> <http://b> }",      # missing object
    '"lit" { <http://a> <http://b> <http://c> . }',      # literal graph label
])
def test_negative_decisions(doc):
    with pytest.raises(TrigError):
        trig.parse_document(doc)


# ---------------------------------------------------------------------------
# sniffer matrix (D-series discipline: 10-line cap, never claims what an
# earlier handler owns)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("doc,want", [
    ("GRAPH <http://e/g> { <http://a> <http://b> <http://c> . }", True),
    ("graph <http://e/g> { <http://a> <http://b> <http://c> . }", True),
    ("GRAPH ex:g { ex:a ex:b ex:c . }", True),
    ("<http://e/g> { <http://a> <http://b> <http://c> . }", True),
    ("_:bg { <http://a> <http://b> <http://c> . }", True),
    ("# comment\n\nGRAPH <http://e/g> { }", True),
    # NOT claimed: bare '{' is JSON-LD/JSON/JS territory — anywhere
    ('{"@id": "http://e/x", "@type": "http://e/T"}', False),
    ("{ <http://a> <http://b> <http://c> . }", False),
    ("<html>\n<body>\n{ x }\n</body>", False),
    # NOT claimed: pname label without GRAPH keyword — 'a:hover {' is a
    # CSS rule; pname-labeled TriG declares @prefix first and arrives
    # via the Turtle-detection retry instead
    ("ex:g { ex:a ex:b ex:c . }", False),
    ("a:hover { color: red }", False),
    # NOT claimed: HTML tags are not absolute-IRI labels (inner space /
    # no scheme)
    ('<script type="application/ld+json">{"@context": "x"}', False),
    ("<style>{ p: 1 }", False),
    # NOT claimed: plain triple lines (N-Triples/Turtle territory)
    ("<http://a> <http://b> <http://c> .", False),
    ("@prefix ex: <http://e/> .\nex:a ex:b ex:c .", False),
    ("", False),
    # block opener beyond line 10: not sniffed (cap discipline)
    ("\n" * 10 + "GRAPH <http://e/g> { }", False),
])
def test_can_handle(doc, want):
    assert trig.can_handle(doc) is want


def test_can_handle_never_throws_on_garbage():
    for junk in ["{{{{", "GRAPH", "\x00\x01", "{" * 500, "a" * 10000]:
        trig.can_handle(junk)  # D4 discipline: no exception


# ---------------------------------------------------------------------------
# detection-chain integration through the full Spark parse stage
# ---------------------------------------------------------------------------

def test_pipeline_detects_graph_led_trig(spark):
    from parser_rdf_spark.parse import parse_pages, triples_of

    doc = (
        "GRAPH <http://e/g> {\n"
        "  <http://e/a> <http://e/p> _:x .\n"
        "}\n"
        '<http://e/b> <http://e/p> "top" .\n'
    )
    parsed = parse_pages(pages_df(spark, {"https://t/1": doc}))
    [meta] = parsed.select("doc_url", "format", "error_message").collect()
    assert meta.format == "trig" and meta.error_message is None
    rows = triples_of(parsed).orderBy("line_no").collect()
    # named graph survives; doc-scoped bnode object; default-graph triple
    assert rows[0].graph == "http://e/g"
    assert rows[0].obj_value.startswith("_:d")
    assert rows[1].graph == "_:default" or rows[1].graph is None


def test_pipeline_retries_prefix_led_trig_after_turtle(spark):
    """'@prefix'-led TriG detects as Turtle (reference-pinned priority
    D6) and must reach the TriG parser via the parse-stage retry."""
    from parser_rdf_spark.parse import parse_pages, triples_of

    doc = (
        "@prefix ex: <http://example.org/> .\n"
        "ex:g { ex:a ex:p ex:b . }\n"
    )
    parsed = parse_pages(pages_df(spark, {"https://t/2": doc}))
    [meta] = parsed.select("format", "error_message").collect()
    assert meta.format == "trig" and meta.error_message is None
    [row] = triples_of(parsed).collect()
    assert row.graph == EX + "g"


def test_pipeline_explicit_fmt_override(spark):
    from parser_rdf_spark.parse import parse_pages

    # valid Turtle forced through the TriG grammar still parses (TriG is
    # a Turtle superset)
    doc = "@prefix ex: <http://example.org/> .\nex:a ex:p ex:b .\n"
    parsed = parse_pages(pages_df(spark, {"https://t/3": doc}), fmt="trig")
    [meta] = parsed.select("format", "error_message").collect()
    assert meta.format == "trig" and meta.error_message is None


def test_reference_detection_decisions_unchanged(spark):
    """Appending the TriG handler must not steal any reference-pinned
    decision: the cross-format quartet still detects as before."""
    from parser_rdf_spark import w3c_fixtures as w3c
    from parser_rdf_spark.parse import parse_pages

    docs = {f"https://q.example.org/{n}": c for n, c in w3c.SAMPLES.items()}
    parsed = parse_pages(pages_df(spark, docs))
    got = {r.doc_url: r.format for r in parsed.select("doc_url", "format").collect()}
    assert "trig" not in got.values()
    assert len(set(got.values())) >= 4


# ---------------------------------------------------------------------------
# serializer: round-trip laws
# ---------------------------------------------------------------------------

def _full_rows(spark, rows):
    from parser_rdf_spark.schemas import TRIPLES

    return spark.createDataFrame(rows, TRIPLES)


def test_to_trig_golden_structure(spark):
    from parser_rdf_spark.serialize import to_trig_docs

    df = _full_rows(spark, [
        ("https://d/1", None, "http://e/s", "http://e/p", "iri", "http://e/o", None, None, 1),
        ("https://d/1", "http://e/g1", "http://e/a", "http://e/k", "literal", "Alice", "en", None, 2),
        ("https://d/1", "_:g2", "http://e/c", "http://e/p", "bnode", "_:x", None, None, 3),
    ])
    [doc] = [r.trig for r in to_trig_docs(df).collect()]
    # default graph first, then GRAPH blocks in first-seen order
    assert doc.index("<http://e/s>") < doc.index("GRAPH <http://e/g1>")
    assert doc.index("GRAPH <http://e/g1>") < doc.index("GRAPH _:g2")
    assert doc.count("{") == 2 and doc.count("}") == 2


def test_trig_roundtrip_quartet_plus_quads(spark):
    """Parse mixed-format fixture docs, serialize each doc's triples as
    TriG, re-parse with the pure TriG parser, demand the same multiset
    (modulo one extra bnode-scope layer on re-parse, like every other
    round-trip law here)."""
    from parser_rdf_spark.parse import parse_pages, triples_of
    from parser_rdf_spark.serialize import to_trig_docs

    docs = {
        "https://q/nt": '<http://e/a> <http://e/p> "x" .\n_:b <http://e/p> _:c .',
        "https://q/nq": '<http://e/a> <http://e/p> "y" <http://e/g> .\n'
                        "_:s <http://e/p> <http://e/o> _:g .",
        "https://q/trig": "GRAPH <http://e/g> { <http://e/a> <http://e/p> 42 . }",
    }
    t = triples_of(parse_pages(pages_df(spark, docs)))
    want = sorted(
        (r.doc_url, r.subj, r.pred, r.obj_kind, r.obj_value, r.obj_lang,
         r.obj_datatype,
         None if r.graph in (None, "_:default") else r.graph)
        for r in t.collect()
    )
    got = []
    for r in to_trig_docs(t).collect():
        ts, _ = trig.parse_document(r.trig)
        for q in ts:
            got.append((r.doc_url, q.subj, q.pred, q.obj_kind, q.obj_value,
                        q.obj_lang, q.obj_datatype, q.graph))
    assert sorted(got) == want


def test_trig_roundtrip_random_bulk(spark):
    """Seeded-random bulk: 300 quads over 20 docs × 4 graph shapes
    (default NULL, '_:default' sentinel, IRI graph, bnode graph)."""
    import random

    from parser_rdf_spark.serialize import to_trig_docs

    rng = random.Random(7)
    NS = ["http://xmlns.com/foaf/0.1/", "http://example.org/v/"]

    def iri():
        alpha = "abzAZ09_-~\u00e9\u4e2d"
        return rng.choice(NS) + "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))

    def bnode():
        return "_:" + "".join(rng.choice("ab01_") for _ in range(rng.randint(1, 5)))

    def lit():
        alpha = 'ab \\"\n\r\t\u00e9\u4e2d\U0001f600\'`{}'
        return "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))

    rows = []
    for i in range(300):
        doc = f"https://r/{i % 20}"
        g = rng.choice([None, "_:default", iri(), bnode()])
        s = bnode() if rng.random() < 0.2 else iri()
        p = iri()
        r = rng.random()
        if r < 0.3:
            row = (doc, g, s, p, "iri", iri(), None, None, i + 1)
        elif r < 0.4:
            row = (doc, g, s, p, "bnode", bnode(), None, None, i + 1)
        elif r < 0.6:
            row = (doc, g, s, p, "literal", lit(), rng.choice(["en", "en-GB", "de"]), None, i + 1)
        elif r < 0.8:
            row = (doc, g, s, p, "literal", lit(), None, iri(), i + 1)
        else:
            row = (doc, g, s, p, "literal", lit(), None, None, i + 1)
        rows.append(row)

    df = _full_rows(spark, rows)
    got = []
    for r in to_trig_docs(df).collect():
        ts, _ = trig.parse_document(r.trig)
        for t in ts:
            got.append((r.doc_url, t.graph, t.subj, t.pred, t.obj_kind,
                        t.obj_value, t.obj_lang, t.obj_datatype))
    want = [(d, None if g in (None, "_:default") else g, s, p, k, v, lg, dt)
            for (d, g, s, p, k, v, lg, dt, _ln) in rows]
    key = lambda t: tuple("" if x is None else x for x in t)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_write_trig_partition_files_are_valid_documents(spark, tmp_path):
    from parser_rdf_spark.serialize import write_trig

    df = _full_rows(spark, [
        ("https://d/1", "http://e/g", "http://e/s1", "http://e/p", "iri", "http://e/o", None, None, 1),
        ("https://d/2", None, "http://e/s2", "http://e/p", "literal", "x", None, None, 1),
    ])
    out = str(tmp_path / "trig")
    write_trig(df, out, partitions=1)
    text = "\n".join(r.value for r in spark.read.text(out).collect())
    ts, _ = trig.parse_document(text)
    assert len(ts) == 2 and {t.graph for t in ts} == {"http://e/g", None}
