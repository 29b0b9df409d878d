"""N-Triples serialization: golden line forms + the round-trip law
parse(serialize(t)) == t (serialize.py)."""

import pytest

from parser_rdf_spark.ntriples import parse_document
from parser_rdf_spark.schemas import TRIPLES
from parser_rdf_spark.serialize import to_ntriples

from conftest import pages_df


def _rows(spark, *triples):
    # (subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)
    full = [("https://d/1", "_:default", s, p, k, v, lg, dt, i + 1)
            for i, (s, p, k, v, lg, dt) in enumerate(triples)]
    return spark.createDataFrame(full, TRIPLES)


def lines(df):
    return [r.line for r in df.orderBy("line").collect()]


def test_golden_forms(spark):
    df = _rows(
        spark,
        ("http://e/s", "http://e/p", "iri", "http://e/o", None, None),
        ("_:b1", "http://e/p", "bnode", "_:b2", None, None),
        ("http://e/s", "http://e/p", "literal", "plain", None, None),
        ("http://e/s", "http://e/p", "literal", "hallo", "de", None),
        ("http://e/s", "http://e/p", "literal", "42", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
    )
    assert sorted(lines(to_ntriples(df))) == sorted([
        "<http://e/s> <http://e/p> <http://e/o> .",
        "_:b1 <http://e/p> _:b2 .",
        '<http://e/s> <http://e/p> "plain" .',
        '<http://e/s> <http://e/p> "hallo"@de .',
        '<http://e/s> <http://e/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    ])


def test_escapes_round_trip_through_pure_parser(spark):
    nasty = 'a"b\\c\nd\re\tf'
    df = _rows(spark, ("http://e/s", "http://e/p", "literal", nasty, None, None))
    [line] = lines(to_ntriples(df))
    assert "\n" not in line and "\r" not in line and "\t" not in line
    [t] = parse_document(line)
    assert t.obj_value == nasty and t.obj_kind == "literal"


@pytest.mark.parametrize("doc", [
    '<http://e/s> <http://e/p> "v"@en-GB .',
    '<http://e/s> <http://e/p> "\\\\ and \\" and \\n" .',
    "_:x <http://e/p> _:y .",
    '<http://e/s> <http://e/p> ""^^<http://e/dt> .',
])
def test_round_trip_law_pure(spark, doc):
    t1 = parse_document(doc)
    df = _rows(spark, *[(t.subj, t.pred, t.obj_kind, t.obj_value,
                         t.obj_lang, t.obj_datatype) for t in t1])
    reparsed = []
    for line in lines(to_ntriples(df)):
        reparsed.extend(parse_document(line))
    assert [(t.subj, t.pred, t.obj_kind, t.obj_value, t.obj_lang, t.obj_datatype)
            for t in reparsed] == \
           [(t.subj, t.pred, t.obj_kind, t.obj_value, t.obj_lang, t.obj_datatype)
            for t in t1]


def test_round_trip_w3c_positive_corpus_on_spark(spark):
    """Serialize every triple the W3C positive suite parses, re-parse the
    lines through the FULL Spark pipeline, and demand the same multiset.

    Bnode labels are compared modulo doc-scoping: the pipeline rewrites
    ``_:o`` to ``_:d<dochash>-o`` on every parse (P5), so a re-parse of
    serialized output legitimately gains one more scope layer — the
    IDENTITY structure (which rows share a label) is what round-trips."""
    import re

    def norm(term):
        return re.sub(r"^_:(?:d[0-9a-f]+-)+", "_:", term)
    from parser_rdf_spark import w3c_fixtures as w3c
    from parser_rdf_spark.parse import parse_pages, triples_of

    docs = {}
    for name in w3c.POSITIVE:
        docs[f"https://w3c.example.org/{name}"] = w3c.FIXTURES[name]
    pages = pages_df(spark, docs)
    t1 = triples_of(parse_pages(pages, fmt="n-triples"))

    serialized = to_ntriples(t1)
    redocs = (
        serialized.groupBy("doc_url")
        .agg({"line": "collect_list"})
        .collect()
    )
    docs2 = {r["doc_url"]: "\n".join(sorted(r["collect_list(line)"])) for r in redocs}
    t2 = triples_of(parse_pages(pages_df(spark, docs2), fmt="n-triples"))

    key = lambda r: (r.doc_url, norm(r.subj), r.pred, r.obj_kind,  # noqa: E731
                     norm(r.obj_value) if r.obj_kind == "bnode" else r.obj_value,
                     r.obj_lang or "", r.obj_datatype or "")
    assert sorted(map(key, t1.collect())) == sorted(map(key, t2.collect()))


def test_write_ntriples_files_are_valid_documents(spark, tmp_path):
    from parser_rdf_spark.serialize import write_ntriples

    df = _rows(
        spark,
        ("http://e/s1", "http://e/p", "iri", "http://e/o", None, None),
        ("http://e/s2", "http://e/p", "literal", "x", None, None),
    )
    out = str(tmp_path / "nt")
    write_ntriples(df, out, partitions=2)
    text = spark.read.text(out)
    parsed = []
    for r in text.collect():
        parsed.extend(parse_document(r.value))
    assert len(parsed) == 2


# ---------------------------------------------------------------------------
# Turtle serialization (to_turtle_blocks / to_turtle_docs)
# ---------------------------------------------------------------------------

def test_turtle_golden_doc(spark):
    from parser_rdf_spark.serialize import to_turtle_docs

    df = _rows(
        spark,
        ("http://example.org/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "iri", "http://xmlns.com/foaf/0.1/Person", None, None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/name",
         "literal", 'Al"ice\n', None, None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/knows",
         "bnode", "_:b1", None, None),
        ("_:b1", "http://xmlns.com/foaf/0.1/name", "literal", "Bob", "en", None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/age",
         "literal", "42", None, "http://www.w3.org/2001/XMLSchema#integer"),
        ("http://example.org/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "iri", "http://example.org/odd.name/Thing", None, None),
    )
    [doc] = [r.turtle for r in to_turtle_docs(df).collect()]
    body = doc.split("\n\n", 1)[1]
    assert body == (
        '<http://example.org/alice> a foaf:Person, <http://example.org/odd.name/Thing> ;\n'
        '    foaf:name "Al\\"ice\\n" ;\n'
        '    foaf:knows _:b1 ;\n'
        '    foaf:age "42"^^xsd:integer .\n'
        '\n'
        '_:b1 foaf:name "Bob"@en .'
    )
    # header declares every default prefix, sorted
    assert doc.startswith('@prefix dcterms: <http://purl.org/dc/terms/> .')


def test_turtle_roundtrip_quartet_through_spark_pipeline(spark):
    """Serialize the golden quartet's triples to Turtle documents and
    re-parse them through the FULL Spark pipeline (fmt=turtle): the same
    multiset must come back, bnode labels compared modulo the extra
    doc-scope layer the re-parse adds (P5)."""
    import re

    from parser_rdf_spark import w3c_fixtures as w3c
    from parser_rdf_spark.parse import parse_pages, triples_of
    from parser_rdf_spark.serialize import to_turtle_docs

    def norm(term):
        return re.sub(r"^_:(?:d[0-9a-f]+-)+", "_:", term)

    docs = {f"https://quartet.example.org/{n}": c for n, c in w3c.SAMPLES.items()}
    t1 = triples_of(parse_pages(pages_df(spark, docs))).filter("graph = '_:default' OR graph IS NULL")

    redocs = {r.doc_url: r.turtle for r in to_turtle_docs(t1).collect()}
    t2 = triples_of(parse_pages(pages_df(spark, redocs), fmt="turtle"))

    key = lambda r: (r.doc_url, norm(r.subj), r.pred, r.obj_kind,  # noqa: E731
                     norm(r.obj_value) if r.obj_kind == "bnode" else r.obj_value,
                     r.obj_lang or "", r.obj_datatype or "")
    assert sorted(map(key, t1.collect())) == sorted(map(key, t2.collect()))


def test_turtle_roundtrip_random_bulk(spark):
    """Seeded-random bulk property test at one-Spark-job cost: 300 random
    triples over 30 docs — unicode literals, langtags, datatypes, bnodes,
    compactable and non-compactable IRIs — serialized by the engine and
    re-parsed by the pure Turtle parser."""
    import random

    from parser_rdf_spark.schemas import TRIPLES
    from parser_rdf_spark.serialize import to_turtle_docs
    from parser_rdf_spark.turtle import parse_document as turtle_parse

    rng = random.Random(42)
    NS = ["http://xmlns.com/foaf/0.1/", "http://example.org/v/",
          "http://www.w3.org/2000/01/rdf-schema#"]

    def iri():
        local_alpha = "abzAZ09_-~!$&'()*+=/?.%\u00e9\u4e2d"
        n = rng.randint(1, 8)
        return rng.choice(NS) + "".join(rng.choice(local_alpha) for _ in range(n))

    def bnode():
        return "_:" + "".join(rng.choice("ab01_") for _ in range(rng.randint(1, 5)))

    def lit():
        alpha = 'ab \\"\n\r\t\u00e9\u4e2d\U0001f600\'`'
        return "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))

    rows = []
    for i in range(300):
        doc = f"https://r/{i % 30}"
        s = bnode() if rng.random() < 0.2 else iri()
        p = iri()
        r = rng.random()
        if r < 0.3:
            row = (doc, None, s, p, "iri", iri(), None, None, i + 1)
        elif r < 0.4:
            row = (doc, None, s, p, "bnode", bnode(), None, None, i + 1)
        elif r < 0.6:
            row = (doc, None, s, p, "literal", lit(), rng.choice(["en", "en-GB", "de"]), None, i + 1)
        elif r < 0.8:
            row = (doc, None, s, p, "literal", lit(), None, iri(), i + 1)
        else:
            row = (doc, None, s, p, "literal", lit(), None, None, i + 1)
        rows.append(row)

    df = spark.createDataFrame(rows, TRIPLES)
    got = []
    for r in to_turtle_docs(df).collect():
        triples, _ = turtle_parse(r.turtle)
        for t in triples:
            got.append((r.doc_url, t.subj, t.pred, t.obj_kind, t.obj_value,
                        t.obj_lang, t.obj_datatype))
    want = [(d, s, p, k, v, lg, dt) for (d, _, s, p, k, v, lg, dt, _ln) in rows]
    assert sorted(got) == sorted(want)


def test_write_turtle_partition_files_are_valid_documents(spark, tmp_path):
    from parser_rdf_spark.serialize import write_turtle
    from parser_rdf_spark.turtle import parse_document as turtle_parse

    df = _rows(
        spark,
        ("http://e/s1", "http://e/p", "iri", "http://e/o", None, None),
        ("http://e/s2", "http://e/p", "literal", "x", None, None),
    )
    out = str(tmp_path / "ttl")
    write_turtle(df, out, partitions=1)
    text = "\n".join(r.value for r in spark.read.text(out).collect())
    triples, _ = turtle_parse(text)
    assert len(triples) == 2


# ---------------------------------------------------------------------------
# N-Quads serialization (to_nquads)
# ---------------------------------------------------------------------------

def _quad_rows(spark, *quads):
    # (graph, subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)
    from parser_rdf_spark.schemas import TRIPLES

    full = [("https://d/1", g, s, p, k, v, lg, dt, i + 1)
            for i, (g, s, p, k, v, lg, dt) in enumerate(quads)]
    return spark.createDataFrame(full, TRIPLES)


def test_nquads_golden_forms(spark):
    from parser_rdf_spark.serialize import to_nquads

    df = _quad_rows(
        spark,
        ("http://e/g", "http://e/s", "http://e/p", "iri", "http://e/o", None, None),
        ("_:g1", "http://e/s", "http://e/p", "literal", "x", "en", None),
        ("_:default", "http://e/s", "http://e/p", "literal", "plain", None, None),
        (None, "_:b1", "http://e/p", "bnode", "_:b2", None, None),
    )
    assert sorted(r.line for r in to_nquads(df).collect()) == sorted([
        "<http://e/s> <http://e/p> <http://e/o> <http://e/g> .",
        '<http://e/s> <http://e/p> "x"@en _:g1 .',
        '<http://e/s> <http://e/p> "plain" .',
        "_:b1 <http://e/p> _:b2 .",
    ])


def test_nquads_roundtrip_through_strict_quad_parser(spark):
    from parser_rdf_spark.serialize import to_nquads

    df = _quad_rows(
        spark,
        ("http://e/g", "http://e/s", "http://e/p", "literal", 'a"b\\c\nd', None, None),
        ("_:graphb", "_:s", "http://e/p", "iri", "http://e/o", None, None),
        (None, "http://e/s", "http://e/p", "literal", "42", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
    )
    reparsed = []
    for r in to_nquads(df).collect():
        reparsed.extend(parse_document(r.line, allow_graph=True))
    key = lambda q: tuple("" if x is None else x for x in q)  # noqa: E731
    got = sorted(((t.graph, t.subj, t.pred, t.obj_kind, t.obj_value,
                   t.obj_lang, t.obj_datatype) for t in reparsed), key=key)
    want = sorted([
        ("http://e/g", "http://e/s", "http://e/p", "literal", 'a"b\\c\nd', None, None),
        ("_:graphb", "_:s", "http://e/p", "iri", "http://e/o", None, None),
        (None, "http://e/s", "http://e/p", "literal", "42", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
    ], key=key)
    assert got == want


# ---------------------------------------------------------------------------
# JSON-LD serialization (to_jsonld_docs)
# ---------------------------------------------------------------------------

def test_jsonld_golden_doc(spark):
    import json

    from parser_rdf_spark.serialize import to_jsonld_docs

    df = _rows(
        spark,
        ("http://example.org/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "iri", "http://xmlns.com/foaf/0.1/Person", None, None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/name",
         "literal", 'Al"i\\ce\n', None, None),
        ("_:b1", "http://xmlns.com/foaf/0.1/name", "literal", "Bob", "en", None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/age",
         "literal", "42", None, "http://www.w3.org/2001/XMLSchema#integer"),
    )
    [doc] = [r.jsonld for r in to_jsonld_docs(df).collect()]
    parsed = json.loads(doc)  # valid JSON, escaping correct
    assert parsed["@context"]["foaf"] == "http://xmlns.com/foaf/0.1/"
    nodes = {n["@id"]: n for n in parsed["@graph"]}
    alice = nodes["http://example.org/alice"]
    assert alice["rdf:type"] == [{"@id": "http://xmlns.com/foaf/0.1/Person"}]
    assert alice["foaf:name"] == [{"@value": 'Al"i\\ce\n'}]
    assert alice["foaf:age"] == [{"@value": "42", "@type": "xsd:integer"}]
    assert nodes["_:b1"]["foaf:name"] == [{"@value": "Bob", "@language": "en"}]


def test_jsonld_roundtrip_quartet_through_spark_pipeline(spark):
    """Serialize the quartet's triples to JSON-LD and re-parse through
    the FULL Spark pipeline (fmt=json-ld): same multiset, bnode labels
    modulo the extra doc-scope layer (P5)."""
    import re

    from parser_rdf_spark import w3c_fixtures as w3c
    from parser_rdf_spark.parse import parse_pages, triples_of
    from parser_rdf_spark.serialize import to_jsonld_docs

    def norm(term):
        return re.sub(r"^_:(?:d[0-9a-f]+-)+", "_:", term)

    docs = {f"https://quartet.example.org/{n}": c for n, c in w3c.SAMPLES.items()}
    t1 = triples_of(parse_pages(pages_df(spark, docs)))

    redocs = {r.doc_url: r.jsonld for r in to_jsonld_docs(t1).collect()}
    t2 = triples_of(parse_pages(pages_df(spark, redocs), fmt="json-ld"))

    key = lambda r: (r.doc_url, norm(r.subj), r.pred, r.obj_kind,  # noqa: E731
                     norm(r.obj_value) if r.obj_kind == "bnode" else r.obj_value,
                     r.obj_lang or "", r.obj_datatype or "")
    assert sorted(map(key, t1.collect())) == sorted(map(key, t2.collect()))


def test_jsonld_roundtrip_random_bulk(spark):
    """Seeded-random bulk property test: 300 random triples over 30 docs
    serialized by the engine, re-parsed by the pure JSON-LD parser."""
    import random

    from parser_rdf_spark.jsonld import parse_document as jsonld_parse
    from parser_rdf_spark.schemas import TRIPLES
    from parser_rdf_spark.serialize import to_jsonld_docs

    rng = random.Random(7)
    NS = ["http://xmlns.com/foaf/0.1/", "http://example.org/v/",
          "http://www.w3.org/2000/01/rdf-schema#"]

    def iri():
        local_alpha = "abzAZ09_-~!$&'()*+=/?.%\u00e9\u4e2d"
        n = rng.randint(1, 8)
        return rng.choice(NS) + "".join(rng.choice(local_alpha) for _ in range(n))

    def bnode():
        return "_:" + "".join(rng.choice("ab01_") for _ in range(rng.randint(1, 5)))

    def lit():
        alpha = 'ab \\"\n\r\t\u00e9\u4e2d\U0001f600\'`{}[]:,'
        return "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))

    rows = []
    for i in range(300):
        doc = f"https://r/{i % 30}"
        s = bnode() if rng.random() < 0.2 else iri()
        p = iri()
        r = rng.random()
        if r < 0.3:
            row = (doc, None, s, p, "iri", iri(), None, None, i + 1)
        elif r < 0.4:
            row = (doc, None, s, p, "bnode", bnode(), None, None, i + 1)
        elif r < 0.6:
            row = (doc, None, s, p, "literal", lit(), rng.choice(["en", "en-GB", "de"]), None, i + 1)
        elif r < 0.8:
            row = (doc, None, s, p, "literal", lit(), None, iri(), i + 1)
        else:
            row = (doc, None, s, p, "literal", lit(), None, None, i + 1)
        rows.append(row)

    df = spark.createDataFrame(rows, TRIPLES)
    got = []
    for r in to_jsonld_docs(df).collect():
        triples, _ = jsonld_parse(r.jsonld)
        for t in triples:
            got.append((r.doc_url, t.subj, t.pred, t.obj_kind, t.obj_value,
                        t.obj_lang, t.obj_datatype))
    want = [(d, s, p, k, v, lg, dt) for (d, _, s, p, k, v, lg, dt, _ln) in rows]
    assert sorted(got) == sorted(want)


def test_write_jsonld_lines_are_independent_documents(spark, tmp_path):
    from parser_rdf_spark.jsonld import parse_document as jsonld_parse
    from parser_rdf_spark.serialize import write_jsonld

    df = _rows(
        spark,
        ("http://e/s1", "http://e/p", "iri", "http://e/o", None, None),
        ("http://e/s2", "http://e/p", "literal", "x", None, None),
    )
    out = str(tmp_path / "jsonld")
    write_jsonld(df, out, partitions=1)
    parsed = []
    for r in spark.read.text(out).collect():
        triples, _ = jsonld_parse(r.value)
        parsed.extend(triples)
    assert len(parsed) == 2


# ---------------------------------------------------------------------------
# RDF/XML serialization (to_rdfxml_docs)
# ---------------------------------------------------------------------------

def test_rdfxml_golden_doc_and_escaping(spark):
    from parser_rdf_spark.rdfxml import parse_document as rdfxml_parse
    from parser_rdf_spark.serialize import to_rdfxml_docs

    df = _rows(
        spark,
        ("http://example.org/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "iri", "http://xmlns.com/foaf/0.1/Person", None, None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/name",
         "literal", 'Al<i&ce>\n"q"', None, None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/knows",
         "iri", "http://example.org/bob?a=1&b=2", None, None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/age",
         "literal", "42", None, "http://www.w3.org/2001/XMLSchema#integer"),
        ("http://example.org/bob?a=1&b=2", "http://xmlns.com/foaf/0.1/name",
         "literal", "Bob", "en", None),
    )
    [doc] = [r.rdfxml for r in to_rdfxml_docs(df).collect()]
    assert 'xmlns:foaf="http://xmlns.com/foaf/0.1/"' in doc
    assert "&amp;b=2" in doc and "&lt;i&amp;ce&gt;" in doc
    triples, _ = rdfxml_parse(doc)
    got = sorted((t.subj, t.pred, t.obj_kind, t.obj_value, t.obj_lang, t.obj_datatype)
                 for t in triples)
    want = sorted([
        ("http://example.org/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "iri", "http://xmlns.com/foaf/0.1/Person", None, None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/name",
         "literal", 'Al<i&ce>\n"q"', None, None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/knows",
         "iri", "http://example.org/bob?a=1&b=2", None, None),
        ("http://example.org/alice", "http://xmlns.com/foaf/0.1/age",
         "literal", "42", None, "http://www.w3.org/2001/XMLSchema#integer"),
        ("http://example.org/bob?a=1&b=2", "http://xmlns.com/foaf/0.1/name",
         "literal", "Bob", "en", None),
    ], key=lambda q: tuple("" if x is None else x for x in q))
    got = sorted(got, key=lambda q: tuple("" if x is None else x for x in q))
    assert got == want


def test_rdfxml_roundtrip_random_bulk_ground(spark):
    """Seeded-random GROUND (bnode-free — the documented subset) bulk
    round-trip: odd namespaces, xml-special characters in literals,
    datatypes, langtags."""
    import random

    from parser_rdf_spark.rdfxml import parse_document as rdfxml_parse
    from parser_rdf_spark.schemas import TRIPLES
    from parser_rdf_spark.serialize import to_rdfxml_docs

    rng = random.Random(13)
    NS = ["http://xmlns.com/foaf/0.1/", "http://example.org/v?q=1&r=2#",
          "http://www.w3.org/2000/01/rdf-schema#"]

    def pred():
        n = rng.randint(1, 6)
        return rng.choice(NS) + "p" + "".join(rng.choice("abz09_-.") for _ in range(n))

    def iri():
        n = rng.randint(1, 8)
        return "http://e.org/" + "".join(rng.choice("abzAZ09_-~!$&'()*+=/?.%é中") for _ in range(n))

    def lit():
        alpha = 'ab <>&"\n\r\té中\U0001f600\']]>'
        return "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))

    rows = []
    for i in range(200):
        doc = f"https://r/{i % 20}"
        s, p = iri(), pred()
        r = rng.random()
        if r < 0.3:
            row = (doc, None, s, p, "iri", iri(), None, None, i + 1)
        elif r < 0.55:
            row = (doc, None, s, p, "literal", lit(), rng.choice(["en", "en-GB"]), None, i + 1)
        elif r < 0.8:
            row = (doc, None, s, p, "literal", lit(), None, iri(), i + 1)
        else:
            row = (doc, None, s, p, "literal", lit(), None, None, i + 1)
        rows.append(row)

    df = spark.createDataFrame(rows, TRIPLES)
    got = []
    for r in to_rdfxml_docs(df).collect():
        triples, _ = rdfxml_parse(r.rdfxml)
        for t in triples:
            got.append((r.doc_url, t.subj, t.pred, t.obj_kind, t.obj_value,
                        t.obj_lang, t.obj_datatype))
    want = [(d, s, p, k, v, lg, dt) for (d, _, s, p, k, v, lg, dt, _ln) in rows]
    assert sorted(got) == sorted(want)


def test_rdfxml_bnode_error_and_skolemize(spark):
    from py4j.protocol import Py4JJavaError

    from parser_rdf_spark.rdfxml import parse_document as rdfxml_parse
    from parser_rdf_spark.serialize import to_rdfxml_docs

    df = _rows(
        spark,
        ("_:b1", "http://e/p", "literal", "x", None, None),
        ("http://e/s", "http://e/q", "bnode", "_:b1", None, None),
    )
    with pytest.raises(Exception) as exc:
        to_rdfxml_docs(df).collect()
    assert "rdf:nodeID-free" in str(exc.value)

    [doc] = [r.rdfxml for r in to_rdfxml_docs(df, on_bnode="skolemize").collect()]
    triples, _ = rdfxml_parse(doc)
    got = sorted((t.subj, t.pred, t.obj_kind, t.obj_value) for t in triples)
    assert got == [
        ("http://e/s", "http://e/q", "iri", "urn:bnode:b1"),
        ("urn:bnode:b1", "http://e/p", "literal", "x"),
    ]


def test_rdfxml_illegal_control_char_raises(spark):
    from parser_rdf_spark.serialize import to_rdfxml_docs

    df = _rows(spark, ("http://e/s", "http://e/p", "literal", "a\x01b", None, None))
    with pytest.raises(Exception) as exc:
        to_rdfxml_docs(df).collect()
    assert "XML-1.0-illegal" in str(exc.value)


def test_rdfxml_unsplittable_predicate_raises(spark):
    from parser_rdf_spark.serialize import to_rdfxml_docs

    df = _rows(spark, ("http://e/s", "http://e/p/", "literal", "x", None, None))
    with pytest.raises(Exception) as exc:
        to_rdfxml_docs(df).collect()
    assert "NCName" in str(exc.value)
