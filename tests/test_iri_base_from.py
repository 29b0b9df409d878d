"""RFC 3986 resolution (iri.py), the SPARQL ``BASE`` prologue, and
``FROM`` / ``FROM NAMED`` dataset clauses.

The reference scopes out relative-IRI resolution entirely
(docs/spec-completeness.md:147); both features here are engine
extensions of the SPARQL front-end, pinned against the RFC 3986 §5.4
reference examples and the SPARQL 1.1 §13.2 dataset semantics."""

import pytest

from parser_rdf_spark.iri import (
    is_absolute_iri,
    remove_dot_segments,
    resolve_iri,
)
from parser_rdf_spark.sparql import SparqlError, parse_sparql, sparql_query


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# resolver unit pins — RFC 3986 §5.4.1 normal + §5.4.2 abnormal examples
# ---------------------------------------------------------------------------

BASE = "http://a/b/c/d;p?q"

RFC_NORMAL = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
]

RFC_ABNORMAL = [
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    # strict mode: same-scheme relative reference is NOT re-interpreted
    ("http:g", "http:g"),
]


@pytest.mark.parametrize("ref,want", RFC_NORMAL + RFC_ABNORMAL)
def test_rfc3986_examples(ref, want):
    assert resolve_iri(BASE, ref) == want


def test_remove_dot_segments_edges():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
    assert remove_dot_segments("") == ""
    assert remove_dot_segments("..") == ""
    assert remove_dot_segments("/..") == "/"


def test_is_absolute():
    assert is_absolute_iri("urn:ex:p")
    assert is_absolute_iri("http://a/b#frag")
    assert not is_absolute_iri("g/h")
    assert not is_absolute_iri("//host/p")
    assert not is_absolute_iri("#frag")


def test_non_hierarchical_base():
    # urllib.parse.urljoin would mangle urn: (not in uses_relative);
    # the strict algorithm handles any scheme
    assert resolve_iri("urn:ex:a/b", "c") == "urn:ex:a/c"
    assert resolve_iri("urn:ex:a", "urn:other:x") == "urn:other:x"


# ---------------------------------------------------------------------------
# BASE prologue
# ---------------------------------------------------------------------------

KG = [
    ("http://ex.org/kg/nation/1", "rdf:type", "http://ex.org/kg/class/Nation"),
    ("http://ex.org/kg/nation/2", "rdf:type", "http://ex.org/kg/class/Nation"),
    ("http://ex.org/kg/nation/1", "http://ex.org/kg/pred/name", "FRANCE"),
    ("http://ex.org/kg/nation/2", "http://ex.org/kg/pred/name", "KENYA"),
]


@pytest.fixture(scope="module")
def base_kg(spark):
    return spark.createDataFrame(KG, "subj string, pred string, obj string")


def test_base_resolves_relative_irirefs(base_kg):
    out = sparql_query(base_kg, """
        BASE <http://ex.org/kg/>
        SELECT ?n ?name WHERE {
          ?n <pred/name> ?name .
          ?n rdf:type <class/Nation> .
        }
    """)
    assert rows(out) == [
        ("http://ex.org/kg/nation/1", "FRANCE"),
        ("http://ex.org/kg/nation/2", "KENYA"),
    ]


def test_base_dot_segments_and_constants(base_kg):
    out = sparql_query(base_kg, """
        BASE <http://ex.org/kg/sub/dir/>
        SELECT ?name WHERE { <../../nation/1> <./../../pred/name> ?name }
    """)
    assert rows(out) == [("FRANCE",)]


def test_base_applies_to_prefix_declarations(base_kg):
    out = sparql_query(base_kg, """
        BASE <http://ex.org/>
        PREFIX p: <kg/pred/>
        SELECT ?name WHERE { <kg/nation/2> p:name ?name }
    """)
    assert rows(out) == [("KENYA",)]


def test_base_chaining_and_absolute_untouched():
    spec = parse_sparql("""
        BASE <http://a/one/>
        BASE <two/>
        SELECT ?s WHERE { ?s <p> <urn:abs:x> }
    """)
    assert spec["patterns"] == [("?s", "http://a/one/two/p", "urn:abs:x")]


def test_base_in_expressions(base_kg):
    out = sparql_query(base_kg, """
        BASE <http://ex.org/kg/>
        SELECT ?n WHERE {
          ?n rdf:type <class/Nation> .
          FILTER (?n = <nation/1>)
        }
    """)
    assert rows(out) == [("http://ex.org/kg/nation/1",)]


def test_relative_base_rejected():
    with pytest.raises(SparqlError, match="absolute"):
        parse_sparql("BASE <kg/> SELECT ?s WHERE { ?s <p> ?o }")


def test_no_base_keeps_relative_verbatim(base_kg):
    # without BASE the lexical form matches the string-typed relation
    out = sparql_query(base_kg, 'SELECT ?s WHERE { ?s <pred/name> "FRANCE" }')
    assert rows(out) == []


# ---------------------------------------------------------------------------
# FROM / FROM NAMED dataset construction
# ---------------------------------------------------------------------------

DQUADS = [
    ("_:default", "d", "type", "Person"),      # original default graph
    ("urn:g1", "a", "knows", "b"),
    ("urn:g1", "a", "type", "Person"),
    ("urn:g2", "b", "knows", "c"),
    ("urn:g2", "a", "knows", "b"),             # duplicate of g1's triple
    ("urn:g3", "c", "knows", "d"),
]


@pytest.fixture(scope="module")
def dquads(spark):
    return spark.createDataFrame(
        DQUADS, "graph string, subj string, pred string, obj string")


def test_from_builds_merged_default(dquads):
    out = sparql_query(dquads, """
        SELECT ?s ?o FROM <urn:g1> FROM <urn:g2> WHERE { ?s knows ?o }
    """)
    # set-union: the duplicated (a knows b) appears once
    assert rows(out) == [("a", "b"), ("b", "c")]


def test_from_excludes_original_default(dquads):
    out = sparql_query(dquads, """
        SELECT ?s FROM <urn:g1> WHERE { ?s type Person }
    """)
    assert rows(out) == [("a",)]  # d (original default) is out of dataset


def test_from_named_restricts_graph_patterns(dquads):
    out = sparql_query(dquads, """
        SELECT ?g ?s FROM NAMED <urn:g2> FROM NAMED <urn:g3>
        WHERE { GRAPH ?g { ?s knows ?o } }
    """)
    assert rows(out) == [("urn:g2", "a"), ("urn:g2", "b"), ("urn:g3", "c")]


def test_from_only_empties_named_set(dquads):
    out = sparql_query(dquads, """
        SELECT ?g FROM <urn:g1> WHERE { GRAPH ?g { ?s knows ?o } }
    """)
    assert rows(out) == []


def test_from_named_only_empties_default(dquads):
    out = sparql_query(dquads, """
        SELECT ?s FROM NAMED <urn:g1> WHERE { ?s knows ?o }
    """)
    assert rows(out) == []


def test_from_mixed_default_and_named(dquads):
    out = sparql_query(dquads, """
        SELECT ?s ?g FROM <urn:g1> FROM NAMED <urn:g2>
        WHERE { ?s type Person . GRAPH ?g { ?s knows ?o } }
    """)
    assert rows(out) == [("a", "urn:g2")]


def test_from_construct_shorthand(dquads):
    out = sparql_query(dquads, """
        CONSTRUCT FROM <urn:g3> WHERE { ?s knows ?o }
    """)
    assert rows(out) == [("c", "knows", "d")]


def test_from_ask(dquads):
    assert sparql_query(
        dquads, "ASK FROM <urn:g3> WHERE { c knows d }").collect()[0][0]
    assert not sparql_query(
        dquads, "ASK FROM <urn:g3> WHERE { a knows b }").collect()[0][0]


def test_from_on_triples_relation_raises(spark):
    kg = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string")
    with pytest.raises(SparqlError, match="quads relation"):
        sparql_query(kg, "SELECT ?s FROM <urn:g1> WHERE { ?s p ?o }")


def test_from_in_subselect_rejected():
    with pytest.raises(SparqlError, match="sub-SELECT"):
        parse_sparql("""
            SELECT ?s WHERE {
              { SELECT ?s FROM <urn:g1> WHERE { ?s p ?o } }
            }
        """)


def test_from_with_base(dquads):
    out = sparql_query(dquads, """
        BASE <urn:g1>
        SELECT ?s ?o FROM <> WHERE { ?s knows ?o }
    """)
    assert rows(out) == [("a", "b")]
