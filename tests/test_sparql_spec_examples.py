"""SPARQL 1.1 specification worked examples, evaluated verbatim.

Each test reproduces a data+query+results triple PUBLISHED in the W3C
SPARQL 1.1 Query recommendation (https://www.w3.org/TR/sparql11-query/,
section numbers in the test names) — the spec's own examples are the
most citable conformance evidence short of the full test suite. Data is
entered as the spec's triples; lang-tag/datatype-sensitive examples run
in term mode over the encoded relation, structure-only examples over
the plain (subj, pred, obj) relation."""

import pytest

from parser_rdf_spark import schemas
from parser_rdf_spark.bgp import terms_spo
from parser_rdf_spark.sparql import sparql_query

FOAF = "http://xmlns.com/foaf/0.1/"
DC = "http://purl.org/dc/elements/1.1/"
DC10 = "http://purl.org/dc/elements/1.0/"
NS = "http://example.org/ns#"
ORG = "http://books.example/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _spo(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _terms(spark, rows):
    """rows: (subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)"""
    full = [("d", None, s, p, k, v, lg, dt, i)
            for i, (s, p, k, v, lg, dt) in enumerate(rows)]
    return terms_spo(spark.createDataFrame(full, schema=schemas.TRIPLES))


def test_spec_2_1_simple_query(spark):
    # §2.1: one triple, one matching solution
    kg = _spo(spark, [("http://example.org/book/book1",
                       f"{DC}title", "SPARQL Tutorial")])
    got = sparql_query(kg, f"""
        SELECT ?title
        WHERE {{ <http://example.org/book/book1> <{DC}title> ?title . }}
    """).collect()
    assert [r.title for r in got] == ["SPARQL Tutorial"]


def test_spec_2_3_matching_language_tags(spark):
    # §2.3.1: "cat"@en does NOT match the plain literal "cat";
    # the @en-tagged pattern does
    kg = _terms(spark, [
        ("http://example.org/x", f"{NS}p", "literal", "cat", "en", None),
    ])
    q_plain = f'SELECT ?v WHERE {{ ?v <{NS}p> "cat" }}'
    q_en = f'SELECT ?v WHERE {{ ?v <{NS}p> "cat"@en }}'
    assert sparql_query(kg, q_plain, term_mode=True).count() == 0
    assert [r.v for r in sparql_query(kg, q_en, term_mode=True).collect()] \
        == ["<http://example.org/x>"]


def test_spec_2_3_matching_integer(spark):
    # §2.3.2: bare 42 abbreviates "42"^^xsd:integer
    kg = _terms(spark, [
        ("http://example.org/y", f"{NS}p", "literal", "42", None,
         f"{XSD}integer"),
    ])
    got = sparql_query(kg, f"SELECT ?v WHERE {{ ?v <{NS}p> 42 }}",
                       term_mode=True).collect()
    assert [r.v for r in got] == ["<http://example.org/y>"]


SPEC_6_DATA = [
    ("_:a", f"{FOAF}name", "Alice"),
    ("_:a", f"{FOAF}mbox", "mailto:alice@example.com"),
    ("_:a", f"{FOAF}mbox", "mailto:alice@work.example"),
    ("_:b", f"{FOAF}name", "Bob"),
]


def test_spec_6_1_optional(spark):
    # §6.1: Bob has no mbox but still appears, mbox unbound
    kg = _spo(spark, SPEC_6_DATA)
    got = sparql_query(kg, f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?name ?mbox
        WHERE {{ ?x foaf:name ?name .
                 OPTIONAL {{ ?x foaf:mbox ?mbox }} }}
    """).collect()
    sols = {(r.name, r.mbox) for r in got}
    assert sols == {
        ("Alice", "mailto:alice@example.com"),
        ("Alice", "mailto:alice@work.example"),
        ("Bob", None),
    }


def test_spec_7_union(spark):
    # §7: titles from both the dc10 and dc11 vocabularies
    kg = _spo(spark, [
        ("_:a", f"{DC10}title", "SPARQL Query Language Tutorial"),
        ("_:a", f"{DC10}creator", "Alice"),
        ("_:b", f"{DC}title", "SPARQL Protocol Tutorial"),
        ("_:b", f"{DC}creator", "Bob"),
        ("_:c", f"{DC10}title", "SPARQL"),
        ("_:c", f"{DC}title", "SPARQL (updated)"),
    ])
    got = sparql_query(kg, f"""
        PREFIX dc10: <{DC10}>
        PREFIX dc11: <{DC}>
        SELECT ?title
        WHERE {{ {{ ?book dc10:title ?title }} UNION
                 {{ ?book dc11:title ?title }} }}
    """).collect()
    assert sorted(r.title for r in got) == sorted([
        "SPARQL Query Language Tutorial", "SPARQL Protocol Tutorial",
        "SPARQL", "SPARQL (updated)",
    ])


NEG_DATA = [
    ("http://example/alice", "rdf:type", f"{FOAF}Person"),
    ("http://example/alice", f"{FOAF}name", "Alice"),
    ("http://example/bob", "rdf:type", f"{FOAF}Person"),
    ("http://example/bob", f"{FOAF}name", "Bob"),
    ("http://example/alice", f"{FOAF}mbox", "mailto:alice@example.com"),
]


def test_spec_8_1_filter_not_exists(spark):
    # §8.1.1 shape: persons with no mbox
    kg = _spo(spark, [(s, p.replace("rdf:type",
                                    "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), o)
                      for s, p, o in NEG_DATA])
    got = sparql_query(kg, f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?name
        WHERE {{ ?x foaf:name ?name .
                 FILTER NOT EXISTS {{ ?x foaf:mbox ?mbox }} }}
    """).collect()
    assert [r.name for r in got] == ["Bob"]


def test_spec_8_3_minus(spark):
    # §8.3: MINUS removes solutions compatible on the shared variable
    kg = _spo(spark, [(s, p.replace("rdf:type",
                                    "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), o)
                      for s, p, o in NEG_DATA])
    got = sparql_query(kg, f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?name
        WHERE {{ ?x foaf:name ?name .
                 MINUS {{ ?x foaf:mbox ?mbox }} }}
    """).collect()
    assert [r.name for r in got] == ["Bob"]


def test_spec_6_2_constraints_in_optional(spark):
    # §6.2: the FILTER inside OPTIONAL is the left-join condition —
    # "SPARQL Tutorial" (price 42 fails ?price < 30) keeps its row with
    # ?price unbound; "The Semantic Web" (price 23) binds it
    kg = _terms(spark, [
        ("_:a", f"{DC}title", "literal", "SPARQL Tutorial", None, None),
        ("_:a", f"{NS}price", "literal", "42", None, f"{XSD}integer"),
        ("_:b", f"{DC}title", "literal", "The Semantic Web", None, None),
        ("_:b", f"{NS}price", "literal", "23", None, f"{XSD}integer"),
    ])
    got = sparql_query(kg, f"""
        PREFIX dc: <{DC}>
        PREFIX ns: <{NS}>
        SELECT ?title ?price
        WHERE {{ ?x dc:title ?title .
                 OPTIONAL {{ ?x ns:price ?price . FILTER (?price < 30) }} }}
    """, term_mode=True).collect()
    assert {(r.title, r.price) for r in got} == {
        ('"SPARQL Tutorial"', None),
        ('"The Semantic Web"', f'"23"^^<{XSD}integer>'),
    }


def test_spec_6_3_multiple_optionals(spark):
    # §6.3: two independent OPTIONALs bind independently
    kg = _spo(spark, [
        ("_:a", f"{FOAF}name", "Alice"),
        ("_:a", f"{FOAF}homepage", "http://work.example.org/alice/"),
        ("_:b", f"{FOAF}name", "Bob"),
        ("_:b", f"{FOAF}mbox", "mailto:bob@work.example"),
    ])
    got = sparql_query(kg, f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?name ?mbox ?hpage
        WHERE {{ ?x foaf:name ?name .
                 OPTIONAL {{ ?x foaf:mbox ?mbox }} .
                 OPTIONAL {{ ?x foaf:homepage ?hpage }} }}
    """).collect()
    assert {(r.name, r.mbox, r.hpage) for r in got} == {
        ("Alice", None, "http://work.example.org/alice/"),
        ("Bob", "mailto:bob@work.example", None),
    }


def test_spec_8_3_3_minus_vs_not_exists_disjoint(spark):
    # §8.3.3: over { :a :b :c }, NOT EXISTS { ?x ?y ?z } removes the
    # solution (the disjoint group HAS a solution) while
    # MINUS { ?x ?y ?z } removes nothing (no shared domain)
    kg = _spo(spark, [("http://example/a", "http://example/b",
                       "http://example/c")])
    ne = sparql_query(kg, """
        SELECT * WHERE { ?s ?p ?o FILTER NOT EXISTS { ?x ?y ?z } }
    """)
    assert ne.count() == 0
    mi = sparql_query(kg, """
        SELECT * WHERE { ?s ?p ?o MINUS { ?x ?y ?z } }
    """)
    assert mi.count() == 1


def test_spec_9_property_path_plus(spark):
    # §9.3 shape: foaf:knows+ reaches transitively
    kg = _spo(spark, [
        ("http://example/a", f"{FOAF}knows", "http://example/b"),
        ("http://example/b", f"{FOAF}knows", "http://example/c"),
    ])
    got = sparql_query(kg, f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?y WHERE {{ <http://example/a> foaf:knows+ ?y }}
    """).collect()
    assert sorted(r.y for r in got) == ["http://example/b", "http://example/c"]


def test_spec_10_1_bind_discounted_price(spark):
    # §10.1: BIND(?p*(1-?discount) AS ?price) with a FILTER over it
    kg = _terms(spark, [
        (f"{ORG}book1", f"{DC}title", "literal", "SPARQL Tutorial", None, None),
        (f"{ORG}book1", f"{NS}price", "literal", "42", None, f"{XSD}integer"),
        (f"{ORG}book1", f"{NS}discount", "literal", "0.2", None, f"{XSD}decimal"),
        (f"{ORG}book2", f"{DC}title", "literal", "The Semantic Web", None, None),
        (f"{ORG}book2", f"{NS}price", "literal", "23", None, f"{XSD}integer"),
        (f"{ORG}book2", f"{NS}discount", "literal", "0.25", None, f"{XSD}decimal"),
    ])
    got = sparql_query(kg, f"""
        PREFIX dc: <{DC}> PREFIX ns: <{NS}>
        SELECT ?title ?price
        WHERE {{ ?x ns:price ?p .
                 ?x ns:discount ?discount .
                 BIND(?p * (1 - ?discount) AS ?price)
                 FILTER(?price < 20)
                 ?x dc:title ?title . }}
    """, term_mode=True).collect()
    assert [(r.title, round(r.price, 2)) for r in got] == \
        [('"The Semantic Web"', 17.25)]


def test_spec_11_1_aggregate_sum(spark):
    # §11.1: SUM of literal values grouped by org, with HAVING
    kg = _terms(spark, [
        (f"{ORG}org1", f"{ORG}affiliates", "iri", f"{ORG}auth1", None, None),
        (f"{ORG}org1", f"{ORG}affiliates", "iri", f"{ORG}auth2", None, None),
        (f"{ORG}auth1", f"{ORG}writesBook", "iri", f"{ORG}book1", None, None),
        (f"{ORG}book1", f"{ORG}price", "literal", "9", None, f"{XSD}integer"),
        (f"{ORG}auth2", f"{ORG}writesBook", "iri", f"{ORG}book3", None, None),
        (f"{ORG}book3", f"{ORG}price", "literal", "7", None, f"{XSD}integer"),
        (f"{ORG}org2", f"{ORG}affiliates", "iri", f"{ORG}auth3", None, None),
        (f"{ORG}auth3", f"{ORG}writesBook", "iri", f"{ORG}book4", None, None),
        (f"{ORG}book4", f"{ORG}price", "literal", "7", None, f"{XSD}integer"),
    ])
    got = sparql_query(kg, f"""
        PREFIX : <{ORG}>
        SELECT (SUM(?lprice) AS ?totalPrice)
        WHERE {{ ?org :affiliates ?auth .
                 ?auth :writesBook ?book .
                 ?book :price ?lprice . }}
        GROUP BY ?org
        HAVING (SUM(?lprice) > 10)
    """, term_mode=True).collect()
    assert [r.totalPrice for r in got] == [16.0]


def test_spec_15_order_limit_offset(spark):
    # §15: ORDER BY ?name with LIMIT/OFFSET pagination
    kg = _spo(spark, [
        ("_:1", f"{FOAF}name", "Eve"),
        ("_:2", f"{FOAF}name", "Alice"),
        ("_:3", f"{FOAF}name", "Bob"),
        ("_:4", f"{FOAF}name", "Dan"),
        ("_:5", f"{FOAF}name", "Carol"),
    ])
    got = sparql_query(kg, f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?name WHERE {{ ?x foaf:name ?name }}
        ORDER BY ?name LIMIT 2 OFFSET 1
    """).collect()
    assert [r.name for r in got] == ["Bob", "Carol"]


def test_spec_17_4_langmatches_filter(spark):
    # §17.4.3.13 shape: langMatches(lang(?title), "FR")
    kg = _terms(spark, [
        ("http://example/b", f"{DC}title", "literal", "SPARQL", "en", None),
        ("http://example/b", f"{DC}title", "literal", "SPARQL (fr)", "fr", None),
    ])
    got = sparql_query(kg, f"""
        PREFIX dc: <{DC}>
        SELECT ?title
        WHERE {{ ?x dc:title ?title .
                 FILTER(langMatches(LANG(?title), "FR")) }}
    """, term_mode=True).collect()
    assert [r.title for r in got] == ['"SPARQL (fr)"@fr']


# ---------------------------------------------------------------------------
# SPARQL 1.1 Update recommendation worked examples
# (https://www.w3.org/TR/sparql11-update/, section numbers below)
# ---------------------------------------------------------------------------

def test_update_spec_3_1_1_insert_data(spark):
    # §3.1.1 Example 1: add a title triple to the book
    from parser_rdf_spark.sparql import sparql_update

    store = _spo(spark, [
        ("http://example/book1", f"{DC}creator", "A.N.Other"),
    ])
    out = sparql_update(store, f"""
        PREFIX dc: <{DC}>
        INSERT DATA
        {{ <http://example/book1> dc:title "A new book" }}
    """)
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert got == {
        ("http://example/book1", f"{DC}creator", "A.N.Other"),
        ("http://example/book1", f"{DC}title", "A new book"),
    }


def test_update_spec_3_1_2_delete_data(spark):
    # §3.1.2 Example 2: remove the outdated title
    from parser_rdf_spark.sparql import sparql_update

    store = _spo(spark, [
        ("http://example/book2", f"{DC}title", "David Copperfield"),
        ("http://example/book2", f"{DC}creator", "Edmund Wells"),
    ])
    out = sparql_update(store, f"""
        PREFIX dc: <{DC}>
        DELETE DATA
        {{ <http://example/book2> dc:title "David Copperfield" }}
    """)
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert got == {("http://example/book2", f"{DC}creator", "Edmund Wells")}


def test_update_spec_3_1_3_delete_insert_where(spark):
    # §3.1.3 Example 3 shape: rename Bill to William wherever he appears
    # as a foaf:givenName
    from parser_rdf_spark.sparql import sparql_update

    store = _spo(spark, [
        ("http://example/president25", f"{FOAF}givenName", "Bill"),
        ("http://example/president25", f"{FOAF}familyName", "McKinley"),
        ("http://example/president27", f"{FOAF}givenName", "Bill"),
        ("http://example/president27", f"{FOAF}familyName", "Taft"),
        ("http://example/president42", f"{FOAF}givenName", "Bill"),
        ("http://example/president42", f"{FOAF}familyName", "Clinton"),
    ])
    out = sparql_update(store, f"""
        PREFIX foaf: <{FOAF}>
        DELETE {{ ?person foaf:givenName "Bill" }}
        INSERT {{ ?person foaf:givenName "William" }}
        WHERE {{ ?person foaf:givenName "Bill" }}
    """)
    names = sorted((r.subj, r.obj) for r in out.collect()
                   if r.pred == f"{FOAF}givenName")
    assert names == [
        ("http://example/president25", "William"),
        ("http://example/president27", "William"),
        ("http://example/president42", "William"),
    ]


def test_update_spec_3_1_3_delete_where_shorthand(spark):
    # §3.1.3.1 DELETE WHERE: drop every statement about anyone whose
    # givenName is Fred
    from parser_rdf_spark.sparql import sparql_update

    store = _spo(spark, [
        ("http://example/william", f"{FOAF}givenName", "William"),
        ("http://example/william", f"{FOAF}mbox", "mailto:bill@example"),
        ("http://example/fred", f"{FOAF}givenName", "Fred"),
        ("http://example/fred", f"{FOAF}mbox", "mailto:fred@example"),
    ])
    out = sparql_update(store, f"""
        PREFIX foaf: <{FOAF}>
        DELETE WHERE {{ ?person foaf:givenName "Fred" ;
                                ?property ?value }}
    """)
    got = {r.subj for r in out.collect()}
    assert got == {"http://example/william"}
