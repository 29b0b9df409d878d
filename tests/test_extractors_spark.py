"""Extraction queries: ports of the reference's decisive Unit/
Characterization assertions (SURVEY.md §5 item 3), run through the full
pipeline (pages → fused parse → relational extraction).

Reference sources for each pinned behavior are cited inline.
"""

import pytest

from parser_rdf_spark import w3c_fixtures as w3c
from parser_rdf_spark.extract import (
    extract_classes,
    extract_properties,
    extract_shapes,
)
from parser_rdf_spark.parse import docmeta_of, parse_pages, triples_of

from conftest import pages_df

TTL_PREAMBLE = """\
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
"""


def _triples(spark, ttl: str, url: str = "https://t.example.org/doc"):
    parsed = parse_pages(pages_df(spark, {url: TTL_PREAMBLE + ttl}))
    return triples_of(parsed)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return rows[0]


# ---------------------------------------------------------------------------
# classes (reference: tests/Unit/Extractors/ClassExtractorTest.php)
# ---------------------------------------------------------------------------

def test_class_detection_all_five_type_uris(spark):
    ttl = """
    ex:A a rdfs:Class .
    ex:B a owl:Class .
    ex:C a rdfs:Datatype .
    ex:D a rdfs:Container .
    ex:E a rdfs:Literal .
    ex:F a ex:SomethingElse .
    """
    out = extract_classes(_triples(spark, ttl))
    uris = {r.uri for r in out.collect()}
    assert uris == {f"http://example.org/{x}" for x in "ABCDE"}


def test_multilingual_labels_and_best_match(spark):
    # ClassExtractorTest:91-131 — labels keyed by lang; label prefers English
    ttl = """
    ex:Person a rdfs:Class ;
        rdfs:label "Persoon"@nl ;
        rdfs:label "Person"@en .
    """
    row = _one(extract_classes(_triples(spark, ttl)))
    assert row.labels == {"en": "Person", "nl": "Persoon"}
    assert row.label == "Person"


def test_label_fallback_first_when_no_english(spark):
    ttl = 'ex:P a rdfs:Class ; rdfs:label "Persona"@es ; rdfs:label "Personne"@fr .'
    row = _one(extract_classes(_triples(spark, ttl)))
    assert row.label == "Persona"


def test_untagged_label_fills_en_slot_only_if_empty(spark):
    # reference XML analogue: src/Extractors/ClassExtractor.php:197-207
    ttl = 'ex:P a rdfs:Class ; rdfs:label "Raw" ; rdfs:label "English"@en .'
    row = _one(extract_classes(_triples(spark, ttl)))
    assert row.labels["en"] == "English"
    ttl2 = 'ex:P a rdfs:Class ; rdfs:label "Raw" ; rdfs:label "Tweede"@nl .'
    row2 = _one(extract_classes(_triples(spark, ttl2)))
    assert row2.labels == {"nl": "Tweede", "en": "Raw"}


def test_descriptions_and_parent_classes(spark):
    ttl = """
    ex:Student a rdfs:Class ;
        rdfs:comment "A student"@en ;
        rdfs:subClassOf ex:Person ;
        rdfs:subClassOf ex:Learner .
    """
    row = _one(extract_classes(_triples(spark, ttl)))
    assert row.description == "A student"
    assert row.parent_classes == ["http://example.org/Person", "http://example.org/Learner"]


def test_class_without_labels_has_null_and_empty_map(spark):
    # ClassExtractorTest:270-300
    row = _one(extract_classes(_triples(spark, "ex:Thing a rdfs:Class .")))
    assert row.label is None
    assert row.labels == {}


def test_blank_node_classes_skipped_by_default(spark):
    ttl = """
    ex:Person a rdfs:Class .
    _:blank1 a rdfs:Class .
    """
    out = extract_classes(_triples(spark, ttl))
    assert [r.uri for r in out.collect()] == ["http://example.org/Person"]


def test_blank_node_classes_skolemized_on_request(spark):
    # tests/Unit/BlankNodeSkolemizationTest.php:67-83
    ttl = """
    ex:Person a rdfs:Class .
    _:blank1 a rdfs:Class ; rdfs:label "Anon"@en .
    """
    out = extract_classes(_triples(spark, ttl), include_skolemized=True)
    uris = sorted(r.uri for r in out.collect())
    assert uris[0] == "http://example.org/Person"
    assert uris[1].startswith("urn:bnode:_:")


def test_see_also_iris_only_and_annotations_prefixed(spark):
    # tests/Unit/RdfsVocabularyCompletenessTest.php:26-168 + annotations test
    ttl = """
    ex:Person a rdfs:Class ;
        rdfs:seeAlso <http://example.org/doc> ;
        rdfs:seeAlso "not an iri" ;
        rdfs:isDefinedBy <http://example.org/onto> ;
        skos:prefLabel "Person"@en .
    """
    row = _one(extract_classes(_triples(spark, ttl)))
    assert row.see_also == ["http://example.org/doc"]
    assert row.is_defined_by == ["http://example.org/onto"]
    props = [a.property for a in row.annotations]
    assert "skos:prefLabel" in props


def test_types_in_metadata(spark):
    ttl = "ex:P a rdfs:Class , owl:Class ."
    row = _one(extract_classes(_triples(spark, ttl)))
    assert set(row.types) == {
        "http://www.w3.org/2000/01/rdf-schema#Class",
        "http://www.w3.org/2002/07/owl#Class",
    }


# ---------------------------------------------------------------------------
# properties (reference: tests/Unit/Extractors/PropertyExtractorTest.php)
# ---------------------------------------------------------------------------

def test_property_type_determination(spark):
    # PropertyExtractor:140-153 — first matching type wins; default datatype
    ttl = """
    ex:a a owl:ObjectProperty .
    ex:b a owl:DatatypeProperty .
    ex:c a owl:AnnotationProperty .
    ex:d a rdf:Property .
    ex:e a owl:FunctionalProperty .
    """
    out = {r.uri.rsplit("/", 1)[1]: r for r in extract_properties(_triples(spark, ttl)).collect()}
    assert out["a"].property_type == "object"
    assert out["b"].property_type == "datatype"
    assert out["c"].property_type == "annotation"
    assert out["d"].property_type == "datatype"
    assert out["e"].property_type == "datatype"
    assert out["e"].is_functional is True
    assert out["a"].is_functional is False


def test_domain_range_simple(spark):
    ttl = """
    ex:name a rdf:Property ;
        rdfs:domain ex:Person ;
        rdfs:range rdfs:Literal .
    """
    row = _one(extract_properties(_triples(spark, ttl)))
    assert row.domain == ["http://example.org/Person"]
    assert row.range == ["http://www.w3.org/2000/01/rdf-schema#Literal"]


def test_domain_union_of_flattened(spark):
    # PropertyExtractor:164-218 — owl:unionOf RDF list traversal
    ttl = """
    ex:knows a owl:ObjectProperty ;
        rdfs:domain [ a owl:Class ; owl:unionOf ( ex:Person ex:Organization ) ] ;
        rdfs:range ex:Person .
    """
    row = _one(extract_properties(_triples(spark, ttl)))
    assert row.domain == ["http://example.org/Person", "http://example.org/Organization"]


def test_range_from_comment_fallback_patterns(spark):
    # PropertyExtractor:239-268 — the 6 ordered regexes
    cases = {
        "p1": ("The range of this property is a plain literal.",
               "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"),
        "p2": ("Range is rdfs:Literal values.",
               "http://www.w3.org/2001/XMLSchema#string"),
        "p3": ("The range is an xsd:string value.",
               "http://www.w3.org/2001/XMLSchema#string"),
        "p4": ("Range must be a dateTime stamp.",
               "http://www.w3.org/2001/XMLSchema#dateTime"),
        "p5": ("The range here is boolean.",
               "http://www.w3.org/2001/XMLSchema#boolean"),
        "p6": ("Its range is an integer count.",
               "http://www.w3.org/2001/XMLSchema#integer"),
    }
    ttl = "\n".join(
        f'ex:{k} a rdf:Property ; rdfs:comment "{text}"@en .' for k, (text, _) in cases.items()
    )
    out = {r.uri.rsplit("/", 1)[1]: r for r in extract_properties(_triples(spark, ttl)).collect()}
    for k, (_, want) in cases.items():
        assert out[k].range == [want], k


def test_formal_range_beats_comment_fallback(spark):
    ttl = """
    ex:p a rdf:Property ;
        rdfs:range ex:Thing ;
        rdfs:comment "The range of this property is a plain literal."@en .
    """
    row = _one(extract_properties(_triples(spark, ttl)))
    assert row.range == ["http://example.org/Thing"]


def test_parent_and_inverse_properties(spark):
    ttl = """
    ex:child a rdf:Property ;
        rdfs:subPropertyOf ex:parent ;
        owl:inverseOf ex:opposite .
    """
    row = _one(extract_properties(_triples(spark, ttl)))
    assert row.parent_properties == ["http://example.org/parent"]
    assert row.inverse_of == ["http://example.org/opposite"]


# ---------------------------------------------------------------------------
# shapes (reference: tests/Unit/Extractors/ShapeExtractorTest.php)
# ---------------------------------------------------------------------------

def test_node_shape_with_nested_property_shapes(spark):
    ttl = """
    ex:PersonShape a sh:NodeShape ;
        rdfs:label "Person shape"@en ;
        sh:targetClass ex:Person ;
        sh:property [
            sh:path ex:name ;
            sh:datatype <http://www.w3.org/2001/XMLSchema#string> ;
            sh:minCount "1" ;
            sh:maxCount "2"
        ] ;
        sh:property [
            sh:datatype <http://www.w3.org/2001/XMLSchema#string>
        ] .
    """
    row = _one(extract_shapes(_triples(spark, ttl)))
    assert row.uri == "http://example.org/PersonShape"
    assert row.label == "Person shape"
    assert row.target_class == "http://example.org/Person"
    # second property shape has no sh:path → dropped (ShapeExtractor:133)
    assert len(row.property_shapes) == 1
    ps = row.property_shapes[0]
    assert ps.path == "http://example.org/name"
    assert ps.minCount == "1" and ps.maxCount == "2"


def test_shape_constraints_pivot(spark):
    ttl = """
    ex:S a sh:PropertyShape ;
        sh:path ex:age ;
        sh:minCount "1" ;
        sh:maxInclusive "150" ;
        sh:datatype <http://www.w3.org/2001/XMLSchema#integer> .
    """
    row = _one(extract_shapes(_triples(spark, ttl)))
    assert row.constraints == {
        "minCount": "1",
        "maxInclusive": "150",
        "datatype": "http://www.w3.org/2001/XMLSchema#integer",
    }
    assert row.target_property == "http://example.org/age"


def test_shapes_skipped_for_rdfxml_docs(spark):
    # ShapeExtractor:56-58 — rdf/xml documents produce no shapes
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:sh="http://www.w3.org/ns/shacl#"
         xmlns:ex="http://example.org/">
    <sh:NodeShape rdf:about="http://example.org/Shape1"/>
</rdf:RDF>"""
    parsed = parse_pages(pages_df(spark, {"https://x.example.org/shape.rdf": xml}))
    out = extract_shapes(triples_of(parsed), docmeta=docmeta_of(parsed))
    assert out.count() == 0
    # without the docmeta gate the shape IS found (proves the gate works)
    assert extract_shapes(triples_of(parsed)).count() == 1


# ---------------------------------------------------------------------------
# cross-format golden (reference: tests/Integration/RdfParserPipelineTest.php)
# ---------------------------------------------------------------------------

def test_cross_format_golden_classes_and_properties(spark):
    docs = {
        f"https://fixtures.example.org/{name}": content
        for name, content in w3c.SAMPLES.items()
    }
    parsed = parse_pages(pages_df(spark, docs)).cache()
    classes = extract_classes(triples_of(parsed)).collect()
    props = extract_properties(triples_of(parsed)).collect()
    assert len(classes) == 4 and len(props) == 4
    for r in classes:
        assert r.uri == "http://example.org/Person"
        assert r.label == "Person"
        assert r.labels == {"en": "Person"}
    for r in props:
        assert r.uri == "http://example.org/name"
        assert r.label == "name"
        assert r.domain == ["http://example.org/Person"]
    parsed.unpersist()


# ---------------------------------------------------------------------------
# E20: restrictions parity surface
# ---------------------------------------------------------------------------

def test_extract_all_exposes_empty_restrictions_surface(spark):
    """E20: the reference's extractRestrictions is a constant-[] subclass
    hook (reference src/RdfParser.php:214-217) — the table must exist,
    be typed, and be empty."""
    from parser_rdf_spark.extract import extract_all
    from parser_rdf_spark.schemas import RESTRICTIONS

    docs = {"https://e.org/d": "<http://e/a> <http://e/p> <http://e/b> ."}
    tables = extract_all(triples_of(parse_pages(pages_df(spark, docs))))
    assert set(tables) >= {"classes", "properties", "shapes", "restrictions"}
    assert tables["restrictions"].schema == RESTRICTIONS
    assert tables["restrictions"].count() == 0
    # the empty frame is a driver-local relation: no file scan, no shuffle
    plan = tables["restrictions"]._jdf.queryExecution().optimizedPlan().toString()
    assert "FileScan" not in plan and "Exchange" not in plan
    tables["_res"].unpersist()


def test_seed_prefilter_lossless_and_shrinks_aggregate(spark):
    """resource_aggregate's semi-join pre-filter must not change ANY
    extractor output, while aggregating far fewer subjects on
    instance-heavy data (the web-scale common case)."""
    from parser_rdf_spark.extract import resource_aggregate

    # 1 ontology subject + 50 instance subjects (untyped / non-seed types)
    instances = "\n".join(
        f"<http://ex.org/item{i}> <http://ex.org/weight> \"{i}\" ." for i in range(50)
    )
    ttl = TTL_PREAMBLE + "ex:Person a rdfs:Class ; rdfs:label \"Person\" .\n"
    docs = {
        "https://e.org/onto.ttl": ttl,
        "https://e.org/data.nt": instances,
    }
    triples = triples_of(parse_pages(pages_df(spark, docs)))

    full = resource_aggregate(triples, restrict_to_seed_types=False)
    pruned = resource_aggregate(triples)
    assert full.count() > 50  # every instance subject aggregated
    assert pruned.count() == 1  # only the typed ontology subject

    for restrict in (False, True):
        res = resource_aggregate(triples, restrict_to_seed_types=restrict)
        out = {r.uri: r.label for r in extract_classes(triples, res=res).collect()}
        assert out == {"http://example.org/Person": "Person"}


def _list_triples(spark, doc, chains):
    """chains: {head_bnode: [member_iri, ...]} → rdf:first/rdf:rest rows."""
    from parser_rdf_spark.extract import RDF_FIRST, RDF_NIL, RDF_REST

    rows, ln = [], 0
    for head, members in chains.items():
        node = head
        for i, m in enumerate(members):
            ln += 1
            rows.append((doc, "_:default", node, RDF_FIRST, "iri", m, None, None, ln))
            nxt = f"{head}_n{i+1}" if i + 1 < len(members) else RDF_NIL
            kind = "bnode" if i + 1 < len(members) else "iri"
            ln += 1
            rows.append((doc, "_:default", node, RDF_REST, kind, nxt, None, None, ln))
            node = nxt
    return spark.createDataFrame(
        rows,
        "doc_url string, graph string, subj string, pred string, obj_kind string, "
        "obj_value string, obj_lang string, obj_datatype string, line_no int",
    )


def test_resolve_rdf_lists_many_short_chains_bounded_walk(spark):
    """ADVICE r2 item 4: H short chains over an n-node doc spine must not
    cost O(H*n) — the walk is bounded by least(spine, max_iters) and every
    chain still resolves completely."""
    from parser_rdf_spark.extract import resolve_rdf_lists

    chains = {
        f"_:h{i}": [f"http://ex.org/m{i}a", f"http://ex.org/m{i}b"] for i in range(60)
    }
    triples = _list_triples(spark, "https://d/lists", chains)
    heads = spark.createDataFrame(
        [("https://d/lists", h) for h in chains], "doc_url string, head string"
    )
    out = resolve_rdf_lists(triples, heads)
    rows = out.collect()
    assert len(rows) == 120
    by_head = {}
    for r in rows:
        by_head.setdefault(r.head, []).append((r.pos, r.member))
    assert sorted(by_head["_:h7"]) == [(0, "http://ex.org/m7a"), (1, "http://ex.org/m7b")]
    assert len(by_head) == 60


def test_resolve_rdf_lists_max_iters_caps_hostile_chain(spark):
    """A chain longer than max_iters truncates at max_iters positions —
    the same contract as the old per-position self-join implementation."""
    from parser_rdf_spark.extract import resolve_rdf_lists

    chains = {"_:big": [f"http://ex.org/m{i:03d}" for i in range(40)]}
    triples = _list_triples(spark, "https://d/long", chains)
    heads = spark.createDataFrame(
        [("https://d/long", "_:big")], "doc_url string, head string"
    )
    assert resolve_rdf_lists(triples, heads).count() == 32  # default max_iters
    assert resolve_rdf_lists(triples, heads, max_iters=40).count() == 40
