"""Characterization-suite port: edge cases of E10/E12/E13/E14 pinned from
the reference's Characterization tests
(reference: tests/Characterization/PropertyExtractorTest.php and
PrefixExtractorTest.php), run through the full pipeline (pages → fused
parse → relational extraction). Each test cites the reference assertion
it ports.
"""

from pyspark.sql import functions as F

from parser_rdf_spark.extract import extract_properties
from parser_rdf_spark.parse import parse_pages, prefixes_of, triples_of

from conftest import pages_df

TTL_PREAMBLE = """\
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/> .
"""

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _props(spark, ttl: str, url: str = "https://char.example.org/doc"):
    parsed = parse_pages(pages_df(spark, {url: TTL_PREAMBLE + ttl}))
    return {r.uri: r for r in extract_properties(triples_of(parsed)).collect()}


def _props_raw(spark, content: str, url: str):
    parsed = parse_pages(pages_df(spark, {url: content}))
    return {r.uri: r for r in extract_properties(triples_of(parsed)).collect()}


def _prefixes(spark, content: str, url: str = "https://char.example.org/doc"):
    parsed = parse_pages(pages_df(spark, {url: content}))
    return {r.prefix: r.namespace for r in prefixes_of(parsed).collect()}


# ---------------------------------------------------------------------------
# PropertyExtractor — type detection / required keys
# (PropertyExtractorTest.php:17-108)
# ---------------------------------------------------------------------------

def test_all_four_property_type_uris_detected(spark):
    ttl = """
    ex:name a rdf:Property .
    ex:age a owl:DatatypeProperty .
    ex:knows a owl:ObjectProperty .
    ex:note a owl:AnnotationProperty .
    """
    ps = _props(spark, ttl)
    assert set(ps) == {
        "http://example.org/name", "http://example.org/age",
        "http://example.org/knows", "http://example.org/note",
    }


def test_property_row_has_all_required_keys(spark):
    # PropertyExtractorTest.php:88-108 — output keys; our metadata
    # equivalents are the types/see_also/is_defined_by/annotations columns
    ps = _props(spark, 'ex:name a rdf:Property ; rdfs:label "name"@en ; rdfs:comment "The name"@en .')
    r = ps["http://example.org/name"]
    for key in ("uri", "label", "labels", "description", "descriptions",
                "property_type", "domain", "range", "parent_properties",
                "inverse_of", "is_functional", "types"):
        assert key in r.asDict()
    assert r.label == "name" and r.description == "The name"


def test_property_type_per_owl_class(spark):
    # :110-177 — datatype / object / annotation, and rdf:Property → datatype
    ps = _props(spark, """
    ex:age a owl:DatatypeProperty .
    ex:knows a owl:ObjectProperty .
    ex:note a owl:AnnotationProperty .
    ex:plain a rdf:Property .
    """)
    assert ps["http://example.org/age"].property_type == "datatype"
    assert ps["http://example.org/knows"].property_type == "object"
    assert ps["http://example.org/note"].property_type == "annotation"
    assert ps["http://example.org/plain"].property_type == "datatype"  # default


def test_property_type_first_matching_type_wins(spark):
    # determinePropertyType iterates types in document order and returns
    # on the FIRST that matches any marker
    # (reference src/Extractors/PropertyExtractor.php:140-152)
    url = "https://char.example.org/order.nt"
    nt = (
        "<http://example.org/p> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#AnnotationProperty> .\n"
        "<http://example.org/p> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#ObjectProperty> .\n"
    )
    ps = _props_raw(spark, nt, url)
    assert ps["http://example.org/p"].property_type == "annotation"
    # reversed order flips the answer
    nt_rev = "\n".join(reversed(nt.strip().split("\n"))) + "\n"
    ps2 = _props_raw(spark, nt_rev, "https://char.example.org/order2.nt")
    assert ps2["http://example.org/p"].property_type == "object"


def test_is_functional_flag_true_and_false(spark):
    # :179-223
    ps = _props(spark, """
    ex:id a owl:DatatypeProperty, owl:FunctionalProperty .
    ex:name a owl:DatatypeProperty .
    """)
    assert ps["http://example.org/id"].is_functional is True
    assert ps["http://example.org/name"].is_functional is False


# ---------------------------------------------------------------------------
# domain / range shapes (:225-311)
# ---------------------------------------------------------------------------

def test_multiple_domains_and_ranges_collected(spark):
    ps = _props(spark, """
    ex:name a rdf:Property ;
        rdfs:domain ex:Person ;
        rdfs:domain ex:Organization .
    ex:value a rdf:Property ;
        rdfs:range xsd:string ;
        rdfs:range xsd:integer .
    """)
    assert set(ps["http://example.org/name"].domain) == {
        "http://example.org/Person", "http://example.org/Organization"
    }
    assert set(ps["http://example.org/value"].range) == {f"{XSD}string", f"{XSD}integer"}


def test_property_without_domain_range_empty_arrays(spark):
    # :297-311 — empty ARRAYS, not nulls
    ps = _props(spark, "ex:thing a rdf:Property .")
    r = ps["http://example.org/thing"]
    assert r.domain == [] and r.range == []


def test_parent_properties_and_inverse_of(spark):
    # :313-358
    ps = _props(spark, """
    ex:fullName a rdf:Property ; rdfs:subPropertyOf ex:name .
    ex:isKnownBy a owl:ObjectProperty ; owl:inverseOf ex:knows .
    """)
    assert ps["http://example.org/fullName"].parent_properties == ["http://example.org/name"]
    assert ps["http://example.org/isKnownBy"].inverse_of == ["http://example.org/knows"]


def test_union_domain_flattened_to_members(spark):
    # :360-386 — union members extracted as individual URIs
    ps = _props(spark, """
    ex:name a rdf:Property ;
        rdfs:domain [ a owl:Class ;
            owl:unionOf (ex:Person ex:Organization) ] .
    """)
    assert ps["http://example.org/name"].domain == [
        "http://example.org/Person", "http://example.org/Organization"
    ]


def test_union_with_bnode_member_drops_only_the_bnode(spark):
    # E12 (reference src/Extractors/PropertyExtractor.php:164-218): list
    # members that are THEMSELVES bnodes (nested expressions) are dropped;
    # named members survive in list order
    ps = _props(spark, """
    ex:rel a owl:ObjectProperty ;
        rdfs:range [ a owl:Class ;
            owl:unionOf (ex:Book [ a owl:Restriction ] ex:Article) ] .
    """)
    assert ps["http://example.org/rel"].range == [
        "http://example.org/Book", "http://example.org/Article"
    ]


def test_named_domain_and_union_domain_merge_in_order(spark):
    # positional dedupe: per original value position, named value or its
    # union members in list order
    ps = _props(spark, """
    ex:p a rdf:Property ;
        rdfs:domain ex:First ;
        rdfs:domain [ a owl:Class ; owl:unionOf (ex:Second ex:Third) ] .
    """)
    assert ps["http://example.org/p"].domain == [
        "http://example.org/First", "http://example.org/Second", "http://example.org/Third"
    ]


# ---------------------------------------------------------------------------
# range-from-comment fallback (:388-525) — all patterns + precedence
# ---------------------------------------------------------------------------

def test_range_comment_all_six_patterns(spark):
    ps = _props(spark, """
    ex:a a rdf:Property ; rdfs:comment "The range of this property is a plain literal." .
    ex:b a rdf:Property ; rdfs:comment "The range is a Literal value." .
    ex:c a rdf:Property ; rdfs:comment "The range of this property is xsd:string." .
    ex:d a rdf:Property ; rdfs:comment "The range of this property is a dateTime value." .
    ex:e a rdf:Property ; rdfs:comment "The range of this property is a boolean value." .
    ex:f a rdf:Property ; rdfs:comment "The range of this property is an integer value." .
    """)
    assert ps["http://example.org/a"].range == [RDF_LANGSTRING]
    assert ps["http://example.org/b"].range == [f"{XSD}string"]
    assert ps["http://example.org/c"].range == [f"{XSD}string"]
    assert ps["http://example.org/d"].range == [f"{XSD}dateTime"]
    assert ps["http://example.org/e"].range == [f"{XSD}boolean"]
    assert ps["http://example.org/f"].range == [f"{XSD}integer"]


def test_range_comment_precedence_langstring_beats_string(spark):
    # the 6 patterns are ORDERED: language-tagged matches before the
    # generic string pattern even though both substrings occur
    ps = _props(spark, """
    ex:p a rdf:Property ;
        rdfs:comment "The range is a language-tagged string." .
    """)
    assert ps["http://example.org/p"].range == [RDF_LANGSTRING]


def test_range_comment_datetime_beats_integer_order(spark):
    # 'dateTime' pattern is checked before 'integer': a comment matching
    # both yields dateTime (ordered CASE, reference :239-268)
    ps = _props(spark, """
    ex:p a rdf:Property ;
        rdfs:comment "The range is a dateTime, stored as integer epoch." .
    """)
    assert ps["http://example.org/p"].range == [f"{XSD}dateTime"]


def test_range_comment_requires_range_keyword(spark):
    # patterns are 'range.*X' — a comment mentioning integer without the
    # word range produces NO fallback
    ps = _props(spark, """
    ex:p a rdf:Property ; rdfs:comment "An integer-ish thing." .
    """)
    assert ps["http://example.org/p"].range == []


def test_formal_range_suppresses_comment_fallback(spark):
    # :88-90 — fallback only when rdfs:range is empty
    ps = _props(spark, """
    ex:p a rdf:Property ;
        rdfs:range xsd:decimal ;
        rdfs:comment "The range of this property is a boolean value." .
    """)
    assert ps["http://example.org/p"].range == [f"{XSD}decimal"]


# ---------------------------------------------------------------------------
# RDF/XML path (:564-733)
# ---------------------------------------------------------------------------

_XML_URL = "https://char.example.org/props.rdf"


def test_rdfxml_property_element_with_domain_range(spark):
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
    <rdf:Property rdf:about="http://example.org/name">
        <rdfs:label>name</rdfs:label>
        <rdfs:domain rdf:resource="http://example.org/Person"/>
        <rdfs:range rdf:resource="http://www.w3.org/2001/XMLSchema#string"/>
    </rdf:Property>
</rdf:RDF>"""
    ps = _props_raw(spark, xml, _XML_URL)
    r = ps["http://example.org/name"]
    assert r.label == "name"
    assert r.domain == ["http://example.org/Person"]
    assert r.range == [f"{XSD}string"]


def test_rdfxml_property_via_type_attribute_dublin_core_pattern(spark):
    # :630-650 — rdf:Description + rdf:type child resource
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
    <rdf:Description rdf:about="http://example.org/title">
        <rdf:type rdf:resource="http://www.w3.org/1999/02/22-rdf-syntax-ns#Property"/>
        <rdfs:label>title</rdfs:label>
    </rdf:Description>
</rdf:RDF>"""
    ps = _props_raw(spark, xml, _XML_URL)
    assert "http://example.org/title" in ps


def test_rdfxml_object_property_element_type(spark):
    # :652-677 — element name determines the type
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
    <owl:ObjectProperty rdf:about="http://example.org/knows">
        <rdfs:label>knows</rdfs:label>
    </owl:ObjectProperty>
</rdf:RDF>"""
    ps = _props_raw(spark, xml, _XML_URL)
    assert ps["http://example.org/knows"].property_type == "object"


def test_rdfxml_functional_property_element(spark):
    # :679-704
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
    <owl:FunctionalProperty rdf:about="http://example.org/id">
        <rdfs:label>id</rdfs:label>
    </owl:FunctionalProperty>
</rdf:RDF>"""
    ps = _props_raw(spark, xml, _XML_URL)
    assert ps["http://example.org/id"].is_functional is True


def test_rdfxml_range_from_comment_fallback(spark):
    # :706-732
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
    <rdf:Property rdf:about="http://example.org/desc">
        <rdfs:label>desc</rdfs:label>
        <rdfs:comment>The range of this is a plain literal value.</rdfs:comment>
    </rdf:Property>
</rdf:RDF>"""
    ps = _props_raw(spark, xml, _XML_URL)
    assert ps["http://example.org/desc"].range == [RDF_LANGSTRING]


def test_anonymous_owl_expressions_never_surface_as_properties(spark):
    # :542-561 — bnode restriction subjects are skipped
    ps = _props(spark, """
    ex:name a rdf:Property .
    [ a owl:Restriction ; owl:onProperty ex:something ] .
    """)
    assert set(ps) == {"http://example.org/name"}
    assert not any(u.startswith("_:") for u in ps)


# ---------------------------------------------------------------------------
# PrefixExtractor — 4-layer merge (PrefixExtractorTest.php)
# ---------------------------------------------------------------------------

def test_prefixes_from_turtle_at_prefix(spark):
    # PrefixExtractorTest.php:17-33
    ttl = TTL_PREAMBLE + "ex:Person a rdfs:Class .\n"
    pf = _prefixes(spark, ttl)
    assert pf["ex"] == "http://example.org/"
    assert pf["rdfs"] == "http://www.w3.org/2000/01/rdf-schema#"


def test_prefixes_from_sparql_prefix_case_insensitive(spark):
    # :35-50 — SPARQL-style PREFIX, no dot, case-insensitive keyword.
    # The turtle tokenizer accepts the SPARQL form; prefix extraction is
    # regex-based over the raw content, so both spellings land.
    content = (
        "prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#>\n"
        "PREFIX ex: <http://example.org/>\n"
        "ex:Person a rdfs:Class .\n"
    )
    pf = _prefixes(spark, content)
    assert pf["ex"] == "http://example.org/"
    assert pf["rdfs"] == "http://www.w3.org/2000/01/rdf-schema#"


def test_prefixes_from_rdfxml_xmlns(spark):
    # :52-71
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:custom="http://custom.example.org/">
    <rdfs:Class rdf:about="http://example.org/Person"/>
</rdf:RDF>"""
    pf = _prefixes(spark, xml, "https://char.example.org/p.rdf")
    assert pf["custom"] == "http://custom.example.org/"
    assert pf["rdf"] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_prefixes_from_jsonld_context_url_values_only(spark):
    # :73-91 — @context keys whose values are URLs become prefixes; the
    # term mapping to a full property IRI also passes FILTER_VALIDATE_URL
    content = """{
        "@context": {
            "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
            "ex": "http://example.org/",
            "label": "http://www.w3.org/2000/01/rdf-schema#label"
        },
        "@id": "http://example.org/Person",
        "@type": "rdfs:Class"
    }"""
    pf = _prefixes(spark, content, "https://char.example.org/p.jsonld")
    assert pf["rdfs"] == "http://www.w3.org/2000/01/rdf-schema#"
    assert pf["ex"] == "http://example.org/"


def test_common_prefix_added_when_namespace_used(spark):
    # :129-143 — rdfs used via full IRI, never declared ⇒ auto-added
    content = (
        "@prefix ex: <http://example.org/> .\n"
        "ex:Person a <http://www.w3.org/2000/01/rdf-schema#Class> .\n"
    )
    pf = _prefixes(spark, content)
    assert pf["rdfs"] == "http://www.w3.org/2000/01/rdf-schema#"


def test_common_prefix_not_added_when_namespace_unused(spark):
    # :162-178 — schema.org is never referenced ⇒ no 'schema' prefix
    content = TTL_PREAMBLE + "ex:Person a rdfs:Class .\n"
    pf = _prefixes(spark, content)
    assert "schema" not in pf


def test_explicit_declaration_survives_merge_exactly_once(spark):
    # :145-160, :180-195 — one row per prefix, explicit value preserved
    content = TTL_PREAMBLE + "ex:Person a rdfs:Class .\n"
    parsed = parse_pages(pages_df(spark, {"https://char.example.org/d": content}))
    rows = prefixes_of(parsed).filter(F.col("prefix") == "rdfs").collect()
    assert len(rows) == 1
    assert rows[0].namespace == "http://www.w3.org/2000/01/rdf-schema#"


def test_ntriples_doc_gets_common_prefixes_from_usage_only(spark):
    # :216-226 — no content-level declarations in N-Triples; used
    # namespaces surface through the common-prefix layer. "Used" means a
    # RESOURCE term (subject or non-literal object) starts with the
    # namespace — predicate-only usage does not count (reference
    # src/Extractors/PrefixExtractor.php:213-223 walks graph->resources()),
    # so rdf: (only in the predicate position here) is NOT added.
    nt = (
        "<http://example.org/s> "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://www.w3.org/2000/01/rdf-schema#Class> .\n"
    )
    pf = _prefixes(spark, nt, "https://char.example.org/d.nt")
    assert pf.get("rdfs") == "http://www.w3.org/2000/01/rdf-schema#"
    assert "rdf" not in pf
    assert "ex" not in pf


# ---------------------------------------------------------------------------
# ShapeExtractor edges (tests/Characterization/ShapeExtractorTest.php)
# ---------------------------------------------------------------------------

SH_PREAMBLE = TTL_PREAMBLE + "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"


def _shapes(spark, ttl: str, url: str = "https://char.example.org/shapes.ttl"):
    from parser_rdf_spark.extract import extract_shapes

    parsed = parse_pages(pages_df(spark, {url: SH_PREAMBLE + ttl}))
    return {r.uri: r for r in extract_shapes(triples_of(parsed)).collect()}


def test_shape_all_five_target_kinds(spark):
    # ShapeExtractorTest.php:85-168 — targetClass / targetNode /
    # targetSubjectsOf / targetObjectsOf / sh:path as target_property
    ss = _shapes(spark, """
    ex:S1 a sh:NodeShape ; sh:targetClass ex:Person .
    ex:S2 a sh:NodeShape ; sh:targetNode ex:alice .
    ex:S3 a sh:NodeShape ; sh:targetSubjectsOf ex:knows .
    ex:S4 a sh:NodeShape ; sh:targetObjectsOf ex:knows .
    ex:S5 a sh:PropertyShape ; sh:path ex:name .
    """)
    assert ss["http://example.org/S1"].target_class == "http://example.org/Person"
    assert ss["http://example.org/S2"].target_node == "http://example.org/alice"
    assert ss["http://example.org/S3"].target_subjects_of == "http://example.org/knows"
    assert ss["http://example.org/S4"].target_objects_of == "http://example.org/knows"
    assert ss["http://example.org/S5"].target_property == "http://example.org/name"


def test_property_shape_declared_type_detected(spark):
    # :40-58 — sh:PropertyShape is a shape seed type in its own right
    ss = _shapes(spark, "ex:NameShape a sh:PropertyShape ; sh:path ex:name .")
    assert "http://example.org/NameShape" in ss


def test_property_shapes_without_path_filtered_out(spark):
    # :209-242 — a sh:property bnode with no sh:path never surfaces
    ss = _shapes(spark, """
    ex:PersonShape a sh:NodeShape ;
        sh:targetClass ex:Person ;
        sh:property [ sh:path ex:name ; sh:minCount 1 ] ;
        sh:property [ sh:minCount 1 ] .
    """)
    pshapes = ss["http://example.org/PersonShape"].property_shapes
    assert len(pshapes) == 1
    assert pshapes[0].path == "http://example.org/name"


def test_blank_node_shapes_never_toplevel(spark):
    # :364-388 — inline property-shape bnodes are not top-level shapes
    ss = _shapes(spark, """
    ex:PersonShape a sh:NodeShape ;
        sh:targetClass ex:Person ;
        sh:property [ sh:path ex:name ; sh:minCount 1 ] .
    """)
    assert set(ss) == {"http://example.org/PersonShape"}
    assert not any(u is None or u.startswith("_:") for u in ss)


def test_content_without_shapes_yields_empty(spark):
    # :348-362
    ss = _shapes(spark, "ex:Person a rdfs:Class .")
    assert ss == {}
