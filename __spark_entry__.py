"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full detect→validate→parse→extract
pipeline over the embedded conformance corpus plus sf0.001 documents
treated as Common-Crawl-style pages.

``queries()``/``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data ops. Two oracle styles:

- **sf-table oracles**: ops over documents/embeddings/events with a real
  DuckDB SQL equivalent (dedup, token stats, quality, lang-id, ANN, …).
  All outputs are ints/strings (no floats) so value-hashes match exactly.
- **golden-fixture oracles**: the RDF parse/extract ops run on the
  embedded W3C + cross-format fixture corpus (DuckDB cannot parse RDF, so
  the oracle is a VALUES literal generated from the pure-Python core —
  which is itself verified against the W3C suite's 41/29 split by
  tests/test_ntriples_pure.py). These encode the conformance DECISIONS
  (the P/R target) as data.
- ops with no SQL equivalent (MinHash/SimHash/LSH, which hash with
  xxhash64/blake2b) have queries() entries only → rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parser_rdf_spark import multimodal as mm
from parser_rdf_spark import w3c_fixtures as w3c
from parser_rdf_spark import w3c_turtle_fixtures as wttl
from parser_rdf_spark import textops
from parser_rdf_spark import webops
from parser_rdf_spark.extract import (
    extract_classes,
    extract_properties,
    extract_shapes,
    resource_counts,
)
from parser_rdf_spark.linking import (
    connected_components,
    link_entities,
    minhash_lsh_blocking,
)
from parser_rdf_spark.materialize import build_edges
from parser_rdf_spark.parse import (
    docmeta_of,
    parse_pages,
    prefixes_of,
    triples_of,
)

# ---------------------------------------------------------------------------
# fixture corpora (deterministic, embedded — no external data)
# ---------------------------------------------------------------------------

_QUARTET_URL = "https://fixtures.example.org/integration/{}"
_W3C_URL = "https://fixtures.example.org/w3c/{}"
_W3C_TTL_URL = "https://fixtures.example.org/w3c-turtle/{}"

_SHACL_DOC = """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ;
    rdfs:label "Person shape"@en ;
    sh:targetClass ex:Person ;
    sh:minCount "1" ;
    sh:property [ sh:path ex:name ; sh:minCount "1" ; sh:maxCount "2" ] .
"""

_SHACL_DEEP_DOC = """\
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/> .

ex:PersonShape a sh:NodeShape ;
    rdfs:label "Person shape"@en ;
    rdfs:label "Personform"@de ;
    sh:targetClass ex:Person ;
    sh:minCount "1" ;
    sh:maxCount "5" ;
    sh:property [ sh:path ex:name ; sh:minCount "1" ; sh:maxCount "2" ; rdfs:label "name constraint"@en ] ;
    sh:property _:sharedEmail ;
    sh:property [ sh:minCount "9" ] .

ex:OrgShape a sh:NodeShape ;
    rdfs:label "Organization shape"@en ;
    sh:targetClass ex:Organization ;
    sh:minLength "2" ;
    sh:maxLength "64" ;
    sh:property _:sharedEmail .

_:sharedEmail sh:path ex:email ;
    sh:pattern "^[^@]+@[^@]+$" ;
    sh:datatype xsd:string ;
    rdfs:label "shared email constraint"@en .

ex:AddressShape a sh:NodeShape ;
    sh:targetClass ex:Address ;
    sh:nodeKind sh:IRI ;
    sh:class ex:PostalAddress ;
    sh:property [ sh:path ex:street ; sh:minLength "1" ; sh:maxLength "120" ] ;
    sh:property [ sh:path ex:zip ; sh:pattern "^[0-9]{5}$" ; sh:datatype xsd:string ] .

ex:AgeShape a sh:PropertyShape ;
    rdfs:label "Age bounds"@en ;
    sh:path ex:age ;
    sh:minInclusive "0" ;
    sh:maxInclusive "150" ;
    sh:datatype xsd:integer .

ex:ScoreShape a sh:PropertyShape ;
    sh:path ex:score ;
    sh:minExclusive "0.0" ;
    sh:maxExclusive "1.0" .

ex:RefShape a sh:NodeShape ;
    sh:targetNode ex:TheNode ;
    sh:node ex:PersonShape .

ex:SubjectsShape a sh:NodeShape ;
    sh:targetSubjectsOf ex:knows ;
    sh:minCount "2" .

ex:ObjectsShape a sh:NodeShape ;
    sh:targetObjectsOf ex:employs ;
    sh:nodeKind sh:BlankNodeOrIRI ;
    sh:pattern "^x" .

ex:DocShape a sh:NodeShape ;
    rdfs:label "Doc shape (en)"@en ;
    sh:targetClass ex:Document ;
    sh:property [ sh:path ex:title ; sh:name "title" ; sh:message "title required" ; sh:minCount "1" ] ;
    sh:property [ sh:path ex:author ; sh:class ex:Person ; sh:nodeKind sh:IRI ] ;
    sh:property [ sh:path ex:created ; sh:datatype xsd:dateTime ] .

ex:EmptyShape a sh:NodeShape .
"""

_UNIONOF_DOC = """\
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://example.org/> .
ex:author a owl:ObjectProperty ;
    rdfs:label "author"@en ;
    rdfs:domain [ owl:unionOf ( ex:Book ex:Article ex:Thesis ) ] ;
    rdfs:range ex:Person .
ex:pages a owl:DatatypeProperty ;
    rdfs:label "pages"@en ;
    rdfs:comment "The range is xsd:integer page count." .
ex:note a owl:AnnotationProperty ;
    rdfs:label "note"@en ;
    rdfs:comment "Free-form note; range is a plain literal value." .
"""

_HTML_STRUCTURED_DOC = """\
<!DOCTYPE html>
<html><head>
<script type="application/ld+json">
{"@context": "https://schema.org", "@id": "https://example.org/carol",
 "@type": "Person", "name": "Carol Danvers"}
</script>
</head>
<body prefix="foaf: http://xmlns.com/foaf/0.1/" vocab="https://schema.org/">
<div itemscope itemtype="https://schema.org/Person" itemid="https://example.org/alice">
  <span itemprop="name">Alice Liddell</span>
  <meta itemprop="birthDate" content="1852-05-04">
  <a itemprop="url" href="https://alice.example.org/">home</a>
</div>
<div about="https://example.org/bob" typeof="Person">
  <span property="name">Bob Smith</span>
  <span property="foaf:nick" content="bobby"></span>
</div>
</body></html>
"""

# Edge-case HTML: itemref (forward + backward + shared + unknown id),
# nested itemscope with itemid, malformed/unquoted attributes, valueless
# itemprop, a broken JSON-LD block next to a good one, RDFa
# resource+typeof, inline markup inside a captured literal, and an
# unclosed element flushed at document end. Oracle rows are HAND-PINNED
# literals (not parser output) — each is a decision about the semantics.
_HTML_EDGE_DOC = """\
<!DOCTYPE html>
<html>
<!-- <div itemscope itemtype="https://schema.org/Fake"> inside a comment -->
<body vocab=https://schema.org/ prefix="dc: http://purl.org/dc/terms/">
<div id="extra"><span itemprop="jobTitle">Captain</span>
  <meta itemprop="birthDate" content='1701-01-01'></div>
<div itemscope itemtype="https://schema.org/Person" itemid="https://example.org/amy" itemref="extra ghost">
  <span itemprop="name">Amy &amp; co</span>
  <div itemprop="address" itemscope itemtype="https://schema.org/PostalAddress" itemid="https://example.org/addr1">
    <span itemprop="addressLocality">Leeds</span>
  </div>
</div>
<div itemscope itemtype="https://schema.org/Event" itemid=https://example.org/ev itemref="extra">
  <time itemprop="startDate" datetime="2026-01-01">New Year</time>
  <span itemprop>valueless itemprop ignored</span>
</div>
<p about="https://example.org/story" property="dc:title">A <b>bold</b> tale</p>
<span about="https://example.org/story" property="wordCount" content="42"></span>
<div about="https://example.org/story"><a property="author" href=https://example.org/amy>Amy</a>
<span property="publisher" resource="https://example.org/acme" typeof="Organization"></span></div>
<script type="application/ld+json">{"broken": </script>
<script type="application/ld+json">{"@context": "https://schema.org", "@id": "https://example.org/zed", "nickname": "Z"}</script>
<div unclosed itemscope itemtype="https://schema.org/Thing" itemid="https://example.org/th"><span itemprop="name">Tail
</body></html>
"""

_CC_EDGES = [
    ("http://e/a", "http://e/b"), ("http://e/b", "http://e/c"),
    ("http://e/d", "http://e/e"), ("http://e/f", "http://e/f"),
]

_LINK_DICT = [
    ("http://ex.org/alice", "http://canon.org/Alice"),
    ("http://ex.org/alice/", "http://canon.org/Alice"),
    ("http://ex.org/bob", "http://canon.org/Bob"),
]
_LINK_TRIPLES = [
    ("https://d/1", 1, "http://ex.org/s1", "http://ex.org/knows", "http://ex.org/alice"),
    ("https://d/1", 2, "http://ex.org/s1", "http://ex.org/knows", "http://ex.org/bob"),
    ("https://d/2", 1, "http://ex.org/s2", "http://ex.org/knows", "http://ex.org/alice/"),
    ("https://d/2", 2, "http://ex.org/s2", "http://ex.org/knows", "http://ex.org/carol"),
]


def _fixture_pages(spark: SparkSession, docs: dict[str, str]) -> DataFrame:
    from datetime import datetime, timezone

    from parser_rdf_spark.schemas import PAGES

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    return spark.createDataFrame(
        [(url, ts, None, text, "en") for url, text in docs.items()], schema=PAGES
    )


def _quartet_pages(spark: SparkSession) -> DataFrame:
    return _fixture_pages(
        spark, {_QUARTET_URL.format(n): c for n, c in w3c.SAMPLES.items()}
    )


def _quartet_triples(spark: SparkSession) -> DataFrame:
    return triples_of(parse_pages(_quartet_pages(spark)))


def _sql_quote(s) -> str:
    if s is None:
        return "NULL"
    return "'" + str(s).replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline over conformance corpus + sf0.001 documents
    as pages. Returns the extracted classes table (stable schema, 4 rows
    from the cross-format quartet; the word-salad documents contribute
    format-detection error rows, not classes)."""
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_pages = docs.select(
        F.concat(F.lit("https://docs.example.org/"), F.col("doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    fixture = _fixture_pages(
        spark,
        {
            **{_QUARTET_URL.format(n): c for n, c in w3c.SAMPLES.items()},
            **{_W3C_URL.format(n): w3c.FIXTURES[n] for n in w3c.POSITIVE},
        },
    )
    pages = fixture.unionByName(doc_pages)
    parsed = parse_pages(pages)
    classes = extract_classes(triples_of(parsed))
    return classes.select("doc_url", "uri", "label").orderBy("doc_url")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_w3c_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conformance P/R surface: per-fixture parse decision on Spark."""
    pages = _fixture_pages(spark, {_W3C_URL.format(n): w3c.FIXTURES[n] for n in w3c.POSITIVE + w3c.NEGATIVE})
    meta = docmeta_of(parse_pages(pages, fmt="n-triples", empty_guard=False))
    return meta.select(
        F.substring_index("doc_url", "/", -1).alias("fixture"),
        F.coalesce("n_triples", F.lit(0)).cast("bigint").alias("n_triples"),
        F.col("error_stage").isNotNull().alias("rejected"),
    ).orderBy("fixture")


def _q_w3c_turtle_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turtle analogue of the N-Triples conformance surface: per-fixture
    accept/reject decision + triple count for the ported W3C Turtle suite
    (scoped to the reference's subset; @base cases pinned as rejects —
    see parser_rdf_spark/w3c_turtle_fixtures.py)."""
    names = wttl.POSITIVE + wttl.NEGATIVE + sorted(wttl.OUT_OF_SCOPE_REJECTED)
    pages = _fixture_pages(
        spark, {_W3C_TTL_URL.format(n): wttl.FIXTURES[n] for n in names}
    )
    meta = docmeta_of(parse_pages(pages, fmt="turtle", empty_guard=False))
    return meta.select(
        F.substring_index("doc_url", "/", -1).alias("fixture"),
        F.coalesce("n_triples", F.lit(0)).cast("bigint").alias("n_triples"),
        F.col("error_stage").isNotNull().alias("rejected"),
    ).orderBy("fixture")


def _q_quartet_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quartet_triples(spark).select(
        F.substring_index("doc_url", "/", -1).alias("doc"),
        "subj", "pred", "obj_kind", "obj_value",
        F.coalesce("obj_lang", F.lit("")).alias("obj_lang"),
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


def _q_quartet_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _quartet_triples(spark)
    return extract_classes(t).select(
        F.substring_index("doc_url", "/", -1).alias("doc"), "uri", "label"
    )


def _q_quartet_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _quartet_triples(spark)
    return extract_properties(t).select(
        F.substring_index("doc_url", "/", -1).alias("doc"),
        "uri", "label", "property_type",
        F.array_join("domain", "|").alias("domain_joined"),
        F.col("is_functional").cast("boolean").alias("is_functional"),
    )


def _q_quartet_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = parse_pages(_quartet_pages(spark))
    return prefixes_of(parsed).select(
        F.substring_index("doc_url", "/", -1).alias("doc"), "prefix", "namespace"
    )


def _q_quartet_resource_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resource_counts(_quartet_triples(spark)).select(
        F.substring_index("doc_url", "/", -1).alias("doc"),
        F.col("resource_count").cast("bigint").alias("resource_count"),
    )


def _q_shacl_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = _fixture_pages(spark, {"https://fixtures.example.org/shacl/doc1": _SHACL_DOC})
    shapes = extract_shapes(triples_of(parse_pages(pages)))
    return shapes.select(
        "uri", "label",
        F.col("target_class").alias("target_class"),
        F.element_at("constraints", "minCount").alias("min_count_constraint"),
        F.size("property_shapes").cast("bigint").alias("n_property_shapes"),
    )


def _q_shacl_shapes_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16-E18 at depth: 10 shape rows (NodeShapes + top-level
    PropertyShapes), a SHARED labeled-bnode property shape referenced by
    two node shapes, a pathless property shape (dropped, reference
    ShapeExtractor.php:133), all 13 constraint keys
    (ShapeExtractor.php:33-47), all four target kinds, en-preferred
    labels. Constraint map + nested property_shapes flattened to
    deterministic strings for the oracle."""
    pages = _fixture_pages(spark, {"https://fixtures.example.org/shacl/deep": _SHACL_DEEP_DOC})
    shapes = extract_shapes(triples_of(parse_pages(pages)))
    return shapes.select(
        "uri",
        F.coalesce("label", F.lit("")).alias("label"),
        F.coalesce("target_class", F.lit("")).alias("target_class"),
        F.coalesce("target_node", F.lit("")).alias("target_node"),
        F.coalesce("target_subjects_of", F.lit("")).alias("target_subjects_of"),
        F.coalesce("target_objects_of", F.lit("")).alias("target_objects_of"),
        F.coalesce("target_property", F.lit("")).alias("target_property"),
        F.expr(
            "array_join(transform(sort_array(map_entries(constraints)), "
            "e -> concat(e.key, '=', e.value)), ';')"
        ).alias("constraints_joined"),
        F.size("property_shapes").cast("bigint").alias("n_property_shapes"),
        F.expr(
            "array_join(transform(property_shapes, s -> concat(s.path, ':', "
            "coalesce(s.minCount, '-'), ':', coalesce(s.pattern, '-'), ':', "
            "coalesce(s.datatype, '-'), ':', coalesce(s.label, '-'))), '|')"
        ).alias("ps_joined"),
    )


def _q_property_class_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12 (owl:unionOf rdf-list flattening) + E13 (range-from-comment
    fallback) + E10 (property-type determination) on a golden fixture."""
    pages = _fixture_pages(
        spark, {"https://fixtures.example.org/unionof/doc1": _UNIONOF_DOC}
    )
    props = extract_properties(triples_of(parse_pages(pages)))
    return props.select(
        "uri",
        "property_type",
        F.array_join("domain", "|").alias("domain_joined"),
        F.array_join("range", "|").alias("range_joined"),
    )


_NQUADS_DOC = """\
<http://e/s1> <http://e/p> <http://e/o1> <http://g/one> .
<http://e/s2> <http://e/p> "default graph" .
<http://e/s3> <http://e/p> "also named" <http://g/two> .
<http://e/s4> <http://e/p> <http://e/o4> <http://g/one> .
"""


def _q_nquads_named_graphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-Quads parse (new engine surface, no reference counterpart):
    per-statement named graphs land in the triples relation; docs reach
    the handler via the n-triples-sniff retry fallback."""
    pages = _fixture_pages(
        spark, {"https://fixtures.example.org/nq/doc1": _NQUADS_DOC}
    )
    t = triples_of(parse_pages(pages))
    return t.select("graph", "subj", "pred", "obj_kind", "obj_value")


_BNODE_CLASS_DOC = """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .
ex:Named a rdfs:Class ; rdfs:label "Named"@en .
_:anon a rdfs:Class ; rdfs:label "Anonymous"@en .
"""


def _q_skolemized_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 blank-node gate + skolemizer: bnode-subject classes are dropped
    by default and surface as urn:bnode: IRIs when skolemizing
    (reference: src/Extractors/ClassExtractor.php:75-82)."""
    pages = _fixture_pages(
        spark, {"https://fixtures.example.org/bnode/doc1": _BNODE_CLASS_DOC}
    )
    t = triples_of(parse_pages(pages))
    plain = extract_classes(t).select("uri", "label", F.lit(False).alias("skolemized"))
    skol = extract_classes(t, include_skolemized=True).select(
        # the skolem label embeds the doc-hash-scoped bnode label; expose
        # only the stable prefix so the oracle is deterministic
        F.when(F.col("uri").startswith("urn:bnode:"), F.lit("urn:bnode:<scoped>"))
        .otherwise(F.col("uri")).alias("uri"),
        "label",
        F.lit(True).alias("skolemized"),
    )
    return plain.unionByName(skol)


def _q_html_structured_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML structured-data extraction (microdata + RDFa Lite + embedded
    JSON-LD) through the fused parse stage — the north star's
    'RDF/RDFa/microdata/JSON-LD extraction' surface. No reference
    counterpart (the reference parses standalone RDF strings only)."""
    pages = _fixture_pages(
        spark,
        {
            "https://fixtures.example.org/html/doc1": _HTML_STRUCTURED_DOC,
            "https://fixtures.example.org/html/edge": _HTML_EDGE_DOC,
        },
    )
    t = triples_of(parse_pages(pages))
    # named terms only: bnode labels are doc-scoped on the Spark side but
    # raw in the hand-pinned golden, so they can't hash-compare
    return t.filter(
        (F.col("obj_kind") != "bnode") & ~F.col("subj").startswith("_:")
    ).select(
        F.substring_index("doc_url", "/", -1).alias("doc"),
        "subj", "pred", "obj_kind", "obj_value",
    )


def _q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = spark.createDataFrame(_CC_EDGES, "src string, dst string")
    return connected_components(edges).select("vertex", "component").orderBy("vertex")


def _q_entity_linking(spark: SparkSession, sf_dir: str) -> DataFrame:
    triples = spark.createDataFrame(
        _LINK_TRIPLES, "doc_url string, line_no int, subj string, pred string, obj_value string"
    )
    entities = spark.createDataFrame(_LINK_DICT, "surface string, canonical_iri string")
    return link_entities(triples, entities).select("doc_url", "line_no", "obj_value", "canonical_obj")


def _q_edges_from_quartet(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = build_edges(_quartet_triples(spark))
    return edges.select(
        F.substring_index("doc_url", "/", -1).alias("doc"), "subj", "pred", "obj"
    )


# A linking corpus doc: two owl:sameAs chains + one rdfs:seeAlso pair
# feed stage 3's connected components; the alias object is the target of
# dictionary canonicalization.
_PIPELINE_LINK_DOC = """\
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
<http://ex.org/a1> owl:sameAs <http://ex.org/a2> .
<http://ex.org/a2> owl:sameAs <http://ex.org/a3> .
<http://ex.org/b1> rdfs:seeAlso <http://ex.org/b2> .
<http://ex.org/c1> <http://ex.org/knows> <http://ex.org/alias-c2> .
"""

_PIPELINE_DICT = [("http://ex.org/alias-c2", "http://canon.example.org/c2")]


def _q_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 4-stage KG-construction pipeline (scripts/run_pipeline.py's
    exact wiring) over the quartet + W3C conformance + HTML + linking
    corpus: GraphWriter bucket loop (stages 1+2+4a, resumable
    materialization to parquet), ontology extraction off the materialized
    triples (2.5), dictionary canonicalization + connected components (3),
    and component-labelled vertices (4b). Returns one (metric, value) row
    per pipeline stat so the driver gate exercises stage WIRING, not just
    individual operators. Oracle: hand-pinned literals.

    Detection-parity decisions pinned here (the per-format conformance
    queries parse with an EXPLICIT fmt; the pipeline detects): the
    reference's N-Triples sniffer slices the first 10 RAW lines, comments
    included (reference src/Handlers/NTriplesHandler.php:26-41), so
    nt-syntax-subm-01 (15 leading comment lines) is undetectable and
    lands in docs_rejected, as do the empty/comment-only
    nt-syntax-file-01..03 (D9 empty-content guard); conversely
    nt-syntax-bad-nt-prefix-01 (`@prefix ... .`) is valid TURTLE, so
    detection accepts it with 0 triples."""
    import shutil
    import tempfile

    from parser_rdf_spark.extract import extract_all
    from parser_rdf_spark.linking import canonicalize_triples, connected_components
    from parser_rdf_spark.materialize import GraphWriter, build_vertices

    out = tempfile.mkdtemp(prefix="pipeline_e2e")
    try:
        pages = _fixture_pages(
            spark,
            {
                **{_QUARTET_URL.format(n): c for n, c in w3c.SAMPLES.items()},
                **{_W3C_URL.format(n): w3c.FIXTURES[n] for n in w3c.POSITIVE + w3c.NEGATIVE},
                "https://fixtures.example.org/html/doc1": _HTML_STRUCTURED_DOC,
                "https://fixtures.example.org/html/edge": _HTML_EDGE_DOC,
                "https://fixtures.example.org/link/sameas": _PIPELINE_LINK_DOC,
            },
        )
        writer = GraphWriter(out, url_buckets=4)
        result = writer.run(spark, pages, "contract-e2e")

        triples = writer.triples(spark)
        docmeta = writer.docmeta(spark)
        entities = spark.createDataFrame(
            _PIPELINE_DICT, "surface string, canonical_iri string"
        )
        canon = canonicalize_triples(triples, entities).select(
            "doc_url", "graph",
            F.col("subj_canonical").alias("subj"), "pred", "obj_kind",
            F.col("obj_canonical").alias("obj_value"), "obj_lang",
            "obj_datatype", "line_no",
        )
        tables = extract_all(canon, docmeta=docmeta)

        edges = writer.edges(spark)
        equiv = edges.filter(
            F.col("pred").isin(
                "http://www.w3.org/2002/07/owl#sameAs",
                "http://www.w3.org/2000/01/rdf-schema#seeAlso",
            )
        ).select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        components = connected_components(equiv)
        vertices = build_vertices(edges, components=components)

        def _stat(name: str, df: DataFrame) -> DataFrame:
            return df.agg(F.count(F.lit(1)).cast("bigint").alias("value")).select(
                F.lit(name).alias("metric"), "value"
            )

        def _lit(name: str, v: int) -> DataFrame:
            return spark.createDataFrame([(name, v)], "metric string, value bigint")

        stats = [
            _lit("pages_in", pages.count()),
            _lit("buckets_total", result.buckets_total),
            _lit("buckets_processed", result.buckets_processed),
            _lit("buckets_skipped_resume", result.buckets_skipped),
            _stat("docs_parsed_ok", docmeta.filter(F.col("error_stage").isNull())),
            _stat("docs_rejected", docmeta.filter(F.col("error_stage").isNotNull())),
            _stat("triples_rows", triples),
            _stat("edges_rows", edges),
            _stat(
                "edges_canonicalized",
                canon.join(
                    triples.select("doc_url", "line_no", F.col("obj_value").alias("orig_obj")),
                    ["doc_url", "line_no"],
                ).filter(F.col("obj_value") != F.col("orig_obj")),
            ),
            _stat("classes_rows", tables["classes"]),
            _stat("properties_rows", tables["properties"]),
            _stat("shapes_rows", tables["shapes"]),
            _stat("restrictions_rows", tables["restrictions"]),
            _stat(
                "prefix_decls",
                docmeta.filter(F.col("prefixes").isNotNull()).select(
                    F.explode("prefixes").alias("p", "ns")
                ),
            ),
            _stat("equiv_edges", equiv),
            _stat("component_vertices", components),
            _stat("components_distinct", components.select("component").distinct()),
            _stat("vertices_rows", vertices),
            _stat(
                "vertices_with_component",
                vertices.filter(F.col("component_id").isNotNull()),
            ),
            # lineage accounting (north rule: "every partition writes
            # lineage + triple-count metrics"): the per-partition metrics
            # table must account for every edge row exactly once
            writer.metrics(spark)
            .agg(F.sum("triple_count").cast("bigint").alias("value"))
            .select(F.lit("lineage_edges_accounted").alias("metric"), "value"),
            _stat("lineage_runs",
                  writer.metrics(spark).select("run_id").distinct()),
        ]
        res = stats[0]
        for s in stats[1:]:
            res = res.unionByName(s)
        rows = res.collect()  # materialize before the tempdir vanishes
        tables["_res"].unpersist()
        # maintenance boundary (north rule: resumable + storage bounded):
        # compact every table to one file per partition dir, expire all
        # but the current snapshot, and pin that row counts are identical
        # across the boundary — i.e. the vacuum left current reads green
        for t in GraphWriter.TABLES:
            writer.compact(spark, t)
        expired = writer.expire_snapshots(keep_last=1)
        rows += [
            ("maintenance_expired_snapshots", len(expired)),
            ("triples_rows_post_maintenance",
             writer.table_at(spark, "triples").count()),
            ("edges_rows_post_maintenance",
             writer.table_at(spark, "edges").count()),
        ]
        return spark.createDataFrame(rows, "metric string, value bigint")
    finally:
        shutil.rmtree(out, ignore_errors=True)


# -- sf-table ops -----------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _q_exact_dedup(spark, sf_dir):
    return textops.exact_dedup_groups(_docs(spark, sf_dir)).select(
        "text_md5", F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("first_doc_id").cast("bigint").alias("first_doc_id"),
    )


def _q_dedup_keep_first(spark, sf_dir):
    return textops.dedup_keep_first(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text_md5"
    )


def _q_token_stats(spark, sf_dir):
    return textops.token_stats(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("bigint").alias("n_distinct_tokens"),
        F.col("avg_token_len_x100").cast("bigint").alias("avg_token_len_x100"),
    )


def _q_bpe_token_stats(spark, sf_dir):
    return textops.bpe_token_stats(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.col("n_word_tokens").cast("bigint").alias("n_word_tokens"),
        F.col("n_number_tokens").cast("bigint").alias("n_number_tokens"),
        F.col("n_symbol_tokens").cast("bigint").alias("n_symbol_tokens"),
    )


def _q_quality_score(spark, sf_dir):
    return textops.quality_score(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_stopword_types").cast("bigint").alias("n_stopword_types"),
        F.col("quality").cast("bigint").alias("quality"),
    )


def _q_lang_id(spark, sf_dir):
    return textops.lang_id(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "lang", "lang_guess"
    )


def _q_fingerprints(spark, sf_dir):
    return textops.fingerprints(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "md5_exact", "md5_normalized"
    )


def _q_decontamination(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 97 == 0 act as the
    held-out benchmark; every other doc reports its distinct 5-gram
    overlap with that set (the pretraining-hygiene gate)."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return textops.decontaminate(train, bench, n=5).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_hit").cast("bigint").alias("n_hit"),
        F.col("contaminated").cast("bigint").alias("contaminated"),
    )


def _q_repetition_stats(spark, sf_dir):
    return textops.repetition_stats(_docs(spark, sf_dir), n=2).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("top_token_frac_x10000").cast("bigint").alias("top_token_frac_x10000"),
        F.col("dup_ngram_frac_x10000").cast("bigint").alias("dup_ngram_frac_x10000"),
    )


def _q_chunk_documents(spark, sf_dir):
    """Token-bounded overlapping chunking (16-token chunks, 4 overlap):
    the pretraining/embedding prep step, pure Column posexplode."""
    return textops.chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=16, overlap=4
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "chunk_text",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )


# The documents table is newline-free word-salad with no PII/URLs, so the
# web-hygiene contract queries derive their input shapes deterministically
# from (doc_id, text) with engine-portable expressions — the DuckDB oracle
# derives the identical table, so the operators are exercised on real
# line/PII/URL structure while staying self-contained.

_LINEIFY_EXPR = (
    "array_join(transform(sequence(0, (size(split(text, ' ')) - 1) div 3), "
    "i -> array_join(slice(split(text, ' '), i*3+1, 3), ' ')), '\n')"
)
_LINEIFY_SQL = (
    "array_to_string(list_transform("
    "generate_series(0, (len(string_split(text, ' ')) - 1) // 3), "
    "i -> array_to_string(string_split(text, ' ')[i*3+1:i*3+3], ' ')), chr(10))"
)

_PII_TAIL_EXPR = (
    " CASE WHEN doc_id % 3 = 0 THEN concat(' mail u', doc_id, '@ex', doc_id % 7, '.com') ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(' ssn 123-45-', lpad(cast(doc_id % 10000 as string), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' tel 555-867-', lpad(cast(doc_id % 10000 as string), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' ip 10.', doc_id % 256, '.0.', doc_id % 100) ELSE '' END"
)
_PIIIFY_EXPR = f"concat(text,{_PII_TAIL_EXPR})"
# Boilerplate slice for the composed-pipeline derivation: every doc_id
# ≡ 17 (mod 50) carries the same two-line text, so after PII redaction
# several of them become byte-identical (exact dedup bites) and the
# survivors still share lines with the first owner (line dedup bites).
_BOILER_L1 = (
    "the boilerplate navigation header appears on every mirrored page "
    "and search crawlers copy it verbatim across many hosts"
)
_BOILER_L2 = (
    "copyright notice all rights reserved contact the site administrator "
    "for removal requests and takedown policies of this archive"
)
# the composed-pipeline input: line-structured text AND PII spans (the
# PII tail lands on the final line, so redaction and line dedup interact)
_CLEANIFY_EXPR = (
    "concat(CASE WHEN doc_id % 50 = 17 THEN "
    f"concat('{_BOILER_L1}', chr(10), '{_BOILER_L2}') "
    f"ELSE {_LINEIFY_EXPR} END,{_PII_TAIL_EXPR})"
)
_PII_TAIL_SQL = (
    " CASE WHEN doc_id % 3 = 0 THEN ' mail u' || doc_id || '@ex' || (doc_id % 7) || '.com' ELSE '' END ||"
    " CASE WHEN doc_id % 4 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||"
    " CASE WHEN doc_id % 5 = 0 THEN ' tel 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||"
    " CASE WHEN doc_id % 2 = 0 THEN ' ip 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) ELSE '' END"
)
_PIIIFY_SQL = f"text ||{_PII_TAIL_SQL}"
_CLEANIFY_SQL = (
    "(CASE WHEN doc_id % 50 = 17 THEN "
    f"'{_BOILER_L1}' || chr(10) || '{_BOILER_L2}' "
    f"ELSE {_LINEIFY_SQL} END) ||{_PII_TAIL_SQL}"
)

_URLIFY_EXPR = (
    "concat(text, ' see http://site', doc_id % 13, '.example.',"
    " CASE WHEN doc_id % 3 = 0 THEN 'com' WHEN doc_id % 3 = 1 THEN 'org' ELSE 'net' END,"
    " '/p/', doc_id,"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' and https://cdn', doc_id % 5, '.example.com/x') ELSE '' END)"
)
_URLIFY_SQL = (
    "text || ' see http://site' || (doc_id % 13) || '.example.' ||"
    " CASE WHEN doc_id % 3 = 0 THEN 'com' WHEN doc_id % 3 = 1 THEN 'org' ELSE 'net' END ||"
    " '/p/' || doc_id ||"
    " CASE WHEN doc_id % 2 = 0 THEN ' and https://cdn' || (doc_id % 5) || '.example.com/x' ELSE '' END"
)


def _q_line_dedup(spark, sf_dir):
    """C4-style corpus-wide line dedup over a line-structured derivation
    of the documents table (3-token lines): a duplicated line survives
    only at its first (doc_id, pos) occurrence. One min-struct groupBy +
    one join — no window over the skewed line key."""
    docs3 = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_LINEIFY_EXPR).alias("text")
    )
    return webops.line_dedup(docs3).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        "clean_text",
    )


def _q_substring_dup_windows(spark, sf_dir):
    """ExactSubstr-style duplicate-span report (Lee et al. 2022) at
    12-token window granularity over the documents table: windows
    present in ≥2 distinct docs, per-doc counts + earliest duplicated
    offset. Engine keys the shuffle on xxhash64(window); the oracle
    groups the exact window strings — counts must agree."""
    from parser_rdf_spark.textops import substring_dup_windows

    return substring_dup_windows(_docs(spark, sf_dir), k=12)


# shared DuckDB CTEs for the ExactSubstr surfaces (k=12): exact window
# strings, cross-doc dup windows, and the per-doc maximal-span merge
# (LAG gap flag + running-sum span ids — the engine's _merge_spans in
# SQL, independently recomputed over the exact grams, not hashes)
_SUBSTR_SPAN_CTES = (
    "WITH toks AS (SELECT doc_id, "
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t "
    "FROM documents), "
    "sized AS (SELECT doc_id, t FROM toks WHERE len(t) >= 12), "
    "w AS (SELECT doc_id, i, array_to_string(t[i+1:i+12], ' ') AS gram "
    "FROM sized, unnest(range(len(t) - 11)) AS u(i)), "
    "d AS (SELECT gram FROM w GROUP BY gram "
    "HAVING min(doc_id) <> max(doc_id)), "
    "dupw AS (SELECT doc_id, i FROM w "
    "WHERE gram IN (SELECT gram FROM d)), "
    "flg AS (SELECT doc_id, i, CASE WHEN "
    "LAG(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL "
    "OR i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i) > 12 "
    "THEN 1 ELSE 0 END AS f FROM dupw), "
    "sp AS (SELECT doc_id, i, "
    "SUM(f) OVER (PARTITION BY doc_id ORDER BY i) AS sid FROM flg), "
    "spans AS (SELECT doc_id, sid, MIN(i) AS s, MAX(i) + 11 AS e, "
    "COUNT(*) AS nw FROM sp GROUP BY doc_id, sid), "
)


def _q_substring_dup_spans(spark, sf_dir):
    """VERDICT r05 task 5: maximal duplicated spans (ExactSubstr true
    extents) at 12-token granularity over the documents table —
    overlapping/adjacent duplicated windows merged per doc, inclusive
    token bounds AND the span text sliced back out byte-exact. The
    oracle re-runs the gap merge in SQL over exact window strings."""
    from parser_rdf_spark.textops import substring_dup_spans

    return substring_dup_spans(_docs(spark, sf_dir), k=12).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("n_windows").cast("bigint").alias("n_windows"),
        "span_text",
    )


def _q_substring_dedup_clean(spark, sf_dir):
    """ExactSubstr CLEANING (keep the global first occurrence of each
    duplicated 12-token window, cut the rest) over the documents table.
    The oracle reproduces keep-first with a doc*1e6+pos ordering key and
    exact window strings; texts must match byte-for-byte."""
    from parser_rdf_spark.textops import substring_dedup_clean

    return substring_dedup_clean(_docs(spark, sf_dir), k=12)


def _q_pii_redact(spark, sf_dir):
    """PII detect-and-redact (emails/SSNs/phones/IPv4) over a derivation
    of documents carrying deterministic doc_id-seeded PII spans. Pure
    regexp Column expressions in the Java∩RE2 common dialect."""
    dpii = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_PIIIFY_EXPR).alias("text")
    )
    return webops.pii_redact(dpii).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_email").cast("bigint").alias("n_email"),
        F.col("n_ssn").cast("bigint").alias("n_ssn"),
        F.col("n_phone").cast("bigint").alias("n_phone"),
        F.col("n_ipv4").cast("bigint").alias("n_ipv4"),
        "redacted_text",
    )


def _q_url_domain_stats(spark, sf_dir):
    """Per-domain URL stats over a derivation of documents carrying
    deterministic doc_id-seeded http/https URLs: mentions, distinct
    docs, TLD per host (regexp explode + one groupBy)."""
    durl = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_URLIFY_EXPR).alias("text")
    )
    return webops.url_domain_stats(durl).select(
        "host",
        "tld",
        F.col("n_urls").cast("bigint").alias("n_urls"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
    )


def _q_clean_corpus(spark, sf_dir):
    """The composed pretraining-cleanup pipeline over a derivation with
    BOTH line structure and PII spans: quality gate → PII redact →
    corpus line dedup → exact dedup keep-first."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_CLEANIFY_EXPR).alias("text")
    )
    return webops.clean_corpus(d, min_quality=70).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("quality").cast("bigint").alias("quality"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        "clean_text",
    )


def _q_attrition_report(spark, sf_dir):
    """Per-stage doc/token attrition accounting for the cleanup
    pipeline (raw → quality_gate → line_dedup → exact_dedup)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_CLEANIFY_EXPR).alias("text")
    )
    return webops.attrition_report(d, min_quality=70).select(
        "stage",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )


def _q_bigram_lm_quality(spark, sf_dir):
    """Corpus-trained char-bigram LM score per document (micro-rounded
    integer log-probs; broadcast model join)."""
    return webops.bigram_lm_quality(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.col("sum_logp_micro").cast("bigint").alias("sum_logp_micro"),
        F.col("avg_logp_micro").cast("bigint").alias("avg_logp_micro"),
    )


def _q_mixture_report(spark, sf_dir):
    """Corpus mix report per (lang, source): doc/token counts and
    basis-point shares (integer div; totals via a broadcast single-row
    join, not a single-partition SUM() OVER ())."""
    return textops.mixture_report(_docs(spark, sf_dir)).select(
        "lang",
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("doc_share_bp").cast("bigint").alias("doc_share_bp"),
        F.col("token_share_bp").cast("bigint").alias("token_share_bp"),
    )


_SAMPLE_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.125, "es": 0.0625}


def _q_stratified_sample(spark, sf_dir):
    """Deterministic md5-prefix stratified sampling (language rebalance);
    strata not listed (zh) keep default_fraction=1.0 (everything)."""
    out = textops.stratified_sample(
        _docs(spark, sf_dir), _SAMPLE_FRACTIONS, stratum_col="lang",
        default_fraction=1.0,
    )
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"), "lang")


def _q_ann_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 20)
    return textops.ann_bruteforce_topk(emb, queries=qs, k=3).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def _q_events_rollup(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def _q_events_stream_rollup(spark, sf_dir):
    """Structured-Streaming face with a full value oracle: the hourly
    (window, event_type) rollup computed via readStream over the events
    parquet with an availableNow trigger into a complete-mode memory
    sink. Draining a bounded source must produce EXACTLY the batch
    GROUP BY — which is what the DuckDB oracle checks. The value sum is
    integer cents (sum of per-row rounded bigints) so the aggregate is
    associative and engine-deterministic; streaming disallows distinct
    aggs, so the rollup is count + sum."""
    import tempfile

    name = "events_stream_rollup_sink"
    if any(t.name == name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(name)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the sf tables are single parquet FILES; the file-stream source
    # requires a directory (a bare file path becomes an invalid
    # basePath), so glob it — the wildcard makes the source anchor
    # basePath at the sf dir
    src = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parque*")
    # event-time ops demand TIMESTAMP (not NTZ); the session runs UTC so
    # the cast is wall-clock-identical, and the window start is cast back
    # to NTZ to match the oracle's schema
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_rollup_chk"))
        .start()
    )
    # availableNow terminates on its own; a timeout that expired would
    # leave the complete-mode sink mid-flight and return PARTIAL rows
    # that look like an engine bug (ADVICE r2 item 2) — so assert the
    # drain actually finished instead of ignoring the return value
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("events_stream_rollup drain did not finish within 300s")
    return spark.table(name).select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("value_cents").cast("bigint").alias("value_cents"),
    )


def _first_seen_corpus() -> list[tuple[int, str, str]]:
    """(wave, url, text): 25 urls in wave 0, urls 15..39 re-fetched/new in
    wave 1 — urls 15..24 are RE-FETCHES whose wave-1 content must be
    dropped by the stateful dedup."""
    rows = []
    for u in range(25):
        rows.append((0, f"https://crawl.example.org/page/{u:02d}", f"v0-{u}"))
    for u in range(15, 40):
        rows.append((1, f"https://crawl.example.org/page/{u:02d}", f"v1-{u}"))
    return rows


def _crawl_sessions_corpus() -> list[tuple[int, str, int]]:
    """(wave, host, event_minute past 2026-01-01 00:00). Wave 1's far-
    future fetch advances the watermark (600 − 60 = 540 min) so every
    wave-0 session finalizes; z's own session (end 630) stays in state."""
    return [
        (0, "a.example.org", 0), (0, "a.example.org", 10), (0, "a.example.org", 120),
        (0, "b.example.org", 0), (0, "b.example.org", 155),
        (1, "z.example.org", 600),
    ]


def _write_stream_waves(spark, base_dir: str, wave_rows: dict[int, list[tuple]]) -> str:
    """Write one parquet file per wave with strictly increasing mtimes so
    the file-stream source (ordered by mtime) replays waves as separate
    micro-batches under maxFilesPerTrigger=1."""
    import glob
    import os
    import time as _time

    from parser_rdf_spark.schemas import PAGES

    pages_dir = os.path.join(base_dir, "pages")
    for wave in sorted(wave_rows):
        spark.createDataFrame(wave_rows[wave], schema=PAGES).coalesce(1).write.mode(
            "append"
        ).parquet(pages_dir)
        # pin mtimes: wave files must sort in wave order for the source
        for i, p in enumerate(sorted(glob.glob(f"{pages_dir}/*.parquet"), key=os.path.getmtime)):
            os.utime(p, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
        _time.sleep(0.05)
    return pages_dir


def _drain(q, what: str, timeout: int = 300) -> None:
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(f"{what} drain did not finish within {timeout}s")


def _q_stream_first_seen(spark, sf_dir):
    """Stateful streaming dedup (applyInPandasWithState) drained under
    availableNow: per-URL FIRST content wins across micro-batches.
    Oracle: DuckDB window-argmin over the same (wave, url, text) rows."""
    import tempfile
    from datetime import datetime, timezone

    from parser_rdf_spark import streaming as st

    base = tempfile.mkdtemp(prefix="stream_first_seen")
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    waves: dict[int, list[tuple]] = {}
    for wave, url, text in _first_seen_corpus():
        waves.setdefault(wave, []).append((url, ts, None, text, "en"))
    pages_dir = _write_stream_waves(spark, base, waves)

    stream = st.read_page_stream(spark, pages_dir, max_files_per_trigger=1)
    q = (
        st.first_seen_pages(stream)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, "stream_first_seen")
    return spark.read.parquet(f"{base}/out").select("url", "text")


def _q_stream_crawl_sessions(spark, sf_dir):
    """Streaming sessionization (native session_window + watermark,
    append mode) drained under availableNow over two waves sharing one
    checkpoint-free run: wave 1 advances the watermark and flushes every
    finished wave-0 session. Oracle: DuckDB lag+cumsum sessionization
    filtered to sessions ended before the final watermark."""
    import tempfile
    from datetime import datetime, timedelta, timezone

    from parser_rdf_spark import streaming as st

    base = tempfile.mkdtemp(prefix="stream_sessions")
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    waves: dict[int, list[tuple]] = {}
    for wave, host, minute in _crawl_sessions_corpus():
        waves.setdefault(wave, []).append(
            (f"https://{host}/fetch/{minute}", t0 + timedelta(minutes=minute), None, "", "en")
        )
    pages_dir = _write_stream_waves(spark, base, waves)

    stream = st.read_page_stream(spark, pages_dir, max_files_per_trigger=1)
    q = (
        st.crawl_sessions(stream)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, "stream_crawl_sessions")
    return spark.read.parquet(f"{base}/out").select(
        "host",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        F.col("n_pages").cast("bigint").alias("n_pages"),
    )


def _stream_first_seen_oracle_sql() -> str:
    rows = ", ".join(
        f"({w}, {_sql_quote(u)}, {_sql_quote(t)})" for w, u, t in _first_seen_corpus()
    )
    return (
        "SELECT url, text FROM ("
        "  SELECT url, text, ROW_NUMBER() OVER (PARTITION BY url ORDER BY wave) AS rn "
        f" FROM (VALUES {rows}) AS t(wave, url, text)"
        ") ranked WHERE rn = 1"
    )


def _stream_crawl_sessions_oracle_sql(gap_min: int = 30, wm_min: int = 60) -> str:
    rows = ", ".join(
        f"({_sql_quote(h)}, {m})" for _w, h, m in _crawl_sessions_corpus()
    )
    t0 = "TIMESTAMP '2026-01-01 00:00:00'"
    return (
        f"WITH ev(host, m) AS (VALUES {rows}), "
        f"wm AS (SELECT max(m) - {wm_min} AS w FROM ev), "
        "d AS (SELECT host, m, CASE WHEN m - lag(m) OVER (PARTITION BY host ORDER BY m) "
        f"<= {gap_min} THEN 0 ELSE 1 END AS new_s FROM ev), "
        "g AS (SELECT host, m, SUM(new_s) OVER (PARTITION BY host ORDER BY m) AS sid FROM d), "
        "s AS (SELECT host, MIN(m) AS start_m, MAX(m) + "
        f"{gap_min} AS end_m, COUNT(*) AS n_pages FROM g GROUP BY host, sid) "
        f"SELECT host, {t0} + start_m * INTERVAL 1 MINUTE AS session_start, "
        f"{t0} + end_m * INTERVAL 1 MINUTE AS session_end, n_pages "
        "FROM s, wm WHERE end_m <= w"
    )


def _q_events_asof(spark, sf_dir):
    """As-of join over the events table: every click matched to the
    user's most recent at-or-before view (one union+window shuffle, no
    join operator — see relops.asof_join). Oracle: DuckDB's native
    ASOF LEFT JOIN."""
    from parser_rdf_spark.relops import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "ts", "user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    j = asof_join(clicks, views, on="user_id")
    return j.select(
        F.col("event_id").cast("bigint").alias("click_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("right.event_id").cast("bigint").alias("view_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("right.ts").cast("timestamp"))
        ).cast("bigint").alias("us_since_view"),
    )


def _q_events_range_join(spark, sf_dir):
    """Bucketized point-in-interval join: event values matched to
    overlapping value bands (band i covers [25i − 5, 25i + 20]). The
    bucketized plan equi-joins on bucket id — no nested-loop join —
    while DuckDB recomputes the same result with a plain inequality
    join."""
    from parser_rdf_spark.relops import range_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "value")
    bands = spark.range(0, 21).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 25.0 - 5.0).alias("lo"),
        (F.col("id") * 25.0 + 20.0).alias("hi"),
    )
    out = range_join(ev, bands, "value", "lo", "hi", bucket_width=25.0)
    return out.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("band_id").cast("bigint").alias("band_id"),
    )


def _q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization (native SESSION window aggregation — one
    shuffle, JVM-side merging state). Oracle: the classic lag + cumulative
    break-count window SQL; exact-boundary gaps MERGE in both."""
    from parser_rdf_spark.relops import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = sessionize(ev, "user_id", "ts", "30 minutes")
    return s.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("session_start"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("span_us").cast("bigint").alias("span_us"),
    )


def _event_graph(spark, sf_dir):
    """Deterministic KG-shaped directed graph derived from the events
    table (src = user_id mod 997, dst = event_id mod 997, self-loops
    dropped) — reproducible in plain SQL so every graph operator gets a
    DuckDB oracle. Stands in for the pipeline's materialized edge
    relation."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        (F.col("user_id") % 997).alias("src"),
        (F.col("event_id") % 997).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))


def _q_kg_degrees(spark, sf_dir):
    from parser_rdf_spark import graphops

    return graphops.degrees(_event_graph(spark, sf_dir)).select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.col("out_degree").cast("bigint").alias("out_degree"),
        F.col("in_degree").cast("bigint").alias("in_degree"),
        F.col("degree").cast("bigint").alias("degree"),
    )


def _q_kg_triangles(spark, sf_dir):
    """Degree-oriented (compact-forward) triangle count — the oracle
    recomputes it with the canonical a<b<c three-way self-join."""
    from parser_rdf_spark import graphops

    return graphops.triangle_count(_event_graph(spark, sf_dir)).select(
        F.col("n_triangles").cast("bigint").alias("n_triangles")
    )


def _q_kg_pagerank(spark, sf_dir):
    """3-iteration PageRank (damping 0.85, dangling mass leaks — pinned
    semantics). Ranks are compared at micro resolution: double drift
    between engines is ~1e-15 relative, far inside the 1e-6 rounding."""
    from parser_rdf_spark import graphops

    pr = graphops.pagerank(_event_graph(spark, sf_dir), n_iter=3, damping=0.85)
    return pr.select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.round(F.col("rank") * 1000000.0).cast("bigint").alias("rank_micro"),
    )


def _q_events_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark ``percentile`` is
    the same linear-interpolation definition as SQL quantile_cont —
    verified bitwise-equal on this data; micro-rounded anyway)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("_p50"),
        F.percentile("value", 0.9).alias("_p90"),
        F.percentile("value", 0.99).alias("_p99"),
    )
    return agg.select(
        "event_type",
        *[
            F.round(F.col(f"_p{p}") * 1000000.0).cast("bigint").alias(f"p{p}_micro")
            for p in (50, 90, 99)
        ],
    )


def _q_events_daily_rollup(spark, sf_dir):
    """ROLLUP aggregation (event_type × day → subtotals → grand total)
    with grouping_id disambiguating rollup-nulls — Spark and DuckDB use
    the same first-column-is-MSB bitmask (pinned by the oracle match)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.rollup("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") * 1000000.0).cast("bigint").alias("sum_value_micro"),
            F.grouping_id().alias("gid"),
        )
        .select(
            "event_type",
            "day",
            F.col("n_events").cast("bigint").alias("n_events"),
            "sum_value_micro",
            F.col("gid").cast("bigint").alias("gid"),
        )
    )


def _q_events_user_pivot(spark, sf_dir):
    """Pivot: per-user event-type counts as columns (explicit value list
    — no driver-side distinct scan)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    kinds = ["click", "view", "purchase", "signup", "error"]
    p = ev.groupBy("user_id").pivot("event_type", kinds).agg(F.count(F.lit(1))).na.fill(0)
    return p.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        *[F.col(k).cast("bigint").alias(f"n_{k}") for k in kinds],
    )


def _q_kg_label_propagation(spark, sf_dir):
    """2-round synchronous label propagation (most-frequent neighbor
    label, ties -> smallest). Oracle: two unrolled argmax CTEs (QUALIFY
    row_number)."""
    from parser_rdf_spark import graphops

    lp = graphops.label_propagation(_event_graph(spark, sf_dir), n_iter=2)
    return lp.select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.col("label").cast("bigint").alias("label"),
    )


def _q_kg_khop(spark, sf_dir):
    """2-hop BFS reachability from seeds {1,2,3} with min hop count.
    Oracle: bounded recursive CTE + MIN(hops) — path enumeration is fine
    for the oracle at this size; the Spark side is frontier BFS whose
    work is bounded by vertices, not paths (the 100-TB-safe shape)."""
    from parser_rdf_spark import graphops

    out = graphops.khop_reachability(_event_graph(spark, sf_dir), [1, 2, 3], k=2)
    return out.select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.col("hops").cast("bigint").alias("hops"),
    )


def _q_events_user_timeline(spark, sf_dir):
    """Per-user event timeline: sequence index, gap to the previous event
    (exact integer microseconds), running value sum (micro-rounded —
    windowed float sums may be segment-tree-grouped differently across
    engines; 1e-6 rounding absorbs the reassociation drift)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_id").cast("bigint").alias("event_id"),
        F.row_number().over(w).cast("bigint").alias("idx"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).cast("bigint").alias("gap_us"),
        F.round(F.sum("value").over(wr) * 1000000.0).cast("bigint").alias("run_value_micro"),
    )


def _q_tfidf_top_terms(spark, sf_dir):
    return textops.tfidf_top_terms(_docs(spark, sf_dir), k=3).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("term"),
        F.col("tf").cast("bigint").alias("tf"),
        F.col("score_micro").cast("bigint").alias("score_micro"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def _q_media_stats(spark, sf_dir):
    media = mm.media_from_documents(_docs(spark, sf_dir))
    return mm.media_stats(media).select(
        F.col("media_id").cast("bigint").alias("media_id"),
        "kind",
        F.col("payload_len").cast("bigint").alias("payload_len"),
        "payload_md5",
    )


def _ascii_docs(spark, sf_dir):
    # byte-length == char-length ⇒ byte slicing and char slicing agree,
    # which is what lets the DuckDB (VARCHAR) oracle mirror the binary op
    docs = _docs(spark, sf_dir)
    return docs.filter(F.octet_length(F.encode("text", "UTF-8")) == F.length("text"))


def _q_video_frames(spark, sf_dir):
    media = mm.media_from_documents(_ascii_docs(spark, sf_dir))
    return mm.sample_frames(media, frame_len=64, every_n=2).select(
        F.col("media_id").cast("bigint").alias("media_id"),
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        "frame_md5",
    )


def _q_embedding_near_dup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return textops.embedding_near_dup(emb, threshold=0.45).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
    )


# -- approximate-path verification (LSH/IVF recall vs exact ground truth) ----

def _q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard near-dup pairs, brute force, emitted with
    an INTEGER similarity (n_inter*10000 div n_union) and an integer
    threshold test (2·inter ≥ union ⟺ jaccard ≥ 0.5) so the DuckDB
    oracle — an independent SQL implementation over the same documents —
    compares float-free."""
    docs = _docs(spark, sf_dir)
    p = textops.ngram_jaccard_pairs(docs, threshold=0.0)
    return p.filter(2 * F.col("n_inter") >= F.col("n_union")).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.expr("CAST(n_inter * 10000 DIV n_union AS BIGINT)").alias("jac_x10000"),
    )


def _count1(df, name):
    return df.agg(F.count(F.lit(1)).cast("bigint").alias(name))


def _q_minhash_recall(spark, sf_dir):
    """MinHash-LSH blocking recall against exact n-gram-Jaccard ground
    truth: every true pair (jaccard ≥ 0.5) must appear among the LSH
    candidates. n_true_pairs is recomputed independently by the DuckDB
    oracle; the candidate/caught counts are deterministic (xxhash64) and
    pinned."""
    docs = _docs(spark, sf_dir)
    truth = (
        textops.ngram_jaccard_pairs(docs, threshold=0.0)
        .filter(2 * F.col("n_inter") >= F.col("n_union"))
        .select("id_a", "id_b")
    )
    cands = minhash_lsh_blocking(docs, "text", "doc_id", num_hashes=32, bands=8)
    caught = truth.join(cands, ["id_a", "id_b"])
    return (
        _count1(cands, "n_candidate_pairs")
        .crossJoin(_count1(truth, "n_true_pairs"))
        .crossJoin(_count1(caught, "n_caught"))
        .select(
            "n_candidate_pairs",
            "n_true_pairs",
            "n_caught",
            (F.col("n_caught") * 100 / F.col("n_true_pairs")).cast("bigint").alias("recall_pct"),
        )
    )


def _planted_embeddings(spark, sf_dir, eps=0.05):
    """ANN evaluation corpus: the sf embeddings plus a deterministic
    perturbed twin (vec_id + 10000, cosine ≈ 0.975) for each vec_id < 100.

    The base corpus's nearest neighbors are statistically random (unit
    vectors, top-3 cosine ≈ 0.34 vs noise σ = 0.125), so recall there
    measures nothing an ANN structure can deliver; the planted twins are
    the high-cosine regime approximate search exists for. No external
    data: noise is xxhash64-derived from (vec_id, dim index)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    twins = emb.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.expr(
            f"transform(embedding, (x, i) -> cast(cast(x as double) + {eps} * "
            "(cast(xxhash64(vec_id, i) as double) / 9.223372036854775807e18) as float))"
        ).alias("embedding"),
    )
    return emb.unionByName(twins)


def _q_ann_lsh_recall(spark, sf_dir):
    """Multi-table hyperplane-LSH top-1 recall vs brute-force ground truth
    on the planted-twin corpus. Fully deterministic (blake2b planes) —
    all three outputs pinned."""
    corpus = _planted_embeddings(spark, sf_dir)
    brute = textops.ann_bruteforce_topk(corpus, k=1).filter(F.col("query_id") >= 10000)
    lsh = (
        textops.ann_lsh_topk(corpus, k=1, n_planes=8, n_tables=8)
        .filter(F.col("query_id") >= 10000)
        .select("query_id", "neighbor_id")
    )
    hits = brute.join(lsh, ["query_id", "neighbor_id"])
    return (
        _count1(brute, "n_queries")
        .crossJoin(_count1(hits, "n_hit_top1"))
        .select(
            "n_queries",
            "n_hit_top1",
            (F.col("n_hit_top1") * 100 / F.col("n_queries")).cast("bigint").alias("recall_pct"),
        )
    )


def _q_ann_sq8_recall(spark, sf_dir):
    """int8 scalar-quantized (ADC) top-1 recall vs brute-force ground
    truth on the planted-twin corpus. Quantization is deterministic
    (corpus-wide per-dimension ranges, no RNG), so all three outputs
    pin exactly."""
    corpus = _planted_embeddings(spark, sf_dir)
    brute = textops.ann_bruteforce_topk(corpus, k=1).filter(F.col("query_id") >= 10000)
    sq = (
        textops.ann_sq8_topk(corpus, k=1)
        .filter(F.col("query_id") >= 10000)
        .select("query_id", "neighbor_id")
    )
    hits = brute.join(sq, ["query_id", "neighbor_id"])
    return (
        _count1(brute, "n_queries")
        .crossJoin(_count1(hits, "n_hit_top1"))
        .select(
            "n_queries",
            "n_hit_top1",
            (F.col("n_hit_top1") * 100 / F.col("n_queries")).cast("bigint").alias("recall_pct"),
        )
    )


def _q_ann_ivf_recall(spark, sf_dir):
    """IVF-flat top-1 recall vs brute force on the planted-twin corpus.
    KMeans centroids can shift with partitioning, so the pin is a
    thresholded recall_ok (≥95%), not the exact hit count."""
    corpus = _planted_embeddings(spark, sf_dir)
    brute = textops.ann_bruteforce_topk(corpus, k=1).filter(F.col("query_id") >= 10000)
    ivf = (
        textops.ann_ivf_topk(corpus, k=1, n_lists=8, n_probe=2)
        .filter(F.col("query_id") >= 10000)
        .select("query_id", "neighbor_id")
    )
    hits = brute.join(ivf, ["query_id", "neighbor_id"])
    return (
        _count1(brute, "n_queries")
        .crossJoin(_count1(hits, "n_hit_top1"))
        .select(
            "n_queries",
            (F.col("n_hit_top1") >= 95).cast("bigint").alias("recall_ok"),
        )
    )


def _q_embedding_near_dup_lsh(spark, sf_dir):
    """The LSH-blocked near-dup SCALE path cross-checked against the exact
    all-pairs result at threshold 0.9 on the planted-twin corpus: pair
    sets must agree (the blocked path may only lose what OR-amplification
    loses — pinned at zero here)."""
    corpus = _planted_embeddings(spark, sf_dir)
    exact = textops.embedding_near_dup(corpus, threshold=0.9)
    lsh = textops.embedding_near_dup(corpus, threshold=0.9, n_planes=8, n_tables=8)
    common = exact.join(lsh, ["id_a", "id_b"])
    return (
        _count1(exact, "n_exact")
        .crossJoin(_count1(lsh, "n_lsh"))
        .crossJoin(_count1(common, "n_common"))
    )


# -- raw surfaces of the approximate paths (golden-VALUES oracled: the
# -- outputs are deterministic, and driver-side pure-Python/numpy mirrors
# -- recompute them independently — purehash.xxh64 replicates Spark's
# -- xxhash64 bit-for-bit, float folds are mirrored in IEEE order) ----------

def _q_minhash_near_dup(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return minhash_lsh_blocking(docs, "text", "doc_id", num_hashes=32, bands=8).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
    )


def _q_near_dup_clusters(spark, sf_dir):
    """Cluster-level fuzzy dedup (linking.near_dup_clusters): LSH pairs
    → connected components → one row per doc with its cluster, the
    min-id representative flag, and cluster size — filter(is_representative)
    IS the deduped corpus. Oracle: union-find over the bit-exact
    pure-Python LSH pair mirror plus singleton fill-in."""
    from parser_rdf_spark.linking import near_dup_clusters

    docs = _docs(spark, sf_dir)
    c = near_dup_clusters(docs, "text", "doc_id", num_hashes=32, bands=8)
    return c.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        "is_representative",
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
    )


def _q_simhash(spark, sf_dir):
    return textops.simhash(_docs(spark, sf_dir))


def _q_ann_lsh(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return textops.ann_lsh_topk(emb, k=3, n_planes=8, n_tables=8).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
    )


def _q_ann_ivf(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return textops.ann_ivf_topk(emb, k=3, n_lists=8, n_probe=3).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
    )


def _q_simhash_near_dup(spark, sf_dir):
    return textops.simhash_near_dups(_docs(spark, sf_dir), max_hamming=16)


def _q_media_decode(spark, sf_dir):
    # synthetic FAKE-header corpus: the decode plumbing (Arrow batches,
    # schema, stub gating) is what's exercised; blake2b payloads have no
    # SQL equivalent → rows-only
    dec = mm.decode_media(mm.synth_media(spark, n=60))
    return dec.select("media_id", "kind", "width", "height",
                      "sample_rate", "n_samples", "n_frames", "decoder")


def _q_image_resize(spark, sf_dir):
    dec = mm.decode_media(mm.synth_media(spark, n=60))
    return mm.resize_images(dec, out_w=4, out_h=4)


def _q_media_embed_ann(spark, sf_dir):
    emb = mm.embed_media(mm.synth_media(spark, n=60), dim=16)
    return textops.ann_bruteforce_topk(emb, k=2, id_col="media_id", vec_col="embedding")


# ---------------------------------------------------------------------------
# BGP (SPARQL-style) query compiler over a KG derived from the TPC-H
# tables: the Spark side triple-izes customer/supplier/nation/region into
# ONE (subj, pred, obj) relation and runs compiled pattern self-joins;
# the DuckDB oracle answers the same question with direct joins over the
# BASE tables — an independent formulation, so a compiler bug (wrong join
# variable, dropped OPTIONAL row, filter on the wrong binding) cannot
# cancel out.
# ---------------------------------------------------------------------------

def _tpch_triples(spark, sf_dir):
    """Triple-ize the TPC-H micro-KG: ~6 predicates over customers,
    suppliers, nations, regions. `ex:highBalance` is deliberately present
    only for acctbal > 9000 so OPTIONAL has real unbound rows."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")

    def iri(prefix, col):
        return F.concat(F.lit(f"urn:{prefix}:"), F.col(col).cast("string"))

    def spo(df, s, p, o):
        return df.select(s.alias("subj"), F.lit(p).alias("pred"), o.alias("obj"))

    cust_iri = iri("cust", "c_custkey")
    supp_iri = iri("supp", "s_suppkey")
    nat_iri = iri("nation", "n_nationkey")
    reg_iri = iri("region", "r_regionkey")
    parts = [
        spo(customer, cust_iri, "rdf:type", F.lit("ex:Customer")),
        spo(customer, cust_iri, "ex:inNation", iri("nation", "c_nationkey")),
        spo(customer, cust_iri, "ex:mktsegment", F.col("c_mktsegment")),
        spo(customer.filter(F.col("c_acctbal") > 9000),
            cust_iri, "ex:highBalance", F.lit("true")),
        spo(supplier, supp_iri, "rdf:type", F.lit("ex:Supplier")),
        spo(supplier, supp_iri, "ex:inNation", iri("nation", "s_nationkey")),
        spo(nation, nat_iri, "rdf:type", F.lit("ex:Nation")),
        spo(nation, nat_iri, "ex:name", F.col("n_name")),
        spo(nation, nat_iri, "ex:inRegion", iri("region", "n_regionkey")),
        spo(region, reg_iri, "ex:name", F.col("r_name")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _q_bgp_star_join(spark, sf_dir):
    """4-hop chain query: customers in European nations, with the nation
    name — compiled to self-joins of the single triples relation."""
    from parser_rdf_spark.bgp import bgp_query

    return bgp_query(
        _tpch_triples(spark, sf_dir),
        patterns=[
            ("?c", "rdf:type", "ex:Customer"),
            ("?c", "ex:inNation", "?n"),
            ("?n", "ex:inRegion", "?r"),
            ("?r", "ex:name", "EUROPE"),
            ("?n", "ex:name", "?nname"),
        ],
        select=["?c", "?nname"],
    )


def _q_bgp_optional_filter(spark, sf_dir):
    """OPTIONAL + FILTER: French/German customers, with their
    highBalance marker when present (NULL otherwise — left-join
    semantics the oracle reproduces with a CASE over acctbal). The
    testdata nations are synthetic NATION_<k> names."""
    from parser_rdf_spark.bgp import bgp_query

    return bgp_query(
        _tpch_triples(spark, sf_dir),
        patterns=[
            ("?c", "rdf:type", "ex:Customer"),
            ("?c", "ex:inNation", "?n"),
            ("?n", "ex:name", "?nname"),
        ],
        optional=[("?c", "ex:highBalance", "?hb")],
        filters=["nname IN ('NATION_3', 'NATION_7')"],
        select=["?c", "?nname", "?hb"],
    )


def _q_bgp_stats_ordered(spark, sf_dir):
    """Cost-based BGP join ordering (round 4): the same chain as
    bgp_star_join but with an ADVERSARIAL user pattern order (the two
    mega-patterns first) and `stats=predicate_statistics(triples)` —
    the greedy smallest-estimate order must still answer identically.
    Green means the cost-based path changes only the plan, never the
    relation."""
    from parser_rdf_spark.bgp import bgp_query
    from parser_rdf_spark.graphops import predicate_statistics

    triples = _tpch_triples(spark, sf_dir)
    return bgp_query(
        triples,
        patterns=[
            ("?c", "rdf:type", "ex:Customer"),      # mega: every customer
            ("?c", "ex:inNation", "?n"),            # mega: every customer
            ("?n", "ex:inRegion", "?r"),
            ("?n", "ex:name", "?nname"),
            ("?r", "ex:name", "EUROPE"),            # most selective, last
        ],
        select=["?c", "?nname"],
        stats=predicate_statistics(triples),
    )


def _q_bgp_same_nation_join(spark, sf_dir):
    """Many-to-many variable join: AUTOMOBILE customers × suppliers
    sharing a nation — two entity classes meeting on variable ?n."""
    from parser_rdf_spark.bgp import bgp_query

    return bgp_query(
        _tpch_triples(spark, sf_dir),
        patterns=[
            ("?c", "rdf:type", "ex:Customer"),
            ("?c", "ex:mktsegment", "AUTOMOBILE"),
            ("?c", "ex:inNation", "?n"),
            ("?s", "rdf:type", "ex:Supplier"),
            ("?s", "ex:inNation", "?n"),
        ],
        select=["?c", "?s", "?n"],
    )


# ---------------------------------------------------------------------------
# incremental maintenance (incremental.py): the Spark side splits the
# work into prev + delta and merges INCREMENTALLY; the oracle computes
# the from-scratch answer over the full input — green means incremental
# maintenance is bit-identical to a full rebuild.
# ---------------------------------------------------------------------------

def _q_kg_incremental_cc(spark, sf_dir):
    """Connected components maintained incrementally: full CC on ~3/4 of
    the event-graph edges, then the remaining quarter merged via the
    quotient-graph path. Oracle: recursive-CTE CC over ALL edges."""
    from parser_rdf_spark.incremental import incremental_connected_components
    from parser_rdf_spark.linking import connected_components

    g = _event_graph(spark, sf_dir)
    is_delta = (F.col("src") * 31 + F.col("dst")) % 4 == 0
    prev = connected_components(g.filter(~is_delta))
    inc = incremental_connected_components(prev, g.filter(is_delta))
    return inc.select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.col("component").cast("bigint").alias("component"),
    )


def _delta_triples(spark, sf_dir):
    """The 're-crawl batch': every custkey % 10 == 0 customer re-asserts
    only type + an UPDATED segment (its other triples must vanish), and
    custkey % 100 == 0 spawns a brand-new entity."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    recrawled = customer.filter(F.col("c_custkey") % 10 == 0)
    cust_iri = F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string"))
    new_iri = F.concat(F.lit("urn:cust:new"), F.col("c_custkey").cast("string"))
    return (
        recrawled.select(cust_iri.alias("subj"), F.lit("rdf:type").alias("pred"),
                         F.lit("ex:Customer").alias("obj"))
        .unionByName(recrawled.select(cust_iri.alias("subj"),
                                      F.lit("ex:mktsegment").alias("pred"),
                                      F.lit("UPDATED").alias("obj")))
        .unionByName(customer.filter(F.col("c_custkey") % 100 == 0)
                     .select(new_iri.alias("subj"), F.lit("rdf:type").alias("pred"),
                             F.lit("ex:Customer").alias("obj")))
    )


def _q_triples_delta_merge(spark, sf_dir):
    """Replace-by-entity merge of the re-crawl batch into the TPC-H KG:
    touched subjects keep ONLY their delta triples (stale assertions
    dropped), untouched subjects carry over, new subjects append."""
    from parser_rdf_spark.incremental import merge_triples

    return merge_triples(_tpch_triples(spark, sf_dir), _delta_triples(spark, sf_dir),
                         key="subj")


def _q_triples_delta_stats(spark, sf_dir):
    """Per-batch merge lineage counters (docs updated/added, triples
    removed/added/carried) — the numbers a production merge job logs."""
    from parser_rdf_spark.incremental import merge_stats

    return merge_stats(_tpch_triples(spark, sf_dir), _delta_triples(spark, sf_dir),
                       key="subj")


_ONTO_V1_DOCS = {
    "https://onto.example.org/keep": (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        'ex:Stable a rdfs:Class ; rdfs:label "Stable"@en .\n'
    ),
    "https://onto.example.org/update": (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        'ex:Old a rdfs:Class ; rdfs:label "Old"@en .\n'
        "ex:AlsoOld a rdfs:Class .\n"
    ),
    "https://onto.example.org/drop": (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        'ex:Vanishing a rdfs:Class ; rdfs:label "Vanishing"@en .\n'
    ),
}

_ONTO_DELTA_DOCS = {
    "https://onto.example.org/update": (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        'ex:Old a rdfs:Class ; rdfs:label "Renamed"@en .\n'
        'ex:Fresh a rdfs:Class ; rdfs:label "Fresh"@en .\n'
    ),
    "https://onto.example.org/drop": (
        "@prefix ex: <http://example.org/> .\n"
        'ex:x ex:p "no ontology in the re-crawl" .\n'
    ),
    "https://onto.example.org/new": (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        'ex:Brand a rdfs:Class ; rdfs:label "Brand"@en .\n'
    ),
}


def _q_incremental_ontology_merge(spark, sf_dir):
    """Work-∝-delta ontology-table maintenance (VERDICT r03 task 6):
    classes extracted from the v1 corpus, then a re-crawl batch merged
    via incremental.merge_extracted — ONLY the delta documents are
    re-extracted. Bit-identity with full re-extraction is pinned in
    pytest (all three extraction tables); the oracle here enumerates the
    expected post-merge classes (rename applied, dropped class purged —
    including the document whose re-crawl lost ALL resources — new doc
    appended, untouched doc carried)."""
    from parser_rdf_spark.extract import extract_classes
    from parser_rdf_spark.incremental import merge_extracted

    old_t = triples_of(parse_pages(_fixture_pages(spark, _ONTO_V1_DOCS)))
    delta_t = triples_of(parse_pages(_fixture_pages(spark, _ONTO_DELTA_DOCS)))
    merged = merge_extracted(extract_classes(old_t), delta_t, extract_classes)
    return merged.select("doc_url", "uri", "label")


def _q_rdfs_inference(spark, sf_dir):
    """RDFS entailment materialization over the TPC-H KG + a 7-triple
    ontology: subclass-chain typing (rdfs9/11 through the CLOSED chain
    Customer⊑Agent⊑Entity), property inheritance (rdfs7:
    inNation/inRegion ⊑ locatedIn), domain typing (rdfs2), and range
    typing through the INHERITED property (rdfs3 on locatedIn — only
    derivable because rdfs7 feeds the range rule). Returns inferred-only
    triples; the oracle enumerates the consequence set rule-by-rule in
    SQL over the base tables."""
    from parser_rdf_spark.inference import rdfs_entailment

    onto = spark.createDataFrame(
        [
            ("ex:Customer", "rdfs:subClassOf", "ex:Agent"),
            ("ex:Supplier", "rdfs:subClassOf", "ex:Agent"),
            ("ex:Agent", "rdfs:subClassOf", "ex:Entity"),
            ("ex:inNation", "rdfs:subPropertyOf", "ex:locatedIn"),
            ("ex:inRegion", "rdfs:subPropertyOf", "ex:locatedIn"),
            ("ex:locatedIn", "rdfs:range", "ex:Place"),
            ("ex:inNation", "rdfs:domain", "ex:Resident"),
        ],
        "subj string, pred string, obj string",
    )
    kg = _tpch_triples(spark, sf_dir).unionByName(onto)
    return rdfs_entailment(
        kg,
        vocab={"type": "rdf:type", "subclass": "rdfs:subClassOf",
               "subprop": "rdfs:subPropertyOf", "domain": "rdfs:domain",
               "range": "rdfs:range"},
    )


_WL_TIE_URL = "https://crawl.example.org/wl/{}"


def _q_isomorphic_wl_ties(spark, sf_dir):
    """VERDICT r05 task 4 end-to-end: graph-level dedup through the FULL
    parse path stays sound under WL automorphism ties. Six Turtle docs:
    a 6-cycle of blank nodes, the SAME 6-cycle re-crawled under renamed
    labels, and two disjoint 3-cycles (NON-isomorphic but WL-hash-
    colliding with the 6-cycle — the classic hexagon/two-triangles
    pair), plus a bnode-chain doc, its renamed re-crawl, and a ground-
    different chain. isomorphic_duplicates must group exactly the two
    true re-crawl pairs — the WL collision must NOT merge. Oracle:
    golden VALUES (the grouping IS the contract; hashes are internal)."""
    from parser_rdf_spark.canonical import isomorphic_duplicates
    from parser_rdf_spark.parse import parse_pages, triples_of

    def cycle_ttl(pairs):
        lines = ["@prefix ex: <http://e/> ."]
        lines += [f"_:{a} ex:n _:{b} ." for a, b in pairs]
        return "\n".join(lines)

    def hexa(p):
        return cycle_ttl([(f"{p}{i}", f"{p}{(i + 1) % 6}") for i in range(6)])

    tris = cycle_ttl([("t0", "t1"), ("t1", "t2"), ("t2", "t0"),
                      ("t3", "t4"), ("t4", "t5"), ("t5", "t3")])
    chain = ('@prefix ex: <http://e/> .\n'
             'ex:x ex:knows _:{a} .\n'
             '_:{a} ex:name "Ann" ; ex:friend _:{b} .\n'
             '_:{b} ex:name "{bob}" .')
    pages = _fixture_pages(spark, {
        _WL_TIE_URL.format("hex1"): hexa("h"),
        _WL_TIE_URL.format("hex2"): hexa("z"),
        _WL_TIE_URL.format("tris"): tris,
        _WL_TIE_URL.format("chain1"): chain.format(a="a", b="b", bob="Bob"),
        _WL_TIE_URL.format("chain2"): chain.format(a="g1", b="g2", bob="Bob"),
        _WL_TIE_URL.format("chain3"): chain.format(a="a", b="b", bob="Carol"),
    })
    dups = isomorphic_duplicates(triples_of(parse_pages(pages)), rounds=2)
    return dups.select(
        F.concat_ws("|", "doc_urls").alias("members"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
    )


_WL_TIES_SQL = (
    "SELECT * FROM (VALUES "
    f"('{_WL_TIE_URL.format('chain1')}|{_WL_TIE_URL.format('chain2')}', "
    "CAST(2 AS BIGINT)), "
    f"('{_WL_TIE_URL.format('hex1')}|{_WL_TIE_URL.format('hex2')}', "
    "CAST(2 AS BIGINT))"
    ") AS t(members, n_docs)"
)


def _q_isomorphic_dup_orbit_relabel(spark, sf_dir):
    """Round-5 exactness law through the FULL parse path: graph-level
    dedup is COMPLETE under WL automorphism ties, not merely sound. A
    directed 6-cycle of blank nodes is re-crawled with an
    orbit-CROSSING relabel (label order walks the cycle backwards —
    the i -> -i isomorphism), which the pre-exact original-label
    tie-break serialized differently and therefore MISSED; the
    individualization-refinement key (canonical.exact_canonical_hashes)
    must group it, while the WL-colliding two-triangles decoy stays
    apart and an unambiguous ground-anchored pair still groups via the
    plain WL hash. Oracle: golden VALUES (the grouping IS the
    contract)."""
    from parser_rdf_spark.canonical import isomorphic_duplicates
    from parser_rdf_spark.parse import parse_pages, triples_of

    def cycle_ttl(pairs):
        lines = ["@prefix ex: <http://e/> ."]
        lines += [f"_:{a} ex:n _:{b} ." for a, b in pairs]
        return "\n".join(lines)

    hexa = cycle_ttl([(f"h{i}", f"h{(i + 1) % 6}") for i in range(6)])
    hexa_rev = cycle_ttl([(f"r{(i + 1) % 6}", f"r{i}") for i in range(6)])
    tris = cycle_ttl([("t0", "t1"), ("t1", "t2"), ("t2", "t0"),
                      ("t3", "t4"), ("t4", "t5"), ("t5", "t3")])
    anchored = ('@prefix ex: <http://e/> .\n'
                'ex:x ex:knows _:{a} .\n'
                '_:{a} ex:name "Ann" .')
    pages = _fixture_pages(spark, {
        _WL_TIE_URL.format("ohex1"): hexa,
        _WL_TIE_URL.format("ohex2"): hexa_rev,
        _WL_TIE_URL.format("otris"): tris,
        _WL_TIE_URL.format("oanc1"): anchored.format(a="a"),
        _WL_TIE_URL.format("oanc2"): anchored.format(a="b9"),
    })
    dups = isomorphic_duplicates(triples_of(parse_pages(pages)), rounds=2)
    return dups.select(
        F.concat_ws("|", "doc_urls").alias("members"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
    )


_ORBIT_RELABEL_SQL = (
    "SELECT * FROM (VALUES "
    f"('{_WL_TIE_URL.format('oanc1')}|{_WL_TIE_URL.format('oanc2')}', "
    "CAST(2 AS BIGINT)), "
    f"('{_WL_TIE_URL.format('ohex1')}|{_WL_TIE_URL.format('ohex2')}', "
    "CAST(2 AS BIGINT))"
    ") AS t(members, n_docs)"
)


def _q_incremental_entailment(spark, sf_dir):
    """VERDICT r05 task 6: delta-driven RDFS maintenance
    (inference.rdfs_entailment_delta) — an append-only crawl batch
    (all suppliers + a schema extension: Supplier⊑Agent, Agent⊑Entity,
    inRegion⊑locatedIn, inNation domain Resident) lands on a
    customers-only KG whose consequences are already materialized; the
    engine computes ONLY the consequence delta (semi-naive: delta
    instances × merged broadcast closures, old instances × the
    ontology-sized closure DELTA — skipped per-relation when empty) and
    the function RAISES unless prev ∪ delta is bit-identical to a full
    re-materialization of the merged KG, so a green driver row attests
    the maintenance law itself. Returns the ADDED rows; the oracle
    enumerates them rule-by-rule from the base tables."""
    from parser_rdf_spark.inference import rdfs_entailment, rdfs_entailment_delta

    v = {"type": "rdf:type", "subclass": "rdfs:subClassOf",
         "subprop": "rdfs:subPropertyOf", "domain": "rdfs:domain",
         "range": "rdfs:range"}
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    def iri(prefix, col):
        return F.concat(F.lit(f"urn:{prefix}:"), F.col(col).cast("string"))

    def spo(df, s, p, o):
        return df.select(s.alias("subj"), F.lit(p).alias("pred"), o.alias("obj"))

    onto_v1 = spark.createDataFrame(
        [("ex:Customer", "rdfs:subClassOf", "ex:Agent"),
         ("ex:inNation", "rdfs:subPropertyOf", "ex:locatedIn"),
         ("ex:locatedIn", "rdfs:range", "ex:Place")],
        "subj string, pred string, obj string")
    old = (
        spo(customer, iri("cust", "c_custkey"), "rdf:type", F.lit("ex:Customer"))
        .unionByName(spo(customer, iri("cust", "c_custkey"), "ex:inNation",
                         iri("nation", "c_nationkey")))
        .unionByName(spo(nation, iri("nation", "n_nationkey"), "ex:inRegion",
                         iri("region", "n_regionkey")))
        .unionByName(onto_v1)
    )
    onto_delta = spark.createDataFrame(
        [("ex:Supplier", "rdfs:subClassOf", "ex:Agent"),
         ("ex:Agent", "rdfs:subClassOf", "ex:Entity"),
         ("ex:inRegion", "rdfs:subPropertyOf", "ex:locatedIn"),
         ("ex:inNation", "rdfs:domain", "ex:Resident")],
        "subj string, pred string, obj string")
    delta = (
        spo(supplier, iri("supp", "s_suppkey"), "rdf:type", F.lit("ex:Supplier"))
        .unionByName(spo(supplier, iri("supp", "s_suppkey"), "ex:inNation",
                         iri("nation", "s_nationkey")))
        .unionByName(onto_delta)
    )
    prev = rdfs_entailment(old, vocab=v)
    added = rdfs_entailment_delta(old, delta, prev_inferred=prev, vocab=v)
    # the maintenance law, asserted in-query: prev ∪ added == full(merged)
    full = rdfs_entailment(old.unionByName(delta), vocab=v)
    incr = prev.unionByName(added)
    if (not incr.exceptAll(full).isEmpty()
            or not full.exceptAll(incr).isEmpty()):
        raise AssertionError(
            "delta-driven entailment diverged from full re-materialization")
    return added


_INCR_ENTAIL_SQL = (
    "SELECT 'urn:cust:' || c_custkey AS subj, 'rdf:type' AS pred, "
    "'ex:Entity' AS obj FROM customer "
    "UNION ALL SELECT 'urn:cust:' || c_custkey, 'rdf:type', 'ex:Resident' "
    "FROM customer "
    "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'rdf:type', v.c "
    "FROM supplier, (VALUES ('ex:Agent'), ('ex:Entity'), ('ex:Resident')) v(c) "
    "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'ex:locatedIn', "
    "'urn:nation:' || s_nationkey FROM supplier "
    # supplier-referenced nations become Places only if no customer
    # already placed them (those rows are in prev, not in the delta)
    "UNION ALL SELECT DISTINCT 'urn:nation:' || s_nationkey, 'rdf:type', "
    "'ex:Place' FROM supplier WHERE s_nationkey NOT IN "
    "(SELECT c_nationkey FROM customer) "
    # inRegion newly ⊑ locatedIn: every nation's region edge inherits,
    "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'ex:locatedIn', "
    "'urn:region:' || n_regionkey FROM nation "
    # ... and its object becomes a Place via the (old) range axiom
    "UNION ALL SELECT DISTINCT 'urn:region:' || n_regionkey, 'rdf:type', "
    "'ex:Place' FROM nation "
    # chained schema-closure delta rows (asserted delta edges excluded)
    "UNION ALL SELECT v.s, 'rdfs:subClassOf', 'ex:Entity' "
    "FROM (VALUES ('ex:Customer'), ('ex:Supplier')) v(s)"
)


def _q_incremental_owl_entailment(spark, sf_dir):
    """VERDICT r05 task 6, OWL half (owl_property_entailment_delta): an
    axiom-only append batch (ex:next becomes transitive, ex:prev its
    inverse) lands on a chain KG over the 25 nation keys whose OWL
    consequences are already materialized (empty — no axioms yet). The
    engine re-runs the transitive closure ONLY for the touched
    predicate and derives inverse rows for the old edges via the
    broadcast AXIOM DELTA; RAISES unless prev ∪ delta is bit-identical
    to full re-materialization. Oracle: the chain closure is all
    (i, j > i+1) pairs — enumerable with one self-join, no recursion."""
    from parser_rdf_spark.inference import (owl_property_entailment,
                                            owl_property_entailment_delta)

    v = {"type": "rdf:type", "inverse": "owl:inverseOf",
         "symmetric": "owl:Symmetric", "transitive": "owl:Transitive"}
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = nation.select(F.col("n_nationkey").cast("long").alias("i"))
    edges = (
        k.alias("a").join(k.alias("b"), F.col("b.i") == F.col("a.i") + 1)
        .select(F.concat(F.lit("urn:n:"), F.col("a.i")).alias("subj"),
                F.lit("ex:next").alias("pred"),
                F.concat(F.lit("urn:n:"), F.col("b.i")).alias("obj"))
    )
    delta = spark.createDataFrame(
        [("ex:next", "rdf:type", "owl:Transitive"),
         ("ex:prev", "owl:inverseOf", "ex:next")],
        "subj string, pred string, obj string")
    prev = owl_property_entailment(edges, vocab=v)
    added = owl_property_entailment_delta(edges, delta, prev_inferred=prev,
                                          vocab=v)
    full = owl_property_entailment(edges.unionByName(delta), vocab=v)
    incr = prev.unionByName(added)
    if (not incr.exceptAll(full).isEmpty()
            or not full.exceptAll(incr).isEmpty()):
        raise AssertionError(
            "delta-driven OWL entailment diverged from full re-materialization")
    return added


_INCR_OWL_SQL = (
    "WITH k AS (SELECT CAST(n_nationkey AS BIGINT) AS i FROM nation) "
    # transitive closure of the chain = every forward pair; the adjacent
    # ones are asserted and therefore subtracted
    "SELECT 'urn:n:' || a.i AS subj, 'ex:next' AS pred, "
    "'urn:n:' || b.i AS obj FROM k a, k b WHERE b.i > a.i + 1 "
    # inverse of each asserted edge
    "UNION ALL SELECT 'urn:n:' || (i + 1), 'ex:prev', 'urn:n:' || i "
    "FROM k WHERE i + 1 <= (SELECT max(i) FROM k)"
)


def _q_sparql_entailed_query(spark, sf_dir):
    """SPARQL under the RDFS entailment regime (sparql_query_entailed,
    materialization strategy): the BGP matches rdf:type rows that exist
    only as consequences — subclass-chain typing (Agent, Entity),
    domain typing (Resident), and range typing through an INHERITED
    property (Place via rdfs7+rdfs3). Oracle recomputes each entailed
    class extension from the base tables."""
    from parser_rdf_spark.sparql import sparql_query_entailed

    onto = spark.createDataFrame(
        [
            ("ex:Customer", "rdfs:subClassOf", "ex:Agent"),
            ("ex:Supplier", "rdfs:subClassOf", "ex:Agent"),
            ("ex:Agent", "rdfs:subClassOf", "ex:Entity"),
            ("ex:inNation", "rdfs:subPropertyOf", "ex:locatedIn"),
            ("ex:inRegion", "rdfs:subPropertyOf", "ex:locatedIn"),
            ("ex:locatedIn", "rdfs:range", "ex:Place"),
            ("ex:inNation", "rdfs:domain", "ex:Resident"),
        ],
        "subj string, pred string, obj string",
    )
    kg = _tpch_triples(spark, sf_dir).unionByName(onto)
    return sparql_query_entailed(
        kg, """
        SELECT ?cls (COUNT(?x) AS ?n) WHERE {
          ?x rdf:type ?cls .
          FILTER (?cls IN ("ex:Agent", "ex:Entity", "ex:Resident", "ex:Place"))
        } GROUP BY ?cls
        """,
        entailment="rdfs",
        vocab={"type": "rdf:type", "subclass": "rdfs:subClassOf",
               "subprop": "rdfs:subPropertyOf", "domain": "rdfs:domain",
               "range": "rdfs:range"},
    )


_SPARQL_ENTAILED_SQL = (
    "WITH agents AS (SELECT COUNT(*) AS c FROM "
    "(SELECT c_custkey AS k FROM customer UNION ALL SELECT s_suppkey FROM supplier)), "
    "places AS (SELECT "
    "(SELECT COUNT(DISTINCT nk) FROM (SELECT c_nationkey AS nk FROM customer "
    "UNION SELECT s_nationkey FROM supplier)) + "
    "(SELECT COUNT(DISTINCT n_regionkey) FROM nation) AS c) "
    "SELECT 'ex:Agent' AS cls, (SELECT c FROM agents) AS n "
    "UNION ALL SELECT 'ex:Entity', (SELECT c FROM agents) "
    "UNION ALL SELECT 'ex:Resident', (SELECT c FROM agents) "
    "UNION ALL SELECT 'ex:Place', (SELECT CAST(c AS BIGINT) FROM places)"
)


def _q_property_graph_export(spark, sf_dir):
    """RDF → labeled-property-graph projection (graphops.
    to_property_graph): type assertions become vertex labels,
    literal-object triples become vertex properties, IRI-object triples
    become typed edges — the LPG mapping GNN/feature pipelines consume.
    Output unions the three tables with a part tag; oracle enumerates
    each from the base tables."""
    from parser_rdf_spark.graphops import to_property_graph
    from parser_rdf_spark.schemas import TRIPLES

    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    c_iri = F.concat(F.lit("urn:cust:"), F.col("c_custkey"))
    n_iri = F.concat(F.lit("urn:nation:"), F.col("n_nationkey"))

    def full(subj, pred, kind, value):
        return F.struct(
            F.lit("urn:kg").alias("doc_url"),
            F.lit(None).cast("string").alias("graph"),
            subj.alias("subj"), F.lit(pred).alias("pred"),
            F.lit(kind).alias("obj_kind"),
            value.cast("string").alias("obj_value"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(1).alias("line_no"),
        )

    t = (
        cust.select(F.explode(F.array(
            full(c_iri, RT, "iri", F.lit("ex:Customer")),
            full(c_iri, "ex:acctbal", "literal",
                 F.col("c_acctbal").cast("decimal(12,2)")),
            full(c_iri, "ex:inNation", "iri",
                 F.concat(F.lit("urn:nation:"), F.col("c_nationkey"))),
        )).alias("t"))
        .unionByName(nation.select(F.explode(F.array(
            full(n_iri, RT, "iri", F.lit("ex:Nation")),
            full(n_iri, "ex:name", "literal", F.col("n_name")),
            full(n_iri, "ex:inRegion", "iri",
                 F.concat(F.lit("urn:region:"), F.col("n_regionkey"))),
        )).alias("t")))
        .select("t.*")
    )
    assert [f.name for f in t.schema.fields] == [f.name for f in TRIPLES.fields]
    v, p, e = to_property_graph(t, type_pred=RT)
    return (
        v.select(F.lit("vertex").alias("part"), F.col("id").alias("a"),
                 F.col("label").alias("b"), F.lit("").alias("c"))
        .unionByName(p.select(F.lit("prop").alias("part"),
                              F.col("id").alias("a"), F.col("key").alias("b"),
                              F.col("value").alias("c")))
        .unionByName(e.select(F.lit("edge").alias("part"),
                              F.col("src").alias("a"), F.col("label").alias("b"),
                              F.col("dst").alias("c")))
    )


_PROPERTY_GRAPH_SQL = (
    "SELECT 'vertex' AS part, 'urn:cust:' || c_custkey AS a, "
    "'ex:Customer' AS b, '' AS c FROM customer "
    "UNION ALL SELECT 'vertex', 'urn:nation:' || n_nationkey, 'ex:Nation', '' FROM nation "
    "UNION ALL SELECT 'prop', 'urn:cust:' || c_custkey, 'ex:acctbal', "
    "CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) FROM customer "
    "UNION ALL SELECT 'prop', 'urn:nation:' || n_nationkey, 'ex:name', n_name FROM nation "
    "UNION ALL SELECT 'edge', 'urn:cust:' || c_custkey, 'ex:inNation', "
    "'urn:nation:' || c_nationkey FROM customer "
    "UNION ALL SELECT 'edge', 'urn:nation:' || n_nationkey, 'ex:inRegion', "
    "'urn:region:' || n_regionkey FROM nation"
)


def _q_owl_restriction_inference(spark, sf_dir):
    """OWL 2 RL restriction-class rules (inference.py
    owl_restriction_entailment — the semantics behind the reference's
    E20 restrictions placeholder): someValuesFrom over a typed filler
    (svf1: everyone inNation a typed Nation), someValuesFrom owl:Thing
    (svf2), hasValue in both directions (hv1 emits the value assertion,
    hv2 types the holder), and allValuesFrom (avf types the fillers of
    explicitly-typed subjects). Oracle enumerates every consequence
    from the base tables."""
    from parser_rdf_spark.inference import owl_restriction_entailment

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    OWL = "http://www.w3.org/2002/07/owl#"
    axioms = spark.createDataFrame(
        [
            ("ex:R_Resident", OWL + "onProperty", "ex:inNation"),
            ("ex:R_Resident", OWL + "someValuesFrom", "ex:Nation"),
            ("ex:R_Seg", OWL + "onProperty", "ex:mktsegment"),
            ("ex:R_Seg", OWL + "someValuesFrom", OWL + "Thing"),
            ("ex:R_HighValue", OWL + "onProperty", "ex:highBalance"),
            ("ex:R_HighValue", OWL + "hasValue", "true"),
            ("ex:R_Audited", OWL + "onProperty", "ex:inRegion"),
            ("ex:R_Audited", OWL + "allValuesFrom", "ex:AuditedPlace"),
            ("ex:R_Flagged", OWL + "onProperty", "ex:flag"),
            ("ex:R_Flagged", OWL + "hasValue", "on"),
            ("urn:region:0", "rdf:type", "ex:R_Flagged"),
        ],
        "subj string, pred string, obj string",
    )
    audited = nation.filter(F.col("n_nationkey") % 5 == 0).select(
        F.concat(F.lit("urn:nation:"), F.col("n_nationkey")).alias("subj"),
        F.lit("rdf:type").alias("pred"),
        F.lit("ex:R_Audited").alias("obj"),
    )
    kg = _tpch_triples(spark, sf_dir).unionByName(axioms).unionByName(audited)
    return owl_restriction_entailment(kg, vocab={"type": "rdf:type"})


_OWL_RESTRICTION_SQL = (
    # svf1: every customer/supplier has ex:inNation to a typed ex:Nation
    "SELECT 'urn:cust:' || c_custkey AS subj, 'rdf:type' AS pred, "
    "'ex:R_Resident' AS obj FROM customer "
    "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'rdf:type', 'ex:R_Resident' FROM supplier "
    # svf2: every customer has a mktsegment
    "UNION ALL SELECT 'urn:cust:' || c_custkey, 'rdf:type', 'ex:R_Seg' FROM customer "
    # hv2: highBalance 'true' holders
    "UNION ALL SELECT 'urn:cust:' || c_custkey, 'rdf:type', 'ex:R_HighValue' "
    "FROM customer WHERE c_acctbal > 9000 "
    # avf: regions of the explicitly-audited nations
    "UNION ALL SELECT DISTINCT 'urn:region:' || n_regionkey, 'rdf:type', "
    "'ex:AuditedPlace' FROM nation WHERE n_nationkey % 5 = 0 "
    # hv1: the flagged region gets the value assertion
    "UNION ALL SELECT 'urn:region:0', 'ex:flag', 'on'"
)


def _q_kg_statistics(spark, sf_dir):
    """Stats-collection pass over the TPC-H KG: per-predicate counts,
    subject/object NDVs, and integer-div fanout — the numbers a BGP
    join-order heuristic consumes. Oracle: plain GROUP BY."""
    from parser_rdf_spark.graphops import predicate_statistics

    return predicate_statistics(_tpch_triples(spark, sf_dir))


def _q_ntriples_serialize(spark, sf_dir):
    """Sink-side serialization: the quartet corpus's triples rendered to
    canonical N-Triples lines by the pure-Column serializer. Oracle: an
    INDEPENDENT pure-Python formatter over the golden quartet triples
    (the W3C-verified pure-parse path), emitted as VALUES — the two
    implementations share no code, and the round-trip law
    parse(serialize(t)) == t is pinned separately in pytest."""
    from parser_rdf_spark.serialize import to_ntriples

    return to_ntriples(_quartet_triples(spark)).select(
        F.substring_index("doc_url", "/", -1).alias("doc"), "line"
    )


def _golden_values_ntriples() -> str:
    def term(x: str) -> str:
        return x if x.startswith("_:") else f"<{x}>"

    def fmt(t) -> str:
        if t.obj_kind == "iri":
            o = f"<{t.obj_value}>"
        elif t.obj_kind == "bnode":
            o = t.obj_value
        else:
            s = (t.obj_value.replace("\\", "\\\\").replace('"', '\\"')
                 .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))
            o = f'"{s}"'
            if t.obj_lang:
                o += f"@{t.obj_lang}"
            elif t.obj_datatype:
                o += f"^^<{t.obj_datatype}>"
        return f"{term(t.subj)} {term(t.pred)} {o} ."

    rows = [
        f"({_sql_quote(doc)}, {_sql_quote(fmt(t))})"
        for doc, t in _golden_quartet_rows()
    ]
    return "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(doc, line)"


def _q_owl_ifp_sameas(spark, sf_dir):
    """OWL 2 RL prp-ifp entity resolution: ex:email declared
    owl:InverseFunctionalProperty; customers below custkey 200 share a
    mailbox with custkey+100, so the engine must infer one sameAs star
    pair per shared mailbox (group minimum as canonical). Oracle: the
    same grouping as plain SQL min/self-join over the base table."""
    from parser_rdf_spark.inference import owl_functional_sameas

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    emails = customer.filter(F.col("c_custkey") < 200).select(
        F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("ex:email").alias("pred"),
        F.concat(F.lit("urn:mail:"),
                 (F.col("c_custkey") % 100).cast("string")).alias("obj"),
    )
    axiom = spark.createDataFrame(
        [("ex:email", "rdf:type",
          "http://www.w3.org/2002/07/owl#InverseFunctionalProperty")],
        "subj string, pred string, obj string",
    )
    kg = _tpch_triples(spark, sf_dir).unionByName(emails).unionByName(axiom)
    return owl_functional_sameas(kg, vocab={"type": "rdf:type"}).select(
        "subj", "pred", "obj"
    )


_ONTOLOGY_V1 = """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .
ex:C1 a rdfs:Class ; rdfs:label "One"@en .
ex:C2 a rdfs:Class ; rdfs:label "Two"@en .
ex:C4 a rdfs:Class ; rdfs:label "Four"@en ; rdfs:subClassOf ex:C1 .
"""

_ONTOLOGY_V2 = """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .
ex:C1 a rdfs:Class ; rdfs:label "One renamed"@en .
ex:C3 a rdfs:Class ; rdfs:label "Three"@en ; rdfs:subClassOf ex:C1 .
ex:C4 a rdfs:Class ; rdfs:label "Four"@en ; rdfs:subClassOf ex:C2 .
"""


def _q_fuzzy_name_pairs(spark, sf_dir):
    """Edit-distance ER over synthesized name variants: every customer
    below 150 gets a base name plus (for k%3==0) a 1-edit alias. The
    oracle repeats the prefix-block + length-bound + levenshtein
    verification in SQL (both engines implement standard unit-cost
    Levenshtein)."""
    from parser_rdf_spark.linking import fuzzy_name_pairs

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") < 150
    )
    k = F.col("c_custkey")
    names = customer.select(
        k.cast("bigint").alias("id"),
        F.concat(F.lit("Entity Number "), k.cast("string")).alias("name"),
    ).unionByName(customer.filter(k % 3 == 0).select(
        (k + 100000).cast("bigint").alias("id"),
        F.concat(F.lit("entity number "), k.cast("string"), F.lit("!")).alias("name"),
    ))
    return fuzzy_name_pairs(names, max_distance=1).select(
        "id1", "id2", "name1", "name2", "distance"
    )


def _q_canonicalize_urls(spark, sf_dir):
    """URL canonicalization over synthesized messy crawl URLs (mixed
    case, default ports, tracking params, fragments, unsorted query).
    Oracle: the same normalization rules written independently in
    DuckDB string/list SQL."""
    from parser_rdf_spark.webops import canonicalize_urls

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") < 200
    )
    k = F.col("c_custkey")
    messy = customer.select(
        F.when(k % 4 == 0,
               F.concat(F.lit("HTTP://Example.COM:80/p/"), k.cast("string"),
                        F.lit("?utm_source=x&b="), (k % 3).cast("string"),
                        F.lit("&a=1#frag")))
         .when(k % 4 == 1,
               F.concat(F.lit("https://Host.org:443/q?z="), (k % 5).cast("string")))
         .when(k % 4 == 2,
               F.concat(F.lit("http://plain.net/r/"), (k % 7).cast("string")))
         .otherwise(F.concat(F.lit("http://noslash.net:80"),
                             F.lit("?gclid="), k.cast("string"))).alias("url"),
    )
    return canonicalize_urls(messy).select("url", "canonical_url")


def _q_normalize_literals(spark, sf_dir):
    """Literal canonicalization over synthesized messy integer/boolean
    lexical forms ('+0' || k, ' k ', 'TRUE'/'0'): the oracle applies the
    same TRY_CAST arithmetic in SQL."""
    from parser_rdf_spark.linking import normalize_literals

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") < 120
    )
    xsd = "http://www.w3.org/2001/XMLSchema#"
    k = F.col("c_custkey")
    messy = customer.select(
        F.lit("https://d/1").alias("doc_url"),
        F.lit(None).cast("string").alias("graph"),
        F.concat(F.lit("urn:cust:"), k.cast("string")).alias("subj"),
        F.lit("ex:val").alias("pred"),
        F.lit("literal").alias("obj_kind"),
        F.when(k % 4 == 0, F.concat(F.lit("+0"), k.cast("string")))
         .when(k % 4 == 1, F.concat(F.lit(" "), k.cast("string"), F.lit(" ")))
         .when(k % 4 == 2, F.lit("TRUE"))
         .otherwise(F.lit("not-a-number")).alias("obj_value"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.when(k % 4 == 2, F.lit(xsd + "boolean"))
         .otherwise(F.lit(xsd + "integer")).alias("obj_datatype"),
        k.cast("int").alias("line_no"),
    )
    return normalize_literals(messy).select("subj", "obj_value", "obj_datatype")


def _q_ontology_diff(spark, sf_dir):
    """Schema-evolution report between two ontology snapshots: classes
    added / removed / label-changed / reparented, via ONE full-outer
    join over the extraction tables. Oracle: the hand-derived golden
    diff of the two fixtures."""
    from parser_rdf_spark.incremental import table_diff

    def classes(doc):
        pages = _fixture_pages(spark, {"https://fixtures.example.org/ont/v": doc})
        return extract_classes(triples_of(parse_pages(pages, fmt="turtle")))

    out = table_diff(classes(_ONTOLOGY_V1), classes(_ONTOLOGY_V2), ["uri"],
                     compare_cols=["label", "parent_classes"])
    return out.select(
        "status", "uri", F.array_join("changed_cols", ",").alias("changed")
    )


def _q_kg_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank (random walk with restart) from seeds
    {1,2,3} over the events-derived graph — the same IEEE-pinned
    discipline as kg_pagerank: the oracle unrolls 3 iterations with the
    teleport vector, ranks compared in rounded micro-units."""
    from parser_rdf_spark.graphops import personalized_pagerank

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        (F.col("user_id") % 997).alias("src"),
        (F.col("event_id") % 997).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return personalized_pagerank(g, [1, 2, 3], n_iter=3).select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.expr("cast(round(rank * 1000000e0) as bigint)").alias("rank_micro"),
    )


def _q_kg_hits(spark, sf_dir):
    """HITS hubs/authorities in the unnormalized integer form (exact
    path counts, bigint — no floats anywhere), 2 iterations over the
    events graph. Oracle: the same two join+sum passes per iteration in
    SQL, integer-exact."""
    from parser_rdf_spark.graphops import hits

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        (F.col("user_id") % 997).alias("src"),
        (F.col("event_id") % 997).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return hits(g, n_iter=2).select(
        F.col("vertex").cast("bigint").alias("vertex"), "hub", "auth"
    )


def _q_kg_void_description(spark, sf_dir):
    """VoID dataset descriptor of the TPC-H micro-KG: dataset-level
    counts plus property/class partitions, emitted AS RDF rows. Oracle:
    the same statistics computed by plain SQL aggregates over the
    triple-ized base tables."""
    from parser_rdf_spark.graphops import void_description

    v = void_description(
        _tpch_triples(spark, sf_dir), "https://ds.example.org/kg",
        type_iri="rdf:type",
    )
    return v.select(
        "subj", "pred", "obj_kind", "obj_value",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


# ---------------------------------------------------------------------------
# graph canonicalization (canonical.py): WL color refinement, one shared
# fixture drives BOTH the Spark query and a full re-implementation of the
# refinement in DuckDB SQL (not golden values — the oracle independently
# recomputes every color, hash, and label).
# ---------------------------------------------------------------------------
# (doc, graph, subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)
_XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
_CANON_FIXTURE = [
    # d1 / d2: the same graph under different serializer-minted bnode
    # labels — text dedup misses them, canonical hashing must not
    ("c:d1", None, "http://e/x", "http://e/knows", "bnode", "_:a", None, None),
    ("c:d1", None, "_:a", "http://e/name", "literal", "Ann", None, None),
    ("c:d1", None, "_:a", "http://e/friend", "bnode", "_:b", None, None),
    ("c:d1", None, "_:b", "http://e/name", "literal", "Bob", None, None),
    ("c:d1", None, "_:b", "http://e/age", "literal", "42", None, _XSD_INT),
    ("c:d2", None, "http://e/x", "http://e/knows", "bnode", "_:genid7", None, None),
    ("c:d2", None, "_:genid7", "http://e/name", "literal", "Ann", None, None),
    ("c:d2", None, "_:genid7", "http://e/friend", "bnode", "_:genid3", None, None),
    ("c:d2", None, "_:genid3", "http://e/name", "literal", "Bob", None, None),
    ("c:d2", None, "_:genid3", "http://e/age", "literal", "42", None, _XSD_INT),
    # d3: same shape as d1, one ground literal differs — distinct hash
    ("c:d3", None, "http://e/x", "http://e/knows", "bnode", "_:a", None, None),
    ("c:d3", None, "_:a", "http://e/name", "literal", "Ann", None, None),
    ("c:d3", None, "_:a", "http://e/friend", "bnode", "_:b", None, None),
    ("c:d3", None, "_:b", "http://e/name", "literal", "Carol", None, None),
    ("c:d3", None, "_:b", "http://e/age", "literal", "42", None, _XSD_INT),
    # d4 / d5: automorphic bnode pair (WL ties, labels tie-broken),
    # isomorphic to each other
    ("c:d4", None, "http://e/x", "http://e/p", "bnode", "_:m", None, None),
    ("c:d4", None, "http://e/x", "http://e/p", "bnode", "_:n", None, None),
    ("c:d4", None, "_:m", "http://e/v", "literal", "1", None, None),
    ("c:d4", None, "_:n", "http://e/v", "literal", "1", None, None),
    ("c:d5", None, "http://e/x", "http://e/p", "bnode", "_:q1", None, None),
    ("c:d5", None, "http://e/x", "http://e/p", "bnode", "_:q2", None, None),
    ("c:d5", None, "_:q1", "http://e/v", "literal", "1", None, None),
    ("c:d5", None, "_:q2", "http://e/v", "literal", "1", None, None),
    # d6: d1's triples inside a named graph — graph term is part of the
    # encoding, so the hash differs from d1
    ("c:d6", "http://g/one", "http://e/x", "http://e/knows", "bnode", "_:a", None, None),
    ("c:d6", "http://g/one", "_:a", "http://e/name", "literal", "Ann", None, None),
    ("c:d6", "http://g/one", "_:a", "http://e/friend", "bnode", "_:b", None, None),
    ("c:d6", "http://g/one", "_:b", "http://e/name", "literal", "Bob", None, None),
    ("c:d6", "http://g/one", "_:b", "http://e/age", "literal", "42", None, _XSD_INT),
    # d7: a French-tagged literal and an all-ground triple (no bnodes at
    # all in the second one — canonical hash must still cover it)
    ("c:d7", None, "http://e/x", "http://e/label", "literal", "libellé", "fr", None),
    ("c:d7", None, "http://e/x", "http://e/see", "iri", "http://e/y", None, None),
]


def _canon_triples(spark: SparkSession) -> DataFrame:
    from parser_rdf_spark.schemas import TRIPLES

    rows = [r + (i,) for i, r in enumerate(_CANON_FIXTURE)]
    return spark.createDataFrame(rows, TRIPLES)


def _canon_wl_ctes() -> str:
    """The WL refinement (canonical.py bnode_colors, rounds=2) as DuckDB
    CTEs over the same fixture — independent recomputation of every
    color (md5 over the '#'-joined sorted item list, items
    ``o|pred|g|<neighbor>`` / ``i|pred|g|<neighbor>``)."""
    vals = ", ".join(
        "(" + ", ".join(_sql_quote(c) for c in r) + ")" for r in _CANON_FIXTURE
    )
    ground_obj = (
        "CASE WHEN tt.okind = 'iri' THEN 'I:' || tt.o "
        "ELSE 'L:' || tt.o || '|' || tt.olang || '|' || tt.odt END"
    )
    item_round = (
        "SELECT tt.doc, tt.s AS b, 'o|' || tt.p || '|' || tt.g || '|' || "
        "CASE WHEN tt.o_bn THEN nb.c ELSE " + ground_obj + " END AS item "
        "FROM tt LEFT JOIN {prev} nb ON nb.doc = tt.doc AND nb.b = tt.o AND tt.o_bn "
        "WHERE tt.s_bn "
        "UNION ALL "
        "SELECT tt.doc, tt.o AS b, 'i|' || tt.p || '|' || tt.g || '|' || "
        "CASE WHEN tt.s_bn THEN sb.c ELSE 'I:' || tt.s END "
        "FROM tt LEFT JOIN {prev} sb ON sb.doc = tt.doc AND sb.b = tt.s AND tt.s_bn "
        "WHERE tt.o_bn"
    )
    color_agg = (
        "SELECT doc, b, md5(array_to_string(list_sort(list(item)), '#')) AS c "
        "FROM items{n} GROUP BY doc, b"
    )
    return (
        f"WITH raw(doc, g, s, p, okind, o, olang, odt) AS (VALUES {vals}), "
        "tt AS MATERIALIZED (SELECT doc, "
        "COALESCE(CASE WHEN g = '_:default' THEN NULL ELSE g END, '') AS g, "
        "s, p, okind, o, COALESCE(olang, '') AS olang, COALESCE(odt, '') AS odt, "
        "starts_with(s, '_:') AS s_bn, (okind = 'bnode') AS o_bn FROM raw), "
        "b0 AS MATERIALIZED (SELECT DISTINCT doc, b, 'x' AS c FROM ("
        "SELECT doc, s AS b FROM tt WHERE s_bn "
        "UNION SELECT doc, o FROM tt WHERE o_bn)), "
        "items1 AS (" + item_round.format(prev="b0") + "), "
        "b1 AS MATERIALIZED (" + color_agg.format(n=1) + "), "
        "items2 AS (" + item_round.format(prev="b1") + "), "
        "b2 AS MATERIALIZED (" + color_agg.format(n=2) + "), "
        "colored AS (SELECT tt.doc, "
        "CASE WHEN tt.s_bn THEN 'B:' || sc.c ELSE 'I:' || tt.s END AS subj_c, "
        "tt.p, "
        "CASE WHEN tt.o_bn THEN 'B:' || oc.c "
        "WHEN tt.okind = 'iri' THEN 'I:' || tt.o "
        "ELSE 'L:' || tt.o || '|' || tt.olang || '|' || tt.odt END AS obj_c, "
        "tt.g, tt.s, tt.o, tt.okind, tt.olang, tt.odt, tt.s_bn, tt.o_bn "
        "FROM tt "
        "LEFT JOIN b2 sc ON sc.doc = tt.doc AND sc.b = tt.s AND tt.s_bn "
        "LEFT JOIN b2 oc ON oc.doc = tt.doc AND oc.b = tt.o AND tt.o_bn) "
    )


def _canon_hash_oracle() -> str:
    # ambiguous (round 5): any final color class with >1 bnode — the
    # WL-tie flag isomorphic_duplicates verifies with exact canonical
    # quads; recomputed here from the independent b2 colors
    return _canon_wl_ctes() + (
        ", amb AS (SELECT doc, BOOL_OR(cnt > 1) AS ambiguous FROM "
        "(SELECT doc, c, COUNT(*) AS cnt FROM b2 GROUP BY doc, c) "
        "GROUP BY doc) "
        "SELECT h.doc_url, h.graph_hash, h.n_triples, "
        "COALESCE(a.ambiguous, false) AS ambiguous FROM ("
        "SELECT doc AS doc_url, "
        "md5(array_to_string(list_sort(list(subj_c || ' ' || p || ' ' || obj_c || ' ' || g)), chr(10))) AS graph_hash, "
        "COUNT(*) AS n_triples FROM colored GROUP BY doc) h "
        "LEFT JOIN amb a ON a.doc = h.doc_url"
    )


def _canon_labels_oracle() -> str:
    return _canon_wl_ctes() + (
        ", rel AS (SELECT doc, b, "
        "'_:c' || CAST(ROW_NUMBER() OVER (PARTITION BY doc ORDER BY c, b) - 1 AS VARCHAR) AS canon "
        "FROM b2) "
        "SELECT colored.doc AS doc_url, "
        "COALESCE(sm.canon, colored.s) AS subj, colored.p AS pred, "
        "colored.okind AS obj_kind, "
        "CASE WHEN colored.o_bn THEN om.canon ELSE colored.o END AS obj_value "
        "FROM colored "
        "LEFT JOIN rel sm ON sm.doc = colored.doc AND sm.b = colored.s AND colored.s_bn "
        "LEFT JOIN rel om ON om.doc = colored.doc AND om.b = colored.o AND colored.o_bn"
    )


def _shacl_deep_violations(spark, sf_dir):
    """Shared by shacl_deep_constraints and shacl_report_rdf: the raw
    violations frame of the extended-constraint validation over the
    full-schema TPC-H triple-ization."""
    from parser_rdf_spark.schemas import TRIPLES
    from parser_rdf_spark.shacl import shacl_validate

    XSD_DEC = "http://www.w3.org/2001/XMLSchema#decimal"
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    c_iri = F.concat(F.lit("urn:cust:"), F.col("c_custkey"))
    s_iri = F.concat(F.lit("urn:supp:"), F.col("s_suppkey"))
    n_iri = F.concat(F.lit("urn:nation:"), F.col("n_nationkey"))

    def full(subj, pred, kind, value, dt=None):
        return F.struct(
            F.lit("urn:kg").alias("doc_url"),
            F.lit(None).cast("string").alias("graph"),
            subj.alias("subj"), F.lit(pred).alias("pred"),
            kind.alias("obj_kind") if not isinstance(kind, str)
            else F.lit(kind).alias("obj_kind"),
            value.cast("string").alias("obj_value"),
            F.lit(None).cast("string").alias("obj_lang"),
            (dt if dt is not None else F.lit(None).cast("string")).alias("obj_datatype"),
            F.lit(1).alias("line_no"),
        )

    t = (
        cust.select(F.explode(F.array(
            full(c_iri, "rdf:type", "iri", F.lit("ex:Customer")),
            # decimal(12,2) lexical form — engine-portable (a raw double
            # cast renders '2547.4' in one engine, '2547.40' in another)
            full(c_iri, "ex:acctbal", "literal",
                 F.col("c_acctbal").cast("decimal(12,2)"),
                 F.when(F.col("c_custkey") % 3 != 0, F.lit(XSD_DEC))),
        )).alias("t"))
        .unionByName(nation.select(F.explode(F.array(
            full(n_iri, "rdf:type", "iri", F.lit("ex:Nation")),
            full(n_iri, "ex:name", "literal", F.col("n_name")),
        )).alias("t")))
        .unionByName(supp.select(F.explode(F.array(
            full(s_iri, "rdf:type", "iri", F.lit("ex:Supplier")),
            full(s_iri, "ex:homepage",
                 F.when(F.col("s_suppkey") % 2 == 0, F.lit("iri"))
                 .otherwise(F.lit("literal")),
                 F.concat(F.lit("http://supp.example.org/"), F.col("s_suppkey"))),
        )).alias("t")))
        .select("t.*")
    )
    assert [f.name for f in t.schema.fields] == [f.name for f in TRIPLES.fields]
    shapes = spark.createDataFrame(
        [
            ("s-bal", "ex:Customer", "ex:acctbal", None, None, None, None,
             None, None, None, 0.0, None, None, None, XSD_DEC, None),
            ("s-nname", "ex:Nation", "ex:name", None, None, None, None,
             None, 8, 8, None, None, None, None, None, None),
            ("s-home", "ex:Supplier", "ex:homepage", None, None, None, None,
             None, None, None, None, None, None, None, None, "IRI"),
        ],
        "shape_id string, target_class string, path string, min_count int, "
        "max_count int, node_class string, pattern string, "
        "value_in array<string>, min_length int, max_length int, "
        "min_inclusive double, max_inclusive double, min_exclusive double, "
        "max_exclusive double, datatype string, node_kind string",
    )
    return shacl_validate(t, shapes, type_pred="rdf:type")


def _q_shacl_deep_constraints(spark, sf_dir):
    """Extended SHACL-core constraint kinds (shacl.py round-4 surface)
    over FULL-schema triples (term kinds + datatypes): sh:datatype
    (plain literal IS xsd:string, so a missing decimal tag violates),
    sh:minInclusive (negative balances; non-castable lexical forms
    would too), sh:minLength/maxLength, and sh:nodeKind (literal
    homepages where an IRI is required). Oracle enumerates each
    violation set from the base tables."""
    return _shacl_deep_violations(spark, sf_dir).select(
        "shape_id", "focus", "constraint",
        F.coalesce("value", F.lit("")).alias("value"),
        F.coalesce("observed", F.lit(-1)).alias("observed"),
    )


_SHACL_DEEP_CONSTRAINTS_SQL = (
    # sh:datatype — custkey%3==0 rows are plain literals (xsd:string)
    "SELECT 's-bal' AS shape_id, 'urn:cust:' || c_custkey AS focus, "
    "'datatype' AS constraint, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS value, "
    "CAST(-1 AS BIGINT) AS observed FROM customer WHERE c_custkey % 3 = 0 "
    # sh:minInclusive — negative balances (lexical forms all castable)
    "UNION ALL SELECT 's-bal', 'urn:cust:' || c_custkey, 'minInclusive', "
    "CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR), -1 FROM customer WHERE c_acctbal < 0 "
    # sh:minLength/maxLength on NATION_ names (len 8 ok, 9 violates max)
    "UNION ALL SELECT 's-nname', 'urn:nation:' || n_nationkey, 'maxLength', "
    "n_name, CAST(length(n_name) AS BIGINT) FROM nation WHERE length(n_name) > 8 "
    "UNION ALL SELECT 's-nname', 'urn:nation:' || n_nationkey, 'minLength', "
    "n_name, CAST(length(n_name) AS BIGINT) FROM nation WHERE length(n_name) < 8 "
    # sh:nodeKind IRI — odd suppkeys emitted their homepage as a literal
    "UNION ALL SELECT 's-home', 'urn:supp:' || s_suppkey, 'nodeKind', "
    "'http://supp.example.org/' || s_suppkey, -1 FROM supplier "
    "WHERE s_suppkey % 2 = 1"
)


def _q_shacl_report_rdf(spark, sf_dir):
    """The violations of shacl_deep_constraints rendered AS RDF in the
    W3C SHACL validation-report vocabulary (shacl.py
    validation_report_triples): sh:ValidationReport header +
    sh:conforms false + one md5-keyed sh:ValidationResult node per
    violation with focusNode/sourceShape/sourceConstraintComponent/
    value. Oracle rebuilds every report triple (including the md5
    result-node IRIs) from the base tables."""
    from parser_rdf_spark.shacl import validation_report_triples

    viol = _shacl_deep_violations(spark, sf_dir)
    rep = validation_report_triples(viol)
    return rep.select(
        "subj", "pred", "obj_kind", "obj_value",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


_SHACL_REPORT_SQL = (
    "WITH viol(shape_id, focus, cname, value, observed) AS ("
    "SELECT 's-bal', 'urn:cust:' || c_custkey, 'datatype', "
    "CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR), CAST(NULL AS BIGINT) "
    "FROM customer WHERE c_custkey % 3 = 0 "
    "UNION ALL SELECT 's-bal', 'urn:cust:' || c_custkey, 'minInclusive', "
    "CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR), NULL "
    "FROM customer WHERE c_acctbal < 0 "
    "UNION ALL SELECT 's-nname', 'urn:nation:' || n_nationkey, 'maxLength', "
    "n_name, CAST(length(n_name) AS BIGINT) FROM nation WHERE length(n_name) > 8 "
    "UNION ALL SELECT 's-home', 'urn:supp:' || s_suppkey, 'nodeKind', "
    "'http://supp.example.org/' || s_suppkey, NULL "
    "FROM supplier WHERE s_suppkey % 2 = 1), "
    "r AS (SELECT *, 'urn:shacl:report/result/' || md5("
    "shape_id || chr(31) || focus || chr(31) || cname || chr(31) || "
    "COALESCE(value, '') || chr(31) || COALESCE(CAST(observed AS VARCHAR), '')"
    ") AS rid, "
    "'http://www.w3.org/ns/shacl#' || "
    "CASE cname WHEN 'datatype' THEN 'DatatypeConstraintComponent' "
    "WHEN 'minInclusive' THEN 'MinInclusiveConstraintComponent' "
    "WHEN 'maxLength' THEN 'MaxLengthConstraintComponent' "
    "WHEN 'nodeKind' THEN 'NodeKindConstraintComponent' END AS comp FROM viol) "
    "SELECT 'urn:shacl:report' AS subj, "
    "'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred, "
    "'iri' AS obj_kind, 'http://www.w3.org/ns/shacl#ValidationReport' AS obj_value, "
    "'' AS obj_datatype "
    "UNION ALL SELECT 'urn:shacl:report', 'http://www.w3.org/ns/shacl#conforms', "
    "'literal', 'false', 'http://www.w3.org/2001/XMLSchema#boolean' "
    "UNION ALL SELECT DISTINCT rid, "
    "'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'iri', "
    "'http://www.w3.org/ns/shacl#ValidationResult', '' FROM r "
    "UNION ALL SELECT DISTINCT 'urn:shacl:report', "
    "'http://www.w3.org/ns/shacl#result', 'iri', rid, '' FROM r "
    "UNION ALL SELECT DISTINCT rid, 'http://www.w3.org/ns/shacl#focusNode', "
    "'iri', focus, '' FROM r "
    "UNION ALL SELECT DISTINCT rid, 'http://www.w3.org/ns/shacl#sourceShape', "
    "'iri', shape_id, '' FROM r "
    "UNION ALL SELECT DISTINCT rid, "
    "'http://www.w3.org/ns/shacl#sourceConstraintComponent', 'iri', comp, '' FROM r "
    "UNION ALL SELECT DISTINCT rid, 'http://www.w3.org/ns/shacl#value', "
    "'literal', value, '' FROM r WHERE value IS NOT NULL"
)


def _q_sparql_results_formats(spark, sf_dir):
    """W3C SPARQL 1.1 result serialization (results.py): the
    sparql_select solutions rendered as CSV (spec-lossy lexical forms)
    AND TSV (full term syntax — <iri> brackets, quoted literals,
    unbound OPTIONAL → empty field) result lines. Map-only projections;
    the oracle rebuilds every line with SQL string concatenation over
    the same logical query."""
    from parser_rdf_spark.results import to_sparql_csv, to_sparql_tsv
    from parser_rdf_spark.sparql import sparql_query

    sols = sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?c ?nname ?hb WHERE {
          ?c rdf:type ex:Customer .
          ?c ex:inNation ?n .
          ?n ex:name ?nname .
          OPTIONAL { ?c ex:highBalance ?hb }
          FILTER (?nname IN ("NATION_2", "NATION_5"))
        }
    """)
    csv = to_sparql_csv(sols).select(F.lit("csv").alias("fmt"), "pos", "line")
    tsv = to_sparql_tsv(sols).select(F.lit("tsv").alias("fmt"), "pos", "line")
    return csv.unionByName(tsv)


_RESULTS_FORMATS_SQL = (
    "WITH sols AS ("
    "SELECT 'urn:cust:' || c_custkey AS c, n_name AS nname, "
    "CASE WHEN c_acctbal > 9000 THEN 'true' END AS hb "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey "
    "WHERE n_name IN ('NATION_2', 'NATION_5')) "
    # CSV: lexical forms, no quoting needed (values carry no [\",\r\n])
    "SELECT 'csv' AS fmt, 0 AS pos, 'c,nname,hb' AS line "
    "UNION ALL SELECT 'csv', 1, c || ',' || nname || ',' || COALESCE(hb, '') FROM sols "
    # TSV: term syntax — c is an IRI, nname a literal, hb a literal or empty
    "UNION ALL SELECT 'tsv', 0, '?c' || chr(9) || '?nname' || chr(9) || '?hb' "
    "UNION ALL SELECT 'tsv', 1, '<' || c || '>' || chr(9) || '\"' || nname || '\"' "
    "|| chr(9) || COALESCE('\"' || hb || '\"', '') FROM sols"
)


def _canon_nquads_oracle() -> str:
    return _canon_wl_ctes() + (
        ", rel AS (SELECT doc, b, "
        "'_:c' || CAST(ROW_NUMBER() OVER (PARTITION BY doc ORDER BY c, b) - 1 AS VARCHAR) AS canon "
        "FROM b2) "
        "SELECT colored.doc AS doc_url, "
        "CASE WHEN colored.s_bn THEN sm.canon "
        "ELSE '<' || colored.s || '>' END "
        "|| ' <' || colored.p || '> ' || "
        "CASE WHEN colored.o_bn THEN om.canon "
        "WHEN colored.okind = 'iri' THEN '<' || colored.o || '>' "
        "ELSE '\"' || colored.o || '\"' || "
        "CASE WHEN colored.olang <> '' THEN '@' || colored.olang "
        "WHEN colored.odt <> '' THEN '^^<' || colored.odt || '>' "
        "ELSE '' END END "
        "|| CASE WHEN colored.g <> '' THEN ' <' || colored.g || '>' ELSE '' END "
        "|| ' .' AS line "
        "FROM colored "
        "LEFT JOIN rel sm ON sm.doc = colored.doc AND sm.b = colored.s AND colored.s_bn "
        "LEFT JOIN rel om ON om.doc = colored.doc AND om.b = colored.o AND colored.o_bn"
    )


def _q_canonical_nquads_export(spark, sf_dir):
    """Canonical N-Quads (to_canonical_nquads): WL relabel + N-Quads
    rendering — the RDFC-1.0 deliverable shape; the isomorphic fixture
    pairs (d1/d2, d4/d5) emit IDENTICAL line sets so a downstream text
    hash dedups them. Oracle rebuilds every line (labels AND rendering)
    in SQL."""
    from parser_rdf_spark.canonical import to_canonical_nquads

    return to_canonical_nquads(_canon_triples(spark), rounds=2)


def _q_graph_canonical_dedup(spark, sf_dir):
    """Isomorphism-invariant canonical hash per document graph
    (canonical.py, WL color refinement, rounds=2): d1=d2 and d4=d5 hash
    identically under renamed bnodes; ground/named-graph differences
    (d3, d6) split. The oracle re-runs the full refinement in DuckDB —
    every color and hash independently recomputed, not pinned."""
    from parser_rdf_spark.canonical import canonical_graph_hash

    return canonical_graph_hash(_canon_triples(spark), rounds=2)


def _q_graph_canonical_labels(spark, sf_dir):
    """Canonical blank-node relabeling (_:c0, _:c1, ... by final WL
    color): the canonical serialization input. d1 and d2 emit identical
    triple sets after relabeling; the automorphic d4 pair gets distinct
    labels via the documented original-label tie-break."""
    from parser_rdf_spark.canonical import canonicalize_bnodes

    c = canonicalize_bnodes(_canon_triples(spark), rounds=2)
    return c.select("doc_url", "subj", "pred", "obj_kind", "obj_value")


_VOID_ORACLE_SQL = (
    "WITH t(subj, pred, obj) AS ("
    "SELECT 'urn:cust:' || c_custkey, 'rdf:type', 'ex:Customer' FROM customer "
    "UNION ALL SELECT 'urn:cust:' || c_custkey, 'ex:inNation', 'urn:nation:' || c_nationkey FROM customer "
    "UNION ALL SELECT 'urn:cust:' || c_custkey, 'ex:mktsegment', c_mktsegment FROM customer "
    "UNION ALL SELECT 'urn:cust:' || c_custkey, 'ex:highBalance', 'true' FROM customer WHERE c_acctbal > 9000 "
    "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'rdf:type', 'ex:Supplier' FROM supplier "
    "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'ex:inNation', 'urn:nation:' || s_nationkey FROM supplier "
    "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'rdf:type', 'ex:Nation' FROM nation "
    "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'ex:name', n_name FROM nation "
    "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'ex:inRegion', 'urn:region:' || n_regionkey FROM nation "
    "UNION ALL SELECT 'urn:region:' || r_regionkey, 'ex:name', r_name FROM region), "
    "agg AS (SELECT COUNT(*) AS n, COUNT(DISTINCT pred) AS np, "
    "COUNT(DISTINCT subj) AS ns, COUNT(DISTINCT obj) AS no, "
    "COUNT(DISTINCT CASE WHEN pred = 'rdf:type' THEN subj END) AS ne, "
    "COUNT(DISTINCT CASE WHEN pred = 'rdf:type' THEN obj END) AS nc FROM t) "
    "SELECT 'https://ds.example.org/kg' AS subj, "
    "'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred, "
    "'iri' AS obj_kind, 'http://rdfs.org/ns/void#Dataset' AS obj_value, "
    "'' AS obj_datatype "
    "UNION ALL SELECT 'https://ds.example.org/kg', 'http://rdfs.org/ns/void#triples', "
    "'literal', CAST(n AS VARCHAR), 'http://www.w3.org/2001/XMLSchema#integer' FROM agg "
    "UNION ALL SELECT 'https://ds.example.org/kg', 'http://rdfs.org/ns/void#properties', "
    "'literal', CAST(np AS VARCHAR), 'http://www.w3.org/2001/XMLSchema#integer' FROM agg "
    "UNION ALL SELECT 'https://ds.example.org/kg', 'http://rdfs.org/ns/void#distinctSubjects', "
    "'literal', CAST(ns AS VARCHAR), 'http://www.w3.org/2001/XMLSchema#integer' FROM agg "
    "UNION ALL SELECT 'https://ds.example.org/kg', 'http://rdfs.org/ns/void#distinctObjects', "
    "'literal', CAST(no AS VARCHAR), 'http://www.w3.org/2001/XMLSchema#integer' FROM agg "
    "UNION ALL SELECT 'https://ds.example.org/kg', 'http://rdfs.org/ns/void#entities', "
    "'literal', CAST(ne AS VARCHAR), 'http://www.w3.org/2001/XMLSchema#integer' FROM agg "
    "UNION ALL SELECT 'https://ds.example.org/kg', 'http://rdfs.org/ns/void#classes', "
    "'literal', CAST(nc AS VARCHAR), 'http://www.w3.org/2001/XMLSchema#integer' FROM agg "
    "UNION ALL SELECT 'https://ds.example.org/kg', 'http://rdfs.org/ns/void#propertyPartition', "
    "'iri', 'https://ds.example.org/kg/prop/' || md5(pred), '' FROM (SELECT DISTINCT pred FROM t) "
    "UNION ALL SELECT 'https://ds.example.org/kg/prop/' || md5(pred), "
    "'http://rdfs.org/ns/void#property', 'iri', pred, '' FROM (SELECT DISTINCT pred FROM t) "
    "UNION ALL SELECT 'https://ds.example.org/kg/prop/' || md5(pred), "
    "'http://rdfs.org/ns/void#triples', 'literal', CAST(COUNT(*) AS VARCHAR), "
    "'http://www.w3.org/2001/XMLSchema#integer' FROM t GROUP BY pred "
    "UNION ALL SELECT 'https://ds.example.org/kg', 'http://rdfs.org/ns/void#classPartition', "
    "'iri', 'https://ds.example.org/kg/class/' || md5(obj), '' "
    "FROM (SELECT DISTINCT obj FROM t WHERE pred = 'rdf:type') "
    "UNION ALL SELECT 'https://ds.example.org/kg/class/' || md5(obj), "
    "'http://rdfs.org/ns/void#class', 'iri', obj, '' "
    "FROM (SELECT DISTINCT obj FROM t WHERE pred = 'rdf:type') "
    "UNION ALL SELECT 'https://ds.example.org/kg/class/' || md5(obj), "
    "'http://rdfs.org/ns/void#entities', 'literal', "
    "CAST(COUNT(DISTINCT subj) AS VARCHAR), "
    "'http://www.w3.org/2001/XMLSchema#integer' "
    "FROM t WHERE pred = 'rdf:type' GROUP BY obj"
)


def _q_kg_random_walks(spark, sf_dir):
    """Deterministic random-walk corpus (DeepWalk preprocessing) over a
    customer→nation→region DAG with a segment side-branch: 2 walks of
    length 3 from every non-sink vertex, every step chosen by the
    engine-portable md5 hash — the oracle replays the identical walk
    arithmetic unrolled in SQL."""
    from parser_rdf_spark.graphops import random_walks

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") < 100
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string"))
    edges = (
        customer.select(cust.alias("src"),
                        F.concat(F.lit("urn:nation:"),
                                 F.col("c_nationkey").cast("string")).alias("dst"))
        .unionByName(customer.select(cust.alias("src"),
                                     F.col("c_mktsegment").alias("dst")))
        .unionByName(nation.select(
            F.concat(F.lit("urn:nation:"),
                     F.col("n_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("urn:region:"),
                     F.col("n_regionkey").cast("string")).alias("dst")))
    )
    return random_walks(edges, walk_length=3, num_walks=2)


def _walks_oracle_sql(walk_length: int = 3, num_walks: int = 2) -> str:
    md5i = ("(('0x' || substr(md5({x}), 1, 8))::UBIGINT)")
    base = (
        "SELECT DISTINCT 'urn:cust:' || c_custkey AS node, "
        "'urn:nation:' || c_nationkey AS nbr FROM customer WHERE c_custkey < 100 "
        "UNION SELECT DISTINCT 'urn:cust:' || c_custkey, c_mktsegment "
        "FROM customer WHERE c_custkey < 100 "
        "UNION SELECT DISTINCT 'urn:nation:' || n_nationkey, "
        "'urn:region:' || n_regionkey FROM nation"
    )
    ctes = [
        f"e AS MATERIALIZED ({base})",
        "adj AS MATERIALIZED (SELECT node, list(nbr ORDER BY nbr) AS nbrs "
        "FROM (SELECT node, nbr, row_number() OVER "
        "(PARTITION BY node ORDER BY md5(nbr)) AS rk FROM e) "
        "WHERE rk <= 10000 GROUP BY node)",
        "w0 AS MATERIALIZED (SELECT node || '#' || w AS walk_id, node AS start, "
        "node AS cur, [node] AS path FROM adj, "
        f"(SELECT unnest(range({num_walks})) AS w))",
    ]
    for i in range(1, walk_length + 1):
        h = md5i.format(x=f"w{i-1}.walk_id || ':{i}:' || w{i-1}.cur")
        ctes.append(
            f"w{i} AS MATERIALIZED (SELECT w{i-1}.walk_id, w{i-1}.start, "
            f"CASE WHEN adj.nbrs IS NULL THEN w{i-1}.cur "
            f"ELSE adj.nbrs[CAST(({h} % len(adj.nbrs)) + 1 AS INT)] END AS cur, "
            f"CASE WHEN adj.nbrs IS NULL THEN w{i-1}.path "
            f"ELSE list_append(w{i-1}.path, "
            f"adj.nbrs[CAST(({h} % len(adj.nbrs)) + 1 AS INT)]) END AS path "
            f"FROM w{i-1} LEFT JOIN adj ON w{i-1}.cur = adj.node)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT walk_id, start, array_to_string(path, '->') AS walk, "
          f"CAST(len(path) - 1 AS BIGINT) AS n_steps FROM w{walk_length}"
    )


def _q_sparql_describe_cbd(spark, sf_dir):
    """DESCRIBE as a Concise Bounded Description: blank-node objects are
    recursively included (a bnode has no dereferenceable identity of its
    own), IRI objects are not expanded. Driven over an inline bnode-tree
    KG; oracle = the hand-derived closure."""
    from parser_rdf_spark.sparql import sparql_query

    t = spark.createDataFrame([
        ("urn:thing", "ex:label", "top"),
        ("urn:thing", "ex:part", "_:p1"),
        ("_:p1", "ex:name", "inner"),
        ("_:p1", "ex:sub", "_:p2"),
        ("_:p2", "ex:name", "deep"),
        ("urn:thing", "ex:ref", "urn:other"),
        ("urn:other", "ex:label", "not-expanded"),
        ("urn:third", "ex:label", "unrelated"),
    ], "subj string, pred string, obj string")
    return sparql_query(t, "DESCRIBE <urn:thing>")


def _q_sparql_graph_mgmt(spark, sf_dir):
    """SPARQL 1.1 Update graph management over a quads relation:
    customers bucketed into three named graphs plus nations in the
    default graph, then MOVE / ADD / COPY / DROP chained — the oracle
    enumerates the surviving partitions as disjoint UNIONs."""
    from parser_rdf_spark.sparql import sparql_update_graphs

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") < 300
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    quads = customer.select(
        F.concat(F.lit("urn:g:"),
                 (F.col("c_custkey") % 3).cast("string")).alias("graph"),
        F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("ex:seg").alias("pred"),
        F.col("c_mktsegment").alias("obj"),
    ).unionByName(nation.select(
        F.lit("_:default").alias("graph"),
        F.concat(F.lit("urn:nation:"),
                 F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("ex:name").alias("pred"),
        F.col("n_name").alias("obj"),
    ))
    return sparql_update_graphs(quads, """
        MOVE <urn:g:1> TO <urn:g:2> ;
        ADD DEFAULT TO <urn:g:0> ;
        COPY DEFAULT TO <urn:g:1> ;
        DROP DEFAULT
    """)


def _q_kg_neighborhood_jaccard(spark, sf_dir):
    """Structural ER: Jaccard of undirected neighborhoods over a
    customer–nation–segment bipartite slice (custkey < 50) — co-neighbor
    blocked, integer basis-point similarity. Oracle: the same math as
    explicit SQL joins."""
    from parser_rdf_spark.graphops import neighborhood_jaccard

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") < 50
    )
    cust = F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string"))
    edges = customer.select(
        cust.alias("src"),
        F.concat(F.lit("urn:nation:"),
                 F.col("c_nationkey").cast("string")).alias("dst"),
    ).unionByName(customer.select(cust.alias("src"), F.col("c_mktsegment").alias("dst")))
    return neighborhood_jaccard(edges)


def _q_kg_kcore(spark, sf_dir):
    """2-core of a customer–nation–segment–region slice: customers
    below custkey 40 attach to their nation and segment, ALL nations
    attach to their region — so customer-less nations are pendants whose
    peeling cascades into the region layer, exercising the iterative
    fixpoint, not just one degree filter. Oracle: the same peeling
    unrolled as 12 CTE rounds (strictly more than the actual depth)."""
    from parser_rdf_spark.graphops import kcore

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") < 40
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string"))
    edges = (
        customer.select(
            cust.alias("src"),
            F.concat(F.lit("urn:nation:"),
                     F.col("c_nationkey").cast("string")).alias("dst"))
        .unionByName(customer.select(cust.alias("src"),
                                     F.col("c_mktsegment").alias("dst")))
        .unionByName(nation.select(
            F.concat(F.lit("urn:nation:"),
                     F.col("n_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("urn:region:"),
                     F.col("n_regionkey").cast("string")).alias("dst")))
    )
    return kcore(edges, 2)


def _kcore_oracle_sql(k: int = 2, rounds: int = 12) -> str:
    base = (
        "SELECT 'urn:cust:' || c_custkey AS node, "
        "'urn:nation:' || c_nationkey AS nbr FROM customer WHERE c_custkey < 40 "
        "UNION SELECT 'urn:nation:' || c_nationkey, 'urn:cust:' || c_custkey "
        "FROM customer WHERE c_custkey < 40 "
        "UNION SELECT 'urn:cust:' || c_custkey, c_mktsegment "
        "FROM customer WHERE c_custkey < 40 "
        "UNION SELECT c_mktsegment, 'urn:cust:' || c_custkey "
        "FROM customer WHERE c_custkey < 40 "
        "UNION SELECT 'urn:nation:' || n_nationkey, 'urn:region:' || n_regionkey "
        "FROM nation "
        "UNION SELECT 'urn:region:' || n_regionkey, 'urn:nation:' || n_nationkey "
        "FROM nation"
    )
    ctes = [f"adj0 AS MATERIALIZED ({base})"]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT node FROM (SELECT node, COUNT(*) AS c "
            f"FROM adj{p} GROUP BY node) WHERE c >= {k})"
        )
        ctes.append(
            f"adj{i} AS MATERIALIZED (SELECT adj{p}.node, adj{p}.nbr FROM adj{p} "
            f"JOIN k{i} x ON adj{p}.node = x.node "
            f"JOIN k{i} y ON adj{p}.nbr = y.node)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT node, CAST(COUNT(*) AS BIGINT) AS core_degree "
          f"FROM adj{rounds} GROUP BY node"
    )


def _q_owl_haskey_sameas(spark, sf_dir):
    """OWL 2 RL prp-key: ex:Customer keyed by (ex:email, ex:inNation).
    Customers k and k+100 share a synthetic mailbox; only those pairs
    that ALSO share a nation survive the full-key match. Oracle: the
    same compound self-join over the base table."""
    from parser_rdf_spark.inference import owl_haskey_sameas

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    emails = customer.filter(F.col("c_custkey") < 200).select(
        F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("ex:email").alias("pred"),
        F.concat(F.lit("urn:mail:"),
                 (F.col("c_custkey") % 100).cast("string")).alias("obj"),
    )
    keys = spark.createDataFrame(
        [("ex:Customer", "k1", "ex:email"), ("ex:Customer", "k1", "ex:inNation")],
        "cls string, key_id string, prop string",
    )
    kg = _tpch_triples(spark, sf_dir).unionByName(emails)
    return owl_haskey_sameas(kg, keys, vocab={"type": "rdf:type"}).select(
        "subj", "pred", "obj"
    )


def _q_owl_chain_entailment(spark, sf_dir):
    """OWL 2 RL prp-spo2 property chains: ex:basedInRegion declared as
    the chain (ex:inNation ∘ ex:inRegion) — every customer and supplier
    gains the region it transits through. Oracle: the two explicit
    2-hop joins over the base tables."""
    from parser_rdf_spark.inference import owl_chain_entailment

    chains = spark.createDataFrame(
        [("ex:basedInRegion", "c1", 0, "ex:inNation"),
         ("ex:basedInRegion", "c1", 1, "ex:inRegion")],
        "p string, chain_id string, pos int, step string",
    )
    return owl_chain_entailment(
        _tpch_triples(spark, sf_dir), chains=chains
    ).select("subj", "pred", "obj")


def _q_resolve_entities(spark, sf_dir):
    """Stage-3 one-call identity resolution: IFP mailbox collisions
    (custkey k ~ k+100) inferred, classes closed, every triple rewritten
    to the class minimum, sameAs consumed. Oracle: SQL rewrite through
    the group-minimum map."""
    from parser_rdf_spark.inference import resolve_entities

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") < 200
    )
    k = F.col("c_custkey")
    cust = F.concat(F.lit("urn:cust:"), k.cast("string"))
    kg = (
        customer.select(cust.alias("subj"), F.lit("ex:email").alias("pred"),
                        F.concat(F.lit("urn:mail:"),
                                 (k % 100).cast("string")).alias("obj"))
        .unionByName(customer.select(cust.alias("subj"),
                                     F.lit("ex:mktsegment").alias("pred"),
                                     F.col("c_mktsegment").alias("obj")))
        .unionByName(customer.select(cust.alias("subj"),
                                     F.lit("ex:inNation").alias("pred"),
                                     F.concat(F.lit("urn:nation:"),
                                              F.col("c_nationkey").cast("string")).alias("obj")))
        .unionByName(spark.createDataFrame(
            [("ex:email", "rdf:type",
              "http://www.w3.org/2002/07/owl#InverseFunctionalProperty")],
            "subj string, pred string, obj string"))
    )
    return resolve_entities(kg, vocab={"type": "rdf:type"})


def _q_turtle_serialize(spark, sf_dir):
    """Sink-side Turtle serialization: the quartet corpus rendered to
    prefix-compacted, subject-grouped Turtle blocks by the pure-Column
    serializer. Oracle: an INDEPENDENT pure-Python formatter over the
    golden quartet triples emitted as VALUES; the round-trip law
    turtle_parse(to_turtle(t)) == t is pinned separately in pytest."""
    from parser_rdf_spark.serialize import to_turtle_blocks

    return to_turtle_blocks(_quartet_triples(spark)).select(
        F.substring_index("doc_url", "/", -1).alias("doc"), "block"
    )


def _q_nquads_serialize(spark, sf_dir):
    """N-Quads round-circle: parse the canonical N-Quads fixture through
    the full pipeline, serialize it back with the pure-Column N-Quads
    renderer — on canonical input, parse∘serialize is the identity, so
    the oracle is simply the fixture's own lines."""
    from parser_rdf_spark.serialize import to_nquads

    pages = _fixture_pages(
        spark, {"https://fixtures.example.org/nq/doc1": _NQUADS_DOC}
    )
    return to_nquads(triples_of(parse_pages(pages))).select("line")


def _golden_values_nquads() -> str:
    lines = [ln for ln in _NQUADS_DOC.splitlines() if ln.strip()]
    rows = ", ".join(f"({_sql_quote(ln)})" for ln in lines)
    return f"SELECT * FROM (VALUES {rows}) AS t(line)"


_TRIG_DOC = """\
@prefix ex: <http://e/> .
ex:s2 ex:p "default graph" .
GRAPH <http://g/one> {
  ex:s1 ex:p ex:o1 ;
        ex:q "libellé"@fr .
  _:b ex:p 42
}
ex:g2 { ex:s3 ex:p "also named" . }
"""


def _q_trig_named_graphs(spark, sf_dir):
    """TriG parse (new engine surface — the reference scopes quads
    formats out, docs/spec-completeness.md:131): GRAPH blocks in all
    three label forms land per-statement named graphs in the triples
    relation. The '@prefix'-led doc sniffs as Turtle (reference-pinned
    D6) and reaches trig.py via the parse-stage retry (parse.py). Bnode
    subjects are descoped (P5 adds the doc hash) for a deterministic
    oracle."""
    pages = _fixture_pages(
        spark, {"https://fixtures.example.org/trig/doc1": _TRIG_DOC}
    )
    t = triples_of(parse_pages(pages))
    descope = lambda c: F.regexp_replace(c, r"^_:(d[0-9a-f]+-)+", "_:")  # noqa: E731
    return t.select(
        F.col("graph"),
        descope(F.col("subj")).alias("subj"),
        "pred", "obj_kind", "obj_value",
        F.coalesce("obj_lang", F.lit("")).alias("obj_lang"),
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


def _golden_values_trig() -> str:
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    rows = [
        ("_:default", "http://e/s2", "http://e/p", "literal", "default graph", "", ""),
        ("http://g/one", "http://e/s1", "http://e/p", "iri", "http://e/o1", "", ""),
        ("http://g/one", "http://e/s1", "http://e/q", "literal", "libellé", "fr", ""),
        ("http://g/one", "_:b", "http://e/p", "literal", "42", "", xsd_int),
        ("http://e/g2", "http://e/s3", "http://e/p", "literal", "also named", "", ""),
    ]
    vals = ", ".join("(" + ", ".join(_sql_quote(c) for c in r) + ")" for r in rows)
    return (
        f"SELECT * FROM (VALUES {vals}) AS "
        "t(graph, subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)"
    )


def _q_trig_serialize_roundtrip(spark, sf_dir):
    """TriG round-circle IN the driver gate: the N-Quads fixture's quads
    serialized to TriG documents by the pure-Column writer
    (serialize.py to_trig_docs), fed back through the FULL Spark parse
    pipeline (fmt=trig), compared as quads — parse∘serialize = id, so
    the oracle is the same VALUES relation as nquads_named_graphs."""
    from parser_rdf_spark.serialize import to_trig_docs

    pages = _fixture_pages(
        spark, {"https://fixtures.example.org/nq/doc1": _NQUADS_DOC}
    )
    docs = to_trig_docs(triples_of(parse_pages(pages)))
    pages2 = docs.select(
        F.col("doc_url").alias("url"),
        F.lit("2026-01-01T00:00:00Z").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("trig").alias("text"),
        F.lit("en").alias("lang"),
    )
    t2 = triples_of(parse_pages(pages2, fmt="trig"))
    return t2.select(
        F.coalesce("graph", F.lit("_:default")).alias("graph"),
        "subj", "pred", "obj_kind", "obj_value",
    )


def _q_jsonld_serialize_roundtrip(spark, sf_dir):
    """JSON-LD round-circle IN the driver gate: the quartet's triples
    serialized to flattened JSON-LD by the pure-Column writer, fed back
    through the FULL Spark parse pipeline (fmt=json-ld), and compared
    as triples against the golden quartet — i.e. parse∘serialize = id.
    Bnode labels are normalized modulo P5 doc-scope layers (the re-parse
    legitimately adds one)."""
    from parser_rdf_spark.serialize import to_jsonld_docs

    docs = to_jsonld_docs(_quartet_triples(spark))
    pages2 = docs.select(
        F.col("doc_url").alias("url"),
        F.lit("2026-01-01T00:00:00Z").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("jsonld").alias("text"),
        F.lit("en").alias("lang"),
    )
    t2 = triples_of(parse_pages(pages2, fmt="json-ld"))
    descope = lambda c: F.regexp_replace(c, r"^_:(d[0-9a-f]+-)+", "_:")  # noqa: E731
    return t2.select(
        F.substring_index("doc_url", "/", -1).alias("doc"),
        descope(F.col("subj")).alias("subj"),
        F.col("pred"),
        F.col("obj_kind"),
        F.when(F.col("obj_kind") == "bnode", descope(F.col("obj_value")))
         .otherwise(F.col("obj_value")).alias("obj_value"),
        F.coalesce("obj_lang", F.lit("")).alias("obj_lang"),
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


def _q_rdfxml_serialize_roundtrip(spark, sf_dir):
    """RDF/XML round-circle IN the driver gate: quartet triples
    serialized (bnodes skolemized to urn:bnode: IRIs — the rdf:nodeID-
    free subset cannot carry labels), fed back through the FULL parse
    pipeline (fmt=rdf/xml), compared against the skolem-mapped golden
    quartet."""
    from parser_rdf_spark.serialize import to_rdfxml_docs

    docs = to_rdfxml_docs(_quartet_triples(spark), on_bnode="skolemize")
    pages2 = docs.select(
        F.col("doc_url").alias("url"),
        F.lit("2026-01-01T00:00:00Z").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("rdfxml").alias("text"),
        F.lit("en").alias("lang"),
    )
    t2 = triples_of(parse_pages(pages2, fmt="rdf/xml"))
    return t2.select(
        F.substring_index("doc_url", "/", -1).alias("doc"),
        "subj", "pred", "obj_kind", "obj_value",
        F.coalesce("obj_lang", F.lit("")).alias("obj_lang"),
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


def _golden_values_quartet_skolemized() -> str:
    def skolem(term: str) -> str:
        return "urn:bnode:" + term[2:] if term.startswith("_:") else term

    rows = [
        f"({_sql_quote(doc)}, {_sql_quote(skolem(t.subj))}, {_sql_quote(t.pred)}, "
        f"{_sql_quote('iri' if t.obj_kind == 'bnode' else t.obj_kind)}, "
        f"{_sql_quote(skolem(t.obj_value) if t.obj_kind == 'bnode' else t.obj_value)}, "
        f"{_sql_quote(t.obj_lang or '')}, {_sql_quote(t.obj_datatype or '')})"
        for doc, t in _golden_quartet_rows()
    ]
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows)
        + ") AS t(doc, subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)"
    )


def _golden_values_quartet_descoped() -> str:
    import re as _re

    def descope(term: str) -> str:
        return _re.sub(r"^_:(?:d[0-9a-f]+-)+", "_:", term)

    rows = [
        f"({_sql_quote(doc)}, {_sql_quote(descope(t.subj))}, {_sql_quote(t.pred)}, "
        f"{_sql_quote(t.obj_kind)}, "
        f"{_sql_quote(descope(t.obj_value) if t.obj_kind == 'bnode' else t.obj_value)}, "
        f"{_sql_quote(t.obj_lang or '')}, {_sql_quote(t.obj_datatype or '')})"
        for doc, t in _golden_quartet_rows()
    ]
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows)
        + ") AS t(doc, subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)"
    )


def _golden_values_turtle() -> str:
    """Independent Turtle block formatter (shares no code with
    serialize.py): same prefix table, grouping mirrored by explicitly
    sorting on (line_no, rendered-term) the way Spark's struct sort
    breaks ties."""
    import re as _re

    PREF = {
        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
        "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
        "owl": "http://www.w3.org/2002/07/owl#",
        "xsd": "http://www.w3.org/2001/XMLSchema#",
        "sh": "http://www.w3.org/ns/shacl#",
        "foaf": "http://xmlns.com/foaf/0.1/",
        "dcterms": "http://purl.org/dc/terms/",
        "schema": "https://schema.org/",
    }
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

    def compact(iri: str) -> str:
        for pfx, ns in sorted(PREF.items(), key=lambda kv: -len(kv[1])):
            local = iri[len(ns):]
            if iri.startswith(ns) and _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_-]*", local):
                return f"{pfx}:{local}"
        return f"<{iri}>"

    def esc(v: str) -> str:
        return (v.replace("\\", "\\\\").replace('"', '\\"')
                .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))

    def obj(t) -> str:
        if t.obj_kind == "iri":
            return compact(t.obj_value)
        if t.obj_kind == "bnode":
            return t.obj_value
        o = f'"{esc(t.obj_value)}"'
        if t.obj_lang:
            o += f"@{t.obj_lang}"
        elif t.obj_datatype:
            o += f"^^{compact(t.obj_datatype)}"
        return o

    groups: dict = {}
    for doc, t in _golden_quartet_rows():
        groups.setdefault((doc, t.subj), {}).setdefault(t.pred, []).append(
            (t.line_no or 0, obj(t)))
    blocks = []
    for (doc, subj), preds in groups.items():
        rendered = []
        for pred, objs in preds.items():
            objs.sort()  # (line_no, rendered) — same tie-break as struct sort
            pv = "a" if pred == RDF_TYPE else compact(pred)
            rendered.append((min(ln for ln, _ in objs), pv,
                             ", ".join(o for _, o in objs)))
        rendered.sort()
        s = subj if subj.startswith("_:") else compact(subj)
        body = " ;\n    ".join(f"{pv} {ov}" for _, pv, ov in rendered)
        blocks.append((doc, f"{s} {body} ."))
    rows = [f"({_sql_quote(doc)}, {_sql_quote(b)})" for doc, b in blocks]
    return "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(doc, block)"


def _q_owl_sameas(spark, sf_dir):
    """owl:sameAs canonicalization over the TPC-H KG: every nation IRI
    gains a 2-link alias chain (urn:nation:k ~ urn:nat:k ~ urn:n:k), the
    engine clusters the chains with the CC routine and rewrites every
    subject/object to the lexicographic minimum (urn:n:k) — the oracle
    rewrites the triple-ization analytically."""
    from parser_rdf_spark.inference import OWL_SAMEAS, sameas_canonicalize

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    def alias_edges(src_prefix, dst_prefix):
        k = F.col("n_nationkey").cast("string")
        return nation.select(
            F.concat(F.lit(src_prefix), k).alias("subj"),
            F.lit(OWL_SAMEAS).alias("pred"),
            F.concat(F.lit(dst_prefix), k).alias("obj"),
        )

    kg = (
        _tpch_triples(spark, sf_dir)
        .unionByName(alias_edges("urn:nation:", "urn:nat:"))
        .unionByName(alias_edges("urn:nat:", "urn:n:"))
    )
    return sameas_canonicalize(kg)


def _q_owl_inference(spark, sf_dir):
    """OWL property-axiom materialization over the TPC-H KG:
    owl:inverseOf (inNation ⇒ nation hasResident cust/supp),
    owl:SymmetricProperty (a synthetic region adjacency chain gains its
    reverse edges), and owl:TransitiveProperty (cust within nation
    within region closes to cust within region — the instance-level
    path-doubling loop). Oracle enumerates the consequence set from the
    base tables."""
    from parser_rdf_spark.inference import owl_property_entailment

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    axioms = spark.createDataFrame(
        [
            ("ex:inNation", "owl:inverseOf", "ex:hasResident"),
            ("ex:within", "rdf:type", "owl:TransitiveProperty"),
            ("ex:adjacentTo", "rdf:type", "owl:SymmetricProperty"),
        ],
        "subj string, pred string, obj string",
    )
    within = customer.select(
        F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("ex:within").alias("pred"),
        F.concat(F.lit("urn:nation:"), F.col("c_nationkey").cast("string")).alias("obj"),
    ).unionByName(nation.select(
        F.concat(F.lit("urn:nation:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("ex:within").alias("pred"),
        F.concat(F.lit("urn:region:"), F.col("n_regionkey").cast("string")).alias("obj"),
    ))
    adjacent = region.filter(F.col("r_regionkey") < 4).select(
        F.concat(F.lit("urn:region:"), F.col("r_regionkey").cast("string")).alias("subj"),
        F.lit("ex:adjacentTo").alias("pred"),
        F.concat(F.lit("urn:region:"), (F.col("r_regionkey") + 1).cast("string")).alias("obj"),
    )
    kg = (
        _tpch_triples(spark, sf_dir)
        .unionByName(axioms).unionByName(within).unionByName(adjacent)
    )
    return owl_property_entailment(
        kg,
        vocab={"type": "rdf:type", "inverse": "owl:inverseOf",
               "symmetric": "owl:SymmetricProperty",
               "transitive": "owl:TransitiveProperty"},
    )


def _q_shacl_validation(spark, sf_dir):
    """SHACL-core validation of the TPC-H KG against 6 shapes covering
    every constraint kind: minCount (customers lacking highBalance,
    observed 0), maxCount (suppliers banned from inNation, observed 1),
    sh:class (mktsegment literals are not typed ex:Segment — and the
    conforming s-cust-nation shape proves typed values pass), pattern
    (nation names outside ^NATION_1[0-9]$), and sh:in (region name
    outside the 4-name enumeration). Oracle enumerates the violation
    set per shape from the base tables."""
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )

    from parser_rdf_spark.shacl import shacl_validate

    shape_schema = StructType([
        StructField("shape_id", StringType()),
        StructField("target_class", StringType()),
        StructField("path", StringType()),
        StructField("min_count", IntegerType()),
        StructField("max_count", IntegerType()),
        StructField("node_class", StringType()),
        StructField("pattern", StringType()),
        StructField("value_in", ArrayType(StringType())),
    ])
    shapes = spark.createDataFrame(
        [
            ("s-cust-nation", "ex:Customer", "ex:inNation", 1, 1, "ex:Nation", None, None),
            ("s-cust-high", "ex:Customer", "ex:highBalance", 1, None, None, None, None),
            ("s-supp-ban", "ex:Supplier", "ex:inNation", None, 0, None, None, None),
            ("s-nation-name", "ex:Nation", "ex:name", None, None, None,
             "^NATION_1[0-9]$", None),
            ("s-cust-seg", "ex:Customer", "ex:mktsegment", None, None,
             "ex:Segment", None, None),
            ("s-region-name", "ex:Region", "ex:name", None, None, None, None,
             ["AFRICA", "AMERICA", "ASIA", "EUROPE"]),
        ],
        shape_schema,
    )
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    region_types = region.select(
        F.concat(F.lit("urn:region:"), F.col("r_regionkey").cast("string")).alias("subj"),
        F.lit("rdf:type").alias("pred"),
        F.lit("ex:Region").alias("obj"),
    )
    kg = _tpch_triples(spark, sf_dir).unionByName(region_types)
    return shacl_validate(kg, shapes, type_pred="rdf:type")


def _q_stream_incremental_cc(spark, sf_dir):
    """Continuous component maintenance end-to-end: the event graph's
    edges arrive as TWO streamed batches (separate availableNow drains
    against one checkpoint — the second drain resumes and sees only the
    new file); each batch is merged by quotient-graph incremental CC
    and committed as a snapshot. The final snapshot must equal
    from-scratch CC over ALL edges (same recursive-CTE oracle as
    kg_incremental_cc)."""
    import shutil
    import tempfile

    from parser_rdf_spark.snapshots import SnapshotTable
    from parser_rdf_spark.streaming import component_maintenance

    base = tempfile.mkdtemp(prefix="stream_cc")
    try:
        edges_dir = f"{base}/edges"
        g = _event_graph(spark, sf_dir)
        is_delta = (F.col("src") * 31 + F.col("dst")) % 4 == 0
        for batch in (g.filter(~is_delta), g.filter(is_delta)):
            batch.coalesce(1).write.mode("append").parquet(edges_dir)
            stream = spark.readStream.schema("src bigint, dst bigint").parquet(edges_dir)
            q = component_maintenance(stream, f"{base}/labels", f"{base}/ckpt")
            assert q.awaitTermination(240), "availableNow drain did not finish"
        table = SnapshotTable(f"{base}/labels")
        assert len(table.history()) == 2, "expected one snapshot per batch"
        rows = table.read(spark).select(
            F.col("vertex").cast("bigint").alias("vertex"),
            F.col("component").cast("bigint").alias("component"),
        ).collect()  # materialize before the tempdir vanishes
        return spark.createDataFrame(rows, "vertex bigint, component bigint")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _q_stream_canonical_dedup(spark, sf_dir):
    """Streaming graph-level dedup end-to-end: Turtle pages arrive as
    TWO streamed batches (separate availableNow drains, one
    checkpoint); batch 2 re-crawls batch 1's graph under fresh _:genid
    labels. The committed registry maps every doc to its canonical
    representative (min doc_url per isomorphism class) — the re-crawl
    must land on the batch-1 doc. Oracle: the expected mapping (the
    graphs are fixed fixtures; hashes are internal, the MAPPING is the
    contract)."""
    import shutil
    import tempfile

    from parser_rdf_spark.snapshots import SnapshotTable
    from parser_rdf_spark.streaming import canonical_dedup_maintenance

    ttl = (
        '@prefix ex: <http://e/> .\n'
        'ex:x ex:knows _:{a} .\n'
        '_:{a} ex:name "Ann" ; ex:friend _:{b} .\n'
        '_:{b} ex:name "{bob}" .'
    )
    batches = [
        {"https://stream.example.org/p1": ttl.format(a="a", b="b", bob="Bob")},
        {
            "https://stream.example.org/p2":
                ttl.format(a="genid1", b="genid2", bob="Bob"),
            "https://stream.example.org/p3":
                ttl.format(a="a", b="b", bob="Carol"),
        },
    ]
    base = tempfile.mkdtemp(prefix="stream_canon")
    try:
        from parser_rdf_spark.schemas import PAGES

        for docs in batches:
            _fixture_pages(spark, docs).coalesce(1).write.mode("append") \
                .parquet(f"{base}/pages")
            stream = spark.readStream.schema(PAGES).parquet(f"{base}/pages")
            q = canonical_dedup_maintenance(
                stream, f"{base}/registry", f"{base}/ckpt")
            assert q.awaitTermination(240), "availableNow drain did not finish"
        reg = SnapshotTable(f"{base}/registry").read(spark)
        from pyspark.sql import Window

        w = Window.partitionBy("graph_hash")
        rows = (
            reg.withColumn("canonical_doc", F.min("doc_url").over(w))
            .withColumn("group_size", F.count(F.lit(1)).over(w))
            .select("doc_url", "canonical_doc", "group_size")
            .collect()
        )
        return spark.createDataFrame(
            rows, "doc_url string, canonical_doc string, group_size bigint")
    finally:
        shutil.rmtree(base, ignore_errors=True)


_STREAM_CANON_SQL = (
    "SELECT * FROM (VALUES "
    "('https://stream.example.org/p1', 'https://stream.example.org/p1', CAST(2 AS BIGINT)), "
    "('https://stream.example.org/p2', 'https://stream.example.org/p1', 2), "
    "('https://stream.example.org/p3', 'https://stream.example.org/p3', 1)"
    ") AS t(doc_url, canonical_doc, group_size)"
)


def _q_bgp_path_query(spark, sf_dir):
    """Property paths: a 3-hop SEQUENCE path (inNation/inRegion/name)
    desugared to a join chain, anchored by an INVERSE-predicate pattern
    (^ex:mktsegment) — region name for every AUTOMOBILE customer."""
    from parser_rdf_spark.bgp import bgp_query, seq_path

    return bgp_query(
        _tpch_triples(spark, sf_dir),
        patterns=[("AUTOMOBILE", "^ex:mktsegment", "?c")]
        + seq_path("?c", ["ex:inNation", "ex:inRegion", "ex:name"], "?rname"),
        select=["?c", "?rname"],
    )


def _q_bgp_construct_rewrite(spark, sf_dir):
    """CONSTRUCT: materialize the inferred ex:inRegion shortcut edge and
    its ex:hasMember inverse for every entity (customers AND suppliers)
    with an inNation→inRegion chain — the KG-to-KG rewrite primitive."""
    from parser_rdf_spark.bgp import bgp_construct

    return bgp_construct(
        _tpch_triples(spark, sf_dir),
        patterns=[("?c", "ex:inNation", "?n"), ("?n", "ex:inRegion", "?r")],
        template=[("?c", "ex:inRegion", "?r"), ("?r", "ex:hasMember", "?c")],
    )


def _q_bgp_union_query(spark, sf_dir):
    """SPARQL UNION: customers (with their market segment) unioned with
    suppliers — branches bind different variable sets, so the supplier
    branch's ?seg is NULL-filled, per union semantics. Multiset union:
    zero extra shuffles beyond each branch's own joins."""
    from parser_rdf_spark.bgp import bgp_union

    return bgp_union(
        _tpch_triples(spark, sf_dir),
        [
            {"patterns": [("?m", "rdf:type", "ex:Customer"),
                          ("?m", "ex:mktsegment", "?seg")]},
            {"patterns": [("?m", "rdf:type", "ex:Supplier")]},
        ],
        select=["?m", "?seg"],
    )


def _q_bgp_not_exists(spark, sf_dir):
    """SPARQL FILTER NOT EXISTS compiled to a left-anti join: nations
    with no high-balance customer. The negation group is itself a
    2-pattern join, so this exercises group compilation + anti-join."""
    from parser_rdf_spark.bgp import bgp_query

    return bgp_query(
        _tpch_triples(spark, sf_dir),
        patterns=[("?n", "rdf:type", "ex:Nation"), ("?n", "ex:name", "?nname")],
        not_exists=[[("?c", "ex:inNation", "?n"),
                     ("?c", "ex:highBalance", "true"),
                     ("?c", "ex:mktsegment", "AUTOMOBILE")]],
        select=["?nname"],
    )


def _q_bgp_aggregate(spark, sf_dir):
    """SPARQL VALUES + GROUP BY + HAVING in one compiled query: distinct
    customer count per (nation name, segment) for two inline segments,
    keeping groups of ≥2. One hash aggregate; map-side partials are
    Catalyst-automatic."""
    from parser_rdf_spark.bgp import bgp_query

    return bgp_query(
        _tpch_triples(spark, sf_dir),
        patterns=[("?c", "rdf:type", "ex:Customer"),
                  ("?c", "ex:inNation", "?n"),
                  ("?n", "ex:name", "?nname"),
                  ("?c", "ex:mktsegment", "?seg")],
        values=(["?seg"], [("AUTOMOBILE",), ("BUILDING",)]),
        group_by=["?nname", "?seg"],
        aggregates={"n_cust": "count(DISTINCT c)"},
        having=["n_cust >= 2"],
    )


def _q_bgp_bind_query(spark, sf_dir):
    """SPARQL BIND: derive a numeric id and a normalized host label from
    bound variables (pure Column expressions — BIND never leaves the
    JVM), then FILTER on the derived column."""
    from parser_rdf_spark.bgp import bgp_query

    return bgp_query(
        _tpch_triples(spark, sf_dir),
        patterns=[("?c", "rdf:type", "ex:Customer"),
                  ("?c", "ex:inNation", "?n"),
                  ("?n", "ex:name", "?nname")],
        bind={"?cid": "cast(substring(c, 10) as bigint)",
              "?host": "lower(replace(nname, '_', '-'))"},
        filters=["cid % 10 = 0"],
        select=["?cid", "?host"],
    )


def _q_bgp_kleene_path(spark, sf_dir):
    """SPARQL transitive path (p+): every ancestor of every customer
    through a 3-level ex:partOf hierarchy (customer → nation → region →
    world), the closure computed by iterative path doubling with
    checkpointing over the partOf edge subset only."""
    from parser_rdf_spark.bgp import bgp_query

    t = _tpch_triples(spark, sf_dir)
    part_of = t.filter(F.col("pred").isin("ex:inNation", "ex:inRegion")).select(
        "subj", F.lit("ex:partOf").alias("pred"), "obj"
    )
    region_up = (
        t.filter(F.col("pred") == "ex:inRegion")
        .select(F.col("obj").alias("subj"))
        .distinct()
        .select("subj", F.lit("ex:partOf").alias("pred"),
                F.lit("urn:world:0").alias("obj"))
    )
    kg = t.unionByName(part_of).unionByName(region_up)
    return bgp_query(
        kg,
        patterns=[("?c", "rdf:type", "ex:Customer"), ("?c", "ex:partOf+", "?anc")],
        select=["?c", "?anc"],
    )


# ---------------------------------------------------------------------------
# SPARQL text front-end (sparql.py): real SPARQL 1.1 query STRINGS parsed
# into the bgp compiler — the surface a user of the constructed KG
# actually types. The oracles still answer over the BASE tables with
# direct joins, so parser + compiler + oracle share no formulation.
# ---------------------------------------------------------------------------

def _q_sparql_select(spark, sf_dir):
    """OPTIONAL group + FILTER IN, straight from query text."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?c ?nname ?hb WHERE {
          ?c rdf:type ex:Customer .
          ?c ex:inNation ?n .
          ?n ex:name ?nname .
          OPTIONAL { ?c ex:highBalance ?hb }
          FILTER (?nname IN ("NATION_2", "NATION_5"))
        }
    """)


def _q_sparql_path_agg(spark, sf_dir):
    """Sequence property path + GROUP BY aggregate from query text:
    customers per region through inNation/inRegion."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?rname (COUNT(?c) AS ?n_cust) WHERE {
          ?c rdf:type ex:Customer .
          ?c ex:inNation/ex:inRegion ?r .
          ?r ex:name ?rname .
        } GROUP BY ?rname
    """)


def _q_sparql_ask(spark, sf_dir):
    """ASK: any high-balance AUTOMOBILE customer? (limit-1 existence
    probe — the scan stops at the first solution)."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        ASK { ?c ex:mktsegment "AUTOMOBILE" . ?c ex:highBalance "true" }
    """)


def _q_sparql_construct(spark, sf_dir):
    """CONSTRUCT rewrite from query text: supplier→region shortcut edges
    in both directions."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        CONSTRUCT { ?s ex:locatedIn ?r . ?r ex:hosts ?s } WHERE {
          ?s rdf:type ex:Supplier .
          ?s ex:inNation ?n .
          ?n ex:inRegion ?r .
        }
    """)


def _q_sparql_union(spark, sf_dir):
    """UNION of two typed branches with a STRSTARTS filter in each."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?e ?nname WHERE {
          { ?e rdf:type ex:Customer . ?e ex:inNation ?n . ?n ex:name ?nname .
            FILTER (STRSTARTS(?nname, "NATION_1")) }
          UNION
          { ?e rdf:type ex:Supplier . ?e ex:inNation ?n . ?n ex:name ?nname .
            FILTER (STRSTARTS(?nname, "NATION_1")) }
        }
    """)


def _q_sparql_union_join_group(spark, sf_dir):
    """UNION mixed with sibling patterns in one group (spec §18.2 Join
    over the union's solution relation — round-5 general group executor):
    the shared inNation/name patterns join the union of high-balance
    customers and suppliers, and the group FILTER references a variable
    bound by the sibling patterns."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?e ?nname WHERE {
          ?e ex:inNation ?n .
          ?n ex:name ?nname .
          { ?e rdf:type ex:Customer . ?e ex:highBalance "true" }
          UNION { ?e rdf:type ex:Supplier }
          FILTER (STRSTARTS(?nname, "NATION_1"))
        }
    """)


def _q_sparql_optional_filter_groups(spark, sf_dir):
    """General OPTIONAL/NOT EXISTS bodies (round 5): the OPTIONAL's
    inner FILTER references an OUTER variable, so it compiles to the
    left-join CONDITION (LeftJoin(Ω1, Ω2, expr), spec §18.2.1) — only
    AUTOMOBILE customers keep their highBalance binding, everyone else
    gets NULL even when high-balance; the correlated NOT EXISTS prunes
    nation-0 customers via its inner filter (spec §8.1.1)."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?c ?seg ?hb WHERE {
          ?c rdf:type ex:Customer .
          ?c ex:mktsegment ?seg .
          OPTIONAL { ?c ex:highBalance ?hb FILTER(?seg = "AUTOMOBILE") }
          FILTER NOT EXISTS { ?c ex:inNation ?n FILTER(?n = "urn:nation:0") }
        }
    """)


def _q_sparql_negated_minus(spark, sf_dir):
    """Negated property set + MINUS from query text: every non-type,
    non-inNation assertion about nations, minus their inRegion edges —
    leaving exactly the name literals."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?s ?o WHERE {
          ?s rdf:type ex:Nation .
          ?s !(ex:inNation|rdf:type) ?o .
          MINUS { ?s ex:inRegion ?o }
        }
    """)


def _q_sparql_graph(spark, sf_dir):
    """SPARQL GRAPH over a quads relation: customer/supplier assertions
    live in per-source named graphs, nation/region assertions in the
    default graph — the query joins a variable-graph pattern (named
    graphs only, per the dataset model) with a default-graph pattern."""
    from parser_rdf_spark.sparql import sparql_query

    t = _tpch_triples(spark, sf_dir)
    quads = t.select(
        F.when(F.col("subj").startswith("urn:cust:"), "urn:g:cust")
        .when(F.col("subj").startswith("urn:supp:"), "urn:g:supp")
        .otherwise("_:default").alias("graph"),
        "subj", "pred", "obj",
    )
    return sparql_query(quads, """
        SELECT ?g ?e ?n WHERE {
          GRAPH ?g { ?e ex:inNation ?n }
          ?n ex:name ?nname .
          FILTER (STRSTARTS(?nname, "NATION_2"))
        }
    """)


def _q_sparql_graph_kleene(spark, sf_dir):
    """Kleene path INSIDE a variable GRAPH (round 5): the ex:within
    hierarchy (customer→nation→region) lives in urn:g:geo; a decoy
    region→universe edge lives in urn:g:decoy. SPARQL paths close
    WITHIN each graph, so the closure must NOT produce cust→universe
    or nation→universe pairs — the oracle enumerates exactly the
    per-graph reachability, so any cross-graph leak hash-mismatches."""
    from parser_rdf_spark.sparql import sparql_query

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")

    def iri(prefix, col):
        return F.concat(F.lit(f"urn:{prefix}:"), F.col(col).cast("string"))

    def q(df, g, s, o):
        return df.select(F.lit(g).alias("graph"), s.alias("subj"),
                         F.lit("ex:within").alias("pred"), o.alias("obj"))

    quads = (
        q(customer, "urn:g:geo", iri("cust", "c_custkey"),
          iri("nation", "c_nationkey"))
        .unionByName(q(nation, "urn:g:geo", iri("nation", "n_nationkey"),
                       iri("region", "n_regionkey")))
        .unionByName(q(region, "urn:g:decoy", iri("region", "r_regionkey"),
                       iri("univ", "r_regionkey")))
    )
    return sparql_query(quads, """
        SELECT ?g ?a ?b WHERE { GRAPH ?g { ?a ex:within+ ?b } }
    """)


def _q_sparql_path_alternation(spark, sf_dir):
    """General path alternation (round 5): a sequence member beside a
    plain member — customers reach their region via
    inNation/inRegion, nations via inRegion — one union of the two
    pair relations (set semantics per the engine's distinct closure
    discipline)."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?e ?r WHERE { ?e (ex:inNation/ex:inRegion)|ex:inRegion ?r }
    """)


def _q_sparql_service_join(spark, sf_dir):
    """SERVICE over a registered relation (round 5 — the Spark-first
    take on federation: an endpoint is just another DataFrame): the
    main group runs over the triple-ized KG, the SERVICE body over a
    separately-derived 'credit bureau' relation, and the two
    natural-join on ?c."""
    from parser_rdf_spark.sparql import sparql_query

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    remote = customer.select(
        F.concat(F.lit("urn:cust:"),
                 F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("ex:rating").alias("pred"),
        F.when(F.col("c_acctbal") > 5000, "prime")
        .otherwise("standard").alias("obj"))
    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?c ?nname ?rating WHERE {
          ?c rdf:type ex:Customer .
          ?c ex:inNation ?n .
          ?n ex:name ?nname .
          SERVICE <urn:bureau> { ?c ex:rating ?rating }
          FILTER(STRSTARTS(?nname, "NATION_3"))
        }
    """, services={"urn:bureau": remote})


def _q_sparql_describe(spark, sf_dir):
    """DESCRIBE every nation: all triples whose subject matches the
    WHERE solutions — one semi-join against the resource set."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        DESCRIBE ?n WHERE { ?n rdf:type ex:Nation }
    """)


def _q_sparql_exists_filter(spark, sf_dir):
    """Positive FILTER EXISTS: nations with at least one high-balance
    customer — a left-semi join on the shared variable, so the outer
    cardinality never inflates however many customers match."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?n ?nname WHERE {
          ?n rdf:type ex:Nation .
          ?n ex:name ?nname .
          FILTER EXISTS { ?c ex:inNation ?n . ?c ex:highBalance "true" }
        }
    """)


def _q_sparql_agg_union(spark, sf_dir):
    """GROUP BY aggregate over a UNION (entities per nation across both
    typed branches) with ORDER BY + OFFSET + LIMIT pagination — the union
    is plan-level concatenation, the aggregate one hash agg on top, the
    page a global sort only over the ~25 aggregated rows."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?nname (COUNT(?e) AS ?n_ent) WHERE {
          { ?e rdf:type ex:Customer . ?e ex:inNation ?n . ?n ex:name ?nname }
          UNION
          { ?e rdf:type ex:Supplier . ?e ex:inNation ?n . ?n ex:name ?nname }
        } GROUP BY ?nname ORDER BY ?nname LIMIT 5 OFFSET 2
    """)


def _q_sparql_subselect(spark, sf_dir):
    """Sub-SELECT: the per-nation customer count computed in an inner
    aggregate, natural-joined to the outer name pattern on ?n, with an
    outer FILTER over the sub-projected count — the SPARQL idiom for
    aggregate-then-enrich without regrouping the wide relation."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?nname ?n_cust WHERE {
          ?n rdf:type ex:Nation .
          ?n ex:name ?nname .
          { SELECT ?n (COUNT(?c) AS ?n_cust) WHERE {
              ?c rdf:type ex:Customer . ?c ex:inNation ?n
            } GROUP BY ?n }
          FILTER(?n_cust >= 60)
        }
    """)


def _q_sparql_proj_expr(spark, sf_dir):
    """SPARQL 1.1 projection expressions: a computed column in the
    SELECT clause ((LCASE(...) AS ?v), (?x op k AS ?w)) — applied after
    the solution relation, never a per-row Python call."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?n (LCASE(?nname) AS ?lname)
               (CONCAT(?nname, "|", ?nname) AS ?twice) WHERE {
          ?n rdf:type ex:Nation .
          ?n ex:name ?nname .
        }
    """)


def _q_sparql_group_concat(spark, sf_dir):
    """GROUP_CONCAT aggregate: the distinct market segments per nation
    rendered as one delimited string. SPARQL leaves member order
    undefined; the engine pins lexicographic order, so the oracle's
    list_sort/list_distinct rendering is bit-identical."""
    from parser_rdf_spark.sparql import sparql_query

    return sparql_query(_tpch_triples(spark, sf_dir), """
        SELECT ?nname (GROUP_CONCAT(DISTINCT ?seg; SEPARATOR="|") AS ?segs)
               (COUNT(?c) AS ?n_cust) WHERE {
          ?c rdf:type ex:Customer .
          ?c ex:mktsegment ?seg .
          ?c ex:inNation ?n .
          ?n ex:name ?nname .
        } GROUP BY ?nname
    """)


def _q_sparql_update(spark, sf_dir):
    """SPARQL 1.1 Update applied as a pure function over the KG: a
    DELETE/INSERT WHERE predicate migration for high-balance customers,
    then INSERT DATA / DELETE DATA constants — returns the full
    post-update relation, compared triple-for-triple against the oracle's
    independent set algebra over the base tables."""
    from parser_rdf_spark.sparql import sparql_update

    return sparql_update(_tpch_triples(spark, sf_dir), """
        DELETE { ?c ex:mktsegment ?seg }
        INSERT { ?c ex:segment ?seg . ?c ex:migrated "true" }
        WHERE  { ?c ex:mktsegment ?seg . ?c ex:highBalance "true" } ;
        INSERT DATA { <urn:world:0> rdf:type ex:World .
                      <urn:world:0> ex:name "World" } ;
        DELETE DATA { <urn:region:0> ex:name "AFRICA" }
    """)


def _q_snapshot_time_travel(spark, sf_dir):
    """Iceberg-style snapshot log driven end-to-end: commit the TPC-H KG
    (v1), commit the delta-merged KG (v2), roll back to v1 (v3) — then
    read ALL THREE snapshots after the last commit. Green means old
    snapshots stay readable (time travel), rollback republishes the old
    file set, and the merged snapshot equals the oracle's from-scratch
    merge."""
    import shutil
    import tempfile

    from parser_rdf_spark.incremental import merge_triples
    from parser_rdf_spark.snapshots import SnapshotTable

    out = tempfile.mkdtemp(prefix="snap_tt")
    try:
        t = SnapshotTable(out)
        s1 = t.commit_write(_tpch_triples(spark, sf_dir), mode="overwrite",
                            operation="initial")
        merged = merge_triples(t.read(spark, s1), _delta_triples(spark, sf_dir),
                               key="subj")
        s2 = t.commit_write(merged, mode="overwrite", operation="merge")
        s3 = t.rollback(s1)
        stats = []
        for sid, op in ((s1, "initial"), (s2, "merge"), (s3, "rollback")):
            stats.append(
                t.read(spark, sid).agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_triples"),
                    F.countDistinct("subj").cast("bigint").alias("n_subjects"),
                ).select(F.lit(sid).cast("bigint").alias("snap"),
                         F.lit(op).alias("operation"), "n_triples", "n_subjects")
            )
        res = stats[0]
        for s in stats[1:]:
            res = res.unionByName(s)
        rows = res.collect()  # materialize before the tempdir vanishes
        return spark.createDataFrame(
            rows, "snap bigint, operation string, n_triples bigint, n_subjects bigint"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


# From-scratch connected components over the full event graph — shared
# by the batch-incremental and streamed-incremental maintenance oracles.
_FULL_EVENT_CC_SQL = (
    "WITH RECURSIVE e AS (SELECT DISTINCT user_id % 997 AS src, "
    "event_id % 997 AS dst FROM events WHERE user_id % 997 <> event_id % 997), "
    "sym(a, b) AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e), "
    "reach(v, c) AS (SELECT a, a FROM sym "
    "UNION SELECT sym.b, reach.c FROM reach JOIN sym ON sym.a = reach.v) "
    "SELECT CAST(v AS BIGINT) AS vertex, CAST(MIN(c) AS BIGINT) AS component "
    "FROM reach GROUP BY v"
)

# SQL mirror of _tpch_triples + _delta_triples for the merge oracles:
# the oracle re-derives both relations in pure SQL and merges them with
# NOT IN / UNION ALL — a different mechanism than the engine's
# anti-join, same contract.
def _q_sparql_base(spark, sf_dir):
    """SPARQL BASE prologue: every IRIREF in the query below is
    relative (including dot-segments) and resolves per RFC 3986 §5.2
    against the declared base (parser_rdf_spark/iri.py) — an engine
    extension beyond the reference's no-relative-IRI scope
    (docs/spec-completeness.md:147). The triples carry full http IRIs;
    resolution happens at parse time, so the executed plan is the same
    pushed-scan BGP as an absolute-IRI query."""
    from parser_rdf_spark.sparql import sparql_query

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    kg = "http://ex.org/kg/"

    def iri(tail, col):
        return F.concat(F.lit(kg + tail), F.col(col).cast("string"))

    def spo(df, s, p, o):
        return df.select(s.alias("subj"), F.lit(kg + p).alias("pred"),
                         o.alias("obj"))

    triples = spo(nation, iri("nation/", "n_nationkey"), "pred/name",
                  F.col("n_name")) \
        .unionByName(spo(nation, iri("nation/", "n_nationkey"),
                         "pred/inRegion", iri("region/", "n_regionkey"))) \
        .unionByName(spo(region, iri("region/", "r_regionkey"),
                         "pred/name", F.col("r_name")))
    return sparql_query(triples, """
        BASE <http://ex.org/kg/sub/>
        SELECT ?n ?nname ?rname WHERE {
          ?n <../pred/name> ?nname .
          ?n <./../pred/inRegion> ?r .
          ?r <../x/../pred/name> ?rname .
          FILTER (?r = <../region/0>)
        }
    """)


def _q_sparql_from_dataset(spark, sf_dir):
    """FROM / FROM NAMED dataset construction (SPARQL §13.2): supplier
    assertions live in <urn:g:supp>, customer assertions in
    <urn:g:cust>, nation names in <urn:g:nat>, and a decoy row set in
    the relation's original default graph. The dataset clauses select
    nat as the (merged) default graph and supp as the only named graph
    — customers and the original default rows are provably out of the
    dataset. Plan shape: two literal `graph IN` filters + union, then
    the usual BGP joins."""
    from parser_rdf_spark.sparql import sparql_query

    t = _tpch_triples(spark, sf_dir)
    quads = t.select(
        F.when(F.col("subj").startswith("urn:cust:"), "urn:g:cust")
        .when(F.col("subj").startswith("urn:supp:"), "urn:g:supp")
        .when(F.col("subj").startswith("urn:nation:"), "urn:g:nat")
        .otherwise("_:default").alias("graph"),
        "subj", "pred", "obj",
    )
    return sparql_query(quads, """
        SELECT ?e ?nname FROM <urn:g:nat> FROM NAMED <urn:g:supp>
        WHERE {
          GRAPH ?g { ?e ex:inNation ?n }
          ?n ex:name ?nname .
          FILTER (STRSTARTS(?nname, "NATION_1"))
        }
    """)


# ---------------------------------------------------------------------------
# RDF-star (rdfstar.py / starops.py): parse, unnest, reification bridge,
# SPARQL-star. New engine surface — the reference's format matrix ends at
# RDF 1.1 (docs/spec-completeness.md:131).

_STAR_E = "http://e/"
_STAR_DEC = "http://www.w3.org/2001/XMLSchema#decimal"
_STAR_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
# canonical lexical forms of the five distinct quoted terms in the fixture
_STAR_A = f"<< <{_STAR_E}alice> <{_STAR_E}worksFor> <{_STAR_E}acme> >>"
_STAR_B = f"<< <{_STAR_E}bob> <{_STAR_E}worksFor> <{_STAR_E}acme> >>"
_STAR_C = f"<< <{_STAR_E}bob> <{_STAR_E}worksFor> <{_STAR_E}globex> >>"
_STAR_D = f'<< <{_STAR_E}x> <{_STAR_E}p> "été"@fr >>'
_STAR_NEST = f"<< {_STAR_A} <{_STAR_E}derived> <{_STAR_E}rule7> >>"
_STAR_ANNOT_DOC = (
    f'{_STAR_A} <{_STAR_E}confidence> "0.9"^^<{_STAR_DEC}> .\n'
    f'{_STAR_B} <{_STAR_E}confidence> "0.4"^^<{_STAR_DEC}> .\n'
    f'{_STAR_C} <{_STAR_E}confidence> "0.8"^^<{_STAR_DEC}> .\n'
    f"{_STAR_A} <{_STAR_E}source> <http://crawl/p1> .\n"
    f"<{_STAR_E}doc> <{_STAR_E}claims> {_STAR_D} .\n"
    f'{_STAR_NEST} <{_STAR_E}depth> "2" .\n'
    f"<{_STAR_E}alice> <{_STAR_E}worksFor> <{_STAR_E}acme> .\n"
)


def _star_fixture_triples(spark):
    pages = _fixture_pages(
        spark, {"https://fixtures.example.org/star/doc1": _STAR_ANNOT_DOC}
    )
    return triples_of(parse_pages(pages))


def _q_rdfstar_parse_annotations(spark, sf_dir):
    """N-Triples-star through the FULL parse pipeline: the doc sniffs as
    a line format (reference-pinned D5), fails the strict RDF 1.1 parse,
    and is routed by the parse-stage retry (parse.py) to the star
    grammar (rdfstar.py). Quoted terms land as canonical lexical forms
    (subjects verbatim, objects as obj_kind='quoted'); nesting and
    typed/lang literals inside quoted terms included. Oracle: golden
    VALUES of the canonical encoding."""
    return _star_fixture_triples(spark).select(
        "subj", "pred", "obj_kind", "obj_value",
        F.coalesce("obj_lang", F.lit("")).alias("obj_lang"),
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


def _star_parse_golden_rows() -> list[tuple]:
    e, dec = _STAR_E, _STAR_DEC
    return [
        (_STAR_A, f"{e}confidence", "literal", "0.9", "", dec),
        (_STAR_B, f"{e}confidence", "literal", "0.4", "", dec),
        (_STAR_C, f"{e}confidence", "literal", "0.8", "", dec),
        (_STAR_A, f"{e}source", "iri", "http://crawl/p1", "", ""),
        (f"{e}doc", f"{e}claims", "quoted", _STAR_D, "", ""),
        (_STAR_NEST, f"{e}depth", "literal", "2", "", ""),
        (f"{e}alice", f"{e}worksFor", "iri", f"{e}acme", "", ""),
    ]


def _golden_values_star_parse() -> str:
    vals = ", ".join(
        "(" + ", ".join(_sql_quote(c) for c in r) + ")"
        for r in _star_parse_golden_rows()
    )
    return (
        f"SELECT * FROM (VALUES {vals}) AS "
        "t(subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)"
    )


def _q_rdfstar_unnest(spark, sf_dir):
    """star_unnest (starops.py): the relational accessor for quoted
    terms — one row per DISTINCT quoted lexical form with its inner
    s/p/o parts (the scalable substitute for SPARQL-star SUBJECT() /
    PREDICATE() / OBJECT(): the Arrow parse runs on the term dictionary,
    not the corpus). A nested subterm surfaces with kind 'quoted'."""
    from parser_rdf_spark.starops import star_unnest

    return star_unnest(_star_fixture_triples(spark)).select(
        "term", "q_subj_kind", "q_subj", "q_pred", "q_obj_kind", "q_obj_value",
        F.coalesce("q_obj_lang", F.lit("")).alias("q_obj_lang"),
        F.coalesce("q_obj_datatype", F.lit("")).alias("q_obj_datatype"),
    )


def _golden_values_star_unnest() -> str:
    e = _STAR_E
    rows = [
        (_STAR_A, "iri", f"{e}alice", f"{e}worksFor", "iri", f"{e}acme", "", ""),
        (_STAR_B, "iri", f"{e}bob", f"{e}worksFor", "iri", f"{e}acme", "", ""),
        (_STAR_C, "iri", f"{e}bob", f"{e}worksFor", "iri", f"{e}globex", "", ""),
        (_STAR_D, "iri", f"{e}x", f"{e}p", "literal", "été", "fr", ""),
        (_STAR_NEST, "quoted", _STAR_A, f"{e}derived", "iri", f"{e}rule7", "", ""),
    ]
    vals = ", ".join("(" + ", ".join(_sql_quote(c) for c in r) + ")" for r in rows)
    return (
        f"SELECT * FROM (VALUES {vals}) AS t(term, q_subj_kind, q_subj, "
        "q_pred, q_obj_kind, q_obj_value, q_obj_lang, q_obj_datatype)"
    )


def _q_rdfstar_reification(spark, sf_dir):
    """star_to_reification (starops.py): the W3C star→reification
    mapping as a distributed job — every distinct quoted term becomes a
    skolem node ``urn:stmt:md5(lexical)`` with rdf:type/subject/
    predicate/object quads; asserted rows are rewritten to the node IRI
    by a pure-Column md5 (no join); nested terms expand recursively with
    parent references rewritten to child ids. Oracle: DuckDB derives the
    SAME skolem ids independently via its own md5() over the canonical
    lexical forms."""
    from parser_rdf_spark.starops import star_to_reification

    return star_to_reification(_star_fixture_triples(spark)).select(
        "subj", "pred", "obj_kind", "obj_value",
        F.coalesce("obj_lang", F.lit("")).alias("obj_lang"),
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


def _star_reification_sql() -> str:
    e, dec, rdf = _STAR_E, _STAR_DEC, _STAR_RDF
    qa, qb, qc, qd, qn = (
        _sql_quote(x) for x in (_STAR_A, _STAR_B, _STAR_C, _STAR_D, _STAR_NEST)
    )
    # the five statement rows: (lexical, s_kind, s, p, o_kind, o, lang, dt);
    # the nested term's subject reference is the INNER term's skolem id
    q_rows = ", ".join([
        f"({qa}, 'iri', '{e}alice', '{e}worksFor', 'iri', '{e}acme', '', '')",
        f"({qb}, 'iri', '{e}bob', '{e}worksFor', 'iri', '{e}acme', '', '')",
        f"({qc}, 'iri', '{e}bob', '{e}worksFor', 'iri', '{e}globex', '', '')",
        f"({qd}, 'iri', '{e}x', '{e}p', 'literal', 'été', 'fr', '')",
        f"({qn}, 'iri', 'urn:stmt:' || md5({qa}), '{e}derived', 'iri', '{e}rule7', '', '')",
    ])
    asserted = ", ".join([
        f"('urn:stmt:' || md5({qa}), '{e}confidence', 'literal', '0.9', '', '{dec}')",
        f"('urn:stmt:' || md5({qb}), '{e}confidence', 'literal', '0.4', '', '{dec}')",
        f"('urn:stmt:' || md5({qc}), '{e}confidence', 'literal', '0.8', '', '{dec}')",
        f"('urn:stmt:' || md5({qa}), '{e}source', 'iri', 'http://crawl/p1', '', '')",
        f"('{e}doc', '{e}claims', 'iri', 'urn:stmt:' || md5({qd}), '', '')",
        f"('urn:stmt:' || md5({qn}), '{e}depth', 'literal', '2', '', '')",
        f"('{e}alice', '{e}worksFor', 'iri', '{e}acme', '', '')",
    ])
    return f"""
        WITH q(lex, sk, sv, pv, ok, ov, olang, odt) AS (VALUES {q_rows}),
        ids AS (SELECT 'urn:stmt:' || md5(lex) AS id, * FROM q),
        reif AS (
          SELECT id AS subj, '{rdf}type' AS pred, 'iri' AS obj_kind,
                 '{rdf}Statement' AS obj_value, '' AS obj_lang, '' AS obj_datatype
          FROM ids
          UNION ALL SELECT id, '{rdf}subject', sk, sv, '', '' FROM ids
          UNION ALL SELECT id, '{rdf}predicate', 'iri', pv, '', '' FROM ids
          UNION ALL SELECT id, '{rdf}object', ok, ov, olang, odt FROM ids
        )
        SELECT * FROM reif
        UNION ALL
        SELECT * FROM (VALUES {asserted})
          AS a(subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)
    """


def _q_rdfstar_reify_roundtrip(spark, sf_dir):
    """The reification bridge round-trip law IN the driver gate:
    reification_to_star(star_to_reification(t)) ≡ t (triple-identical,
    nested terms resolved innermost-first) — so the oracle is the same
    golden VALUES as rdfstar_parse_annotations."""
    from parser_rdf_spark.starops import reification_to_star, star_to_reification

    t = _star_fixture_triples(spark)
    return reification_to_star(star_to_reification(t)).select(
        "subj", "pred", "obj_kind", "obj_value",
        F.coalesce("obj_lang", F.lit("")).alias("obj_lang"),
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


def _q_sparql_star_annotations(spark, sf_dir):
    """SPARQL-star over the annotated fixture: a quoted-triple pattern
    ``<< ?s e:worksFor ?o >> e:confidence ?c`` compiles to a
    startswith('<<')-constrained scan joined 1:1 against the
    parse-once-per-distinct-term unnest relation (bgp.py). Oracle:
    golden VALUES of the three annotated edges."""
    from parser_rdf_spark.bgp import triples_spo
    from parser_rdf_spark.sparql import sparql_query

    spo = triples_spo(_star_fixture_triples(spark))
    return sparql_query(spo, f"""
        PREFIX e: <{_STAR_E}>
        SELECT ?s ?o ?c WHERE {{
          << ?s e:worksFor ?o >> e:confidence ?c .
        }}
    """)


_TTL_STAR_DOC = f"""@prefix ex: <{_STAR_E}> .
ex:alice ex:worksFor ex:acme {{| ex:confidence 0.9 ; ex:source <http://crawl/p1> |}} .
<< ex:bob ex:worksFor ex:acme >> ex:confidence 0.4 .
ex:doc ex:claims << ex:x ex:p "été"@fr >> .
ex:s ex:p "a", "b" {{| ex:note "only-b" |}} .
"""


def _q_turtle_star_annotations(spark, sf_dir):
    """Turtle-star through the FULL pipeline: the '@prefix'-led doc
    sniffs as Turtle (reference-pinned D6) and parses natively —
    annotation blocks ``{| … |}`` assert the base triple AND annotate
    its quoted form (per-object in ',' lists); explicit ``<< … >>``
    terms resolve prefixed names to the same canonical encoding as
    N-Triples-star (turtle.py). Oracle: golden VALUES."""
    pages = _fixture_pages(
        spark, {"https://fixtures.example.org/star/doc2": _TTL_STAR_DOC}
    )
    return triples_of(parse_pages(pages)).select(
        "subj", "pred", "obj_kind", "obj_value",
        F.coalesce("obj_lang", F.lit("")).alias("obj_lang"),
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


def _golden_values_turtle_star() -> str:
    e, dec = _STAR_E, _STAR_DEC
    rows = [
        (f"{e}alice", f"{e}worksFor", "iri", f"{e}acme", "", ""),
        (_STAR_A, f"{e}confidence", "literal", "0.9", "", dec),
        (_STAR_A, f"{e}source", "iri", "http://crawl/p1", "", ""),
        (_STAR_B, f"{e}confidence", "literal", "0.4", "", dec),
        (f"{e}doc", f"{e}claims", "quoted", _STAR_D, "", ""),
        (f"{e}s", f"{e}p", "literal", "a", "", ""),
        (f"{e}s", f"{e}p", "literal", "b", "", ""),
        (f'<< <{e}s> <{e}p> "b" >>', f"{e}note", "literal", "only-b", "", ""),
    ]
    vals = ", ".join("(" + ", ".join(_sql_quote(c) for c in r) + ")" for r in rows)
    return (
        f"SELECT * FROM (VALUES {vals}) AS "
        "t(subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)"
    )


_NQ_STAR_DOC = (
    f'<< <{_STAR_E}s> <{_STAR_E}p> "v1" >> <{_STAR_E}confidence> "0.9" <http://g/one> .\n'
    f"<{_STAR_E}doc> <{_STAR_E}claims> << <{_STAR_E}x> <{_STAR_E}p> <{_STAR_E}y> >> _:g2 .\n"
    f"<{_STAR_E}a> <{_STAR_E}b> <{_STAR_E}c> <http://g/one> .\n"
    f'<{_STAR_E}plain> <{_STAR_E}p> "no graph" .\n'
)


def _q_nquads_star_graphs(spark, sf_dir):
    """N-Quads-star through the FULL pipeline: the 4-term star doc fails
    the N-Triples sniff-parse AND the triples-star retry, landing on the
    quads-star retry (parse.py) — quoted terms coexist with named-graph
    terms; graph bnode labels are doc-scoped (descoped here for a
    deterministic oracle). Oracle: golden VALUES."""
    pages = _fixture_pages(
        spark, {"https://fixtures.example.org/star/doc3": _NQ_STAR_DOC}
    )
    t = triples_of(parse_pages(pages))
    descope = lambda c: F.regexp_replace(c, r"^_:(d[0-9a-f]+-)+", "_:")  # noqa: E731
    return t.select(
        descope(F.col("graph")).alias("graph"),
        "subj", "pred", "obj_kind", "obj_value",
    )


def _golden_values_nquads_star() -> str:
    e = _STAR_E
    rows = [
        ("http://g/one", f'<< <{e}s> <{e}p> "v1" >>', f"{e}confidence",
         "literal", "0.9"),
        ("_:g2", f"{e}doc", f"{e}claims", "quoted", f"<< <{e}x> <{e}p> <{e}y> >>"),
        ("http://g/one", f"{e}a", f"{e}b", "iri", f"{e}c"),
        ("_:default", f"{e}plain", f"{e}p", "literal", "no graph"),
    ]
    vals = ", ".join("(" + ", ".join(_sql_quote(c) for c in r) + ")" for r in rows)
    return (
        f"SELECT * FROM (VALUES {vals}) AS t(graph, subj, pred, obj_kind, obj_value)"
    )


def _golden_values_star_sparql() -> str:
    e = _STAR_E
    rows = [
        (f"{e}alice", f"{e}acme", "0.9"),
        (f"{e}bob", f"{e}acme", "0.4"),
        (f"{e}bob", f"{e}globex", "0.8"),
    ]
    vals = ", ".join("(" + ", ".join(_sql_quote(c) for c in r) + ")" for r in rows)
    return f"SELECT * FROM (VALUES {vals}) AS t(s, o, c)"


def _q_sparql_star_annotation_block(spark, sf_dir):
    """SPARQL-star annotation syntax ``?s p ?o {| q ?v |}`` in query
    text: sugar for the base pattern PLUS quoted-subject patterns
    (sparql.py _maybe_annotation) — the conjunction keeps only edges
    that are BOTH asserted and annotated (in the fixture: alice alone;
    bob's annotated edges are not asserted). Oracle: golden VALUES."""
    from parser_rdf_spark.bgp import triples_spo
    from parser_rdf_spark.sparql import sparql_query

    spo = triples_spo(_star_fixture_triples(spark))
    return sparql_query(spo, f"""
        PREFIX e: <{_STAR_E}>
        SELECT ?s ?o ?c ?src WHERE {{
          ?s e:worksFor ?o {{| e:confidence ?c ; e:source ?src |}} .
        }}
    """)


def _golden_values_star_annotation() -> str:
    e = _STAR_E
    return (
        "SELECT * FROM (VALUES ("
        + ", ".join(_sql_quote(c) for c in
                    (f"{e}alice", f"{e}acme", "0.9", "http://crawl/p1"))
        + ")) AS t(s, o, c, src)"
    )


_TERM_KB = "http://kb.example.org/"
_TERM_PARSE_DOC = f"""\
<{_TERM_KB}a> <{_TERM_KB}name> "Ada"@en .
<{_TERM_KB}a> <{_TERM_KB}name> "Aude"@fr .
<{_TERM_KB}b> <{_TERM_KB}name> "Bo" .
<{_TERM_KB}a> <{_TERM_KB}age> "36"^^<http://www.w3.org/2001/XMLSchema#integer> .
<{_TERM_KB}b> <{_TERM_KB}age> "7.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
<{_TERM_KB}a> <{_TERM_KB}knows> <{_TERM_KB}b> .
_:x <{_TERM_KB}note> "anon" .
"""


def _q_sparql_term_parse(spark, sf_dir):
    """Parse→encode→query coherence: an N-Triples fixture with language
    tags, typed literals, an IRI object and a bnode subject goes through
    the FULL parse pipeline, bgp.terms_spo re-renders the serializer's
    canonical encoding, and a term-mode SPARQL query destructures every
    term class back out (STR/LANG/DATATYPE/isIRI — plain literals report
    xsd:string, lang literals rdf:langString, IRIs ''). Oracle: golden
    VALUES."""
    from parser_rdf_spark.bgp import terms_spo
    from parser_rdf_spark.parse import parse_pages, triples_of
    from parser_rdf_spark.sparql import sparql_query

    pages = _fixture_pages(
        spark, {f"{_TERM_KB}doc1": _TERM_PARSE_DOC})
    enc = terms_spo(triples_of(parse_pages(pages)))
    return sparql_query(enc, """
        SELECT ?sl ?pl ?lex ?lg ?dtl ?knd WHERE {
          ?s ?p ?o . FILTER(isIRI(?s))
          BIND(STR(?s) AS ?sl)
          BIND(STR(?p) AS ?pl)
          BIND(STR(?o) AS ?lex)
          BIND(LANG(?o) AS ?lg)
          BIND(COALESCE(STR(DATATYPE(?o)), "") AS ?dtl)
          BIND(IF(isIRI(?o), "iri", "lit") AS ?knd)
        }
    """, term_mode=True)


def _golden_values_term_parse() -> str:
    kb, xsd = _TERM_KB, "http://www.w3.org/2001/XMLSchema#"
    lang_s = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    rows = [
        (f"{kb}a", f"{kb}name", "Ada", "en", lang_s, "lit"),
        (f"{kb}a", f"{kb}name", "Aude", "fr", lang_s, "lit"),
        (f"{kb}b", f"{kb}name", "Bo", "", f"{xsd}string", "lit"),
        (f"{kb}a", f"{kb}age", "36", "", f"{xsd}integer", "lit"),
        (f"{kb}b", f"{kb}age", "7.5", "", f"{xsd}decimal", "lit"),
        (f"{kb}a", f"{kb}knows", f"{kb}b", "", "", "iri"),
    ]
    vals = ", ".join(
        "(" + ", ".join(_sql_quote(v) for v in r) + ")" for r in rows)
    return (f"SELECT * FROM (VALUES {vals}) "
            "AS t(sl, pl, lex, lg, dtl, knd)")


def _q_sparql_term_materialized(spark, sf_dir):
    """VERDICT r05 task 2: term-mode SPARQL over the MATERIALIZED terms
    table — GraphWriter's fifth output table stores bgp.terms_spo as
    columns (Iceberg-style bucket(N, pred) partitioning on the ENCODED
    predicate), so constant-predicate filters reach the parquet scan as
    pushed predicates AND prune pred_bucket partition dirs outright —
    impossible over the derived concat projection (Catalyst cannot
    invert concat). The function RAISES unless the executed plan shows
    both the partition filter and the pushed predicate, so a green
    driver row attests the 100-TB plan shape, not just the values.
    Corpus: the cross-format quartet through the full GraphWriter
    pipeline. Oracle: golden VALUES."""
    import re
    import shutil
    import tempfile

    from parser_rdf_spark.materialize import GraphWriter
    from parser_rdf_spark.sparql import sparql_query

    out = tempfile.mkdtemp(prefix="terms_mat")
    try:
        pages = _fixture_pages(
            spark,
            {_QUARTET_URL.format(n): c for n, c in w3c.SAMPLES.items()})
        writer = GraphWriter(out, url_buckets=2)
        writer.run(spark, pages, "terms-mat")
        q = sparql_query(writer.terms(spark), """
            SELECT ?s ?typ ?label ?lg WHERE {
              ?s <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?typ .
              ?s <http://www.w3.org/2000/01/rdf-schema#label> ?label .
              BIND(LANG(?label) AS ?lg)
            }
        """, term_mode=True)
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "extended")
        if not re.search(r"PartitionFilters: \[isnotnull\(pred_bucket#\d+\),"
                         r" \(pred_bucket#\d+ = \d+\)\]", plan):
            raise AssertionError(
                "constant-predicate pattern did not prune pred_bucket "
                "partitions on the materialized terms table:\n" + plan)
        if "PushedFilters: [IsNotNull(pred), EqualTo(pred," not in plan:
            raise AssertionError(
                "constant predicate not pushed to the parquet scan:\n" + plan)
        rows = q.collect()  # materialize before the tempdir vanishes
        return spark.createDataFrame(
            rows, "s string, typ string, label string, lg string")
    finally:
        shutil.rmtree(out, ignore_errors=True)


_TERM_MATERIALIZED_SQL = (
    "SELECT * FROM (VALUES "
    "('<http://example.org/Person>', "
    "'<http://www.w3.org/2000/01/rdf-schema#Class>', "
    "'\"Person\"@en', 'en'), "
    "('<http://example.org/name>', "
    "'<http://www.w3.org/1999/02/22-rdf-syntax-ns#Property>', "
    "'\"name\"@en', 'en')"
    ") AS t(s, typ, label, lg)"
)


def _q_sparql_stats_text(spark, sf_dir):
    """VERDICT r05 task 3: cost-based join ordering reachable from the
    SPARQL TEXT front-end (sparql_query(stats=...) → bgp_query(stats=)):
    the same adversarial pattern order as bgp_stats_ordered_query (the
    two mega-patterns written first, the selective region constant
    last), but written as query text the way real users write it. The
    greedy smallest-estimate order must change only the plan, never the
    relation — the oracle is the same region join."""
    from parser_rdf_spark.graphops import predicate_statistics
    from parser_rdf_spark.sparql import sparql_query

    triples = _tpch_triples(spark, sf_dir)
    return sparql_query(triples, """
        SELECT ?c ?nname WHERE {
          ?c rdf:type ex:Customer .
          ?c ex:inNation ?n .
          ?n ex:inRegion ?r .
          ?n ex:name ?nname .
          ?r ex:name "EUROPE" .
        }
    """, stats=predicate_statistics(triples))


def _tpch_term_triples(spark, sf_dir):
    """Full-schema (schemas.TRIPLES) micro-KG with language tags and
    datatypes — the term-mode twin of _tpch_triples: nation names are
    lang-tagged @en / @fr / plain by n_nationkey % 3, customer balances
    are integer-cents typed literals (xsd:integer; floor(bal*100) is
    deterministic in both engines), customer→nation is an IRI object.
    Feeds bgp.terms_spo for sparql_query(term_mode=True)."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"

    def row(df, subj, pred, kind, value, lang=None, dt=None):
        return df.select(
            F.lit("tpch").alias("doc_url"),
            F.lit(None).cast("string").alias("graph"),
            subj.alias("subj"), F.lit(pred).alias("pred"),
            F.lit(kind).alias("obj_kind"), value.alias("obj_value"),
            (lang if lang is not None else F.lit(None).cast("string")).alias("obj_lang"),
            (F.lit(dt) if dt else F.lit(None).cast("string")).alias("obj_datatype"),
            F.lit(None).cast("int").alias("line_no"),
        )

    nat_iri = F.concat(F.lit("urn:nation:"), F.col("n_nationkey").cast("string"))
    cust_iri = F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string"))
    lang = (
        F.when(F.col("n_nationkey") % 3 == 0, F.lit("en"))
        .when(F.col("n_nationkey") % 3 == 1, F.lit("fr"))
        .otherwise(F.lit(None).cast("string"))
    )
    cents = F.floor(F.col("c_acctbal") * 100).cast("bigint").cast("string")
    parts = [
        row(nation, nat_iri, "urn:ex:name", "literal", F.col("n_name"), lang=lang),
        row(nation, nat_iri, "urn:ex:inRegion", "iri",
            F.concat(F.lit("urn:region:"), F.col("n_regionkey").cast("string"))),
        row(customer, cust_iri, "urn:ex:acctbal", "literal", cents, dt=xsd_int),
        row(customer, cust_iri, "urn:ex:inNation", "iri",
            F.concat(F.lit("urn:nation:"), F.col("c_nationkey").cast("string"))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _q_sparql_term_filters(spark, sf_dir):
    """Term-mode SPARQL over the encoded relation (bgp.terms_spo): LANG /
    langMatches / isLiteral term builtins as pure string SQL, constants
    matched by term identity. Selects the lang-tagged nation names with
    their tags. Oracle: direct nation-table SQL reproducing the % 3
    tagging rule."""
    from parser_rdf_spark.bgp import terms_spo
    from parser_rdf_spark.sparql import sparql_query

    enc = terms_spo(_tpch_term_triples(spark, sf_dir))
    return sparql_query(enc, """
        SELECT ?nname ?lg WHERE {
          ?n <urn:ex:name> ?name .
          ?n <urn:ex:inRegion> ?r .
          FILTER(isLiteral(?name) && langMatches(LANG(?name), "*"))
          BIND(STR(?name) AS ?nname)
          BIND(LANG(?name) AS ?lg)
        }
    """, term_mode=True)


def _q_sparql_term_functions(spark, sf_dir):
    """Term-mode SPARQL typed-literal arithmetic: isNumeric gates on the
    xsd datatype, the numeric FILTER compares by VALUE (try_cast of the
    lexical form — SPARQL's numeric operator mapping), and DATATYPE /
    STR / STRAFTER destructure the encoding. Oracle: customer-table SQL
    over the same floor(bal*100) cents."""
    from parser_rdf_spark.bgp import terms_spo
    from parser_rdf_spark.sparql import sparql_query

    enc = terms_spo(_tpch_term_triples(spark, sf_dir))
    return sparql_query(enc, """
        SELECT ?ck ?cents ?dtl WHERE {
          ?c <urn:ex:acctbal> ?b .
          FILTER(isNumeric(?b) && ?b >= 900000)
          BIND(STRAFTER(STR(?c), "urn:cust:") AS ?ck)
          BIND(STR(?b) AS ?cents)
          BIND(STRAFTER(STR(DATATYPE(?b)), "XMLSchema#") AS ?dtl)
        }
    """, term_mode=True)


_TPCH_DELTA_CTE = (
    "old_t(subj, pred, obj) AS ("
    "SELECT 'urn:cust:' || c_custkey, 'rdf:type', 'ex:Customer' FROM customer "
    "UNION ALL SELECT 'urn:cust:' || c_custkey, 'ex:inNation', 'urn:nation:' || c_nationkey FROM customer "
    "UNION ALL SELECT 'urn:cust:' || c_custkey, 'ex:mktsegment', c_mktsegment FROM customer "
    "UNION ALL SELECT 'urn:cust:' || c_custkey, 'ex:highBalance', 'true' FROM customer WHERE c_acctbal > 9000 "
    "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'rdf:type', 'ex:Supplier' FROM supplier "
    "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'ex:inNation', 'urn:nation:' || s_nationkey FROM supplier "
    "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'rdf:type', 'ex:Nation' FROM nation "
    "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'ex:name', n_name FROM nation "
    "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'ex:inRegion', 'urn:region:' || n_regionkey FROM nation "
    "UNION ALL SELECT 'urn:region:' || r_regionkey, 'ex:name', r_name FROM region), "
    "delta(subj, pred, obj) AS ("
    "SELECT 'urn:cust:' || c_custkey, 'rdf:type', 'ex:Customer' FROM customer WHERE c_custkey % 10 = 0 "
    "UNION ALL SELECT 'urn:cust:' || c_custkey, 'ex:mktsegment', 'UPDATED' FROM customer WHERE c_custkey % 10 = 0 "
    "UNION ALL SELECT 'urn:cust:new' || c_custkey, 'rdf:type', 'ex:Customer' FROM customer WHERE c_custkey % 100 = 0)"
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ROUND-5 DRIVER WINDOW: the driver checks list(queries())[:50].
    # First 44 slots = every entry that had never received a driver-green
    # hash row before this round (the 36 at positions 50-85 of the r04
    # dict PLUS the 8 ANN/multimodal/simhash entries whose only driver
    # row was r01 err=no_oracle — VERDICT r04 finding 1). Slots 45-50 =
    # the new round-5 contract queries. After the r05 run every registry
    # entry has at least one driver-green row.
    return {
        "bgp_stats_ordered_query": _q_bgp_stats_ordered,
        "sparql_base_resolution": _q_sparql_base,
        "sparql_from_dataset": _q_sparql_from_dataset,
        "trig_named_graphs": _q_trig_named_graphs,
        "trig_serialize_roundtrip": _q_trig_serialize_roundtrip,
        "incremental_ontology_merge": _q_incremental_ontology_merge,
        "normalize_literals": _q_normalize_literals,
        "canonicalize_urls": _q_canonicalize_urls,
        "fuzzy_name_pairs": _q_fuzzy_name_pairs,
        "ontology_diff": _q_ontology_diff,
        "ann_sq8_recall": _q_ann_sq8_recall,
        "stream_incremental_cc": _q_stream_incremental_cc,
        "graph_canonical_dedup": _q_graph_canonical_dedup,
        "graph_canonical_labels": _q_graph_canonical_labels,
        "sparql_results_formats": _q_sparql_results_formats,
        "shacl_deep_constraints": _q_shacl_deep_constraints,
        "shacl_report_rdf": _q_shacl_report_rdf,
        "sparql_entailed_query": _q_sparql_entailed_query,
        "canonical_nquads_export": _q_canonical_nquads_export,
        "property_graph_export": _q_property_graph_export,
        "stream_canonical_dedup": _q_stream_canonical_dedup,
        "near_dup_clusters": _q_near_dup_clusters,
        "owl_restriction_inference": _q_owl_restriction_inference,
        "rdfstar_parse_annotations": _q_rdfstar_parse_annotations,
        "rdfstar_unnest": _q_rdfstar_unnest,
        "rdfstar_reification": _q_rdfstar_reification,
        "rdfstar_reify_roundtrip": _q_rdfstar_reify_roundtrip,
        "sparql_star_annotations": _q_sparql_star_annotations,
        "turtle_star_annotations": _q_turtle_star_annotations,
        "nquads_star_graphs": _q_nquads_star_graphs,
        "sparql_star_annotation_block": _q_sparql_star_annotation_block,
        "sparql_term_filters": _q_sparql_term_filters,
        "sparql_term_functions": _q_sparql_term_functions,
        "substring_dup_windows": _q_substring_dup_windows,
        "sparql_term_parse": _q_sparql_term_parse,
        "substring_dedup_clean": _q_substring_dedup_clean,
        # --- the 8 entries whose only prior driver row was r01
        # --- err=no_oracle (oracles added in round 3, never re-windowed).
        "simhash_fingerprints": _q_simhash,
        "simhash_near_dup_pairs": _q_simhash_near_dup,
        "media_decode_dims": _q_media_decode,
        "image_resize_4x4": _q_image_resize,
        "media_embed_ann": _q_media_embed_ann,
        "minhash_lsh_near_dup": _q_minhash_near_dup,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        # --- slots 45-50: new round-5 contract queries (VERDICT r04
        # --- tasks 2,3,5,6) are inserted here as they land.
        "sparql_term_materialized": _q_sparql_term_materialized,
        "sparql_stats_text_query": _q_sparql_stats_text,
        "substring_dup_spans": _q_substring_dup_spans,
        "incremental_entailment": _q_incremental_entailment,
        "isomorphic_dup_wl_ties": _q_isomorphic_wl_ties,
        "incremental_owl_entailment": _q_incremental_owl_entailment,
        # --- post-window round-5 additions (position >50: pytest +
        # local-mirror evidence; the 50-wide driver window above is
        # exactly the never-driver-green backlog + the 6 new queries).
        "isomorphic_dup_orbit_relabel": _q_isomorphic_dup_orbit_relabel,
        "sparql_union_join_group": _q_sparql_union_join_group,
        "sparql_optional_filter_groups": _q_sparql_optional_filter_groups,
        "sparql_graph_kleene_path": _q_sparql_graph_kleene,
        "sparql_path_alternation": _q_sparql_path_alternation,
        "sparql_service_join": _q_sparql_service_join,
        # --- driver-green in r04 (the r04 window), original order.
        "bgp_star_join": _q_bgp_star_join,
        "bgp_optional_filter": _q_bgp_optional_filter,
        "bgp_same_nation_join": _q_bgp_same_nation_join,
        "bgp_path_query": _q_bgp_path_query,
        "bgp_construct_rewrite": _q_bgp_construct_rewrite,
        "bgp_union_query": _q_bgp_union_query,
        "bgp_not_exists": _q_bgp_not_exists,
        "bgp_aggregate": _q_bgp_aggregate,
        "bgp_bind_query": _q_bgp_bind_query,
        "bgp_kleene_path": _q_bgp_kleene_path,
        "sparql_select": _q_sparql_select,
        "sparql_path_agg": _q_sparql_path_agg,
        "sparql_ask": _q_sparql_ask,
        "sparql_construct": _q_sparql_construct,
        "sparql_union": _q_sparql_union,
        "sparql_negated_minus": _q_sparql_negated_minus,
        "sparql_update_apply": _q_sparql_update,
        "sparql_graph_query": _q_sparql_graph,
        "sparql_describe": _q_sparql_describe,
        "sparql_exists_filter": _q_sparql_exists_filter,
        "sparql_agg_union": _q_sparql_agg_union,
        "sparql_subselect": _q_sparql_subselect,
        "sparql_proj_expr": _q_sparql_proj_expr,
        "sparql_group_concat": _q_sparql_group_concat,
        "sparql_graph_mgmt": _q_sparql_graph_mgmt,
        "sparql_describe_cbd": _q_sparql_describe_cbd,
        "rdfs_inference": _q_rdfs_inference,
        "shacl_validation": _q_shacl_validation,
        "owl_inference": _q_owl_inference,
        "owl_sameas_canonicalize": _q_owl_sameas,
        "owl_ifp_sameas": _q_owl_ifp_sameas,
        "resolve_entities": _q_resolve_entities,
        "owl_chain_entailment": _q_owl_chain_entailment,
        "owl_haskey_sameas": _q_owl_haskey_sameas,
        "kg_random_walks": _q_kg_random_walks,
        "kg_void_description": _q_kg_void_description,
        "kg_personalized_pagerank": _q_kg_personalized_pagerank,
        "kg_hits": _q_kg_hits,
        "kg_neighborhood_jaccard": _q_kg_neighborhood_jaccard,
        "kg_kcore": _q_kg_kcore,
        "ntriples_serialize": _q_ntriples_serialize,
        "turtle_serialize": _q_turtle_serialize,
        "nquads_serialize": _q_nquads_serialize,
        "jsonld_serialize_roundtrip": _q_jsonld_serialize_roundtrip,
        "rdfxml_serialize_roundtrip": _q_rdfxml_serialize_roundtrip,
        "kg_statistics": _q_kg_statistics,
        "kg_incremental_cc": _q_kg_incremental_cc,
        "triples_delta_merge": _q_triples_delta_merge,
        "triples_delta_stats": _q_triples_delta_stats,
        "snapshot_time_travel": _q_snapshot_time_travel,
        # --- driver-green in r01/r02/r03 (unchanged code), original order.
        "w3c_conformance_decisions": _q_w3c_decisions,
        "w3c_turtle_decisions": _q_w3c_turtle_decisions,
        "parse_cross_format_triples": _q_quartet_triples,
        "extract_classes": _q_quartet_classes,
        "extract_properties": _q_quartet_properties,
        "extract_prefixes": _q_quartet_prefixes,
        "resource_counts": _q_quartet_resource_counts,
        "extract_shacl_shapes": _q_shacl_shapes,
        "shacl_shapes_deep": _q_shacl_shapes_deep,
        "property_class_expressions": _q_property_class_expressions,
        "html_structured_data": _q_html_structured_data,
        "skolemized_blank_node_classes": _q_skolemized_classes,
        "nquads_named_graphs": _q_nquads_named_graphs,
        "connected_components": _q_connected_components,
        "entity_linking_dictionary": _q_entity_linking,
        "edges_materialize": _q_edges_from_quartet,
        "pipeline_end_to_end": _q_pipeline_end_to_end,
        "exact_dedup_groups": _q_exact_dedup,
        "dedup_keep_first": _q_dedup_keep_first,
        "token_stats": _q_token_stats,
        "bpe_token_stats": _q_bpe_token_stats,
        "decontamination": _q_decontamination,
        "repetition_stats": _q_repetition_stats,
        "stratified_sample": _q_stratified_sample,
        "mixture_report": _q_mixture_report,
        "chunk_documents": _q_chunk_documents,
        "quality_score": _q_quality_score,
        "lang_id": _q_lang_id,
        "doc_fingerprints": _q_fingerprints,
        "line_dedup": _q_line_dedup,
        "pii_redact": _q_pii_redact,
        "url_domain_stats": _q_url_domain_stats,
        "bigram_lm_quality": _q_bigram_lm_quality,
        "clean_corpus": _q_clean_corpus,
        "attrition_report": _q_attrition_report,
        "ann_cosine_topk": _q_ann_topk,
        "events_hourly_rollup": _q_events_rollup,
        "events_stream_rollup": _q_events_stream_rollup,
        "stream_first_seen_dedup": _q_stream_first_seen,
        "stream_crawl_sessions": _q_stream_crawl_sessions,
        "events_asof_join": _q_events_asof,
        "events_value_range_join": _q_events_range_join,
        "events_sessionize": _q_events_sessionize,
        "events_value_percentiles": _q_events_percentiles,
        "events_daily_rollup": _q_events_daily_rollup,
        "events_user_pivot": _q_events_user_pivot,
        "kg_degrees": _q_kg_degrees,
        "kg_triangle_count": _q_kg_triangles,
        "kg_pagerank": _q_kg_pagerank,
        "kg_label_propagation": _q_kg_label_propagation,
        "kg_khop_reachability": _q_kg_khop,
        "events_user_timeline": _q_events_user_timeline,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "media_stats": _q_media_stats,
        "video_frame_sample": _q_video_frames,
        "embedding_near_dup": _q_embedding_near_dup,
        "ngram_jaccard_near_dup": _q_ngram_jaccard,
        "minhash_lsh_recall": _q_minhash_recall,
        "ann_lsh_recall": _q_ann_lsh_recall,
        "ann_ivf_recall": _q_ann_ivf_recall,
        "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def _golden_values_w3c() -> str:
    from parser_rdf_spark.ntriples import NTriplesError, parse_document

    rows = []
    for name in sorted(w3c.POSITIVE + w3c.NEGATIVE):
        try:
            n = len(parse_document(w3c.FIXTURES[name]))
            rows.append(f"({_sql_quote(name)}, CAST({n} AS BIGINT), false)")
        except NTriplesError:
            rows.append(f"({_sql_quote(name)}, CAST(0 AS BIGINT), true)")
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(fixture, n_triples, rejected)"
    )


def _golden_values_w3c_turtle() -> str:
    from parser_rdf_spark.turtle import TurtleError, parse_document

    rows = []
    names = wttl.POSITIVE + wttl.NEGATIVE + sorted(wttl.OUT_OF_SCOPE_REJECTED)
    for name in sorted(names):
        try:
            n = len(parse_document(wttl.FIXTURES[name])[0])
            rows.append(f"({_sql_quote(name)}, CAST({n} AS BIGINT), false)")
        except TurtleError:
            rows.append(f"({_sql_quote(name)}, CAST(0 AS BIGINT), true)")
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(fixture, n_triples, rejected)"
    )


def _golden_quartet_rows():
    """Golden triples from the pure-Python core (W3C-verified), with the
    same doc-scoped bnode rewriting the Spark stage applies."""
    from parser_rdf_spark.formats import parse_rdf_document, scope_bnodes
    from parser_rdf_spark.parse import doc_hash

    out = []
    for name, content in w3c.SAMPLES.items():
        url = _QUARTET_URL.format(name)
        res = parse_rdf_document(content)
        for t in scope_bnodes(res.triples, doc_hash(url)):
            out.append((name, t))
    return out


def _golden_values_quartet_triples() -> str:
    rows = [
        f"({_sql_quote(doc)}, {_sql_quote(t.subj)}, {_sql_quote(t.pred)}, "
        f"{_sql_quote(t.obj_kind)}, {_sql_quote(t.obj_value)}, "
        f"{_sql_quote(t.obj_lang or '')}, {_sql_quote(t.obj_datatype or '')})"
        for doc, t in _golden_quartet_rows()
    ]
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows)
        + ") AS t(doc, subj, pred, obj_kind, obj_value, obj_lang, obj_datatype)"
    )


# Hand-pinned pipeline stats over the 77-page contract corpus (quartet 4
# + W3C N-Triples 41 positive / 29 negative + 2 HTML + 1 linking doc).
# docs_parsed_ok = 48 well-formed − 4 detection-parity rejects
# (file-01..03 empty/comment-only, subm-01 comment-buried) + bad-prefix-01
# accepted as Turtle. Components: {a1,a2,a3} via owl:sameAs chain and
# {b1,b2} via rdfs:seeAlso → 5 vertices in 2 components. One edge object
# (alias-c2) is canonicalized by the dictionary.
_PIPELINE_E2E_ROWS = [
    ("pages_in", 77),
    ("buckets_total", 4),
    ("buckets_processed", 4),
    ("buckets_skipped_resume", 0),
    ("docs_parsed_ok", 45),
    ("docs_rejected", 32),
    ("triples_rows", 100),
    ("edges_rows", 43),
    ("edges_canonicalized", 1),
    ("classes_rows", 4),
    ("properties_rows", 4),
    ("shapes_rows", 0),
    ("restrictions_rows", 0),
    ("prefix_decls", 18),
    ("equiv_edges", 3),
    ("component_vertices", 5),
    ("components_distinct", 2),
    ("vertices_rows", 37),
    ("vertices_with_component", 5),
    ("lineage_edges_accounted", 43),
    ("lineage_runs", 1),
    # 4 bucket-append commits + 5 per-table compaction commits (terms —
    # the materialized term-encoded relation — is the fifth table),
    # expiry keeps only the last → 8 expired; row counts invariant
    # across the compact+vacuum boundary
    ("maintenance_expired_snapshots", 8),
    ("triples_rows_post_maintenance", 100),
    ("edges_rows_post_maintenance", 43),
]

_PIPELINE_E2E_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{m}', CAST({v} AS BIGINT))" for m, v in _PIPELINE_E2E_ROWS)
    + ") AS t(metric, value)"
)


def _golden_values_edges() -> str:
    rows = [
        f"({_sql_quote(doc)}, {_sql_quote(t.subj)}, {_sql_quote(t.pred)}, {_sql_quote(t.obj_value)})"
        for doc, t in _golden_quartet_rows()
        if t.obj_kind != "literal"
    ]
    return "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(doc, subj, pred, obj)"


_QUARTET_DOCS = ["sample.nt", "sample.ttl", "sample.jsonld", "sample.rdf"]

_QUARTET_CLASSES_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"('{d}', 'http://example.org/Person', 'Person')" for d in _QUARTET_DOCS
    )
    + ") AS t(doc, uri, label)"
)

_QUARTET_PROPERTIES_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"('{d}', 'http://example.org/name', 'name', 'datatype', 'http://example.org/Person', false)"
        for d in _QUARTET_DOCS
    )
    + ") AS t(doc, uri, label, property_type, domain_joined, is_functional)"
)


def _golden_values_prefixes() -> str:
    from parser_rdf_spark.formats import parse_rdf_document

    rows = []
    for name, content in w3c.SAMPLES.items():
        res = parse_rdf_document(content)
        for p, ns in res.prefixes.items():
            rows.append(f"({_sql_quote(name)}, {_sql_quote(p)}, {_sql_quote(ns)})")
    return "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(doc, prefix, namespace)"


_RESOURCE_COUNTS_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{d}', CAST(4 AS BIGINT))" for d in _QUARTET_DOCS)
    + ") AS t(doc, resource_count)"
)

_SHACL_SHAPES_SQL = (
    "SELECT * FROM (VALUES ('http://example.org/PersonShape', 'Person shape', "
    "'http://example.org/Person', '1', CAST(1 AS BIGINT))) "
    "AS t(uri, label, target_class, min_count_constraint, n_property_shapes)"
)

_EX = "http://example.org/"
_SHN = "http://www.w3.org/ns/shacl#"
_XSDN = "http://www.w3.org/2001/XMLSchema#"
_SHACL_DEEP_ROWS = [
    # (uri, label, t_class, t_node, t_subj_of, t_obj_of, t_prop, constraints, n_ps, ps)
    (f"{_EX}AddressShape", "", f"{_EX}Address", "", "", "", "",
     f"class={_EX}PostalAddress;nodeKind={_SHN}IRI", 2,
     f"{_EX}street:-:-:-:-|{_EX}zip:-:^[0-9]{{5}}$:{_XSDN}string:-"),
    (f"{_EX}AgeShape", "Age bounds", "", "", "", "", f"{_EX}age",
     f"datatype={_XSDN}integer;maxInclusive=150;minInclusive=0", 0, ""),
    (f"{_EX}DocShape", "Doc shape (en)", f"{_EX}Document", "", "", "", "",
     "", 3,
     f"{_EX}title:1:-:-:-|{_EX}author:-:-:-:-|{_EX}created:-:-:{_XSDN}dateTime:-"),
    (f"{_EX}EmptyShape", "", "", "", "", "", "", "", 0, ""),
    (f"{_EX}ObjectsShape", "", "", "", "", f"{_EX}employs", "",
     f"nodeKind={_SHN}BlankNodeOrIRI;pattern=^x", 0, ""),
    (f"{_EX}OrgShape", "Organization shape", f"{_EX}Organization", "", "", "", "",
     "maxLength=64;minLength=2", 1,
     f"{_EX}email:-:^[^@]+@[^@]+$:{_XSDN}string:shared email constraint"),
    (f"{_EX}PersonShape", "Person shape", f"{_EX}Person", "", "", "", "",
     "maxCount=5;minCount=1", 2,
     f"{_EX}name:1:-:-:name constraint|{_EX}email:-:^[^@]+@[^@]+$:{_XSDN}string:shared email constraint"),
    (f"{_EX}RefShape", "", "", f"{_EX}TheNode", "", "", "",
     f"node={_EX}PersonShape", 0, ""),
    (f"{_EX}ScoreShape", "", "", "", "", "", f"{_EX}score",
     "maxExclusive=1.0;minExclusive=0.0", 0, ""),
    (f"{_EX}SubjectsShape", "", "", "", f"{_EX}knows", "", "",
     "minCount=2", 0, ""),
]
_SHACL_DEEP_SQL = (
    "SELECT uri, label, target_class, target_node, target_subjects_of, "
    "target_objects_of, target_property, constraints_joined, "
    "CAST(n_property_shapes AS BIGINT) AS n_property_shapes, ps_joined "
    "FROM (VALUES "
    + ", ".join(
        "(" + ", ".join([f"'{v}'" if isinstance(v, str) else str(v) for v in row]) + ")"
        for row in _SHACL_DEEP_ROWS
    )
    + ") AS t(uri, label, target_class, target_node, target_subjects_of, "
    "target_objects_of, target_property, constraints_joined, n_property_shapes, ps_joined)"
)

_CC_SQL = """
WITH RECURSIVE edges(src, dst) AS (
  SELECT * FROM (VALUES {edges}) e(src, dst)
), sym(a, b) AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), reach(v, c) AS (
  SELECT a, a FROM sym
  UNION
  SELECT sym.b, reach.c FROM reach JOIN sym ON sym.a = reach.v
)
SELECT v AS vertex, min(c) AS component FROM reach GROUP BY v ORDER BY v
""".format(edges=", ".join(f"('{s}', '{d}')" for s, d in _CC_EDGES))

_LINKING_SQL = """
WITH triples(doc_url, line_no, subj, pred, obj_value) AS (
  SELECT * FROM (VALUES {triples}) t
), dict(surface, canonical_iri) AS (
  SELECT * FROM (VALUES {dict}) d
)
SELECT doc_url, line_no, obj_value,
       COALESCE(dict.canonical_iri, obj_value) AS canonical_obj
FROM triples LEFT JOIN dict ON triples.obj_value = dict.surface
""".format(
    triples=", ".join(
        f"('{d}', {ln}, '{s}', '{p}', '{o}')" for d, ln, s, p, o in _LINK_TRIPLES
    ),
    dict=", ".join(f"('{s}', '{c}')" for s, c in _LINK_DICT),
)

_STOP_SQL = "['" + "', '".join(textops._STOPWORDS) + "']"


def _lang_id_sql() -> str:
    score = {
        lang: f"len(list_intersect(list_distinct(string_split(text, ' ')), ['"
        + "', '".join(ms)
        + "']))"
        for lang, ms in textops._LANG_MARKERS.items()
    }
    langs = list(textops._LANG_MARKERS)
    best = "greatest(" + ", ".join(score[l] for l in langs) + ")"
    # earlier languages win ties (same as the Spark when-chain built in
    # reverse): first lang whose score equals the max
    case = "CASE "
    for l in langs:
        case += f"WHEN {score[l]} = {best} AND {best} > 0 THEN '{l}' "
    case += "ELSE 'und' END"
    return f"SELECT doc_id, lang, {case} AS lang_guess FROM documents"


# HAND-PINNED expected triples for the two HTML fixture docs — written
# from the microdata/RDFa-Lite/JSON-LD semantics, NOT generated from the
# parser, so the oracle is independent of the implementation. Each row is
# (doc, subj, pred, obj_kind, obj_value).
_RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_SC = "https://schema.org/"
_HTML_GOLDEN_ROWS = [
    # -- doc1: happy paths ---------------------------------------------------
    # embedded JSON-LD (remote schema.org context → @vocab)
    ("doc1", "https://example.org/carol", _RDF_TYPE_IRI, "iri", f"{_SC}Person"),
    ("doc1", "https://example.org/carol", f"{_SC}name", "literal", "Carol Danvers"),
    # microdata with itemid
    ("doc1", "https://example.org/alice", _RDF_TYPE_IRI, "iri", f"{_SC}Person"),
    ("doc1", "https://example.org/alice", f"{_SC}name", "literal", "Alice Liddell"),
    ("doc1", "https://example.org/alice", f"{_SC}birthDate", "literal", "1852-05-04"),
    ("doc1", "https://example.org/alice", f"{_SC}url", "iri", "https://alice.example.org/"),
    # RDFa Lite with prefix + vocab
    ("doc1", "https://example.org/bob", _RDF_TYPE_IRI, "iri", f"{_SC}Person"),
    ("doc1", "https://example.org/bob", f"{_SC}name", "literal", "Bob Smith"),
    ("doc1", "https://example.org/bob", "http://xmlns.com/foaf/0.1/nick", "literal", "bobby"),
    # -- edge doc: decisions -------------------------------------------------
    # commented-out itemscope contributes nothing; valueless itemprop ignored
    ("edge", "https://example.org/amy", _RDF_TYPE_IRI, "iri", f"{_SC}Person"),
    # entity reference unescaped in captured text
    ("edge", "https://example.org/amy", f"{_SC}name", "literal", "Amy & co"),
    # itemref crawl: detached text capture + void meta, forward-declared id
    ("edge", "https://example.org/amy", f"{_SC}jobTitle", "literal", "Captain"),
    ("edge", "https://example.org/amy", f"{_SC}birthDate", "literal", "1701-01-01"),
    # the same id claimed by a second item ('ghost' id matches nothing)
    ("edge", "https://example.org/ev", f"{_SC}jobTitle", "literal", "Captain"),
    ("edge", "https://example.org/ev", f"{_SC}birthDate", "literal", "1701-01-01"),
    # nested itemscope with itemid → IRI-valued property; crawl boundary
    # keeps the locality on the nested item only
    ("edge", "https://example.org/addr1", _RDF_TYPE_IRI, "iri", f"{_SC}PostalAddress"),
    ("edge", "https://example.org/amy", f"{_SC}address", "iri", "https://example.org/addr1"),
    ("edge", "https://example.org/addr1", f"{_SC}addressLocality", "literal", "Leeds"),
    # unquoted itemid attribute; time/@datetime value rule
    ("edge", "https://example.org/ev", _RDF_TYPE_IRI, "iri", f"{_SC}Event"),
    ("edge", "https://example.org/ev", f"{_SC}startDate", "literal", "2026-01-01"),
    # RDFa: CURIE predicate via prefix=; inline <b> transparent in capture
    ("edge", "https://example.org/story", "http://purl.org/dc/terms/title", "literal", "A bold tale"),
    ("edge", "https://example.org/story", f"{_SC}wordCount", "literal", "42"),
    # unquoted href IRI object; inherited about subject
    ("edge", "https://example.org/story", f"{_SC}author", "iri", "https://example.org/amy"),
    # resource object + typeof types the RESOURCE (no about on element)
    ("edge", "https://example.org/story", f"{_SC}publisher", "iri", "https://example.org/acme"),
    ("edge", "https://example.org/acme", _RDF_TYPE_IRI, "iri", f"{_SC}Organization"),
    # broken JSON-LD block isolated; good block still parsed
    ("edge", "https://example.org/zed", f"{_SC}nickname", "literal", "Z"),
    # unclosed element: capture flushed at document end
    ("edge", "https://example.org/th", _RDF_TYPE_IRI, "iri", f"{_SC}Thing"),
    ("edge", "https://example.org/th", f"{_SC}name", "literal", "Tail"),
]


def _golden_values_html() -> str:
    rows = [
        "(" + ", ".join(_sql_quote(v) for v in row) + ")"
        for row in _HTML_GOLDEN_ROWS
    ]
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows)
        + ") AS t(doc, subj, pred, obj_kind, obj_value)"
    )


# -- round-2 oracle builders -------------------------------------------------

# Word-3-gram Jaccard in DuckDB — an INDEPENDENT SQL implementation of the
# same definition the Spark op computes (split on ' ', grams of 3, distinct,
# integer threshold 2·inter ≥ union ⟺ jaccard ≥ 0.5, integer similarity).
_NGRAM_GRAMS_CTE = (
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
    "grams AS (SELECT doc_id, list_distinct(list_transform("
    "  range(1, greatest(1, len(w) - 2) + 1), i -> array_to_string(w[i:i+2], ' '))) AS g "
    "FROM toks), "
    "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "  len(list_intersect(a.g, b.g)) AS n_inter, "
    "  len(list_distinct(list_concat(a.g, b.g))) AS n_union "
    "  FROM grams a JOIN grams b ON a.doc_id < b.doc_id) "
)

_ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _simhash_py(text: str) -> int:
    """Independent pure-Python SimHash (per-token loop — deliberately the
    naive definition, not the vectorized implementation under test)."""
    import hashlib

    toks = text.split()
    if not toks:
        return 0
    votes = [0] * 64
    for tok in toks:
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    fp = 0
    for i in range(64):
        if votes[i] > 0:
            fp |= 1 << i
    return fp - (1 << 64) if fp >= (1 << 63) else fp


_SIMHASH_FPS: list[tuple[int, int]] | None = None


def _simhash_fps() -> list[tuple[int, int]]:
    global _SIMHASH_FPS
    if _SIMHASH_FPS is None:
        import pyarrow.parquet as pq

        t = pq.read_table(f"{_ORACLE_SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        _SIMHASH_FPS = [
            (int(i), _simhash_py(x))
            for i, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
        ]
    return _SIMHASH_FPS


def _simhash_golden_sql() -> str:
    rows = ", ".join(f"({i}, {fp})" for i, fp in _simhash_fps())
    return (
        f"SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(simhash AS BIGINT) AS simhash "
        f"FROM (VALUES {rows}) AS t(doc_id, simhash)"
    )


def _simhash_pairs_golden_sql() -> str:
    """BRUTE-FORCE all-pairs Hamming ≤ 16 over the independent Python
    fingerprints. The banded Spark op guarantees exact recall for
    d ≤ max_hamming (pigeonhole) — so brute force IS its expected output,
    and this oracle checks that guarantee, not just regression."""
    fps = _simhash_fps()
    rows = []
    for i in range(len(fps)):
        ia, fa = fps[i]
        for j in range(i + 1, len(fps)):
            ib, fb = fps[j]
            d = ((fa ^ fb) & ((1 << 64) - 1)).bit_count()
            if d <= 16:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                rows.append(f"({a}, {b}, {d})")
    return (
        "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, "
        "CAST(hamming AS INT) AS hamming "
        f"FROM (VALUES {', '.join(rows)}) AS t(id_a, id_b, hamming)"
    )


def _minhash_pairs_py() -> set:
    """Independent pure-Python/numpy mirror of minhash_lsh_blocking
    (linking.py): shingle → xxh64 → 32 permutation minima → 8 banded
    buckets → in-bucket pairs (star pairing past max_bucket). Spark's
    xxhash64 is replicated bit-exactly by parser_rdf_spark.purehash
    (validated in tests/test_purehash.py), so this recomputes the
    candidate-pair set without the JVM."""
    import numpy as np
    import pyarrow.parquet as pq

    from parser_rdf_spark.purehash import (
        spark_hash_long_vec,
        spark_hash_longs,
        spark_hash_string,
    )

    tbl = pq.read_table(f"{_ORACLE_SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    num_hashes, bands, shingle_len, max_bucket = 32, 8, 4, 1000
    rpb = num_hashes // bands
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, text in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        n_sh = max(1, len(text) - (shingle_len - 1))
        hs = np.fromiter(
            (spark_hash_string(text[i : i + shingle_len]) for i in range(n_sh)),
            dtype=np.int64,
            count=n_sh,
        )
        t1 = spark_hash_long_vec(hs, 42)
        sig = [
            int(spark_hash_long_vec(np.full(n_sh, j, dtype=np.int64), t1).min())
            for j in range(num_hashes)
        ]
        for b in range(bands):
            key = (b, spark_hash_longs(sig[b * rpb : (b + 1) * rpb]))
            buckets.setdefault(key, []).append(int(did))
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        if len(ids) <= 1:
            continue
        if len(ids) <= max_bucket:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a, b = ids[i], ids[j]
                    if a != b:
                        pairs.add((min(a, b), max(a, b)))
        else:
            m = min(ids)
            for x in ids:
                if x != m:
                    pairs.add((m, x))
    return pairs


def _minhash_pairs_golden_sql() -> str:
    rows = ", ".join(f"({a}, {b})" for a, b in sorted(_minhash_pairs_py()))
    return (
        "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b "
        f"FROM (VALUES {rows}) AS t(id_a, id_b)"
    )


def _near_dup_clusters_golden_sql() -> str:
    """Union-find over the mirrored LSH pair set + singleton fill-in —
    the expected (id, cluster_id, is_representative, cluster_size)
    relation of linking.near_dup_clusters (cluster_id = hash-min CC
    label = min id per component, matching connected_components)."""
    import pyarrow.parquet as pq

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _minhash_pairs_py():
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    tbl = pq.read_table(f"{_ORACLE_SF_DIR}/documents.parquet", columns=["doc_id"])
    ids = [int(i) for i in tbl.column("doc_id").to_pylist()]
    cluster = {i: (find(i) if i in parent else i) for i in ids}
    sizes: dict[int, int] = {}
    for c in cluster.values():
        sizes[c] = sizes.get(c, 0) + 1
    rows = ", ".join(
        f"({i}, {c}, {str(i == c).upper()}, {sizes[c]})"
        for i, c in sorted(cluster.items())
    )
    return (
        "SELECT CAST(id AS BIGINT) AS id, CAST(cluster_id AS BIGINT) AS cluster_id, "
        "is_representative, CAST(cluster_size AS BIGINT) AS cluster_size "
        f"FROM (VALUES {rows}) AS t(id, cluster_id, is_representative, cluster_size)"
    )


def _load_embeddings_py() -> list[tuple[int, list[float]]]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{_ORACLE_SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    return [
        (int(i), [float(x) for x in v])
        for i, v in zip(tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist())
    ]


def _cosine_py(q: list[float], n: list[float]) -> float:
    import math

    dot = 0.0
    for x, y in zip(q, n):
        dot += x * y
    na = 0.0
    for x in q:
        na += x * x
    nb = 0.0
    for y in n:
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _topk_rows_sql(ranked: list[tuple[int, int, int]]) -> str:
    rows = ", ".join(f"({q}, {n}, {r})" for q, n, r in sorted(ranked))
    return (
        "SELECT CAST(query_id AS BIGINT) AS query_id, "
        "CAST(neighbor_id AS BIGINT) AS neighbor_id, CAST(rank AS INT) AS rank "
        f"FROM (VALUES {rows}) AS t(query_id, neighbor_id, rank)"
    )


def _rank_candidates(
    vecs: dict[int, list[float]], cands: dict[int, set[int]], k: int
) -> list[tuple[int, int, int]]:
    out = []
    for q, ns in cands.items():
        scored = sorted(
            ((-_cosine_py(vecs[q], vecs[n]), n) for n in ns if n != q)
        )
        for rank, (_, n) in enumerate(scored[:k], start=1):
            out.append((q, n, rank))
    return out


def _ann_lsh_golden_sql(k=3, n_planes=8, n_tables=8, seed=42) -> str:
    """Independent mirror of ann_lsh_topk (textops.py): blake2b-derived
    hyperplanes, sign-bit buckets per table, exact cosine within the
    unioned candidate set. Float folds replicate the SQL aggregate's
    left-to-right IEEE order, so ranks (ties broken by neighbor_id)
    match bit-for-bit."""
    import hashlib

    emb = _load_embeddings_py()
    d = len(emb[0][1])

    def h(*xs) -> float:
        raw = hashlib.blake2b("-".join(map(str, xs)).encode(), digest_size=8).digest()
        return (int.from_bytes(raw, "big") / 2**63) - 1.0

    buckets: dict[tuple[int, int], list[int]] = {}
    for t in range(n_tables):
        planes = [[h(seed, t, p, i) for i in range(d)] for p in range(n_planes)]
        for vid, v in emb:
            sig = 0
            for pl in planes:
                acc = 0.0
                for p, x in zip(pl, v):
                    acc += p * x
                sig = sig * 2 + (1 if acc >= 0 else 0)
            buckets.setdefault((t, sig), []).append(vid)
    cands: dict[int, set[int]] = {vid: set() for vid, _ in emb}
    for ids in buckets.values():
        for a in ids:
            cands[a].update(ids)
    vecs = dict(emb)
    return _topk_rows_sql(_rank_candidates(vecs, cands, k))


def _ann_ivf_golden_sql(k=3, n_lists=8, n_probe=3, seed=42, n_iters=8) -> str:
    """Independent mirror of the deterministic IVF-flat path
    (textops.ann_ivf_topk): xxh64-seeded init, integer-quantized Lloyd
    iterations (exact sums ⇒ identical centroids), argmin assignment and
    n_probe probing with IEEE-order float folds."""
    import math

    from parser_rdf_spark.purehash import spark_hash_long

    emb = _load_embeddings_py()
    vn: dict[int, list[float]] = {}
    for vid, v in emb:
        s = 0.0
        for y in v:
            s += y * y
        nrm = math.sqrt(s)
        vn[vid] = [x / nrm for x in v]

    order = sorted(emb, key=lambda iv: (spark_hash_long(seed, spark_hash_long(iv[0])), iv[0]))
    centers = [list(vn[vid]) for vid, _ in order[:n_lists]]

    def dist_sq(c: list[float], x: list[float]) -> float:
        acc = 0.0
        for ci, xi in zip(c, x):
            acc += (ci - xi) * (ci - xi)
        return acc

    for _ in range(n_iters):
        sums: dict[tuple[int, int], int] = {}
        counts: dict[int, int] = {}
        for vid, _v in emb:
            dists = [dist_sq(c, vn[vid]) for c in centers]
            lid = dists.index(min(dists))
            counts[lid] = counts.get(lid, 0) + 1
            for dim, x in enumerate(vn[vid]):
                q = int(math.floor(x * 1000000.0 + 0.5))
                sums[(lid, dim)] = sums.get((lid, dim), 0) + q
        new_centers = [list(c) for c in centers]
        for (lid, dim), s in sums.items():
            new_centers[lid][dim] = float(s) / float(counts[lid]) / 1000000.0
        centers = new_centers

    lists: dict[int, list[int]] = {}
    probes: dict[int, list[int]] = {}
    for vid, _v in emb:
        dists = [dist_sq(c, vn[vid]) for c in centers]
        lists.setdefault(dists.index(min(dists)), []).append(vid)
        order_d = sorted((dv, i) for i, dv in enumerate(dists))
        probes[vid] = [i for _dv, i in order_d[:n_probe]]
    cands = {
        vid: {n for p in ps for n in lists.get(p, [])} for vid, ps in probes.items()
    }
    return _topk_rows_sql(_rank_candidates(dict(emb), cands, k))


def _media_decode_golden_sql() -> str:
    """Re-derive the fake-decoder output for the synthetic media corpus in
    plain Python (same payload grammar, no Spark, no Arrow) — pins the
    mapInPandas plumbing: schema, null channels, batch round-trip."""
    from parser_rdf_spark import multimodal as mmod

    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(60):
        kind = kinds[i % 3]
        d = mmod._decode_fake(i, kind, mmod.synth_payload(i, kind))
        vals = [str(i), _sql_quote(kind)]
        for c in ("width", "height", "sample_rate", "n_samples", "n_frames"):
            vals.append("NULL" if d[c] is None else str(d[c]))
        vals.append(_sql_quote(d["decoder"]))
        rows.append("(" + ", ".join(vals) + ")")
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, kind, "
        "CAST(width AS INT) AS width, CAST(height AS INT) AS height, "
        "CAST(sample_rate AS INT) AS sample_rate, CAST(n_samples AS INT) AS n_samples, "
        "CAST(n_frames AS INT) AS n_frames, decoder "
        f"FROM (VALUES {', '.join(rows)}) AS t(media_id, kind, width, height, "
        "sample_rate, n_samples, n_frames, decoder)"
    )


def _image_resize_golden_sql() -> str:
    """Block-mean resize recomputed driver-side over the same decoded
    buffers (identical numpy arithmetic — a golden pin of the Arrow
    round-trip, not an independent algorithm)."""
    import hashlib as _hl

    import numpy as np

    from parser_rdf_spark import multimodal as mmod

    rows = []
    for i in range(0, 60, 3):  # image kind: media_id % 3 == 0
        d = mmod._decode_fake(i, "image", mmod.synth_payload(i, "image"))
        w, h, buf = d["width"], d["height"], d["pixels"]
        img = np.frombuffer(buf, dtype=np.uint8, count=w * h).reshape(h, w)
        ys = np.array_split(np.arange(h), 4)
        xs = np.array_split(np.arange(w), 4)
        small = np.array(
            [[int(img[np.ix_(y, x)].mean()) for x in xs] for y in ys], dtype=np.uint8
        )
        rows.append(f"({i}, 4, 4, {_sql_quote(_hl.md5(small.tobytes()).hexdigest())})")
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, CAST(width AS INT) AS width, "
        "CAST(height AS INT) AS height, resized_md5 "
        f"FROM (VALUES {', '.join(rows)}) AS t(media_id, width, height, resized_md5)"
    )


def _media_embed_ann_golden_sql() -> str:
    """Embed + brute-force cosine top-2 recomputed in pure Python with the
    same sequential-fold double arithmetic as the JVM expression (so the
    ranking is bit-identical)."""
    import hashlib as _hl

    import numpy as np

    from parser_rdf_spark import multimodal as mmod

    kinds = ["image", "audio", "video"]
    embs = {}
    for i in range(60):
        payload = mmod.synth_payload(i, kinds[i % 3])
        raw = mmod._keystream(
            int.from_bytes(_hl.blake2b(payload, digest_size=8).digest(), "big"), 16 * 4
        )
        v = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
        v = (v / 2**31) - 1.0
        v /= np.linalg.norm(v) or 1.0
        embs[i] = [float(x) for x in v.astype(np.float32)]

    def cosine(a, b):
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / ((na ** 0.5) * (nb ** 0.5))

    rows = []
    for q in range(60):
        scored = sorted(
            ((cosine(embs[q], embs[n]), n) for n in range(60) if n != q),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (_, n) in enumerate(scored[:2], start=1):
            rows.append(f"({q}, {n}, {rank})")
    return (
        "SELECT CAST(query_id AS BIGINT) AS query_id, "
        "CAST(neighbor_id AS BIGINT) AS neighbor_id, CAST(rank AS INT) AS rank "
        f"FROM (VALUES {', '.join(rows)}) AS t(query_id, neighbor_id, rank)"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "w3c_conformance_decisions": _golden_values_w3c(),
        "w3c_turtle_decisions": _golden_values_w3c_turtle(),
        "parse_cross_format_triples": _golden_values_quartet_triples(),
        "ntriples_serialize": _golden_values_ntriples(),
        "turtle_serialize": _golden_values_turtle(),
        "nquads_serialize": _golden_values_nquads(),
        "jsonld_serialize_roundtrip": _golden_values_quartet_descoped(),
        "rdfxml_serialize_roundtrip": _golden_values_quartet_skolemized(),
        "extract_classes": _QUARTET_CLASSES_SQL,
        "extract_properties": _QUARTET_PROPERTIES_SQL,
        "extract_prefixes": _golden_values_prefixes(),
        "resource_counts": _RESOURCE_COUNTS_SQL,
        "extract_shacl_shapes": _SHACL_SHAPES_SQL,
        "shacl_shapes_deep": _SHACL_DEEP_SQL,
        "html_structured_data": _golden_values_html(),
        "nquads_named_graphs": (
            "SELECT * FROM (VALUES "
            "('http://g/one', 'http://e/s1', 'http://e/p', 'iri', 'http://e/o1'), "
            "('_:default', 'http://e/s2', 'http://e/p', 'literal', 'default graph'), "
            "('http://g/two', 'http://e/s3', 'http://e/p', 'literal', 'also named'), "
            "('http://g/one', 'http://e/s4', 'http://e/p', 'iri', 'http://e/o4')"
            ") AS t(graph, subj, pred, obj_kind, obj_value)"
        ),
        "incremental_ontology_merge": (
            "SELECT * FROM (VALUES "
            "('https://onto.example.org/keep', 'http://example.org/Stable', 'Stable'), "
            "('https://onto.example.org/update', 'http://example.org/Old', 'Renamed'), "
            "('https://onto.example.org/update', 'http://example.org/Fresh', 'Fresh'), "
            "('https://onto.example.org/new', 'http://example.org/Brand', 'Brand')"
            ") AS t(doc_url, uri, label)"
        ),
        "trig_named_graphs": _golden_values_trig(),
        "trig_serialize_roundtrip": (
            "SELECT * FROM (VALUES "
            "('http://g/one', 'http://e/s1', 'http://e/p', 'iri', 'http://e/o1'), "
            "('_:default', 'http://e/s2', 'http://e/p', 'literal', 'default graph'), "
            "('http://g/two', 'http://e/s3', 'http://e/p', 'literal', 'also named'), "
            "('http://g/one', 'http://e/s4', 'http://e/p', 'iri', 'http://e/o4')"
            ") AS t(graph, subj, pred, obj_kind, obj_value)"
        ),
        "skolemized_blank_node_classes": (
            "SELECT * FROM (VALUES "
            "('http://example.org/Named', 'Named', false), "
            "('http://example.org/Named', 'Named', true), "
            "('urn:bnode:<scoped>', 'Anonymous', true)"
            ") AS t(uri, label, skolemized)"
        ),
        "property_class_expressions": (
            "SELECT * FROM (VALUES "
            "('http://example.org/author', 'object', "
            " 'http://example.org/Book|http://example.org/Article|http://example.org/Thesis', "
            " 'http://example.org/Person'), "
            "('http://example.org/pages', 'datatype', '', "
            " 'http://www.w3.org/2001/XMLSchema#integer'), "
            "('http://example.org/note', 'annotation', '', "
            " 'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString')"
            ") AS t(uri, property_type, domain_joined, range_joined)"
        ),
        "connected_components": _CC_SQL,
        "entity_linking_dictionary": _LINKING_SQL,
        "edges_materialize": _golden_values_edges(),
        "pipeline_end_to_end": _PIPELINE_E2E_SQL,
        "exact_dedup_groups": (
            "SELECT md5(text) AS text_md5, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(min(doc_id) AS BIGINT) AS first_doc_id FROM documents GROUP BY md5(text)"
        ),
        "dedup_keep_first": (
            "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, md5(text) AS text_md5 "
            "FROM documents GROUP BY md5(text)"
        ),
        "token_stats": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
            "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens, "
            "CAST((length(text) - len(string_split(text, ' ')) + 1) * 100 "
            "  // len(string_split(text, ' ')) AS BIGINT) AS avg_token_len_x100 "
            "FROM documents"
        ),
        "bpe_token_stats": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            r"CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_word_tokens, "
            "CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_number_tokens, "
            r"CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_symbol_tokens "
            "FROM documents"
        ),
        "decontamination": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
            "g AS (SELECT DISTINCT doc_id, gram FROM ("
            "  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(1, len(t) - 4)), "
            "    i -> array_to_string(t[i:i+4], ' '))) AS gram "
            "  FROM toks WHERE doc_id % 97 <> 0)), "
            "bg AS (SELECT DISTINCT gram FROM ("
            "  SELECT unnest(list_transform(generate_series(1, greatest(1, len(t) - 4)), "
            "    i -> array_to_string(t[i:i+4], ' '))) AS gram "
            "  FROM toks WHERE doc_id % 97 = 0)) "
            "SELECT CAST(g.doc_id AS BIGINT) AS doc_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_grams, "
            "CAST(SUM(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit, "
            "CAST(MAX(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS contaminated "
            "FROM g LEFT JOIN bg ON g.gram = bg.gram GROUP BY g.doc_id"
        ),
        "repetition_stats": (
            "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), "
            "tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok), "
            "ts AS (SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_c FROM tc GROUP BY doc_id), "
            "gs AS (SELECT doc_id, len(gl) AS g_total, len(list_distinct(gl)) AS g_distinct FROM ("
            "  SELECT doc_id, list_transform(generate_series(1, greatest(1, "
            "    len(string_split(text, ' ')) - 1)), "
            "    i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')) AS gl "
            "  FROM documents)) "
            "SELECT CAST(ts.doc_id AS BIGINT) AS doc_id, "
            "CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(top_c * 10000 // n_tokens AS BIGINT) AS top_token_frac_x10000, "
            "CAST((g_total - g_distinct) * 10000 // g_total AS BIGINT) AS dup_ngram_frac_x10000 "
            "FROM ts JOIN gs ON ts.doc_id = gs.doc_id"
        ),
        "chunk_documents": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "unnest(list_transform(generate_series(0, (len(t) - 1) // 12), "
            "i -> {'chunk_id': CAST(i AS BIGINT), "
            "'chunk_text': array_to_string(t[i*12+1:i*12+16], ' '), "
            "'n_tokens': CAST(len(t[i*12+1:i*12+16]) AS BIGINT)}), recursive := true) "
            "FROM toks"
        ),
        "mixture_report": (
            "WITH per AS (SELECT lang, source, COUNT(*) AS n_docs, "
            "SUM(len(string_split(text, ' '))) AS n_tokens FROM documents GROUP BY lang, source) "
            "SELECT lang, source, CAST(n_docs AS BIGINT) AS n_docs, "
            "CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(n_docs * 10000 // SUM(n_docs) OVER () AS BIGINT) AS doc_share_bp, "
            "CAST(n_tokens * 10000 // SUM(n_tokens) OVER () AS BIGINT) AS token_share_bp "
            "FROM per"
        ),
        "stratified_sample": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM documents "
            "WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < "
            "CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN '4000' "
            "WHEN 'fr' THEN '2000' WHEN 'es' THEN '1000' ELSE 'zzzz' END"
        ),
        "quality_score": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
            f"CAST(len(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL})) AS BIGINT) AS n_stopword_types, "
            "CAST((CASE WHEN length(text) >= 200 THEN 40 WHEN length(text) >= 50 THEN 25 ELSE 5 END) "
            f" + (CASE WHEN len(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL})) >= 2 THEN 30 "
            f"         WHEN len(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL})) >= 1 THEN 15 ELSE 0 END) "
            " + (len(list_distinct(string_split(text, ' '))) * 30 // greatest(len(string_split(text, ' ')), 1)) "
            "AS BIGINT) AS quality FROM documents"
        ),
        "lang_id": _lang_id_sql(),
        "doc_fingerprints": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS md5_exact, "
            "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS md5_normalized "
            "FROM documents"
        ),
        "line_dedup": (
            f"WITH d AS (SELECT doc_id, {_LINEIFY_SQL} AS text FROM documents), "
            "lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line, "
            "  generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos FROM d), "
            "ranked AS (SELECT doc_id, pos, line, "
            "  row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn FROM lines) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
            "coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY pos), '') AS clean_text "
            "FROM ranked GROUP BY doc_id"
        ),
        "pii_redact": (
            f"WITH d AS (SELECT doc_id, {_PIIIFY_SQL} AS text FROM documents) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email, "
            "CAST(len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_ssn, "
            "CAST(len(regexp_extract_all(text, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS BIGINT) AS n_phone, "
            "CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4, "
            "regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'), "
            "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g'), "
            "'\\b\\d{3}-\\d{3}-\\d{4}\\b', '[PHONE]', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g') AS redacted_text "
            "FROM d"
        ),
        "url_domain_stats": (
            f"WITH d AS (SELECT doc_id, {_URLIFY_SQL} AS text FROM documents), "
            "u AS (SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^ \t\n]+')) AS url FROM d), "
            "h AS (SELECT doc_id, regexp_extract(url, '^https?://([^/ \t\n]+)', 1) AS host FROM u) "
            "SELECT host, regexp_extract(host, '\\.([A-Za-z]+)$', 1) AS tld, "
            "CAST(count(*) AS BIGINT) AS n_urls, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
            "FROM h GROUP BY host"
        ),
        "clean_corpus": (
            f"WITH d AS (SELECT doc_id, {_CLEANIFY_SQL} AS text FROM documents), "
            "q AS (SELECT doc_id, "
            "  (CASE WHEN length(text) >= 200 THEN 40 WHEN length(text) >= 50 THEN 25 ELSE 5 END) "
            f" + (CASE WHEN len(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL})) >= 2 THEN 30 "
            f"     WHEN len(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL})) >= 1 THEN 15 ELSE 0 END) "
            "  + (len(list_distinct(string_split(text, ' '))) * 30 // greatest(len(string_split(text, ' ')), 1)) AS quality "
            "  FROM d), "
            "g AS (SELECT d.doc_id, d.text, q.quality FROM d JOIN q ON d.doc_id = q.doc_id WHERE q.quality >= 70), "
            "r AS (SELECT doc_id, quality, "
            "  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, "
            "  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'), "
            "  '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g'), "
            "  '\\b\\d{3}-\\d{3}-\\d{4}\\b', '[PHONE]', 'g'), "
            "  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g') AS text FROM g), "
            "fst AS (SELECT md5(text) AS m, min(doc_id) AS first_doc_id FROM r GROUP BY 1), "
            "u AS (SELECT r.* FROM r JOIN fst ON md5(r.text) = fst.m AND r.doc_id = fst.first_doc_id), "
            "lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line, "
            "  generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos FROM u), "
            "ranked AS (SELECT doc_id, pos, line, "
            "  row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn FROM lines), "
            "dd AS (SELECT doc_id, count(*) AS n_lines, "
            "  sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept, "
            "  coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY pos), '') AS clean_text "
            "  FROM ranked GROUP BY doc_id), "
            "ne AS (SELECT * FROM dd WHERE clean_text != '') "
            "SELECT CAST(ne.doc_id AS BIGINT) AS doc_id, CAST(q.quality AS BIGINT) AS quality, "
            "CAST(ne.n_lines AS BIGINT) AS n_lines, CAST(ne.n_kept AS BIGINT) AS n_kept, ne.clean_text "
            "FROM ne JOIN q ON ne.doc_id = q.doc_id"
        ),
        "attrition_report": (
            f"WITH d AS (SELECT doc_id, {_CLEANIFY_SQL} AS text FROM documents), "
            "q AS (SELECT doc_id, "
            "  (CASE WHEN length(text) >= 200 THEN 40 WHEN length(text) >= 50 THEN 25 ELSE 5 END) "
            f" + (CASE WHEN len(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL})) >= 2 THEN 30 "
            f"     WHEN len(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL})) >= 1 THEN 15 ELSE 0 END) "
            "  + (len(list_distinct(string_split(text, ' '))) * 30 // greatest(len(string_split(text, ' ')), 1)) AS quality "
            "  FROM d), "
            "g AS (SELECT d.doc_id, d.text FROM d JOIN q ON d.doc_id = q.doc_id WHERE q.quality >= 70), "
            "r AS (SELECT doc_id, "
            "  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, "
            "  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'), "
            "  '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g'), "
            "  '\\b\\d{3}-\\d{3}-\\d{4}\\b', '[PHONE]', 'g'), "
            "  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g') AS text FROM g), "
            "fst AS (SELECT md5(text) AS m, min(doc_id) AS first_doc_id FROM r GROUP BY 1), "
            "u AS (SELECT r.* FROM r JOIN fst ON md5(r.text) = fst.m AND r.doc_id = fst.first_doc_id), "
            "lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line, "
            "  generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos FROM u), "
            "ranked AS (SELECT doc_id, pos, line, "
            "  row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn FROM lines), "
            "dd AS (SELECT doc_id, count(*) AS n_lines, "
            "  sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept, "
            "  coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY pos), '') AS clean_text "
            "  FROM ranked GROUP BY doc_id), "
            "ne AS (SELECT * FROM dd WHERE clean_text != '') "
            "SELECT 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs, "
            "  CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT) AS n_tokens FROM d "
            "UNION ALL SELECT 'quality_gate', CAST(count(*) AS BIGINT), "
            "  CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT) FROM g "
            "UNION ALL SELECT 'exact_dedup', CAST(count(*) AS BIGINT), "
            "  CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT) FROM u "
            "UNION ALL SELECT 'line_dedup', CAST(count(*) AS BIGINT), "
            "  CAST(coalesce(sum(len(string_split(clean_text, ' '))), 0) AS BIGINT) FROM ne"
        ),
        "bigram_lm_quality": (
            "WITH grams AS (SELECT doc_id, unnest(list_transform("
            "  generate_series(1, greatest(length(text) - 1, 0)), i -> substring(text, i, 2))) AS bg "
            "  FROM documents), "
            "model AS (SELECT bg, count(*) AS bg_count FROM grams GROUP BY bg), "
            "tot AS (SELECT count(*) AS bg_total FROM grams), "
            "scored AS (SELECT g.doc_id, CAST(round(ln(CAST(m.bg_count AS DOUBLE) / "
            "  CAST(t.bg_total AS DOUBLE)) * 1000000.0) AS BIGINT) AS logp_micro "
            "  FROM grams g JOIN model m USING (bg) CROSS JOIN tot t), "
            "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
            "  CAST(sum(logp_micro) AS BIGINT) AS sum_logp_micro FROM scored GROUP BY doc_id) "
            "SELECT CAST(d.doc_id AS BIGINT) AS doc_id, "
            "CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams, "
            "CAST(coalesce(sum_logp_micro, 0) AS BIGINT) AS sum_logp_micro, "
            "CAST(CASE WHEN coalesce(n_bigrams, 0) > 0 THEN sum_logp_micro // n_bigrams ELSE 0 END AS BIGINT) AS avg_logp_micro "
            "FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"
        ),
        "ann_cosine_topk": (
            "WITH scored AS ("
            "  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,"
            "         list_cosine_similarity(q.embedding, n.embedding) AS cosine"
            "  FROM embeddings q JOIN embeddings n ON q.vec_id != n.vec_id"
            "  WHERE q.vec_id < 20"
            "), ranked AS ("
            "  SELECT query_id, neighbor_id,"
            "         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank"
            "  FROM scored)"
            "SELECT CAST(query_id AS BIGINT) AS query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id, "
            "CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 3"
        ),
        "events_hourly_rollup": (
            "SELECT date_trunc('hour', ts) AS hour, event_type, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1, 2"
        ),
        "events_stream_rollup": (
            "SELECT date_trunc('hour', ts) AS window_start, event_type, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents "
            "FROM events GROUP BY 1, 2"
        ),
        "events_asof_join": (
            "WITH clicks AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'), "
            "views AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view') "
            "SELECT CAST(l.event_id AS BIGINT) AS click_id, CAST(l.user_id AS BIGINT) AS user_id, "
            "CAST(r.event_id AS BIGINT) AS view_id, "
            "CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS us_since_view "
            "FROM clicks l ASOF LEFT JOIN views r ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        "events_value_range_join": (
            "WITH bands AS (SELECT i AS band_id, i * 25.0 - 5.0 AS lo, i * 25.0 + 20.0 AS hi "
            "FROM range(0, 21) t(i)) "
            "SELECT CAST(e.event_id AS BIGINT) AS event_id, CAST(b.band_id AS BIGINT) AS band_id "
            "FROM events e JOIN bands b ON e.value >= b.lo AND e.value <= b.hi"
        ),
        "events_sessionize": (
            "WITH o AS (SELECT user_id, event_id, ts, "
            "CASE WHEN LAG(ts) OVER w IS NULL "
            "OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, ts, SUM(brk) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid "
            "FROM o) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, MIN(ts) AS session_start, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS span_us "
            "FROM s GROUP BY user_id, sid"
        ),
        "events_value_percentiles": (
            "SELECT event_type, "
            "CAST(ROUND(quantile_cont(value, 0.5) * 1000000e0) AS BIGINT) AS p50_micro, "
            "CAST(ROUND(quantile_cont(value, 0.9) * 1000000e0) AS BIGINT) AS p90_micro, "
            "CAST(ROUND(quantile_cont(value, 0.99) * 1000000e0) AS BIGINT) AS p99_micro "
            "FROM events GROUP BY event_type"
        ),
        "events_daily_rollup": (
            "SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(ROUND(SUM(value) * 1000000e0) AS BIGINT) AS sum_value_micro, "
            "CAST(GROUPING(event_type, date_trunc('day', ts)) AS BIGINT) AS gid "
            "FROM events GROUP BY ROLLUP (event_type, date_trunc('day', ts))"
        ),
        "events_user_pivot": (
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click, "
            "CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view, "
            "CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase, "
            "CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup, "
            "CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error "
            "FROM events GROUP BY user_id"
        ),
        "kg_degrees": (
            "WITH e0 AS (SELECT user_id % 997 AS src, event_id % 997 AS dst FROM events "
            "WHERE user_id % 997 <> event_id % 997), "
            "ends AS (SELECT src AS vertex, 1 AS o, 0 AS i FROM e0 "
            "UNION ALL SELECT dst AS vertex, 0 AS o, 1 AS i FROM e0) "
            "SELECT CAST(vertex AS BIGINT) AS vertex, CAST(SUM(o) AS BIGINT) AS out_degree, "
            "CAST(SUM(i) AS BIGINT) AS in_degree, CAST(COUNT(*) AS BIGINT) AS degree "
            "FROM ends GROUP BY vertex"
        ),
        "kg_triangle_count": (
            "WITH e0 AS (SELECT user_id % 997 AS src, event_id % 997 AS dst FROM events "
            "WHERE user_id % 997 <> event_id % 997), "
            "und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e0) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles "
            "FROM und e1 JOIN und e2 ON e2.a = e1.b "
            "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b"
        ),
        "kg_pagerank": (
            # 3 unrolled iterations; identical IEEE ops to graphops.pagerank
            # ((1e0-0.85e0)/n matches Python's 1.0-0.85, which is NOT the
            # same double as the literal 0.15)
            "WITH e0 AS (SELECT user_id % 997 AS src, event_id % 997 AS dst FROM events "
            "WHERE user_id % 997 <> event_id % 997), "
            "ed AS (SELECT DISTINCT src, dst FROM e0), "
            "v AS (SELECT DISTINCT vertex FROM "
            "(SELECT src AS vertex FROM ed UNION ALL SELECT dst AS vertex FROM ed)), "
            "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v), "
            "od AS (SELECT src, COUNT(*) AS c FROM ed GROUP BY src), "
            "r0 AS (SELECT vertex, 1e0 / nn.n AS r FROM v CROSS JOIN nn), "
            "s1 AS (SELECT ed.dst AS dv, SUM(r0.r / od.c) AS s FROM ed "
            "JOIN od ON od.src = ed.src JOIN r0 ON r0.vertex = ed.src GROUP BY ed.dst), "
            "r1 AS (SELECT v.vertex, (1e0 - 0.85e0) / nn.n + 0.85e0 * COALESCE(s1.s, 0e0) AS r "
            "FROM v CROSS JOIN nn LEFT JOIN s1 ON s1.dv = v.vertex), "
            "s2 AS (SELECT ed.dst AS dv, SUM(r1.r / od.c) AS s FROM ed "
            "JOIN od ON od.src = ed.src JOIN r1 ON r1.vertex = ed.src GROUP BY ed.dst), "
            "r2 AS (SELECT v.vertex, (1e0 - 0.85e0) / nn.n + 0.85e0 * COALESCE(s2.s, 0e0) AS r "
            "FROM v CROSS JOIN nn LEFT JOIN s2 ON s2.dv = v.vertex), "
            "s3 AS (SELECT ed.dst AS dv, SUM(r2.r / od.c) AS s FROM ed "
            "JOIN od ON od.src = ed.src JOIN r2 ON r2.vertex = ed.src GROUP BY ed.dst), "
            "r3 AS (SELECT v.vertex, (1e0 - 0.85e0) / nn.n + 0.85e0 * COALESCE(s3.s, 0e0) AS r "
            "FROM v CROSS JOIN nn LEFT JOIN s3 ON s3.dv = v.vertex) "
            "SELECT CAST(vertex AS BIGINT) AS vertex, "
            "CAST(ROUND(r * 1000000e0) AS BIGINT) AS rank_micro FROM r3"
        ),
        "kg_hits": (
            # 2 unrolled integer iterations — exact, no floats
            "WITH e0 AS (SELECT user_id % 997 AS src, event_id % 997 AS dst FROM events "
            "WHERE user_id % 997 <> event_id % 997), "
            "ed AS (SELECT DISTINCT src, dst FROM e0), "
            "v AS (SELECT DISTINCT vertex FROM "
            "(SELECT src AS vertex FROM ed UNION ALL SELECT dst AS vertex FROM ed)), "
            "h0 AS (SELECT vertex, CAST(1 AS BIGINT) AS hub FROM v), "
            "a1 AS (SELECT v.vertex, CAST(COALESCE(s.a, 0) AS BIGINT) AS auth FROM v "
            "LEFT JOIN (SELECT ed.dst AS dv, SUM(h0.hub) AS a FROM ed "
            "JOIN h0 ON h0.vertex = ed.src GROUP BY ed.dst) s ON s.dv = v.vertex), "
            "h1 AS (SELECT v.vertex, CAST(COALESCE(s.h, 0) AS BIGINT) AS hub FROM v "
            "LEFT JOIN (SELECT ed.src AS sv, SUM(a1.auth) AS h FROM ed "
            "JOIN a1 ON a1.vertex = ed.dst GROUP BY ed.src) s ON s.sv = v.vertex), "
            "a2 AS (SELECT v.vertex, CAST(COALESCE(s.a, 0) AS BIGINT) AS auth FROM v "
            "LEFT JOIN (SELECT ed.dst AS dv, SUM(h1.hub) AS a FROM ed "
            "JOIN h1 ON h1.vertex = ed.src GROUP BY ed.dst) s ON s.dv = v.vertex), "
            "h2 AS (SELECT v.vertex, CAST(COALESCE(s.h, 0) AS BIGINT) AS hub FROM v "
            "LEFT JOIN (SELECT ed.src AS sv, SUM(a2.auth) AS h FROM ed "
            "JOIN a2 ON a2.vertex = ed.dst GROUP BY ed.src) s ON s.sv = v.vertex) "
            "SELECT CAST(h2.vertex AS BIGINT) AS vertex, h2.hub, a2.auth "
            "FROM h2 JOIN a2 ON a2.vertex = h2.vertex"
        ),
        "kg_personalized_pagerank": (
            # 3 unrolled iterations with the teleport vector; identical
            # IEEE ops to graphops.personalized_pagerank (1e0/3 = the
            # Python double 1.0/3, 1e0-0.85e0 = 1.0-0.85)
            "WITH e0 AS (SELECT user_id % 997 AS src, event_id % 997 AS dst FROM events "
            "WHERE user_id % 997 <> event_id % 997), "
            "ed AS (SELECT DISTINCT src, dst FROM e0), "
            "v AS (SELECT DISTINCT vertex FROM "
            "(SELECT src AS vertex FROM ed UNION ALL SELECT dst AS vertex FROM ed)), "
            "sd AS (SELECT s AS sv, 1e0 / 3 AS t FROM (VALUES (1), (2), (3)) seeds(s)), "
            "od AS (SELECT src, COUNT(*) AS c FROM ed GROUP BY src), "
            "r0 AS (SELECT v.vertex, COALESCE(sd.t, 0e0) AS r FROM v "
            "LEFT JOIN sd ON sd.sv = v.vertex), "
            "s1 AS (SELECT ed.dst AS dv, SUM(r0.r / od.c) AS s FROM ed "
            "JOIN od ON od.src = ed.src JOIN r0 ON r0.vertex = ed.src GROUP BY ed.dst), "
            "r1 AS (SELECT v.vertex, (1e0 - 0.85e0) * COALESCE(sd.t, 0e0) "
            "+ 0.85e0 * COALESCE(s1.s, 0e0) AS r FROM v "
            "LEFT JOIN sd ON sd.sv = v.vertex LEFT JOIN s1 ON s1.dv = v.vertex), "
            "s2 AS (SELECT ed.dst AS dv, SUM(r1.r / od.c) AS s FROM ed "
            "JOIN od ON od.src = ed.src JOIN r1 ON r1.vertex = ed.src GROUP BY ed.dst), "
            "r2 AS (SELECT v.vertex, (1e0 - 0.85e0) * COALESCE(sd.t, 0e0) "
            "+ 0.85e0 * COALESCE(s2.s, 0e0) AS r FROM v "
            "LEFT JOIN sd ON sd.sv = v.vertex LEFT JOIN s2 ON s2.dv = v.vertex), "
            "s3 AS (SELECT ed.dst AS dv, SUM(r2.r / od.c) AS s FROM ed "
            "JOIN od ON od.src = ed.src JOIN r2 ON r2.vertex = ed.src GROUP BY ed.dst), "
            "r3 AS (SELECT v.vertex, (1e0 - 0.85e0) * COALESCE(sd.t, 0e0) "
            "+ 0.85e0 * COALESCE(s3.s, 0e0) AS r FROM v "
            "LEFT JOIN sd ON sd.sv = v.vertex LEFT JOIN s3 ON s3.dv = v.vertex) "
            "SELECT CAST(vertex AS BIGINT) AS vertex, "
            "CAST(ROUND(r * 1000000e0) AS BIGINT) AS rank_micro FROM r3"
        ),
        "kg_label_propagation": (
            "WITH e0 AS (SELECT user_id % 997 AS src, event_id % 997 AS dst FROM events "
            "WHERE user_id % 997 <> event_id % 997), "
            "und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e0), "
            "nb AS (SELECT a AS v, b AS nbr FROM und UNION ALL SELECT b AS v, a AS nbr FROM und), "
            "l0 AS (SELECT DISTINCT v AS vertex, v AS label FROM nb), "
            "l1 AS (SELECT nb.v AS vertex, l0.label AS label FROM nb "
            "JOIN l0 ON l0.vertex = nb.nbr GROUP BY nb.v, l0.label "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY nb.v "
            "ORDER BY COUNT(*) DESC, l0.label ASC) = 1), "
            "l2 AS (SELECT nb.v AS vertex, l1.label AS label FROM nb "
            "JOIN l1 ON l1.vertex = nb.nbr GROUP BY nb.v, l1.label "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY nb.v "
            "ORDER BY COUNT(*) DESC, l1.label ASC) = 1) "
            "SELECT CAST(vertex AS BIGINT) AS vertex, CAST(label AS BIGINT) AS label FROM l2"
        ),
        "kg_khop_reachability": (
            "WITH RECURSIVE e AS (SELECT DISTINCT user_id % 997 AS src, event_id % 997 AS dst "
            "FROM events WHERE user_id % 997 <> event_id % 997), "
            "r AS (SELECT v AS vertex, 0 AS hops FROM (VALUES (1), (2), (3)) s(v) "
            "UNION ALL SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.vertex "
            "WHERE r.hops < 2) "
            "SELECT CAST(vertex AS BIGINT) AS vertex, CAST(MIN(hops) AS BIGINT) AS hops "
            "FROM r GROUP BY vertex"
        ),
        # BGP oracles deliberately DON'T triple-ize: they answer the same
        # question with direct joins over the base tables, so the compiler
        # and the oracle share no formulation to be wrong together in.
        "bgp_star_join": (
            "SELECT 'urn:cust:' || c_custkey AS c, n_name AS nname "
            "FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'EUROPE'"
        ),
        # identical relation to bgp_star_join — cost-based ordering must
        # be answer-invariant
        "bgp_stats_ordered_query": (
            "SELECT 'urn:cust:' || c_custkey AS c, n_name AS nname "
            "FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'EUROPE'"
        ),
        "bgp_optional_filter": (
            "SELECT 'urn:cust:' || c_custkey AS c, n_name AS nname, "
            "CASE WHEN c_acctbal > 9000 THEN 'true' END AS hb "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE n_name IN ('NATION_3', 'NATION_7')"
        ),
        "bgp_same_nation_join": (
            "SELECT 'urn:cust:' || c_custkey AS c, 'urn:supp:' || s_suppkey AS s, "
            "'urn:nation:' || c_nationkey AS n "
            "FROM customer JOIN supplier ON c_nationkey = s_nationkey "
            "WHERE c_mktsegment = 'AUTOMOBILE'"
        ),
        "bgp_path_query": (
            "SELECT 'urn:cust:' || c_custkey AS c, r_name AS rname "
            "FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE c_mktsegment = 'AUTOMOBILE'"
        ),
        "bgp_union_query": (
            "SELECT 'urn:cust:' || c_custkey AS m, c_mktsegment AS seg FROM customer "
            "UNION ALL "
            "SELECT 'urn:supp:' || s_suppkey AS m, NULL AS seg FROM supplier"
        ),
        "bgp_not_exists": (
            "SELECT n_name AS nname FROM nation n "
            "WHERE NOT EXISTS (SELECT 1 FROM customer c "
            "WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000 "
            "AND c.c_mktsegment = 'AUTOMOBILE')"
        ),
        "bgp_aggregate": (
            "SELECT n_name AS nname, c_mktsegment AS seg, "
            "CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_cust "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING') "
            "GROUP BY 1, 2 HAVING COUNT(DISTINCT c_custkey) >= 2"
        ),
        "bgp_bind_query": (
            "SELECT CAST(c_custkey AS BIGINT) AS cid, "
            "lower(replace(n_name, '_', '-')) AS host "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE c_custkey % 10 = 0"
        ),
        # kleene oracle: the 3-level partOf hierarchy has a KNOWN bounded
        # depth, so the closure is enumerated hop-by-hop in plain SQL —
        # no recursive CTE shares the engine's path-doubling formulation
        "bgp_kleene_path": (
            "SELECT 'urn:cust:' || c_custkey AS c, "
            "'urn:nation:' || c_nationkey AS anc FROM customer "
            "UNION ALL "
            "SELECT 'urn:cust:' || c_custkey, 'urn:region:' || n_regionkey "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "UNION ALL "
            "SELECT 'urn:cust:' || c_custkey, 'urn:world:0' FROM customer"
        ),
        "bgp_construct_rewrite": (
            "WITH members AS ("
            "SELECT 'urn:cust:' || c_custkey AS m, 'urn:region:' || n_regionkey AS r "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "UNION ALL "
            "SELECT 'urn:supp:' || s_suppkey, 'urn:region:' || n_regionkey "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey) "
            "SELECT DISTINCT subj, pred, obj FROM ("
            "SELECT m AS subj, 'ex:inRegion' AS pred, r AS obj FROM members "
            "UNION ALL SELECT r, 'ex:hasMember', m FROM members)"
        ),
        # SPARQL front-end oracles: same discipline as the bgp_* rows —
        # direct joins over the base tables, nothing shared with the
        # text parser or the compiler
        "sparql_select": (
            "SELECT 'urn:cust:' || c_custkey AS c, n_name AS nname, "
            "CASE WHEN c_acctbal > 9000 THEN 'true' END AS hb "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE n_name IN ('NATION_2', 'NATION_5')"
        ),
        "sparql_path_agg": (
            "SELECT r_name AS rname, CAST(COUNT(*) AS BIGINT) AS n_cust "
            "FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name"
        ),
        "sparql_ask": (
            "SELECT (COUNT(*) > 0) AS ask FROM customer "
            "WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 9000"
        ),
        "sparql_construct": (
            "WITH sr AS ("
            "SELECT 'urn:supp:' || s_suppkey AS s, "
            "'urn:region:' || n_regionkey AS r "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey) "
            "SELECT DISTINCT subj, pred, obj FROM ("
            "SELECT s AS subj, 'ex:locatedIn' AS pred, r AS obj FROM sr "
            "UNION ALL SELECT r, 'ex:hosts', s FROM sr)"
        ),
        "sparql_union": (
            "SELECT 'urn:cust:' || c_custkey AS e, n_name AS nname "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE starts_with(n_name, 'NATION_1') "
            "UNION ALL "
            "SELECT 'urn:supp:' || s_suppkey AS e, n_name AS nname "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "WHERE starts_with(n_name, 'NATION_1')"
        ),
        "sparql_negated_minus": (
            "SELECT 'urn:nation:' || n_nationkey AS s, n_name AS o "
            "FROM nation"
        ),
        # sparql_update oracle: the post-update store via independent set
        # algebra — base triple-ization minus deleted sets plus inserted
        # sets, never touching the engine's update machinery
        "sparql_update_apply": (
            f"WITH {_TPCH_DELTA_CTE}, "
            "hb AS (SELECT 'urn:cust:' || c_custkey AS c, c_mktsegment AS seg "
            "FROM customer WHERE c_acctbal > 9000) "
            "SELECT subj, pred, obj FROM old_t "
            "WHERE NOT (pred = 'ex:mktsegment' AND subj IN (SELECT c FROM hb)) "
            "AND NOT (subj = 'urn:region:0' AND pred = 'ex:name' AND obj = 'AFRICA') "
            "UNION ALL SELECT c, 'ex:segment', seg FROM hb "
            "UNION ALL SELECT c, 'ex:migrated', 'true' FROM hb "
            "UNION ALL SELECT 'urn:world:0', 'rdf:type', 'ex:World' "
            "UNION ALL SELECT 'urn:world:0', 'ex:name', 'World'"
        ),
        # sparql_base_resolution oracle: the query's relative IRIREFs
        # resolve to /kg/pred/name, /kg/pred/inRegion, /kg/region/0 —
        # the oracle states the post-resolution query directly
        "sparql_base_resolution": (
            "SELECT 'http://ex.org/kg/nation/' || n_nationkey AS n, "
            "n_name AS nname, r_name AS rname "
            "FROM nation JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_regionkey = 0"
        ),
        # sparql_from_dataset oracle: dataset = {default: g:nat, named:
        # g:supp} — only supplier inNation rows (named) join nation
        # names (default); customers / original-default rows are out
        "sparql_from_dataset": (
            "SELECT 'urn:supp:' || s_suppkey AS e, n_name AS nname "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "WHERE starts_with(n_name, 'NATION_1')"
        ),
        "sparql_graph_query": (
            "SELECT 'urn:g:cust' AS g, 'urn:cust:' || c_custkey AS e, "
            "'urn:nation:' || c_nationkey AS n "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE starts_with(n_name, 'NATION_2') "
            "UNION ALL "
            "SELECT 'urn:g:supp' AS g, 'urn:supp:' || s_suppkey AS e, "
            "'urn:nation:' || s_nationkey AS n "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "WHERE starts_with(n_name, 'NATION_2')"
        ),
        "sparql_describe": (
            "SELECT 'urn:nation:' || n_nationkey AS subj, 'rdf:type' AS pred, "
            "'ex:Nation' AS obj FROM nation "
            "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'ex:name', n_name "
            "FROM nation "
            "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'ex:inRegion', "
            "'urn:region:' || n_regionkey FROM nation"
        ),
        # sparql_exists_filter oracle: semi-join as IN-subquery over the
        # base tables — nations owning at least one acctbal>9000 customer
        "sparql_exists_filter": (
            "SELECT 'urn:nation:' || n_nationkey AS n, n_name AS nname "
            "FROM nation WHERE n_nationkey IN "
            "(SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)"
        ),
        # sparql_agg_union oracle: the same union-then-aggregate page in
        # plain SQL; nname is unique per nation so the ORDER BY page is
        # deterministic
        "sparql_agg_union": (
            "SELECT nname, CAST(COUNT(*) AS BIGINT) AS n_ent FROM ("
            "SELECT n_name AS nname FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "UNION ALL SELECT n_name FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey) "
            "GROUP BY nname ORDER BY nname LIMIT 5 OFFSET 2"
        ),
        # sparql_subselect oracle: inner aggregate as a plain derived
        # table joined to the nation names
        "sparql_subselect": (
            "SELECT n_name AS nname, CAST(cnt AS BIGINT) AS n_cust FROM "
            "(SELECT c_nationkey, COUNT(*) AS cnt FROM customer "
            "GROUP BY c_nationkey) "
            "JOIN nation ON c_nationkey = n_nationkey WHERE cnt >= 60"
        ),
        "sparql_proj_expr": (
            "SELECT 'urn:nation:' || n_nationkey AS n, "
            "lower(n_name) AS lname, n_name || '|' || n_name AS twice "
            "FROM nation"
        ),
        # sparql_group_concat oracle: list -> distinct -> sort -> join
        # mirrors the engine's pinned lexicographic GROUP_CONCAT order
        "sparql_group_concat": (
            "SELECT n_name AS nname, "
            "array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|') AS segs, "
            "CAST(COUNT(*) AS BIGINT) AS n_cust "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name"
        ),
        # rdfs_inference oracle: the RDFS consequence set enumerated
        # rule-by-rule in SQL — schema-closure novelties, rdfs7 property
        # inheritance, rdfs2 domain typing, rdfs3 range typing via the
        # inherited property, rdfs9 typing through the closed chain
        "rdfs_inference": (
            "WITH inferred(subj, pred, obj) AS ("
            "SELECT 'ex:Customer', 'rdfs:subClassOf', 'ex:Entity' "
            "UNION ALL SELECT 'ex:Supplier', 'rdfs:subClassOf', 'ex:Entity' "
            "UNION ALL SELECT 'urn:cust:' || c_custkey, 'ex:locatedIn', "
            "'urn:nation:' || c_nationkey FROM customer "
            "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'ex:locatedIn', "
            "'urn:nation:' || s_nationkey FROM supplier "
            "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'ex:locatedIn', "
            "'urn:region:' || n_regionkey FROM nation "
            "UNION ALL SELECT 'urn:cust:' || c_custkey, 'rdf:type', 'ex:Resident' FROM customer "
            "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'rdf:type', 'ex:Resident' FROM supplier "
            "UNION ALL SELECT 'urn:nation:' || n_nationkey, 'rdf:type', 'ex:Place' FROM nation "
            "UNION ALL SELECT 'urn:region:' || r_regionkey, 'rdf:type', 'ex:Place' FROM region "
            "UNION ALL SELECT 'urn:cust:' || c_custkey, 'rdf:type', 'ex:Agent' FROM customer "
            "UNION ALL SELECT 'urn:cust:' || c_custkey, 'rdf:type', 'ex:Entity' FROM customer "
            "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'rdf:type', 'ex:Agent' FROM supplier "
            "UNION ALL SELECT 'urn:supp:' || s_suppkey, 'rdf:type', 'ex:Entity' FROM supplier) "
            "SELECT DISTINCT subj, pred, obj FROM inferred"
        ),
        "kg_statistics": (
            f"WITH {_TPCH_DELTA_CTE} "
            "SELECT pred, CAST(count(*) AS BIGINT) AS n_triples, "
            "CAST(count(DISTINCT subj) AS BIGINT) AS ndv_subj, "
            "CAST(count(DISTINCT obj) AS BIGINT) AS ndv_obj, "
            "CAST((count(*) * 1000000) // count(DISTINCT subj) AS BIGINT) AS fanout_micro "
            "FROM old_t GROUP BY pred"
        ),
        # owl_inference oracle: the OWL consequence set enumerated per
        # axiom — inverse edges, symmetric reverses, transitive shortcut
        "owl_inference": (
            "WITH v(subj, pred, obj) AS ("
            "SELECT 'urn:nation:' || c_nationkey, 'ex:hasResident', "
            "'urn:cust:' || c_custkey FROM customer "
            "UNION ALL SELECT 'urn:nation:' || s_nationkey, 'ex:hasResident', "
            "'urn:supp:' || s_suppkey FROM supplier "
            "UNION ALL SELECT 'urn:region:' || (r_regionkey + 1), 'ex:adjacentTo', "
            "'urn:region:' || r_regionkey FROM region WHERE r_regionkey < 4 "
            "UNION ALL SELECT 'urn:cust:' || c_custkey, 'ex:within', "
            "'urn:region:' || n_regionkey FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey) "
            "SELECT DISTINCT subj, pred, obj FROM v"
        ),
        # owl_sameas oracle: the canonical rewrite computed analytically —
        # every urn:nation:k collapses to urn:n:k (the lexicographic
        # minimum of its 3-member alias class); sameAs edges dropped
        "owl_sameas_canonicalize": (
            f"WITH {_TPCH_DELTA_CTE} "
            "SELECT DISTINCT "
            "CASE WHEN subj LIKE 'urn:nation:%' "
            "THEN 'urn:n:' || substr(subj, 12) ELSE subj END AS subj, "
            "pred, "
            "CASE WHEN obj LIKE 'urn:nation:%' "
            "THEN 'urn:n:' || substr(obj, 12) ELSE obj END AS obj "
            "FROM old_t"
        ),
        # owl_ifp_sameas oracle: group-by-mailbox min/self-join mirrors
        # the engine's star pairing (SQL MIN on VARCHAR = the same
        # lexicographic canonical)
        "owl_ifp_sameas": (
            "WITH e AS (SELECT 'urn:cust:' || c_custkey AS s, "
            "'urn:mail:' || (c_custkey % 100) AS m "
            "FROM customer WHERE c_custkey < 200) "
            "SELECT a.s AS subj, "
            "'http://www.w3.org/2002/07/owl#sameAs' AS pred, g.mn AS obj "
            "FROM e a JOIN (SELECT m, MIN(s) AS mn FROM e GROUP BY m) g "
            "ON a.m = g.m WHERE a.s <> g.mn"
        ),
        # sparql_describe_cbd oracle: the hand-derived bounded closure
        "sparql_describe_cbd": (
            "SELECT * FROM (VALUES "
            "('urn:thing', 'ex:label', 'top'), "
            "('urn:thing', 'ex:part', '_:p1'), "
            "('_:p1', 'ex:name', 'inner'), "
            "('_:p1', 'ex:sub', '_:p2'), "
            "('_:p2', 'ex:name', 'deep'), "
            "('urn:thing', 'ex:ref', 'urn:other')"
            ") AS t(subj, pred, obj)"
        ),
        # sparql_graph_mgmt oracle: the four surviving partitions of the
        # MOVE/ADD/COPY/DROP chain as disjoint UNION ALL branches
        "sparql_graph_mgmt": (
            "WITH c AS (SELECT 'urn:g:' || (c_custkey % 3) AS graph, "
            "'urn:cust:' || c_custkey AS subj, 'ex:seg' AS pred, "
            "c_mktsegment AS obj FROM customer WHERE c_custkey < 300), "
            "n AS (SELECT 'urn:nation:' || n_nationkey AS subj, "
            "'ex:name' AS pred, n_name AS obj FROM nation) "
            "SELECT graph, subj, pred, obj FROM c WHERE graph = 'urn:g:0' "
            "UNION ALL SELECT 'urn:g:2', subj, pred, obj FROM c "
            "WHERE graph = 'urn:g:1' "
            "UNION ALL SELECT 'urn:g:0', subj, pred, obj FROM n "
            "UNION ALL SELECT 'urn:g:1', subj, pred, obj FROM n"
        ),
        # kg_random_walks oracle: the identical md5-seeded walk
        # arithmetic unrolled step by step
        "kg_random_walks": _walks_oracle_sql(),
        # kg_void_description oracle: the same dataset statistics and
        # partitions computed by plain SQL aggregates
        "kg_void_description": _VOID_ORACLE_SQL,
        # fuzzy_name_pairs oracle: same blocking + levenshtein in SQL
        "fuzzy_name_pairs": (
            "WITH n(id, name) AS ("
            "SELECT CAST(c_custkey AS BIGINT), 'Entity Number ' || c_custkey "
            "FROM customer WHERE c_custkey < 150 "
            "UNION ALL SELECT CAST(c_custkey + 100000 AS BIGINT), "
            "'entity number ' || c_custkey || '!' "
            "FROM customer WHERE c_custkey < 150 AND c_custkey % 3 = 0), "
            "b AS (SELECT id, name, lower(substr(name, 1, 2)) AS blk, "
            "length(name) AS len FROM n) "
            "SELECT a.id AS id1, c.id AS id2, a.name AS name1, c.name AS name2, "
            "CAST(levenshtein(lower(a.name), lower(c.name)) AS BIGINT) AS distance "
            "FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id "
            "AND abs(a.len - c.len) <= 1 "
            "WHERE levenshtein(lower(a.name), lower(c.name)) <= 1"
        ),
        # canonicalize_urls oracle: the same rules in DuckDB string SQL —
        # lowercase scheme/host, strip default port, drop fragment and
        # tracking params, sort the query
        "canonicalize_urls": (
            "WITH m AS (SELECT CASE "
            "WHEN c_custkey % 4 = 0 THEN 'HTTP://Example.COM:80/p/' || c_custkey || '?utm_source=x&b=' || (c_custkey % 3) || '&a=1#frag' "
            "WHEN c_custkey % 4 = 1 THEN 'https://Host.org:443/q?z=' || (c_custkey % 5) "
            "WHEN c_custkey % 4 = 2 THEN 'http://plain.net/r/' || (c_custkey % 7) "
            "ELSE 'http://noslash.net:80?gclid=' || c_custkey END AS url "
            "FROM customer WHERE c_custkey < 200), "
            "parts AS (SELECT url, "
            "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme, "
            "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport, "
            "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path, "
            "regexp_extract(url, '\\?([^#]*)', 1) AS rawq FROM m), "
            "norm AS (SELECT url, scheme, "
            "CASE WHEN scheme = 'http' AND hostport LIKE '%:80' "
            "THEN substr(hostport, 1, length(hostport) - 3) "
            "WHEN scheme = 'https' AND hostport LIKE '%:443' "
            "THEN substr(hostport, 1, length(hostport) - 4) "
            "ELSE hostport END AS host, "
            "CASE WHEN path = '' THEN '/' ELSE path END AS path, "
            "coalesce(array_to_string(list_sort(list_filter(string_split(rawq, '&'), "
            "x -> x <> '' AND NOT regexp_matches(x, "
            "'^(utm_[a-z]+|gclid|fbclid|msclkid|ref|ref_src)='))), '&'), '') AS q "
            "FROM parts) "
            "SELECT url, scheme || '://' || host || path || "
            "CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url "
            "FROM norm"
        ),
        # normalize_literals oracle: identical TRY_CAST canonicalization
        "normalize_literals": (
            "SELECT 'urn:cust:' || c_custkey AS subj, "
            "CASE "
            "WHEN c_custkey % 4 = 0 THEN CAST(TRY_CAST(trim('+0' || c_custkey) AS BIGINT) AS VARCHAR) "
            "WHEN c_custkey % 4 = 1 THEN CAST(TRY_CAST(trim(' ' || c_custkey || ' ') AS BIGINT) AS VARCHAR) "
            "WHEN c_custkey % 4 = 2 THEN 'true' "
            "ELSE 'not-a-number' END AS obj_value, "
            "CASE WHEN c_custkey % 4 = 2 "
            "THEN 'http://www.w3.org/2001/XMLSchema#boolean' "
            "ELSE 'http://www.w3.org/2001/XMLSchema#integer' END AS obj_datatype "
            "FROM customer WHERE c_custkey < 120"
        ),
        # ontology_diff oracle: the golden diff of the two fixture
        # snapshots (C1 renamed, C2 dropped, C3 added, C4 reparented)
        "ontology_diff": (
            "SELECT * FROM (VALUES "
            "('changed', 'http://example.org/C1', 'label'), "
            "('removed', 'http://example.org/C2', ''), "
            "('added', 'http://example.org/C3', ''), "
            "('changed', 'http://example.org/C4', 'parent_classes')"
            ") AS t(status, uri, changed)"
        ),
        # kg_kcore oracle: the peeling fixpoint unrolled as 12 CTE rounds
        "kg_kcore": _kcore_oracle_sql(),
        # kg_neighborhood_jaccard oracle: undirected neighbor sets as a
        # UNION CTE, pair via shared neighbor, integer basis points
        "kg_neighborhood_jaccard": (
            "WITH n AS ("
            "SELECT 'urn:cust:' || c_custkey AS node, "
            "'urn:nation:' || c_nationkey AS nbr FROM customer WHERE c_custkey < 50 "
            "UNION SELECT 'urn:cust:' || c_custkey, c_mktsegment "
            "FROM customer WHERE c_custkey < 50 "
            "UNION SELECT 'urn:nation:' || c_nationkey, 'urn:cust:' || c_custkey "
            "FROM customer WHERE c_custkey < 50 "
            "UNION SELECT c_mktsegment, 'urn:cust:' || c_custkey "
            "FROM customer WHERE c_custkey < 50), "
            "deg AS (SELECT node, COUNT(*) AS deg FROM n GROUP BY node), "
            "pairs AS (SELECT a.node AS node1, b.node AS node2, "
            "COUNT(*) AS shared FROM n a JOIN n b "
            "ON a.nbr = b.nbr AND a.node < b.node GROUP BY a.node, b.node) "
            "SELECT node1, node2, CAST(shared AS BIGINT) AS shared, "
            "CAST(d1.deg + d2.deg - shared AS BIGINT) AS union_size, "
            "CAST((10000 * shared) // (d1.deg + d2.deg - shared) AS BIGINT) "
            "AS jaccard_pct "
            "FROM pairs JOIN deg d1 ON node1 = d1.node "
            "JOIN deg d2 ON node2 = d2.node"
        ),
        # owl_haskey_sameas oracle: compound-key self-join — pairs must
        # share BOTH the synthetic mailbox and the nation
        "owl_haskey_sameas": (
            "WITH e AS (SELECT 'urn:cust:' || c_custkey AS x, "
            "'urn:mail:' || (c_custkey % 100) AS m, "
            "'urn:nation:' || c_nationkey AS n "
            "FROM customer WHERE c_custkey < 200) "
            "SELECT b.x AS subj, "
            "'http://www.w3.org/2002/07/owl#sameAs' AS pred, a.x AS obj "
            "FROM e a JOIN e b ON a.m = b.m AND a.n = b.n AND a.x < b.x"
        ),
        # resolve_entities oracle: the group-minimum rewrite in SQL —
        # every member maps to MIN(iri) over its mailbox group (sameAs
        # classes here are exactly the shared-mailbox groups), sameAs
        # and the axiom's own rows pass through the rewrite untouched
        "resolve_entities": (
            "WITH e AS (SELECT 'urn:cust:' || c_custkey AS x, "
            "'urn:mail:' || (c_custkey % 100) AS m, c_mktsegment AS seg, "
            "'urn:nation:' || c_nationkey AS n "
            "FROM customer WHERE c_custkey < 200), "
            "canon AS (SELECT m, MIN(x) AS c FROM e GROUP BY m), "
            "r AS (SELECT canon.c AS cx, e.* FROM e JOIN canon ON e.m = canon.m) "
            "SELECT DISTINCT cx AS subj, 'ex:email' AS pred, m AS obj FROM r "
            "UNION SELECT DISTINCT cx, 'ex:mktsegment', seg FROM r "
            "UNION SELECT DISTINCT cx, 'ex:inNation', n FROM r "
            "UNION SELECT 'ex:email', 'rdf:type', "
            "'http://www.w3.org/2002/07/owl#InverseFunctionalProperty'"
        ),
        # owl_chain_entailment oracle: the chain expanded as explicit
        # 2-hop joins, customers and suppliers separately
        "owl_chain_entailment": (
            "SELECT 'urn:cust:' || c_custkey AS subj, "
            "'ex:basedInRegion' AS pred, "
            "'urn:region:' || n_regionkey AS obj "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "UNION "
            "SELECT 'urn:supp:' || s_suppkey, 'ex:basedInRegion', "
            "'urn:region:' || n_regionkey "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey"
        ),
        # shacl_validation oracle: the violation set enumerated per shape
        # from the base tables (conforming shapes contribute nothing)
        "shacl_validation": (
            "WITH v(shape_id, focus, \"constraint\", value, observed) AS ("
            "SELECT 's-cust-high', 'urn:cust:' || c_custkey, 'minCount', "
            "CAST(NULL AS VARCHAR), CAST(0 AS BIGINT) FROM customer WHERE c_acctbal <= 9000 "
            "UNION ALL SELECT 's-supp-ban', 'urn:supp:' || s_suppkey, 'maxCount', "
            "NULL, CAST(1 AS BIGINT) FROM supplier "
            "UNION ALL SELECT 's-nation-name', 'urn:nation:' || n_nationkey, 'pattern', "
            "n_name, NULL FROM nation WHERE NOT regexp_matches(n_name, '^NATION_1[0-9]$') "
            "UNION ALL SELECT 's-cust-seg', 'urn:cust:' || c_custkey, 'class', "
            "c_mktsegment, NULL FROM customer "
            "UNION ALL SELECT 's-region-name', 'urn:region:' || r_regionkey, 'in', "
            "r_name, NULL FROM region "
            "WHERE r_name NOT IN ('AFRICA', 'AMERICA', 'ASIA', 'EUROPE')) "
            "SELECT shape_id, focus, \"constraint\", value, "
            "CAST(observed AS BIGINT) AS observed FROM v"
        ),
        # incremental-CC oracles: from-scratch CC over the FULL edge set —
        # green pins incremental (and streamed-incremental) maintenance
        # == full rebuild
        "kg_incremental_cc": _FULL_EVENT_CC_SQL,
        "stream_incremental_cc": _FULL_EVENT_CC_SQL,
        "graph_canonical_dedup": _canon_hash_oracle(),
        "graph_canonical_labels": _canon_labels_oracle(),
        "sparql_results_formats": _RESULTS_FORMATS_SQL,
        "shacl_deep_constraints": _SHACL_DEEP_CONSTRAINTS_SQL,
        "shacl_report_rdf": _SHACL_REPORT_SQL,
        "sparql_entailed_query": _SPARQL_ENTAILED_SQL,
        "incremental_entailment": _INCR_ENTAIL_SQL,
        "isomorphic_dup_wl_ties": _WL_TIES_SQL,
        "isomorphic_dup_orbit_relabel": _ORBIT_RELABEL_SQL,
        "sparql_union_join_group": (
            "SELECT 'urn:cust:' || c_custkey AS e, n_name AS nname "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE c_acctbal > 9000 AND starts_with(n_name, 'NATION_1') "
            "UNION ALL "
            "SELECT 'urn:supp:' || s_suppkey AS e, n_name AS nname "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "WHERE starts_with(n_name, 'NATION_1')"
        ),
        "sparql_optional_filter_groups": (
            "SELECT 'urn:cust:' || c_custkey AS c, c_mktsegment AS seg, "
            "CASE WHEN c_acctbal > 9000 AND c_mktsegment = 'AUTOMOBILE' "
            "THEN 'true' END AS hb "
            "FROM customer WHERE c_nationkey <> 0"
        ),
        "sparql_service_join": (
            "SELECT 'urn:cust:' || c_custkey AS c, n_name AS nname, "
            "CASE WHEN c_acctbal > 5000 THEN 'prime' ELSE 'standard' END "
            "AS rating "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE starts_with(n_name, 'NATION_3')"
        ),
        "sparql_path_alternation": (
            "SELECT DISTINCT e, r FROM ("
            "SELECT 'urn:cust:' || c_custkey AS e, "
            "'urn:region:' || n_regionkey AS r "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "UNION ALL SELECT 'urn:supp:' || s_suppkey, "
            "'urn:region:' || n_regionkey "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "UNION ALL SELECT 'urn:nation:' || n_nationkey, "
            "'urn:region:' || n_regionkey FROM nation)"
        ),
        "sparql_graph_kleene_path": (
            "SELECT 'urn:g:geo' AS g, 'urn:cust:' || c_custkey AS a, "
            "'urn:nation:' || c_nationkey AS b FROM customer "
            "UNION ALL SELECT 'urn:g:geo', 'urn:nation:' || n_nationkey, "
            "'urn:region:' || n_regionkey FROM nation "
            "UNION ALL SELECT 'urn:g:geo', 'urn:cust:' || c_custkey, "
            "'urn:region:' || n_regionkey "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "UNION ALL SELECT 'urn:g:decoy', 'urn:region:' || r_regionkey, "
            "'urn:univ:' || r_regionkey FROM region"
        ),
        "incremental_owl_entailment": _INCR_OWL_SQL,
        "canonical_nquads_export": _canon_nquads_oracle(),
        "property_graph_export": _PROPERTY_GRAPH_SQL,
        "stream_canonical_dedup": _STREAM_CANON_SQL,
        "near_dup_clusters": _near_dup_clusters_golden_sql(),
        "owl_restriction_inference": _OWL_RESTRICTION_SQL,
        "rdfstar_parse_annotations": _golden_values_star_parse(),
        "rdfstar_unnest": _golden_values_star_unnest(),
        "rdfstar_reification": _star_reification_sql(),
        "rdfstar_reify_roundtrip": _golden_values_star_parse(),
        "sparql_star_annotations": _golden_values_star_sparql(),
        "turtle_star_annotations": _golden_values_turtle_star(),
        "nquads_star_graphs": _golden_values_nquads_star(),
        "sparql_star_annotation_block": _golden_values_star_annotation(),
        "sparql_term_filters": (
            "SELECT n_name AS nname, "
            "CASE WHEN n_nationkey % 3 = 0 THEN 'en' ELSE 'fr' END AS lg "
            "FROM nation WHERE n_nationkey % 3 < 2"
        ),
        "sparql_term_functions": (
            "WITH t AS (SELECT c_custkey, "
            "CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer) "
            "SELECT CAST(c_custkey AS VARCHAR) AS ck, "
            "CAST(cents AS VARCHAR) AS cents, 'integer' AS dtl "
            "FROM t WHERE cents >= 900000"
        ),
        "sparql_term_parse": _golden_values_term_parse(),
        "sparql_term_materialized": _TERM_MATERIALIZED_SQL,
        "sparql_stats_text_query": (
            "SELECT 'urn:cust:' || c_custkey AS c, n_name AS nname "
            "FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'EUROPE'"
        ),
        "substring_dedup_clean": (
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t "
            "FROM documents), "
            "w AS (SELECT doc_id, i, array_to_string(t[i+1:i+12], ' ') AS gram "
            "FROM toks, unnest(range(len(t) - 11)) AS u(i) WHERE len(t) >= 12), "
            "g AS (SELECT gram, min(doc_id) <> max(doc_id) AS isdup, "
            "min(ROW(doc_id, i)) AS first_key FROM w GROUP BY gram), "
            "removed AS (SELECT w.doc_id, w.i FROM w JOIN g ON w.gram = g.gram "
            "WHERE g.isdup AND ROW(w.doc_id, w.i) <> g.first_key), "
            "cov AS (SELECT DISTINCT doc_id, i + j AS tok_pos "
            "FROM removed, unnest(range(12)) AS r(j)), "
            "tokens AS (SELECT doc_id, j AS tok_pos, t[j+1] AS token "
            "FROM toks, unnest(range(len(t))) AS r(j)), "
            "kept AS (SELECT tk.doc_id, tk.tok_pos, tk.token FROM tokens tk "
            "ANTI JOIN cov c ON tk.doc_id = c.doc_id AND tk.tok_pos = c.tok_pos), "
            "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, "
            "string_agg(token, ' ' ORDER BY tok_pos) AS clean_text "
            "FROM kept GROUP BY doc_id), "
            "tot AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks) "
            "SELECT tot.doc_id, n_tokens, "
            "CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept, "
            "COALESCE(clean_text, '') AS clean_text "
            "FROM tot LEFT JOIN per ON tot.doc_id = per.doc_id"
        ),
        "substring_dup_windows": (
            _SUBSTR_SPAN_CTES +
            "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows, "
            "CAST(min(i) AS BIGINT) AS first_dup_pos "
            "FROM dupw GROUP BY doc_id), "
            "spd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, "
            "CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens "
            "FROM spans GROUP BY doc_id), "
            "tot AS (SELECT doc_id, CAST(len(t) - 11 AS BIGINT) AS n_windows "
            "FROM sized) "
            "SELECT tot.doc_id, n_windows, dup_windows, first_dup_pos, "
            "n_spans, dup_tokens "
            "FROM tot JOIN per ON tot.doc_id = per.doc_id "
            "JOIN spd ON tot.doc_id = spd.doc_id"
        ),
        "substring_dup_spans": (
            _SUBSTR_SPAN_CTES +
            "sel AS (SELECT spans.doc_id, "
            "CAST(s AS BIGINT) AS span_start, CAST(e AS BIGINT) AS span_end, "
            "CAST(nw AS BIGINT) AS n_windows, "
            "array_to_string(t[s+1:e+1], ' ') AS span_text "
            "FROM spans JOIN sized ON sized.doc_id = spans.doc_id) "
            "SELECT * FROM sel"
        ),
        "triples_delta_merge": (
            f"WITH {_TPCH_DELTA_CTE} "
            "SELECT subj, pred, obj FROM old_t "
            "WHERE subj NOT IN (SELECT subj FROM delta) "
            "UNION ALL SELECT subj, pred, obj FROM delta"
        ),
        "snapshot_time_travel": (
            f"WITH {_TPCH_DELTA_CTE}, "
            "merged AS (SELECT subj, pred, obj FROM old_t "
            "WHERE subj NOT IN (SELECT subj FROM delta) "
            "UNION ALL SELECT subj, pred, obj FROM delta), "
            "o AS (SELECT CAST(count(*) AS BIGINT) AS n_triples, "
            "CAST(count(DISTINCT subj) AS BIGINT) AS n_subjects FROM old_t), "
            "m AS (SELECT CAST(count(*) AS BIGINT) AS n_triples, "
            "CAST(count(DISTINCT subj) AS BIGINT) AS n_subjects FROM merged) "
            "SELECT CAST(1 AS BIGINT) AS snap, 'initial' AS operation, "
            "n_triples, n_subjects FROM o "
            "UNION ALL SELECT CAST(2 AS BIGINT), 'merge', n_triples, n_subjects FROM m "
            "UNION ALL SELECT CAST(3 AS BIGINT), 'rollback', n_triples, n_subjects FROM o"
        ),
        "triples_delta_stats": (
            f"WITH {_TPCH_DELTA_CTE}, "
            "delta_keys AS (SELECT DISTINCT subj FROM delta), "
            "old_keys AS (SELECT DISTINCT subj FROM old_t) "
            "SELECT "
            "CAST((SELECT count(*) FROM delta_keys WHERE subj IN (SELECT subj FROM old_keys)) AS BIGINT) AS docs_updated, "
            "CAST((SELECT count(*) FROM delta_keys WHERE subj NOT IN (SELECT subj FROM old_keys)) AS BIGINT) AS docs_added, "
            "CAST((SELECT count(*) FROM old_t WHERE subj IN (SELECT subj FROM delta_keys)) AS BIGINT) AS triples_removed, "
            "CAST((SELECT count(*) FROM delta) AS BIGINT) AS triples_added, "
            "CAST((SELECT count(*) FROM old_t WHERE subj NOT IN (SELECT subj FROM delta_keys)) AS BIGINT) AS triples_carried"
        ),
        "events_user_timeline": (
            "SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS event_id, "
            "CAST(ROW_NUMBER() OVER w AS BIGINT) AS idx, "
            "CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT) AS gap_us, "
            "CAST(ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) * 1000000e0) AS BIGINT) AS run_value_micro "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "tfidf_top_terms": (
            "WITH toks AS (SELECT doc_id, lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) "
            "AS term FROM documents), "
            "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term), "
            "dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
            "nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents), "
            "sc AS (SELECT tf.doc_id, tf.term, tf.tf, "
            "CAST(ROUND(tf.tf * ln(nd.n / dfreq.df) * 1000000e0) AS BIGINT) AS score_micro "
            "FROM tf JOIN dfreq ON dfreq.term = tf.term CROSS JOIN nd), "
            "rk AS (SELECT sc.*, ROW_NUMBER() OVER "
            "(PARTITION BY doc_id ORDER BY score_micro DESC, term ASC) AS rank FROM sc) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, term, CAST(tf AS BIGINT) AS tf, "
            "score_micro, CAST(rank AS BIGINT) AS rank FROM rk WHERE rank <= 3"
        ),
        "media_stats": (
            "SELECT CAST(doc_id AS BIGINT) AS media_id, "
            "CASE WHEN doc_id % 3 = 0 THEN 'image' "
            "     WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS payload_len, "
            "md5(text) AS payload_md5 FROM documents"
        ),
        "video_frame_sample": (
            # ASCII-only docs ⇒ byte slicing == char slicing, so VARCHAR
            # substring mirrors the engine's binary frame chunking
            "WITH vids AS ("
            "  SELECT doc_id, text FROM documents"
            "  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) = length(text)"
            "    AND length(text) >= 64) "
            ", frames AS ("
            "  SELECT doc_id, text, unnest(range(0, CAST(length(text) // 64 AS BIGINT), 2)) AS i"
            "  FROM vids) "
            "SELECT CAST(doc_id AS BIGINT) AS media_id, "
            "CAST(i AS BIGINT) AS frame_idx, "
            "md5(substring(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS frame_md5 "
            "FROM frames"
        ),
        "embedding_near_dup": (
            "SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45"
        ),
        # approximate-path verification: ngram truth is an independent
        # DuckDB implementation; recall summaries pin deterministic counts
        # (LSH planes/minhash are blake2b/xxhash64-seeded — no RNG) with
        # ground-truth components recomputed in SQL where expressible
        "ngram_jaccard_near_dup": (
            _NGRAM_GRAMS_CTE
            + "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, "
            "CAST(n_inter * 10000 // n_union AS BIGINT) AS jac_x10000 "
            "FROM pairs WHERE 2 * n_inter >= n_union"
        ),
        "minhash_lsh_recall": (
            _NGRAM_GRAMS_CTE
            + "SELECT CAST(4125 AS BIGINT) AS n_candidate_pairs, "
            "CAST(count(*) AS BIGINT) AS n_true_pairs, "
            "CAST(count(*) AS BIGINT) AS n_caught, "  # recall pinned at 100%
            "CAST(100 AS BIGINT) AS recall_pct "
            "FROM pairs WHERE 2 * n_inter >= n_union"
        ),
        "ann_lsh_recall": (
            "SELECT CAST(100 AS BIGINT) AS n_queries, "
            "CAST(100 AS BIGINT) AS n_hit_top1, CAST(100 AS BIGINT) AS recall_pct"
        ),
        "ann_ivf_recall": (
            "SELECT CAST(100 AS BIGINT) AS n_queries, CAST(1 AS BIGINT) AS recall_ok"
        ),
        "ann_sq8_recall": (
            "SELECT CAST(100 AS BIGINT) AS n_queries, "
            "CAST(100 AS BIGINT) AS n_hit_top1, CAST(100 AS BIGINT) AS recall_pct"
        ),
        "embedding_near_dup_lsh": (
            "SELECT CAST(100 AS BIGINT) AS n_exact, CAST(100 AS BIGINT) AS n_lsh, "
            "CAST(100 AS BIGINT) AS n_common"
        ),
        # golden pins: independent pure-Python recomputations as VALUES
        "simhash_fingerprints": _simhash_golden_sql(),
        "simhash_near_dup_pairs": _simhash_pairs_golden_sql(),
        "minhash_lsh_near_dup": _minhash_pairs_golden_sql(),
        "stream_first_seen_dedup": _stream_first_seen_oracle_sql(),
        "stream_crawl_sessions": _stream_crawl_sessions_oracle_sql(),
        "ann_lsh_topk": _ann_lsh_golden_sql(),
        "ann_ivf_topk": _ann_ivf_golden_sql(),
        "media_decode_dims": _media_decode_golden_sql(),
        "image_resize_4x4": _image_resize_golden_sql(),
        "media_embed_ann": _media_embed_ann_golden_sql(),
    }
