"""Stage 2.5: ontology-entity extraction as pure DataFrame queries.

The reference's extractors are per-document object traversals; semantically
they are **joins + aggregations over the triples relation** (SURVEY.md
§2.5 E1-E22), which is where the idiomatic-Spark win is largest: one
``groupBy(doc_url, subj)`` with many filtered aggregates (single shuffle,
partial+final hash agg, whole-stage codegen) replaces the reference's
per-resource loops; RDF-list traversal becomes a short iterative self-join.

Behavioral parity notes (reference file:line in each function):
- class/property/shape *seeds* are type-membership filters (E1-E3)
- blank-node gate + skolemization (E4): classes skolemize any bnode;
  properties additionally drop anonymous-OWL bnodes even when skolemizing
  (src/Extractors/ClassExtractor.php:75-82 vs PropertyExtractor.php:73-78)
- label/comment best-match (E5/E6): per language tag the LAST tagged value
  wins; an untagged literal fills the 'en' slot only when no tagged-'en'
  exists (first untagged wins among untagged) — pinned by the reference's
  XML analogue (src/Extractors/ClassExtractor.php:197-207)
- owl:unionOf domain/range flattening via rdf:first/rdf:rest walk (E12)
- range-from-comment fallback, 6 ordered regexes (E13,
  src/Extractors/PropertyExtractor.php:239-268)
- SHACL shapes with nested property shapes + 13-constraint pivot (E16-E18);
  shapes skipped entirely for rdf/xml docs (E3)

Zero Python UDFs here — everything is Column/SQL expressions, so Catalyst
gets predicate pushdown, column pruning, partial aggregation, and
whole-stage codegen for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .formats import COMMON_PREFIXES

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
SH_NS = "http://www.w3.org/ns/shacl#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDFS_LABEL = RDFS_NS + "label"
RDFS_COMMENT = RDFS_NS + "comment"
RDFS_SUBCLASSOF = RDFS_NS + "subClassOf"
RDFS_SUBPROPERTYOF = RDFS_NS + "subPropertyOf"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"
RDFS_SEEALSO = RDFS_NS + "seeAlso"
RDFS_ISDEFINEDBY = RDFS_NS + "isDefinedBy"
OWL_UNIONOF = OWL_NS + "unionOf"
OWL_INVERSEOF = OWL_NS + "inverseOf"
OWL_FUNCTIONAL = OWL_NS + "FunctionalProperty"

# E1 (reference: src/Extractors/ClassExtractor.php:28-34)
CLASS_TYPE_URIS = [
    RDFS_NS + "Class",
    OWL_NS + "Class",
    RDFS_NS + "Datatype",
    RDFS_NS + "Container",
    RDFS_NS + "Literal",
]

# E2 (reference: src/Extractors/PropertyExtractor.php:32-38)
PROPERTY_TYPE_URIS = [
    RDF_NS + "Property",
    OWL_NS + "DatatypeProperty",
    OWL_NS + "ObjectProperty",
    OWL_NS + "AnnotationProperty",
    OWL_NS + "FunctionalProperty",
]

# E3 (reference: src/Extractors/ShapeExtractor.php:27-30)
SHAPE_TYPE_URIS = [SH_NS + "NodeShape", SH_NS + "PropertyShape"]

# E18 (reference: src/Extractors/ShapeExtractor.php:33-47)
CONSTRAINT_PROPERTIES = [
    "minCount", "maxCount", "minLength", "maxLength", "pattern",
    "datatype", "nodeKind", "class", "node",
    "minInclusive", "maxInclusive", "minExclusive", "maxExclusive",
]

# anonymous-OWL-expression markers (E4)
OWL_EXPR_PREDS = [
    OWL_UNIONOF,
    OWL_NS + "intersectionOf",
    OWL_NS + "complementOf",
    OWL_NS + "oneOf",
    OWL_NS + "onProperty",
]
OWL_RESTRICTION = OWL_NS + "Restriction"

# predicates that are NOT custom annotations (E9) — union of everything
# the extractors consume explicitly
STANDARD_PREDICATES = [
    RDF_TYPE, RDFS_LABEL, RDFS_COMMENT, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF,
    RDFS_DOMAIN, RDFS_RANGE, RDFS_SEEALSO, RDFS_ISDEFINEDBY, OWL_INVERSEOF,
]

_PREFIX_BY_LEN = sorted(COMMON_PREFIXES.items(), key=lambda kv: -len(kv[1]))


def _prefix_sql(var: str) -> str:
    """SQL CASE shortening an IRI with the 11 common prefixes (E9/E15)."""
    whens = " ".join(
        f"WHEN {var} LIKE '{ns}%' THEN concat('{p}:', substring({var}, {len(ns) + 1})) "
        for p, ns in _PREFIX_BY_LEN
    )
    return f"CASE {whens}ELSE {var} END"


_ANNOTATIONS_SQL = (
    "transform(annotations_arr, x -> "
    f"struct({_prefix_sql('x.pred')} AS property, x.obj_value AS value))"
)


def _agg_ordered(name: str, condition: str) -> F.Column:
    return F.expr(
        f"sort_array(collect_list(struct(line_no, obj_value)) FILTER (WHERE {condition}))"
    ).alias(name)


def _vals(col_name: str) -> F.Column:
    """ordered struct array → distinct values, first-occurrence order."""
    return F.array_distinct(F.expr(f"transform({col_name}, x -> x.obj_value)"))


_LABELS_MAP_EXPR = """
map_concat(
  aggregate(
    filter({arr}, x -> x.obj_lang is not null),
    cast(map() as map<string,string>),
    (acc, x) -> map_concat(map_filter(acc, (k, v) -> k != x.obj_lang), map(x.obj_lang, x.obj_value))
  ),
  CASE WHEN size(filter({arr}, x -> x.obj_lang is null)) > 0
        AND NOT array_contains(transform(filter({arr}, x -> x.obj_lang is not null), x -> x.obj_lang), 'en')
       THEN map('en', filter({arr}, x -> x.obj_lang is null)[0].obj_value)
       ELSE cast(map() as map<string,string>) END
)
"""


def _lang_map(arr_col: str) -> F.Column:
    return F.expr(_LABELS_MAP_EXPR.format(arr=arr_col))


def _best_match(map_col: str) -> F.Column:
    """E5 best-match: English preferred, else the first map value."""
    return F.coalesce(
        F.expr(f"{map_col}['en']"),
        F.expr(f"try_element_at(map_values({map_col}), 1)"),
    )


def resource_aggregate(triples: DataFrame, restrict_to_seed_types: bool = True) -> DataFrame:
    """The single-shuffle per-resource rollup every extractor reads from.

    All value arrays are (line_no)-sorted so the reference's 'doc order' /
    'first value' semantics survive the shuffle.

    ``restrict_to_seed_types`` (default) pre-filters to subjects carrying
    at least one extractor seed ``rdf:type`` (class / property / shape
    URIs) via a semi-join BEFORE the wide aggregation. Lossless: every
    consumer applies :func:`_seed` afterwards, which discards exactly the
    rows the semi-join skips (nested property-shape bnodes are read from
    ``triples`` directly in :func:`extract_shapes`, not from this rollup).
    At web scale this is the difference between aggregating the whole
    corpus's subjects and aggregating only ontology subjects — on
    instance-heavy pages the wide collect_list shuffle shrinks by orders
    of magnitude. The semi-join keys on (doc_url, subj), the same key as
    the aggregation, so the exchange is shared, and AQE broadcasts the
    (tiny) typed-subject side when it fits.
    """
    if restrict_to_seed_types:
        seeds = "', '".join(CLASS_TYPE_URIS + PROPERTY_TYPE_URIS + SHAPE_TYPE_URIS)
        interesting = (
            triples.filter(
                (F.col("pred") == RDF_TYPE) & F.expr(f"obj_value IN ('{seeds}')")
            )
            .select("doc_url", "subj")
            .distinct()
        )
        triples = triples.join(interesting, ["doc_url", "subj"], "left_semi")
    owl_preds = "', '".join(OWL_EXPR_PREDS)
    std = "', '".join(STANDARD_PREDICATES)
    return triples.groupBy("doc_url", "subj").agg(
        _agg_ordered("types_arr", f"pred = '{RDF_TYPE}'"),
        F.expr(
            "sort_array(collect_list(struct(line_no, obj_lang, obj_value)) "
            f"FILTER (WHERE pred = '{RDFS_LABEL}' AND obj_kind = 'literal'))"
        ).alias("label_arr"),
        F.expr(
            "sort_array(collect_list(struct(line_no, obj_lang, obj_value)) "
            f"FILTER (WHERE pred = '{RDFS_COMMENT}' AND obj_kind = 'literal'))"
        ).alias("comment_arr"),
        _agg_ordered("parents_arr", f"pred = '{RDFS_SUBCLASSOF}'"),
        _agg_ordered("parent_props_arr", f"pred = '{RDFS_SUBPROPERTYOF}'"),
        _agg_ordered("inverse_arr", f"pred = '{OWL_INVERSEOF}'"),
        _agg_ordered("see_also_arr", f"pred = '{RDFS_SEEALSO}' AND obj_kind = 'iri'"),
        _agg_ordered("is_defined_by_arr", f"pred = '{RDFS_ISDEFINEDBY}' AND obj_kind = 'iri'"),
        F.expr(
            "sort_array(collect_list(struct(line_no, pred, obj_value)) "
            f"FILTER (WHERE pred NOT IN ('{std}') AND pred NOT LIKE '{SH_NS}%'))"
        ).alias("annotations_arr"),
        F.expr(
            "sort_array(collect_list(struct(line_no, obj_kind, obj_value)) "
            f"FILTER (WHERE pred = '{RDFS_DOMAIN}'))"
        ).alias("domain_arr"),
        F.expr(
            "sort_array(collect_list(struct(line_no, obj_kind, obj_value)) "
            f"FILTER (WHERE pred = '{RDFS_RANGE}'))"
        ).alias("range_arr"),
        F.expr(
            f"count_if(pred IN ('{owl_preds}') OR "
            f"(pred = '{RDF_TYPE}' AND obj_value = '{OWL_RESTRICTION}')) > 0"
        ).alias("is_anon_owl"),
    )


def _with_common_columns(res: DataFrame) -> DataFrame:
    return (
        res.withColumn("labels", _lang_map("label_arr"))
        .withColumn("descriptions", _lang_map("comment_arr"))
        .withColumn("label", _best_match("labels"))
        .withColumn("description", _best_match("descriptions"))
        .withColumn("types", _vals("types_arr"))
        .withColumn("annotations", F.expr(_ANNOTATIONS_SQL))
    )


def _seed(res: DataFrame, type_uris: list[str]) -> DataFrame:
    return res.filter(
        F.arrays_overlap(_vals("types_arr"), F.array(*[F.lit(u) for u in type_uris]))
    )


def extract_classes(
    triples: DataFrame, include_skolemized: bool = False, res: DataFrame | None = None
) -> DataFrame:
    """E1 + E4-E9 (reference: src/Extractors/ClassExtractor.php:62-124).

    Blank-node gate (reference :75-82): bnodes dropped unless skolemizing
    (→ ``urn:bnode:`` + scoped label, no anon-OWL check on the bnode arm);
    *named* anonymous OWL expressions dropped.

    Pass a shared (persisted) ``res = resource_aggregate(triples)`` when
    running several extractors over the same corpus — one shuffle instead
    of one per extractor.
    """
    if res is None:
        res = resource_aggregate(triples)
    res = _with_common_columns(_seed(res, CLASS_TYPE_URIS))
    is_bnode = F.col("subj").startswith("_:")
    if include_skolemized:
        res = res.filter(is_bnode | ~F.col("is_anon_owl"))
        res = res.withColumn(
            "uri",
            F.when(is_bnode, F.concat(F.lit("urn:bnode:"), F.col("subj"))).otherwise(F.col("subj")),
        )
    else:
        res = res.filter(~is_bnode & ~F.col("is_anon_owl")).withColumn("uri", F.col("subj"))
    return res.select(
        "doc_url", "uri", "label", "labels", "description", "descriptions",
        _vals("parents_arr").alias("parent_classes"),
        "types",
        _vals("see_also_arr").alias("see_also"),
        _vals("is_defined_by_arr").alias("is_defined_by"),
        "annotations",
    )


def resolve_rdf_lists(triples: DataFrame, heads: DataFrame, max_iters: int = 32) -> DataFrame:
    """E12 helper: walk rdf:first/rdf:rest chains from ``heads(doc_url,
    head)`` → (doc_url, head, pos, member, member_kind).

    rdf-list spines are DOC-LOCAL (a chain never crosses documents), so
    the whole walk collapses to ONE aggregation + ONE join: build per-doc
    lookup maps (node → first-value, node → next-node) and walk every
    chain inside a single SQL ``aggregate`` over a bounded ``sequence`` —
    no driver-side iteration, no per-round jobs, no lineage growth. The
    previous implementation self-joined once per list POSITION (up to 32
    Spark jobs plus an isEmpty probe each round); this runs exactly one.

    Walk semantics match the iterative version: a node without rdf:first
    ends the chain; the chain continues only through a bnode rdf:rest
    that isn't rdf:nil. The step bound per head is ``least(spine size,
    max_iters)`` — the spine size ends cycles (at most |spine| rows, no
    loop), and ``max_iters`` (same contract as the old per-position
    self-join version: at most 32 list positions per chain) stops a
    hostile list-heavy document from costing O(heads × spine) no-op
    lambda steps in one task (ADVICE r2 item 4: H short chains over an
    n-node doc spine used to cost O(H·n); now O(H·min(n, max_iters))).
    On malformed spines with DUPLICATE rdf:first/rdf:rest per node the
    lowest line number wins deterministically.
    """
    firsts = (
        triples.filter(F.col("pred") == RDF_FIRST)
        .groupBy("doc_url", "subj")
        .agg(
            F.expr(
                "min_by(struct(obj_value AS member, obj_kind AS member_kind), line_no)"
            ).alias("val")
        )
    )
    rests = (
        triples.filter(
            (F.col("pred") == RDF_REST)
            & (F.col("obj_kind") == "bnode")
            & (F.col("obj_value") != RDF_NIL)
        )
        .groupBy("doc_url", "subj")
        .agg(F.expr("min_by(obj_value, line_no)").alias("nxt"))
    )
    spine = (
        firsts.join(rests, ["doc_url", "subj"], "left")
        .groupBy("doc_url")
        .agg(
            F.expr("map_from_entries(collect_list(struct(subj, val)))").alias("fmap"),
            F.expr(
                "map_from_entries(collect_list(struct(subj, nxt)) FILTER (WHERE nxt IS NOT NULL))"
            ).alias("rmap"),
            F.count(F.lit(1)).cast("int").alias("n_nodes"),
        )
    )
    walk = F.expr(
        f"""
        aggregate(
          sequence(1, greatest(least(n_nodes, {int(max_iters)}), 1)),
          struct(
            cast(array() as array<struct<pos:int, member:string, member_kind:string>>) AS out,
            head AS node
          ),
          (acc, i) -> CASE
            WHEN acc.node IS NULL OR try_element_at(fmap, acc.node) IS NULL THEN acc
            ELSE struct(
              concat(acc.out, array(struct(
                cast(i - 1 AS int) AS pos,
                try_element_at(fmap, acc.node).member AS member,
                try_element_at(fmap, acc.node).member_kind AS member_kind))) AS out,
              try_element_at(rmap, acc.node) AS node)
          END,
          acc -> acc.out
        )
        """
    )
    return (
        heads.join(spine, "doc_url", "inner")
        .select("doc_url", "head", F.explode(walk).alias("m"))
        .select("doc_url", "head", "m.pos", "m.member", "m.member_kind")
    )


def _resolve_class_expressions(
    triples: DataFrame, res: DataFrame, specs: list[tuple[str, str]]
) -> DataFrame:
    """E12: named IRI values kept; bnode values resolved through
    owl:unionOf → rdf-list members (bnode members dropped); dedupe
    preserving order: per original value position, the named value or its
    union members in list order (reference:
    src/Extractors/PropertyExtractor.php:164-218).

    ``specs = [(arr_col, role), …]`` are resolved in ONE pass — the
    iterative rdf-list walk (the expensive part) runs once for every
    array column instead of once per column. Output is long-form:
    (doc_url, subj, role, members).
    """
    parts = [
        res.select(
            "doc_url", "subj", F.lit(role).alias("role"),
            F.posexplode(arr_col).alias("pos", "entry"),
        )
        for arr_col, role in specs
    ]
    exploded = parts[0]
    for p in parts[1:]:
        exploded = exploded.unionByName(p)
    exploded = exploded.select(
        "doc_url", "subj", "role", "pos",
        F.col("entry.obj_kind").alias("val_kind"),
        F.col("entry.obj_value").alias("val"),
    )

    named = exploded.filter(F.col("val_kind") == "iri").select(
        "doc_url", "subj", "role", "pos",
        F.lit(0).alias("sub_pos"), F.col("val").alias("member"),
    )

    bnode_vals = exploded.filter(F.col("val_kind") == "bnode")
    union_heads = (
        bnode_vals.join(
            triples.filter((F.col("pred") == OWL_UNIONOF) & (F.col("obj_kind") == "bnode")).select(
                F.col("doc_url").alias("t_doc"),
                F.col("subj").alias("t_subj"),
                F.col("obj_value").alias("head"),
            ),
            (bnode_vals.doc_url == F.col("t_doc")) & (bnode_vals.val == F.col("t_subj")),
            "inner",
        )
        .select("doc_url", "subj", "role", "pos", "head")
    )
    members = resolve_rdf_lists(triples, union_heads.select("doc_url", "head").distinct())
    union_members = (
        union_heads.join(
            members.withColumnRenamed("pos", "list_pos"), ["doc_url", "head"], "inner"
        )
        .filter(F.col("member_kind") == "iri")
        .select("doc_url", "subj", "role", "pos", (F.col("list_pos") + 1).alias("sub_pos"), "member")
    )

    return (
        named.unionByName(union_members)
        .groupBy("doc_url", "subj", "role")
        .agg(
            F.expr(
                "array_distinct(transform(sort_array(collect_list(struct(pos, sub_pos, member))), x -> x.member))"
            ).alias("members")
        )
    )


def _range_comment_case(var: str) -> str:
    """E13: the 6 ordered patterns, applied to a lowercased+trimmed comment
    (reference: src/Extractors/PropertyExtractor.php:239-268)."""
    return f"""
    CASE
      WHEN {var} rlike 'range.*(plain literal|rdf literal|language-tagged|lang.*string)'
        THEN 'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString'
      WHEN {var} rlike 'range.*rdfs:literal' OR {var} rlike 'range.*is.*literal'
        THEN 'http://www.w3.org/2001/XMLSchema#string'
      WHEN {var} rlike 'range.*(xsd:string|string)'
        THEN 'http://www.w3.org/2001/XMLSchema#string'
      WHEN {var} rlike 'range.*(xsd:datetime|datetime)'
        THEN 'http://www.w3.org/2001/XMLSchema#dateTime'
      WHEN {var} rlike 'range.*(xsd:boolean|boolean)'
        THEN 'http://www.w3.org/2001/XMLSchema#boolean'
      WHEN {var} rlike 'range.*(xsd:integer|integer)'
        THEN 'http://www.w3.org/2001/XMLSchema#integer'
      ELSE NULL
    END
    """


def _range_from_comments(comment_arr_col: str) -> F.Column:
    case = _range_comment_case("lower(trim(e.obj_value))")
    return F.expr(
        f"array_distinct(filter(transform({comment_arr_col}, e -> {case}), v -> v is not null))"
    )


_PROPERTY_TYPE_FOLD = """
aggregate(types, '', (acc, t) ->
  CASE WHEN acc != '' THEN acc
       WHEN t like '%ObjectProperty%' THEN 'object'
       WHEN t like '%DatatypeProperty%' THEN 'datatype'
       WHEN t like '%AnnotationProperty%' THEN 'annotation'
       ELSE '' END)
"""


def extract_properties(
    triples: DataFrame, include_skolemized: bool = False, res: DataFrame | None = None
) -> DataFrame:
    """E2 + E10-E13 (reference: src/Extractors/PropertyExtractor.php:60-115).

    Blank-node gate (reference :73-78): bnodes dropped unless skolemizing
    AND not an anonymous OWL expression; named anon-OWL dropped.
    """
    if res is None:
        res = resource_aggregate(triples)
    res = _with_common_columns(_seed(res, PROPERTY_TYPE_URIS))
    is_bnode = F.col("subj").startswith("_:")
    res = res.filter(~F.col("is_anon_owl"))
    if include_skolemized:
        res = res.withColumn(
            "uri",
            F.when(is_bnode, F.concat(F.lit("urn:bnode:"), F.col("subj"))).otherwise(F.col("subj")),
        )
    else:
        res = res.filter(~is_bnode).withColumn("uri", F.col("subj"))

    # The class-expression walk only ever reads owl:unionOf and
    # rdf:first/rdf:rest triples. Filter them out ONCE (predicate pushdown
    # makes this a cheap scan; the result is tiny — ontology list spine
    # only) and checkpoint, so the two resolutions and every iterative
    # round join against the small frame instead of re-scanning the full
    # triples relation.
    aux = triples.filter(
        F.col("pred").isin(RDF_FIRST, RDF_REST, OWL_UNIONOF)
    ).localCheckpoint(eager=True)
    resolved = _resolve_class_expressions(
        aux, res, [("domain_arr", "domain"), ("range_arr", "range")]
    )
    domains = resolved.filter(F.col("role") == "domain").select(
        "doc_url", "subj", F.col("members").alias("domain")
    )
    ranges = resolved.filter(F.col("role") == "range").select(
        "doc_url", "subj", F.col("members").alias("range_formal")
    )

    out = (
        res.join(domains, ["doc_url", "subj"], "left")
        .join(ranges, ["doc_url", "subj"], "left")
        .withColumn("domain", F.coalesce(F.col("domain"), F.array().cast("array<string>")))
        .withColumn("range_formal", F.coalesce(F.col("range_formal"), F.array().cast("array<string>")))
        .withColumn(
            "range",
            F.when(F.size("range_formal") > 0, F.col("range_formal")).otherwise(
                _range_from_comments("comment_arr")
            ),
        )
    )

    property_type = F.expr(
        f"CASE WHEN ({_PROPERTY_TYPE_FOLD}) = '' THEN 'datatype' ELSE ({_PROPERTY_TYPE_FOLD}) END"
    )

    return out.select(
        "doc_url", "uri", "label", "labels", "description", "descriptions",
        property_type.alias("property_type"),
        "domain",
        "range",
        _vals("parent_props_arr").alias("parent_properties"),
        _vals("inverse_arr").alias("inverse_of"),
        F.array_contains("types", OWL_FUNCTIONAL).alias("is_functional"),
        "types",
        _vals("see_also_arr").alias("see_also"),
        _vals("is_defined_by_arr").alias("is_defined_by"),
        "annotations",
    )


def extract_shapes(
    triples: DataFrame, docmeta: DataFrame | None = None, res: DataFrame | None = None
) -> DataFrame:
    """E3 + E16-E18 (reference: src/Extractors/ShapeExtractor.php:54-181).

    When ``docmeta`` (parse.docmeta_of) is given, rdf/xml documents are
    excluded via a broadcast anti-join (the reference returns [] for
    rdf/xml, reference :56-58).
    """
    if res is None:
        res = resource_aggregate(triples)
    res = _seed(res, SHAPE_TYPE_URIS).filter(
        ~F.col("subj").startswith("_:")
    )
    if docmeta is not None:
        rdfxml_docs = docmeta.filter(F.col("format") == "rdf/xml").select("doc_url")
        res = res.join(F.broadcast(rdfxml_docs), "doc_url", "left_anti")
    res = _with_common_columns(res)

    # one pivot over sh:* triples serves the shape row AND nested property
    # shapes (both are keyed (doc_url, subj))
    sh_triples = triples.filter(F.col("pred").startswith(SH_NS))
    pivot_keys = (
        ["targetClass", "targetNode", "targetSubjectsOf", "targetObjectsOf", "path",
         "message", "name", "description"]
        + CONSTRAINT_PROPERTIES
    )
    pivots = sh_triples.groupBy("doc_url", "subj").agg(
        *[
            F.expr(f"min_by(obj_value, line_no) FILTER (WHERE pred = '{SH_NS}{k}')").alias(f"sh_{k}")
            for k in pivot_keys
        ],
        F.expr(
            f"sort_array(collect_list(struct(line_no, obj_value)) FILTER (WHERE pred = '{SH_NS}property'))"
        ).alias("property_refs"),
    )

    shapes = res.join(pivots, ["doc_url", "subj"], "left")

    constraints_map = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in CONSTRAINT_PROPERTIES]),
            F.array(*[F.col(f"sh_{k}") for k in CONSTRAINT_PROPERTIES]),
        ),
        lambda _, v: v.isNotNull(),
    )

    # E17: follow sh:property refs to nested (usually bnode) property shapes
    refs = (
        shapes.select("doc_url", "subj", F.posexplode("property_refs").alias("ref_pos", "ref"))
        .select("doc_url", "subj", "ref_pos", F.col("ref.obj_value").alias("ps_node"))
    )

    ps_fields = ["path", "datatype", "nodeKind", "minCount", "maxCount", "minLength",
                 "maxLength", "pattern", "class", "message", "name", "description"]
    ps_labels = (
        triples.filter((F.col("pred") == RDFS_LABEL) & (F.col("obj_kind") == "literal"))
        .groupBy("doc_url", "subj")
        .agg(
            F.expr("sort_array(collect_list(struct(line_no, obj_lang, obj_value)))").alias("label_arr")
        )
        .select(
            F.col("doc_url").alias("l_doc"), F.col("subj").alias("l_subj"),
            _best_match_from_arr("label_arr").alias("ps_label"),
        )
    )

    ps = (
        refs.join(
            pivots.select(
                F.col("doc_url").alias("p_doc"), F.col("subj").alias("p_subj"),
                *[F.col(f"sh_{k}").alias(f"ps_{k}") for k in ps_fields],
            ),
            (refs.doc_url == F.col("p_doc")) & (refs.ps_node == F.col("p_subj")),
            "left",
        )
        .drop("p_doc", "p_subj")
        .join(
            ps_labels,
            (F.col("doc_url") == F.col("l_doc")) & (F.col("ps_node") == F.col("l_subj")),
            "left",
        )
        .drop("l_doc", "l_subj")
        .filter(F.col("ps_path").isNotNull())  # drop shapes without sh:path (:133)
    )

    ps_struct = F.struct(
        F.col("ps_path").alias("path"),
        F.col("ps_label").alias("label"),
        F.col("ps_datatype").alias("datatype"),
        F.col("ps_nodeKind").alias("nodeKind"),
        F.col("ps_minCount").alias("minCount"),
        F.col("ps_maxCount").alias("maxCount"),
        F.col("ps_minLength").alias("minLength"),
        F.col("ps_maxLength").alias("maxLength"),
        F.col("ps_pattern").alias("pattern"),
        F.col("ps_class").alias("class"),
        F.col("ps_message").alias("message"),
        F.col("ps_name").alias("name"),
        F.col("ps_description").alias("description"),
    )
    ps_agg = (
        ps.select("doc_url", "subj", "ref_pos", ps_struct.alias("s"))
        .groupBy("doc_url", "subj")
        .agg(F.expr("transform(sort_array(collect_list(struct(ref_pos, s))), x -> x.s)").alias("property_shapes"))
    )

    empty_ps = F.array().cast(
        "array<struct<path:string,label:string,datatype:string,nodeKind:string,"
        "minCount:string,maxCount:string,minLength:string,maxLength:string,"
        "pattern:string,class:string,message:string,name:string,description:string>>"
    )

    return (
        shapes.join(ps_agg, ["doc_url", "subj"], "left")
        .select(
            "doc_url",
            F.col("subj").alias("uri"),
            "label",
            "description",
            F.col("sh_targetClass").alias("target_class"),
            F.col("sh_targetNode").alias("target_node"),
            F.col("sh_targetSubjectsOf").alias("target_subjects_of"),
            F.col("sh_targetObjectsOf").alias("target_objects_of"),
            F.col("sh_path").alias("target_property"),
            F.coalesce(F.col("property_shapes"), empty_ps).alias("property_shapes"),
            constraints_map.alias("constraints"),
        )
    )


def _best_match_from_arr(arr_col: str) -> F.Column:
    m = _LABELS_MAP_EXPR.format(arr=arr_col)
    return F.coalesce(
        F.expr(f"({m})['en']"),
        F.expr(f"try_element_at(map_values({m}), 1)"),
    )


def resource_counts(triples: DataFrame) -> DataFrame:
    """P6: per-doc distinct resource terms (subjects ∪ non-literal objects)
    — also computed inside the fused parse stage; this relational version
    exists for the DuckDB-oracle contract."""
    terms = triples.select(
        "doc_url",
        F.explode(
            F.array(
                F.col("subj"),
                F.when(F.col("obj_kind") != "literal", F.col("obj_value")),
            )
        ).alias("term"),
    ).filter(F.col("term").isNotNull())
    return terms.groupBy("doc_url").agg(
        F.countDistinct("term").alias("resource_count")
    )


def extract_restrictions(triples) -> "DataFrame":
    """E20: typed, ALWAYS-empty restrictions table.

    The reference's ``extractRestrictions`` is a constant-``[]`` hook for
    subclasses (reference src/RdfParser.php:214-217) — parity means the
    surface exists and is empty, not that anything is extracted. An empty
    DataFrame costs no scan and no shuffle.
    """
    from .schemas import RESTRICTIONS

    return triples.sparkSession.createDataFrame([], RESTRICTIONS)


def extract_all(
    triples, docmeta=None, include_skolemized: bool = False
) -> dict[str, "DataFrame"]:
    """Run all extractors off ONE persisted resource aggregate —
    a single groupBy shuffle feeds classes, properties, and shapes
    (restrictions is the E20 constant-empty parity surface).
    Caller owns unpersisting ``result['_res']``."""
    res = resource_aggregate(triples).persist()
    return {
        "classes": extract_classes(triples, include_skolemized, res=res),
        "properties": extract_properties(triples, include_skolemized, res=res),
        "shapes": extract_shapes(triples, docmeta=docmeta, res=res),
        "restrictions": extract_restrictions(triples),
        "_res": res,
    }
