"""Fixed, explicit schemas for every table in the engine (SURVEY.md §1.3).

The reference's schema system is implicit in value-object constructors
(reference: src/RdfParser.php:111-125); ours is explicit StructTypes in one
module, never inferred.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# input (BASELINE.json:15 input_hint)
# ---------------------------------------------------------------------------
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# stage-2 fused parse output: ONE nested row per input page. The page's
# triples travel as an Arrow list-of-struct column (built at C speed with
# pyarrow inside ONE mapInArrow pass — a single Arrow round-trip per page
# batch, SURVEY.md §4 item 4) and are exploded JVM-side by triples_of()
# (codegen'd generator — far cheaper than shipping one Python-assembled
# row per triple through the boundary).
# ---------------------------------------------------------------------------
TRIPLE_STRUCT = StructType(
    [
        StructField("subj", StringType(), True),
        StructField("pred", StringType(), True),
        StructField("obj_kind", StringType(), True),  # 'iri'|'bnode'|'literal'
        StructField("obj_value", StringType(), True),
        StructField("obj_lang", StringType(), True),
        StructField("obj_datatype", StringType(), True),
        StructField("line_no", IntegerType(), True),
        # per-statement named graph (N-Quads); null = doc default graph
        StructField("graph", StringType(), True),
    ]
)

PARSED = StructType(
    [
        StructField("doc_url", StringType(), False),
        StructField("graph", StringType(), True),  # '_:default' when unnamed
        StructField("format", StringType(), True),
        StructField("error_stage", StringType(), True),
        StructField("error_line", IntegerType(), True),
        StructField("error_message", StringType(), True),
        StructField("resource_count", LongType(), True),
        StructField("n_triples", LongType(), True),
        StructField("prefixes", MapType(StringType(), StringType()), True),
        StructField("triples", ArrayType(TRIPLE_STRUCT), True),
    ]
)

TRIPLES = StructType(
    [
        StructField("doc_url", StringType(), False),
        StructField("graph", StringType(), True),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj_kind", StringType(), False),
        StructField("obj_value", StringType(), False),
        StructField("obj_lang", StringType(), True),
        StructField("obj_datatype", StringType(), True),
        StructField("line_no", IntegerType(), True),
    ]
)

ERRORS = StructType(
    [
        StructField("doc_url", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("line", IntegerType(), True),
        StructField("message", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# extraction outputs (§1.1) — (doc_url, uri) is the primary key everywhere
# ---------------------------------------------------------------------------
CLASSES = StructType(
    [
        StructField("doc_url", StringType(), False),
        StructField("uri", StringType(), False),
        StructField("label", StringType(), True),
        StructField("labels", MapType(StringType(), StringType()), True),
        StructField("description", StringType(), True),
        StructField("descriptions", MapType(StringType(), StringType()), True),
        StructField("parent_classes", ArrayType(StringType()), True),
        StructField("types", ArrayType(StringType()), True),
        StructField("see_also", ArrayType(StringType()), True),
        StructField("is_defined_by", ArrayType(StringType()), True),
        StructField(
            "annotations",
            ArrayType(
                StructType(
                    [
                        StructField("property", StringType(), True),
                        StructField("value", StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

PROPERTY_SHAPE = StructType(
    [
        StructField("path", StringType(), True),
        StructField("label", StringType(), True),
        StructField("datatype", StringType(), True),
        StructField("nodeKind", StringType(), True),
        StructField("minCount", StringType(), True),
        StructField("maxCount", StringType(), True),
        StructField("minLength", StringType(), True),
        StructField("maxLength", StringType(), True),
        StructField("pattern", StringType(), True),
        StructField("class", StringType(), True),
        StructField("message", StringType(), True),
        StructField("name", StringType(), True),
        StructField("description", StringType(), True),
    ]
)

SHAPES = StructType(
    [
        StructField("doc_url", StringType(), False),
        StructField("uri", StringType(), False),
        StructField("label", StringType(), True),
        StructField("description", StringType(), True),
        StructField("target_class", StringType(), True),
        StructField("target_node", StringType(), True),
        StructField("target_subjects_of", StringType(), True),
        StructField("target_objects_of", StringType(), True),
        StructField("target_property", StringType(), True),
        StructField("property_shapes", ArrayType(PROPERTY_SHAPE), True),
        StructField("constraints", MapType(StringType(), StringType()), True),
    ]
)

PREFIXES = StructType(
    [
        StructField("doc_url", StringType(), False),
        StructField("prefix", StringType(), False),
        StructField("namespace", StringType(), False),
    ]
)

# E20: the reference's extractRestrictions is a constant-[] subclass hook
# (reference src/RdfParser.php:214-217) — the table exists for API parity
# and is ALWAYS empty; the schema is what an OWL-restriction subclass
# extractor would emit.
RESTRICTIONS = StructType(
    [
        StructField("doc_url", StringType(), False),
        StructField("uri", StringType(), False),
        StructField("on_property", StringType(), True),
        StructField("restriction_type", StringType(), True),
        StructField("value", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# stages 3-4
# ---------------------------------------------------------------------------
ENTITIES = StructType(
    [
        StructField("surface", StringType(), False),
        StructField("canonical_iri", StringType(), False),
    ]
)

VERTICES = StructType(
    [
        StructField("iri", StringType(), False),
        StructField("component_id", LongType(), True),
        StructField("kind", StringType(), True),
    ]
)

EDGES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("obj_kind", StringType(), True),
        StructField("pred_bucket", IntegerType(), False),
        StructField("doc_url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
    ]
)

PARTITION_METRICS = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("table", StringType(), False),
        StructField("row_count", LongType(), False),
        StructField("triple_count", LongType(), True),
        StructField("min_key", StringType(), True),
        StructField("max_key", StringType(), True),
        StructField("run_id", StringType(), True),
    ]
)
