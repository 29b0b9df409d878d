"""SHACL-core validation over the triples relation.

The reference EXTRACTS shapes (reference src/Extractors/ShapeExtractor.php:33-47
pivots the 13 constraint predicates) but never validates data against
them; at KG-construction scale, validating the constructed graph is the
natural next stage — a data-quality gate with the same role the hygiene
operators play for text. This module implements the core constraint
kinds over the generic (subj, pred, obj) relation:

  sh:minCount / sh:maxCount  — per-(focus, path) cardinality
  sh:class                   — each value must be rdf:type'd with the class
  sh:pattern                 — value must match (Java∩RE2 common dialect,
                               same discipline as webops.pii_redact)
  sh:in                      — value must be in an enumerated list

Scale shape: shapes are ontology-sized → ONE broadcast join tags focus
nodes (subjects typed with a shape's targetClass), then one equi-join on
(subj, pred) = (focus, path) gathers values, one groupBy per
(shape, focus) does the cardinality check, and the value checks are
Column filters plus one anti-join (sh:class) against the type sub-scan.
No Python per row; violation volume is output-sized, never O(N^2).

Shapes input schema (a row per NodeShape × property path — the flat
form the reference's pivoted constraint map denormalizes to):
  shape_id STRING, target_class STRING, path STRING,
  min_count INT?, max_count INT?, node_class STRING?,
  pattern STRING?, value_in ARRAY<STRING>?
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .inference import RDF_TYPE

_SHAPE_COLS = ("shape_id", "target_class", "path", "min_count", "max_count",
               "node_class", "pattern", "value_in")


def shacl_validate(
    triples: DataFrame,
    shapes: DataFrame,
    type_pred: str = RDF_TYPE,
) -> DataFrame:
    """Validate ``triples`` against ``shapes``; returns the violations
    report (shape_id, focus, constraint, value, observed):

    * cardinality rows carry ``observed`` (the value count) and a NULL
      ``value``;
    * value rows (class / pattern / in) carry the offending ``value``
      and a NULL ``observed`` — one row per offending value.

    A conforming graph returns an empty frame (count it for the gate).
    """
    for c in _SHAPE_COLS:
        if c not in shapes.columns:
            raise ValueError(f"shapes frame missing column {c!r}; needs {_SHAPE_COLS}")

    types = triples.filter(F.col("pred") == type_pred).select(
        F.col("subj").alias("t_subj"), F.col("obj").alias("t_class")
    )

    # focus nodes: one broadcast join of the ontology-sized shape table.
    # DISTINCT because focus nodes are a SET — the corpus-level graph is
    # a union of per-document graphs, so (x, type, C) can be asserted by
    # thousands of documents, and a non-distinct focus side would join
    # quadratically against equally-duplicated value triples (measured:
    # 5e8 rows on the 200k-doc bench corpus before the fix)
    focus = (
        types.join(
            F.broadcast(shapes),
            types.t_class == shapes.target_class,
        )
        .select(F.col("t_subj").alias("focus"), *_SHAPE_COLS)
        .distinct()
    )

    # gather values: prune the value side to shape paths first (broadcast
    # semi-join — constant predicates also prune pred_bucket partitions
    # on the materialized edge table), THEN collapse duplicate assertions
    # (RDF graphs are triple SETS; SHACL cardinalities count value NODES,
    # not assertion copies), then one equi-join on (subj, pred)
    rel = (
        triples.select(
            F.col("subj").alias("v_subj"),
            F.col("pred").alias("v_pred"),
            F.col("obj").alias("value"),
        )
        .join(
            F.broadcast(shapes.select(F.col("path").alias("v_pred")).distinct()),
            "v_pred", "left_semi",
        )
        .distinct()
    )
    vals = focus.join(
        rel,
        (F.col("focus") == F.col("v_subj")) & (F.col("path") == F.col("v_pred")),
        "left",
    ).drop("v_subj", "v_pred")

    def report(df: DataFrame, constraint: str, value_col, observed_col) -> DataFrame:
        return df.select(
            "shape_id",
            "focus",
            F.lit(constraint).alias("constraint"),
            value_col.alias("value"),
            observed_col.cast("bigint").alias("observed"),
        )

    # cardinality: one groupBy per (shape row, focus) — path included so a
    # shape_id with several property rows never merges its counts
    counts = vals.groupBy("shape_id", "path", "focus", "min_count", "max_count").agg(
        F.count("value").alias("n")
    )
    null_v = F.lit(None).cast("string")
    null_n = F.lit(None).cast("bigint")
    min_viol = report(
        counts.filter(F.col("min_count").isNotNull() & (F.col("n") < F.col("min_count"))),
        "minCount", null_v, F.col("n"),
    )
    max_viol = report(
        counts.filter(F.col("max_count").isNotNull() & (F.col("n") > F.col("max_count"))),
        "maxCount", null_v, F.col("n"),
    )

    present = vals.filter(F.col("value").isNotNull())

    # sh:class — anti-join against a fresh alias of the type sub-scan
    class_checked = present.filter(F.col("node_class").isNotNull())
    types2 = types.select(F.col("t_subj").alias("c_subj"), F.col("t_class").alias("c_class"))
    class_viol = report(
        class_checked.join(
            types2,
            (class_checked.value == types2.c_subj)
            & (class_checked.node_class == types2.c_class),
            "left_anti",
        ),
        "class", F.col("value"), null_n,
    )

    pattern_viol = report(
        present.filter(
            F.col("pattern").isNotNull()
            & ~F.regexp_like(F.col("value"), F.col("pattern"))
        ),
        "pattern", F.col("value"), null_n,
    )

    in_viol = report(
        present.filter(
            F.col("value_in").isNotNull()
            & ~F.array_contains(F.col("value_in"), F.col("value"))
        ),
        "in", F.col("value"), null_n,
    )

    return (
        min_viol.unionByName(max_viol)
        .unionByName(class_viol)
        .unionByName(pattern_viol)
        .unionByName(in_viol)
    )
