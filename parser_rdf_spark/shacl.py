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
  sh:minLength / sh:maxLength— lexical-form length bounds
  sh:minInclusive / sh:maxInclusive / sh:minExclusive / sh:maxExclusive
                             — numeric range over the lexical form
                               (non-numeric values violate: SHACL
                               requires comparable values)
  sh:datatype / sh:nodeKind  — term-level checks; these need the FULL
                               triples schema (obj_kind/obj_datatype),
                               so they activate only when the input
                               carries those columns and raise when the
                               shapes demand them over a bare (s,p,o)
                               relation (never silently skip a
                               constraint)

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
plus OPTIONAL constraint columns (absent column = constraint unused):
  min_length INT?, max_length INT?, min_inclusive DOUBLE?,
  max_inclusive DOUBLE?, min_exclusive DOUBLE?, max_exclusive DOUBLE?,
  datatype STRING?, node_kind STRING? ('IRI'|'Literal'|'BlankNode' or
  the sh: IRIs)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .inference import RDF_TYPE

_SHAPE_COLS = ("shape_id", "target_class", "path", "min_count", "max_count",
               "node_class", "pattern", "value_in")
# optional constraint columns with the type a missing one is null-cast to
_OPT_SHAPE_COLS = {
    "min_length": "int",
    "max_length": "int",
    "min_inclusive": "double",
    "max_inclusive": "double",
    "min_exclusive": "double",
    "max_exclusive": "double",
    "datatype": "string",
    "node_kind": "string",
}
_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
_SH_NS = "http://www.w3.org/ns/shacl#"


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
    for c, typ in _OPT_SHAPE_COLS.items():
        if c not in shapes.columns:
            shapes = shapes.withColumn(c, F.lit(None).cast(typ))

    # full-schema input (schemas.TRIPLES) enables the term-level checks;
    # a bare (subj, pred, obj) relation carries no term kinds, so shapes
    # that demand sh:datatype / sh:nodeKind over it are an error, never a
    # silent skip
    full = "obj_value" in triples.columns
    if full:
        triples = triples.select(
            "subj", "pred",
            F.col("obj_value").alias("obj"),
            "obj_kind", "obj_lang", "obj_datatype",
        )
    else:
        if shapes.where(
            F.col("datatype").isNotNull() | F.col("node_kind").isNotNull()
        ).take(1):
            raise ValueError(
                "sh:datatype / sh:nodeKind need the full triples schema "
                "(obj_kind / obj_datatype); got a bare (subj, pred, obj) "
                "relation"
            )
        triples = triples.select(
            "subj", "pred", "obj",
            F.lit(None).cast("string").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_datatype"),
        )

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
        .select(F.col("t_subj").alias("focus"), *_SHAPE_COLS,
                *_OPT_SHAPE_COLS)
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
            F.col("obj_kind").alias("value_kind"),
            F.col("obj_lang").alias("value_lang"),
            F.col("obj_datatype").alias("value_dt"),
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

    # sh:minLength / sh:maxLength over the lexical form
    minlen_viol = report(
        present.filter(
            F.col("min_length").isNotNull()
            & (F.length("value") < F.col("min_length"))
        ),
        "minLength", F.col("value"), F.length("value"),
    )
    maxlen_viol = report(
        present.filter(
            F.col("max_length").isNotNull()
            & (F.length("value") > F.col("max_length"))
        ),
        "maxLength", F.col("value"), F.length("value"),
    )

    # numeric range: non-castable lexical forms VIOLATE (SHACL requires
    # the value be comparable with the bound — try_cast null means it
    # is not)
    num = F.col("value").try_cast("double")

    def range_viol(col: str, name: str, bad) -> DataFrame:
        return report(
            present.filter(
                F.col(col).isNotNull() & (num.isNull() | bad(num, F.col(col)))
            ),
            name, F.col("value"), null_n,
        )

    mininc_viol = range_viol("min_inclusive", "minInclusive", lambda v, b: v < b)
    maxinc_viol = range_viol("max_inclusive", "maxInclusive", lambda v, b: v > b)
    minexc_viol = range_viol("min_exclusive", "minExclusive", lambda v, b: v <= b)
    maxexc_viol = range_viol("max_exclusive", "maxExclusive", lambda v, b: v >= b)

    # sh:datatype — the value must be a literal whose datatype equals the
    # shape's (RDF 1.1: a plain, non-language literal IS xsd:string)
    eff_dt = F.when(
        F.col("value_kind") == "literal",
        F.coalesce(
            F.col("value_dt"),
            F.when(F.col("value_lang").isNull(), F.lit(_XSD_STRING)),
        ),
    )
    dt_viol = report(
        present.filter(
            F.col("datatype").isNotNull()
            & (eff_dt.isNull() | (eff_dt != F.col("datatype")))
        ),
        "datatype", F.col("value"), null_n,
    )

    # sh:nodeKind — accept the bare kind names or the sh: IRIs
    nk = F.regexp_replace(F.col("node_kind"), "^" + _SH_NS, "")
    nk_expected = (
        F.when(nk == "IRI", F.lit("iri"))
        .when(nk == "Literal", F.lit("literal"))
        .when(nk == "BlankNode", F.lit("bnode"))
    )
    nodekind_viol = report(
        present.filter(
            F.col("node_kind").isNotNull()
            & (
                nk_expected.isNull()
                | F.col("value_kind").isNull()
                | (F.col("value_kind") != nk_expected)
            )
        ),
        "nodeKind", F.col("value"), null_n,
    )

    return (
        min_viol.unionByName(max_viol)
        .unionByName(class_viol)
        .unionByName(pattern_viol)
        .unionByName(in_viol)
        .unionByName(minlen_viol)
        .unionByName(maxlen_viol)
        .unionByName(mininc_viol)
        .unionByName(maxinc_viol)
        .unionByName(minexc_viol)
        .unionByName(maxexc_viol)
        .unionByName(dt_viol)
        .unionByName(nodekind_viol)
    )


_SH_CONSTRAINT_COMPONENT = {
    "minCount": "MinCountConstraintComponent",
    "maxCount": "MaxCountConstraintComponent",
    "class": "ClassConstraintComponent",
    "pattern": "PatternConstraintComponent",
    "in": "InConstraintComponent",
    "minLength": "MinLengthConstraintComponent",
    "maxLength": "MaxLengthConstraintComponent",
    "minInclusive": "MinInclusiveConstraintComponent",
    "maxInclusive": "MaxInclusiveConstraintComponent",
    "minExclusive": "MinExclusiveConstraintComponent",
    "maxExclusive": "MaxExclusiveConstraintComponent",
    "datatype": "DatatypeConstraintComponent",
    "nodeKind": "NodeKindConstraintComponent",
}
_RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_XSD_BOOL = "http://www.w3.org/2001/XMLSchema#boolean"


def validation_report_triples(
    violations: DataFrame, report_iri: str = "urn:shacl:report"
) -> DataFrame:
    """Render a :func:`shacl_validate` violations frame as the W3C SHACL
    validation-report vocabulary (https://www.w3.org/TR/shacl/#results)
    — full-schema TRIPLES rows, so any of the engine's serializers can
    emit the report as Turtle/N-Triples/JSON-LD/RDF-XML for downstream
    tooling:

    - ``<report> rdf:type sh:ValidationReport``,
      ``sh:conforms "true|false"^^xsd:boolean``;
    - per violation a deterministic result node
      ``<report>/result/<md5(shape,focus,constraint,value,observed)>``
      typed ``sh:ValidationResult`` with ``sh:focusNode``,
      ``sh:sourceShape``, ``sh:sourceConstraintComponent``, and
      ``sh:value`` (value rows only).

    Result nodes are md5-keyed IRIs, not blank nodes — deterministic,
    dedupable, and join-able back to the violation relation. Map-only
    over the violations plus one 1-row global aggregate for
    ``sh:conforms``."""
    rid = F.concat(
        F.lit(report_iri + "/result/"),
        F.md5(F.concat_ws(
            "\x1f", "shape_id", "focus", "constraint",
            F.coalesce(F.col("value"), F.lit("")),
            F.coalesce(F.col("observed").cast("string"), F.lit("")),
        )),
    )

    def row(subj, pred, kind, value, dt=None):
        return F.struct(
            F.lit(report_iri).alias("doc_url"),
            F.lit(None).cast("string").alias("graph"),
            (subj if not isinstance(subj, str) else F.lit(subj)).alias("subj"),
            F.lit(pred).alias("pred"),
            F.lit(kind).alias("obj_kind"),
            (value if not isinstance(value, str) else F.lit(value))
            .cast("string").alias("obj_value"),
            F.lit(None).cast("string").alias("obj_lang"),
            (F.lit(dt) if dt else F.lit(None)).cast("string").alias("obj_datatype"),
            F.lit(1).alias("line_no"),
        )

    per_result = violations.select(
        F.explode(F.array(
            row(rid, _RDF_TYPE_IRI, "iri", _SH_NS + "ValidationResult"),
            row(F.lit(report_iri), _SH_NS + "result", "iri", rid),
            row(rid, _SH_NS + "focusNode", "iri", F.col("focus")),
            row(rid, _SH_NS + "sourceShape", "iri", F.col("shape_id")),
            row(rid, _SH_NS + "sourceConstraintComponent", "iri",
                F.concat(
                    F.lit(_SH_NS),
                    F.element_at(
                        F.create_map(*[
                            x for k, v in _SH_CONSTRAINT_COMPONENT.items()
                            for x in (F.lit(k), F.lit(v))
                        ]),
                        F.col("constraint"),
                    ),
                )),
            row(rid, _SH_NS + "value", "literal", F.col("value")),
        )).alias("t")
    ).select("t.*").where(F.col("obj_value").isNotNull())

    conforms = violations.groupBy().agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        F.explode(F.array(
            row(F.lit(report_iri), _RDF_TYPE_IRI, "iri",
                _SH_NS + "ValidationReport"),
            row(F.lit(report_iri), _SH_NS + "conforms", "literal",
                F.when(F.col("n") > 0, F.lit("false")).otherwise(F.lit("true")),
                dt=_XSD_BOOL),
        )).alias("t")
    ).select("t.*")
    return conforms.unionByName(per_result).distinct()
