"""SHACL-core validation semantics (shacl.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from parser_rdf_spark.shacl import shacl_validate

TRIPLES = [
    ("alice", "type", "Person"),
    ("bob", "type", "Person"),
    ("acme", "type", "Org"),
    ("alice", "worksFor", "acme"),
    ("alice", "email", "alice@example.org"),
    ("bob", "worksFor", "ghost-corp"),       # ghost-corp has no type
    ("bob", "worksFor", "acme"),             # bob works twice -> maxCount 1
    ("bob", "email", "not-an-email"),
    ("alice", "status", "active"),
    ("bob", "status", "retired"),            # not in the enumeration
]

SHAPE_SCHEMA = StructType([
    StructField("shape_id", StringType()),
    StructField("target_class", StringType()),
    StructField("path", StringType()),
    StructField("min_count", IntegerType()),
    StructField("max_count", IntegerType()),
    StructField("node_class", StringType()),
    StructField("pattern", StringType()),
    StructField("value_in", ArrayType(StringType())),
])

SHAPES = [
    ("s-works", "Person", "worksFor", 1, 1, "Org", None, None),
    ("s-email", "Person", "email", 1, None, None, "^[a-z]+@[a-z.]+$", None),
    ("s-status", "Person", "status", None, None, None, None, ["active", "inactive"]),
    ("s-phone", "Person", "phone", 1, None, None, None, None),
]


@pytest.fixture(scope="module")
def report(spark):
    t = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    s = spark.createDataFrame(SHAPES, SHAPE_SCHEMA)
    return shacl_validate(t, s, type_pred="type").collect()


def _v(report, constraint):
    return sorted(
        (r.shape_id, r.focus, r.value, r.observed)
        for r in report if r.constraint == constraint
    )


def test_min_count_missing_path(report):
    # both persons lack phone entirely (observed 0)
    assert _v(report, "minCount") == [
        ("s-phone", "alice", None, 0), ("s-phone", "bob", None, 0)
    ]


def test_max_count(report):
    assert _v(report, "maxCount") == [("s-works", "bob", None, 2)]


def test_class_constraint_flags_untyped_value(report):
    assert _v(report, "class") == [("s-works", "bob", "ghost-corp", None)]


def test_pattern(report):
    assert _v(report, "pattern") == [("s-email", "bob", "not-an-email", None)]


def test_in_enumeration(report):
    assert _v(report, "in") == [("s-status", "bob", "retired", None)]


def test_conforming_graph_empty_report(spark):
    t = spark.createDataFrame(
        [("x", "type", "Person"), ("x", "phone", "1")],
        "subj string, pred string, obj string",
    )
    s = spark.createDataFrame(
        [("s", "Person", "phone", 1, 1, None, None, None)], SHAPE_SCHEMA
    )
    assert shacl_validate(t, s, type_pred="type").count() == 0


def test_missing_shape_column_raises(spark):
    t = spark.createDataFrame([("x", "type", "P")], "subj string, pred string, obj string")
    bad = spark.createDataFrame([("s", "P", "q")], "shape_id string, target_class string, path string")
    with pytest.raises(ValueError, match="missing column"):
        shacl_validate(t, bad, type_pred="type")


# ---------------------------------------------------------------------------
# extended constraint kinds (length / range / datatype / nodeKind)
# ---------------------------------------------------------------------------
_XSD = "http://www.w3.org/2001/XMLSchema#"
_EXT_SCHEMA = (
    "shape_id string, target_class string, path string, min_count int, "
    "max_count int, node_class string, pattern string, "
    "value_in array<string>, min_length int, max_length int, "
    "min_inclusive double, max_inclusive double, min_exclusive double, "
    "max_exclusive double, datatype string, node_kind string"
)


def _ext_shape(shape_id, path, **kw):
    base = dict(min_count=None, max_count=None, node_class=None,
                pattern=None, value_in=None, min_length=None,
                max_length=None, min_inclusive=None, max_inclusive=None,
                min_exclusive=None, max_exclusive=None, datatype=None,
                node_kind=None)
    base.update(kw)
    return (shape_id, "Person", path, base["min_count"], base["max_count"],
            base["node_class"], base["pattern"], base["value_in"],
            base["min_length"], base["max_length"], base["min_inclusive"],
            base["max_inclusive"], base["min_exclusive"],
            base["max_exclusive"], base["datatype"], base["node_kind"])


@pytest.fixture(scope="module")
def ext_report(spark):
    from parser_rdf_spark.schemas import TRIPLES as FULL

    rows = [
        # (doc_url, graph, subj, pred, obj_kind, obj_value, lang, dt, line)
        ("d", None, "alice", "type", "iri", "Person", None, None, 1),
        ("d", None, "bob", "type", "iri", "Person", None, None, 2),
        ("d", None, "alice", "age", "literal", "30", None, _XSD + "integer", 3),
        ("d", None, "bob", "age", "literal", "200", None, _XSD + "integer", 4),
        ("d", None, "alice", "nick", "literal", "al", None, None, 5),
        ("d", None, "bob", "nick", "literal", "robertissimo", None, None, 6),
        ("d", None, "alice", "home", "iri", "http://e/h1", None, None, 7),
        ("d", None, "bob", "home", "literal", "not an iri", None, None, 8),
        ("d", None, "alice", "label", "literal", "x", "en", None, 9),
        ("d", None, "bob", "score", "literal", "high", None, None, 10),
        ("d", None, "alice", "score", "literal", "0.5", None, None, 11),
    ]
    t = spark.createDataFrame(rows, FULL)
    shapes = spark.createDataFrame(
        [
            _ext_shape("s-age", "age", min_inclusive=0.0, max_inclusive=150.0,
                       datatype=_XSD + "integer"),
            _ext_shape("s-nick", "nick", min_length=3, max_length=8,
                       datatype=_XSD + "string"),
            _ext_shape("s-home", "home",
                       node_kind="http://www.w3.org/ns/shacl#IRI"),
            _ext_shape("s-label", "label", datatype=_XSD + "string"),
            _ext_shape("s-score", "score", min_exclusive=0.0,
                       max_exclusive=1.0),
        ],
        _EXT_SCHEMA,
    )
    return shacl_validate(t, shapes, type_pred="type").collect()


def test_range_constraints(ext_report):
    assert _v(ext_report, "maxInclusive") == [("s-age", "bob", "200", None)]
    assert _v(ext_report, "minInclusive") == []
    # non-numeric value violates the comparable-range requirement
    assert ("s-score", "bob", "high", None) in _v(ext_report, "minExclusive")
    assert ("s-score", "bob", "high", None) in _v(ext_report, "maxExclusive")
    assert ("s-score", "alice", "0.5", None) not in _v(ext_report, "minExclusive")


def test_length_constraints(ext_report):
    assert _v(ext_report, "minLength") == [("s-nick", "alice", "al", 2)]
    assert _v(ext_report, "maxLength") == [("s-nick", "bob", "robertissimo", 12)]


def test_datatype_constraint(ext_report):
    # plain literal IS xsd:string (RDF 1.1), so alice's nick conforms;
    # a language-tagged literal is NOT xsd:string
    dt = _v(ext_report, "datatype")
    assert ("s-label", "alice", "x", None) in dt
    assert all(f != "s-nick" or v != "al" for (f, _, v, _) in dt)


def test_nodekind_constraint(ext_report):
    assert _v(ext_report, "nodeKind") == [("s-home", "bob", "not an iri", None)]


def test_term_constraints_on_bare_relation_raise(spark):
    t = spark.createDataFrame([("x", "type", "Person")],
                              "subj string, pred string, obj string")
    shapes = spark.createDataFrame(
        [_ext_shape("s", "p", datatype=_XSD + "integer")], _EXT_SCHEMA)
    with pytest.raises(ValueError, match="full triples schema"):
        shacl_validate(t, shapes, type_pred="type")


def test_bare_relation_still_works_with_extended_schema_nulls(spark):
    t = spark.createDataFrame(
        [("x", "type", "Person"), ("x", "nick", "waytoolongnickname")],
        "subj string, pred string, obj string")
    shapes = spark.createDataFrame(
        [_ext_shape("s-nick", "nick", max_length=8)], _EXT_SCHEMA)
    rep = shacl_validate(t, shapes, type_pred="type").collect()
    assert _v(rep, "maxLength") == [("s-nick", "x", "waytoolongnickname", 18)]


def test_validation_report_triples(spark, report):
    from parser_rdf_spark.schemas import TRIPLES as FULL
    from parser_rdf_spark.shacl import shacl_validate, validation_report_triples

    t = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    s = spark.createDataFrame(SHAPES, SHAPE_SCHEMA)
    viol = shacl_validate(t, s, type_pred="type")
    rt = validation_report_triples(viol)
    assert [(f.name, f.dataType) for f in rt.schema.fields] == \
        [(f.name, f.dataType) for f in FULL.fields]
    rows = rt.collect()
    SH = "http://www.w3.org/ns/shacl#"
    conforms = [r for r in rows if r.pred == SH + "conforms"]
    assert len(conforms) == 1 and conforms[0].obj_value == "false"
    n_results = len([r for r in rows if r.pred == SH + "result"])
    assert n_results == len(report)  # one result node per violation
    # components named per constraint kind
    comps = {r.obj_value for r in rows
             if r.pred == SH + "sourceConstraintComponent"}
    assert SH + "MinCountConstraintComponent" in comps
    assert SH + "PatternConstraintComponent" in comps
    # a conforming graph reports conforms=true and nothing else
    ok = spark.createDataFrame([("x", "type", "Person"), ("x", "phone", "1")],
                               "subj string, pred string, obj string")
    s2 = spark.createDataFrame(
        [("s", "Person", "phone", 1, 1, None, None, None)], SHAPE_SCHEMA)
    rep2 = validation_report_triples(shacl_validate(ok, s2, type_pred="type"))
    vals = {(r.pred, r.obj_value) for r in rep2.collect()}
    assert (SH + "conforms", "true") in vals and len(vals) == 2


def test_validation_report_serializes(spark):
    """The report is real RDF: render it to N-Triples and reparse
    (fixture uses dereferenceable IRIs — bare-name focus nodes are not
    valid N-Triples terms)."""
    from parser_rdf_spark.serialize import to_ntriples
    from parser_rdf_spark.shacl import shacl_validate, validation_report_triples

    t = spark.createDataFrame(
        [("urn:p:alice", "type", "urn:c:Person"),
         ("urn:p:alice", "urn:prop:nick", "x")],
        "subj string, pred string, obj string")
    s = spark.createDataFrame(
        [("urn:shape:nick", "urn:c:Person", "urn:prop:nick", None, None,
          None, "^.{3,}$", None)], SHAPE_SCHEMA)
    rep = validation_report_triples(shacl_validate(t, s, type_pred="type"))
    lines = [r.line for r in to_ntriples(rep).collect()]
    from parser_rdf_spark.ntriples import parse_document

    triples = parse_document("\n".join(lines))
    assert len(triples) == len(lines)
