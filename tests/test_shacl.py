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
