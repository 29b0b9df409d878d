"""Incremental CC == full recompute; delta merge semantics (incremental.py)."""

import random

import pytest
from pyspark.sql import functions as F

from parser_rdf_spark.incremental import (
    incremental_connected_components,
    merge_stats,
    merge_triples,
)
from parser_rdf_spark.linking import connected_components


def labelling(df):
    return sorted((r["vertex"], r["component"]) for r in df.collect())


def _random_split_case(spark, seed, n_vertices=40, n_edges=60):
    rng = random.Random(seed)
    edges = [
        (f"v{rng.randrange(n_vertices):02d}", f"v{rng.randrange(n_vertices):02d}")
        for _ in range(n_edges)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    cut = len(edges) * 2 // 3
    mk = lambda rows: spark.createDataFrame(rows, "src string, dst string")  # noqa: E731
    return mk(edges[:cut]), mk(edges[cut:]), mk(edges)


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_incremental_equals_full_recompute(spark, seed):
    batch1, batch2, full = _random_split_case(spark, seed)
    prev = connected_components(batch1)
    inc = incremental_connected_components(prev, batch2)
    assert labelling(inc) == labelling(connected_components(full))


def test_incremental_new_vertices_and_merges(spark):
    # prev: {a,b} and {x,y} separate; delta bridges them and adds fresh
    # pair {p,q} plus an isolated self-loop vertex z
    b1 = spark.createDataFrame([("a", "b"), ("x", "y")], "src string, dst string")
    b2 = spark.createDataFrame(
        [("b", "x"), ("p", "q"), ("z", "z")], "src string, dst string"
    )
    prev = connected_components(b1)
    inc = incremental_connected_components(prev, b2)
    got = dict(labelling(inc))
    assert got == {"a": "a", "b": "a", "x": "a", "y": "a",
                   "p": "p", "q": "p", "z": "z"}


def test_incremental_edge_within_same_component_is_noop(spark):
    b1 = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    prev = connected_components(b1)
    inc = incremental_connected_components(
        prev, spark.createDataFrame([("a", "c")], "src string, dst string")
    )
    assert labelling(inc) == labelling(prev)


def test_incremental_empty_prev(spark):
    empty = connected_components(
        spark.createDataFrame([], "src string, dst string")
    )
    delta = spark.createDataFrame([("m", "n")], "src string, dst string")
    inc = incremental_connected_components(empty, delta)
    assert dict(labelling(inc)) == {"m": "m", "n": "m"}


# -- merge ------------------------------------------------------------------

TRIPLE_SCHEMA = "doc_url string, subj string, pred string, obj string"


def test_merge_replaces_all_triples_of_touched_docs(spark):
    old = spark.createDataFrame(
        [("d1", "s1", "p", "o1"), ("d1", "s1", "q", "o2"), ("d2", "s2", "p", "o3")],
        TRIPLE_SCHEMA,
    )
    delta = spark.createDataFrame([("d1", "s1", "p", "NEW")], TRIPLE_SCHEMA)
    merged = merge_triples(old, delta)
    got = sorted(tuple(r) for r in merged.collect())
    # d1's q-triple is gone (re-crawl no longer asserts it); d2 carried
    assert got == [("d1", "s1", "p", "NEW"), ("d2", "s2", "p", "o3")]


def test_merge_appends_new_docs(spark):
    old = spark.createDataFrame([("d1", "s", "p", "o")], TRIPLE_SCHEMA)
    delta = spark.createDataFrame([("d9", "s9", "p", "o9")], TRIPLE_SCHEMA)
    assert merge_triples(old, delta).count() == 2


def test_merge_stats_counters(spark):
    old = spark.createDataFrame(
        [("d1", "s", "p", "o"), ("d1", "s", "q", "o"), ("d2", "s", "p", "o")],
        TRIPLE_SCHEMA,
    )
    delta = spark.createDataFrame(
        [("d1", "s", "p", "n"), ("d3", "s", "p", "o")], TRIPLE_SCHEMA
    )
    row = merge_stats(old, delta).collect()[0]
    assert (row.docs_updated, row.docs_added, row.triples_removed,
            row.triples_added, row.triples_carried) == (1, 1, 2, 2, 1)


def test_table_diff_ontology_evolution(spark):
    from parser_rdf_spark.incremental import table_diff

    old = spark.createDataFrame([
        ("C1", "One", ["P"]), ("C2", "Two", []), ("C4", "Four", None),
    ], "uri string, label string, parents array<string>")
    new = spark.createDataFrame([
        ("C1", "One renamed", ["P"]),      # label changed
        ("C3", "Three", ["C1"]),           # added
        ("C4", "Four", None),              # unchanged (null-safe) -> omitted
    ], "uri string, label string, parents array<string>")
    out = sorted((r.status, r.uri, list(r.changed_cols))
                 for r in table_diff(old, new, ["uri"]).collect())
    assert out == [
        ("added", "C3", []),
        ("changed", "C1", ["label"]),
        ("removed", "C2", []),
    ]


def test_table_diff_multi_change_and_compare_subset(spark):
    from parser_rdf_spark.incremental import table_diff

    old = spark.createDataFrame([("u", "a", 1)], "k string, x string, y int")
    new = spark.createDataFrame([("u", "b", 2)], "k string, x string, y int")
    [r] = table_diff(old, new, ["k"]).collect()
    assert (r.status, list(r.changed_cols)) == ("changed", ["x", "y"])
    # compare restricted to x only
    [r2] = table_diff(old, new, ["k"], compare_cols=["x"]).collect()
    assert list(r2.changed_cols) == ["x"]
