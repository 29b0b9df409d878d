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


_ONTO_V1 = {
    "https://o/keep": (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        'ex:Stable a rdfs:Class ; rdfs:label "Stable"@en .\n'
        "ex:rel a <http://www.w3.org/1999/02/22-rdf-syntax-ns#Property> ; "
        "rdfs:domain ex:Stable .\n"
    ),
    "https://o/update": (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        'ex:Old a rdfs:Class ; rdfs:label "Old"@en ; rdfs:comment "v1" .\n'
        'ex:AlsoOld a rdfs:Class .\n'
    ),
    "https://o/drop": (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        'ex:Vanishing a rdfs:Class ; rdfs:label "Vanishing"@en .\n'
    ),
}

_ONTO_DELTA = {
    # re-crawl: one class renamed, one gone, one added
    "https://o/update": (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        'ex:Old a rdfs:Class ; rdfs:label "Renamed"@en ; rdfs:comment "v2" .\n'
        'ex:Fresh a rdfs:Class ; rdfs:label "Fresh"@en .\n'
    ),
    # re-crawl that no longer defines ANY resource: stale rows must purge
    "https://o/drop": (
        "@prefix ex: <http://example.org/> .\n"
        'ex:x ex:p "no ontology here" .\n'
    ),
    # brand-new document
    "https://o/new": (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        'ex:Brand a rdfs:Class ; rdfs:label "Brand"@en .\n'
        "ex:newRel a <http://www.w3.org/1999/02/22-rdf-syntax-ns#Property> ; "
        "rdfs:range ex:Brand .\n"
    ),
}


def _onto_triples(spark, docs):
    from parser_rdf_spark.parse import parse_pages, triples_of

    from conftest import pages_df

    return triples_of(parse_pages(pages_df(spark, docs)))


@pytest.mark.parametrize("which", ["classes", "properties", "shapes"])
def test_merge_extracted_identity_with_full_reextraction(spark, which):
    """merge_extracted(old_table, delta_triples) is bit-identical to
    re-extracting the merged corpus — for every extraction table."""
    from parser_rdf_spark import extract
    from parser_rdf_spark.incremental import merge_extracted

    extractor = {
        "classes": extract.extract_classes,
        "properties": extract.extract_properties,
        "shapes": extract.extract_shapes,
    }[which]

    old_t = _onto_triples(spark, _ONTO_V1)
    delta_t = _onto_triples(spark, _ONTO_DELTA)
    merged_table = merge_extracted(extractor(old_t), delta_t, extractor)
    full_table = extractor(merge_triples(old_t, delta_t))

    k = lambda r: tuple("" if v is None else str(v) for v in r)  # noqa: E731
    assert sorted(map(k, merged_table.collect())) == sorted(map(k, full_table.collect()))


def test_merge_extracted_purges_docs_that_lost_all_resources(spark):
    from parser_rdf_spark import extract
    from parser_rdf_spark.incremental import merge_extracted

    old_t = _onto_triples(spark, _ONTO_V1)
    delta_t = _onto_triples(spark, {"https://o/drop": _ONTO_DELTA["https://o/drop"]})
    merged = merge_extracted(extract.extract_classes(old_t), delta_t,
                             extract.extract_classes)
    assert merged.filter(F.col("doc_url") == "https://o/drop").count() == 0
    # untouched docs carried over
    assert merged.filter(F.col("doc_url") == "https://o/keep").count() == 1


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
