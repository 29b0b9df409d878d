"""Streaming connected-component maintenance: per-batch incremental CC
committed as snapshots (streaming.component_maintenance)."""

import os

from pyspark.sql import functions as F

from parser_rdf_spark.linking import connected_components
from parser_rdf_spark.snapshots import SnapshotTable
from parser_rdf_spark.streaming import component_maintenance

SCHEMA = "src string, dst string"


def _drain(spark, edges_dir, base):
    stream = spark.readStream.schema(SCHEMA).parquet(edges_dir)
    q = component_maintenance(
        stream, os.path.join(base, "labels"), os.path.join(base, "ckpt")
    )
    assert q.awaitTermination(180), "availableNow drain did not finish"


def labelling(df):
    return sorted((r["vertex"], r["component"]) for r in df.collect())


def test_two_batch_stream_equals_full_batch_cc(spark, tmp_path):
    base = str(tmp_path)
    edges_dir = os.path.join(base, "edges")
    b1 = [("a", "b"), ("x", "y")]
    b2 = [("b", "x"), ("p", "q")]

    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("append").parquet(edges_dir)
    _drain(spark, edges_dir, base)
    table = SnapshotTable(os.path.join(base, "labels"))
    hist1 = table.history()
    assert len(hist1) == 1 and hist1[0]["operation"] == "cc-batch"
    # after batch 1: two separate components
    assert labelling(table.read(spark)) == [
        ("a", "a"), ("b", "a"), ("x", "x"), ("y", "x")
    ]

    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(edges_dir)
    _drain(spark, edges_dir, base)
    assert len(table.history()) == 2
    full = connected_components(spark.createDataFrame(b1 + b2, SCHEMA))
    assert labelling(table.read(spark)) == labelling(full)
    # time travel: the batch-1 labelling is still readable
    assert labelling(table.read(spark, hist1[0]["snapshot_id"])) == [
        ("a", "a"), ("b", "a"), ("x", "x"), ("y", "x")
    ]


def test_redrain_without_new_files_commits_nothing(spark, tmp_path):
    base = str(tmp_path)
    edges_dir = os.path.join(base, "edges")
    spark.createDataFrame([("a", "b")], SCHEMA).coalesce(1).write.mode("append").parquet(edges_dir)
    _drain(spark, edges_dir, base)
    table = SnapshotTable(os.path.join(base, "labels"))
    n = len(table.history())
    _drain(spark, edges_dir, base)  # same checkpoint, no new files
    assert len(table.history()) == n
