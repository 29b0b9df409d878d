"""Snapshot commit log: atomic commits, time travel, rollback, expiry,
and GraphWriter per-bucket snapshot integration (snapshots.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from parser_rdf_spark.materialize import GraphWriter
from parser_rdf_spark.snapshots import ManifestLog, SnapshotTable

from conftest import pages_df


def df_of(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v int")


def vset(df):
    return sorted(r.v for r in df.collect())


def test_append_and_overwrite_visibility(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.commit_write(df_of(spark, [1, 2]), mode="overwrite")
    s2 = t.commit_write(df_of(spark, [3]), mode="append")
    s3 = t.commit_write(df_of(spark, [9]), mode="overwrite")
    assert vset(t.read(spark)) == [9]
    # time travel: older snapshots stay readable after later commits
    assert vset(t.read(spark, s1)) == [1, 2]
    assert vset(t.read(spark, s2)) == [1, 2, 3]
    assert [m["snapshot_id"] for m in t.history()] == [s1, s2, s3]


def test_rollback_is_forward_history(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.commit_write(df_of(spark, [1]), mode="overwrite")
    t.commit_write(df_of(spark, [2]), mode="overwrite")
    s3 = t.rollback(s1)
    assert vset(t.read(spark)) == [1]
    hist = t.history()
    assert len(hist) == 3 and hist[-1]["operation"] == "rollback"
    assert hist[-1]["summary"]["to_snapshot_id"] == s1
    assert s3 == 3


def test_crashed_commit_is_invisible_and_id_burned(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.commit_write(df_of(spark, [1]), mode="overwrite")
    # simulate a crash between manifest write and pointer swap: manifest
    # snap-2 exists but current.json still points at snap-1
    orphan = os.path.join(t.log.meta_dir, "snap-2.json")
    with open(orphan, "w") as f:
        json.dump({"snapshot_id": 2, "parent_id": s1, "operation": "append",
                   "summary": {}, "files": ["data/ghost/x.parquet"]}, f)
    assert t.current_id() == s1
    assert [m["snapshot_id"] for m in t.history()] == [s1]
    # next commit burns id 2 and takes 3 — the orphan can't shadow it
    s3 = t.commit_write(df_of(spark, [7]), mode="overwrite")
    assert s3 == 3
    assert vset(t.read(spark)) == [7]


def test_partitioned_write_keeps_partition_column(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "v int, k string")
    t.commit_write(df, mode="overwrite", partition_by=["k"])
    got = t.read(spark)
    assert sorted(got.columns) == ["k", "v"]
    assert {r.k for r in got.collect()} == {"a", "b"}


def test_expire_snapshots_vacuums_unreferenced_data(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_write(df_of(spark, [1]), mode="overwrite")
    s2 = t.commit_write(df_of(spark, [2]), mode="append")
    s3 = t.commit_write(df_of(spark, [9]), mode="overwrite")
    expired = t.expire_snapshots(keep_last=2)
    assert expired == [1]
    # kept snapshots still read correctly (s2 references snap-1's data
    # dir via append, so that dir must SURVIVE the vacuum)
    assert vset(t.read(spark, s2)) == [1, 2]
    assert vset(t.read(spark, s3)) == [9]
    assert [m["snapshot_id"] for m in t.history()] == [s2, s3]


def test_expire_drops_data_dirs_nothing_references(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_write(df_of(spark, [1]), mode="overwrite")
    t.commit_write(df_of(spark, [2]), mode="overwrite")  # s1's dir now unreferenced
    t.expire_snapshots(keep_last=1)
    assert os.listdir(t._data) == ["snap-2"]
    assert vset(t.read(spark)) == [2]


# -- GraphWriter integration ------------------------------------------------

def _docs(n=12):
    return {
        f"https://host{i % 3}.example.org/doc/{i}": (
            f"<http://ex.org/s{i}> <http://ex.org/p{i % 4}> <http://ex.org/o{i}> ."
        )
        for i in range(n)
    }


def test_graphwriter_commits_one_snapshot_per_bucket(spark, tmp_path):
    out = str(tmp_path / "g")
    w = GraphWriter(out, url_buckets=4)
    res = w.run(spark, pages_df(spark, _docs()), "snap-run")
    hist = w.snapshots.history()
    assert len(hist) == res.buckets_processed == 4
    assert all(m["operation"] == "append-bucket" for m in hist)
    assert [m["summary"]["url_bucket"] for m in hist] == sorted(
        m["summary"]["url_bucket"] for m in hist
    )
    # snapshot-sum of per-bucket triples equals the run total
    assert sum(m["summary"]["n_triples"] for m in hist) == res.triples_written


def test_graphwriter_time_travel_monotone_and_final_equals_live(spark, tmp_path):
    out = str(tmp_path / "g")
    w = GraphWriter(out, url_buckets=4)
    w.run(spark, pages_df(spark, _docs()), "snap-run")
    hist = w.snapshots.history()
    counts = [
        w.table_at(spark, "edges", m["snapshot_id"]).count() for m in hist
    ]
    assert counts == sorted(counts)  # append-only growth
    assert counts[-1] == w.edges(spark).count()
    # earlier snapshot sees strictly fewer buckets
    first = w.table_at(spark, "edges", hist[0]["snapshot_id"])
    assert first.select("url_bucket").distinct().count() == 1


def test_graphwriter_crash_resume_snapshots_stay_consistent(spark, tmp_path):
    out = str(tmp_path / "g")
    pages = pages_df(spark, _docs())
    w = GraphWriter(out, url_buckets=4)
    with pytest.raises(RuntimeError):
        w.run(spark, pages, "run-a", fail_after_buckets=2)
    assert len(w.snapshots.history()) == 2
    mid = w.snapshots.current_id()
    mid_count = w.table_at(spark, "edges", mid).count()
    w2 = GraphWriter(out, url_buckets=4)
    w2.run(spark, pages, "run-b")
    assert len(w2.snapshots.history()) == 4
    # the pre-crash snapshot is still readable and unchanged
    assert w2.table_at(spark, "edges", mid).count() == mid_count
    assert w2.table_at(spark, "edges").count() == w2.edges(spark).count()


def test_manifest_log_unknown_table_raises(spark, tmp_path):
    out = str(tmp_path / "g")
    w = GraphWriter(out, url_buckets=2)
    w.run(spark, pages_df(spark, _docs(4)), "r")
    with pytest.raises(ValueError, match="unknown table"):
        w.table_at(spark, "nope")


def test_manifest_log_empty_history(tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    assert log.current_id() is None and log.history() == []


def test_compaction_rewrites_identically_and_expire_reclaims(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame([(i,) for i in range(100)], "v int").repartition(8)
    s1 = t.commit_write(df, mode="overwrite")
    n_before = len(t.manifest(s1)["files"])
    assert n_before == 8
    s2 = t.compact(spark, target_files=2)
    m2 = t.manifest(s2)
    assert m2["operation"] == "compaction"
    assert m2["summary"]["files_before"] == 8
    assert len(m2["files"]) <= 2
    assert vset(t.read(spark)) == list(range(100))      # identical content
    assert vset(t.read(spark, s1)) == list(range(100))  # old snapshot intact
    t.expire_snapshots(keep_last=1)
    assert sorted(os.listdir(t._data)) == [f"snap-{s2}"]
    assert vset(t.read(spark)) == list(range(100))
