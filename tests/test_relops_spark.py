"""As-of join: semantics (backward/forward, ties, unmatched) and the
one-shuffle union+window plan shape."""

from datetime import datetime

from pyspark.sql import functions as F

from parser_rdf_spark.relops import asof_join


def _ts(minute):
    return datetime(2026, 1, 1, 0, minute)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(20)), (3, "u2", _ts(5)), (4, "u3", _ts(30))],
        "lid int, user string, ts timestamp",
    ).select("lid", "user", "ts")
    right = spark.createDataFrame(
        [(100, "u1", _ts(8)), (101, "u1", _ts(10)), (102, "u1", _ts(15)),
         (103, "u2", _ts(6))],
        "rid int, user string, ts timestamp",
    ).select("user", "ts", "rid")
    return left, right


def test_asof_backward_matches_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {r.lid: r for r in asof_join(left, right, on="user").collect()}
    # lid 1 @10: right candidates @8 and @10 — EQUAL ts matches (inclusive)
    assert out[1].right.rid == 101
    # lid 2 @20: latest right @15
    assert out[2].right.rid == 102
    # lid 3 @5: u2's only right is @6 (after) — unmatched ⇒ NULL struct
    assert out[3].right is None or out[3].right.rid is None
    # lid 4: u3 has no right rows at all — unmatched
    assert out[4].right is None or out[4].right.rid is None


def test_asof_forward_matches_earliest_at_or_after(spark):
    left, right = _frames(spark)
    out = {r.lid: r for r in asof_join(left, right, on="user", direction="forward").collect()}
    assert out[1].right.rid == 101   # @10 inclusive
    assert out[2].right is None or out[2].right.rid is None  # nothing after @20
    assert out[3].right.rid == 103   # u2 @6 is the first at-or-after @5


def test_asof_plan_is_single_shuffle_window(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="user")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one Window over the union; NO join operator in the plan at all
    assert "Window" in plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert j not in plan, plan[:2000]


def test_asof_left_columns_pass_through_unchanged(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user")
    assert [c for c in out.columns] == ["lid", "user", "ts", "right"]
    assert out.count() == left.count()
