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


def test_asof_duplicate_right_ts_ties_are_deterministic(spark):
    """ADVICE r2: duplicate (key, ts) right rows used to resolve by
    partition order. The xxhash64(_r) tiebreak must pick the same winner
    under any partitioning of the right side."""
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(20))], "lid int, user string, ts timestamp"
    )
    dup_rows = [(100 + i, "u1", _ts(10)) for i in range(6)]
    winners = set()
    for parts in (1, 3, 7):
        right = spark.createDataFrame(
            dup_rows, "rid int, user string, ts timestamp"
        ).select("user", "ts", "rid").repartition(parts)
        out = {r.lid: r for r in asof_join(left, right, on="user").collect()}
        assert out[1].right.rid == out[2].right.rid  # both lefts see same winner
        winners.add(out[1].right.rid)
    assert len(winners) == 1  # and the winner is partitioning-invariant


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


def test_range_join_inclusive_bounds_and_equijoin_plan(spark):
    from parser_rdf_spark.relops import range_join

    points = spark.createDataFrame(
        [(1, 0.5), (2, 2.5), (3, 7.0), (4, 99.0)], "pid int, v double"
    )
    ranges = spark.createDataFrame(
        [(10, 0.0, 2.5), (11, 2.5, 5.0), (12, 6.0, 8.0)], "rid int, lo double, hi double"
    )
    out = range_join(points, ranges, "v", "lo", "hi", bucket_width=2.0)
    pairs = {(r.pid, r.rid) for r in out.collect()}
    # boundary 2.5 is INCLUSIVE on both intervals; 99.0 matches nothing
    assert pairs == {(1, 10), (2, 10), (2, 11), (3, 12)}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan[:1500]


def test_range_join_rejects_column_collisions(spark):
    from parser_rdf_spark.relops import range_join
    import pytest as _pytest

    df = spark.createDataFrame([(1, 1.0)], "x int, v double")
    with _pytest.raises(ValueError, match="disjoint"):
        range_join(df, df, "v", "v", "v", 1.0)


def test_sessionize_boundary_merges_and_splits(spark):
    from parser_rdf_spark.relops import sessionize

    # u1: 0:00 and exactly-30min-later MERGE (pinned boundary semantics);
    #     the next event 30min+1s after that starts a new session.
    # u2: single event.
    rows = [
        (1, _ts(0)), (1, _ts(30)), (1, datetime(2026, 1, 1, 1, 0, 1)),
        (2, _ts(5)),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {
        (r.user_id, r.session_start): (r.n_events, r.span_us)
        for r in sessionize(ev, "user_id", "ts").collect()
    }
    assert out == {
        (1, _ts(0)): (2, 30 * 60 * 1_000_000),
        (1, datetime(2026, 1, 1, 1, 0, 1)): (1, 0),
        (2, _ts(5)): (1, 0),
    }


def test_sessionize_plan_is_single_session_window_agg(spark):
    from parser_rdf_spark.relops import sessionize

    ev = spark.createDataFrame([(1, _ts(0))], "user_id int, ts timestamp")
    plan = sessionize(ev, "user_id", "ts")._jdf.queryExecution().executedPlan().toString()
    # native session-window aggregation, not a window-function sort pass
    assert "UpdatingSessions" in plan or "session_window" in plan
    assert "Window" not in plan
