"""Relational operators Spark lacks natively, composed from built-ins.

The engine's event/telemetry side (events table) needs the classic
time-series joins a training-data pipeline leans on. First citizen:
the as-of join (each left row matched to the most recent right row at or
before its timestamp, per key) — no reference counterpart (the reference
is a per-document parser); this is north-star "operations a large-scale
pipeline needs" surface, verified against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join: rows of ``points`` matched to every row of
    ``ranges`` with ``lo_col ≤ point_col ≤ hi_col`` (inclusive both ends).

    Spark executes a naive inequality join as BroadcastNestedLoopJoin /
    CartesianProduct — O(|P|·|R|) and a cluster-killer at scale. This
    bucketizes instead: each range row is exploded onto every
    ``bucket_width``-wide bucket it overlaps, points land on their single
    bucket, and an EQUI-join on the bucket id feeds the exact interval
    filter. Cost is O(|P| + |R|·(span/width)) shuffled rows; pick
    ``bucket_width`` near the typical interval span so ranges explode to
    ~1-2 buckets each. The plan contains a hash/sort-merge equi-join and
    no nested-loop operator (pinned by test).

    Column names of the two inputs must be disjoint.
    """
    overlap = set(points.columns) & set(ranges.columns)
    if overlap:
        raise ValueError(f"points/ranges column names must be disjoint; both have {sorted(overlap)}")
    pb = points.withColumn("_b", F.floor(F.col(point_col) / F.lit(bucket_width)))
    rb = ranges.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)),
                F.floor(F.col(hi_col) / F.lit(bucket_width)),
            )
        ),
    )
    return (
        pb.join(rb, "_b")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("_b")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, the single right row with the
    greatest ``right_ts`` ≤ ``left_ts`` (direction='backward'; 'forward'
    mirrors to the smallest ``right_ts`` ≥ ``left_ts``), matched per
    ``on`` key. Unmatched left rows keep NULL right columns (left-join
    semantics, same as DuckDB ``ASOF LEFT JOIN``).

    Shape: ONE shuffle. Both sides are union-tagged and sorted per key by
    (ts, side); a window ``last(payload, ignoreNulls)`` carries the most
    recent right payload forward onto each left row. This is the
    scale-correct plan — the naive alternative (range join + per-key
    row_number) shuffles twice and explodes on dense keys. Keys are the
    partition dimension; skewed keys are AQE's problem like any other
    window.

    Right-side columns come back nested under a ``right`` struct column
    (``result["right.<col>"]``), avoiding name collisions. Ties on
    ``right_ts`` within a key resolve DETERMINISTICALLY to the duplicate
    row with the greatest ``xxhash64`` of its payload struct — an
    arbitrary but stable total order, so repeated runs (and the DuckDB
    oracle comparison) never flake on partition order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    from pyspark.sql.window import Window

    r_payload_cols = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in r_payload_cols]).alias("_r"),
        F.lit(None).cast(
            "struct<" + ", ".join(f"`{f.name}`: {f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_l"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            "struct<" + ", ".join(f"`{c}`: {right.schema[c].dataType.simpleString()}" for c in r_payload_cols) + ">"
        ).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    unioned = r.unionByName(l)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts ⇒ right_ts == left_ts
        # matches; xxhash64(_r) totally orders duplicate (key, ts) right
        # rows so the tie-winner is stable across partitionings (left rows
        # all share the null-hash constant — irrelevant, each emits itself)
        w = (
            Window.partitionBy("_k")
            .orderBy(F.asc("_t"), F.asc("_side"), F.asc(F.xxhash64("_r")))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.desc("_t"), F.asc("_side"), F.asc(F.xxhash64("_r")))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = unioned.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    return (
        matched.filter(F.col("_side") == 1)
        .select(F.col("_l").alias("left"), F.col("_m").alias("right"))
        .select("left.*", F.col("right").alias("right"))
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization via Spark's native SESSION window
    aggregation: per key, consecutive events chain into one session while
    the gap between neighbors is <= ``gap`` (exact-boundary events MERGE
    — pinned by test); a strictly larger gap starts a new session.

    Returns one row per (key, session): key_col, session_start, n_events,
    span_us (exact integer microseconds, first-to-last event — integer so
    cross-engine comparisons never hit float precision).

    Scale shape: ``session_window`` is a first-class Catalyst aggregation
    (UpdatingSessionsExec + merging agg) — ONE shuffle on the key, state
    merged JVM-side, no window-function sort-the-world pass and no Python.
    Equivalent lag/cumsum SQL reproduces it for the oracle.
    """
    return (
        events.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("_last"),
        )
        .select(
            F.col(key_col),
            F.col("session_start"),
            F.col("n_events"),
            # cast: parquet reads TIMESTAMP_NTZ, unix_micros wants TIMESTAMP;
            # the fixed-offset reinterpretation cancels in the difference
            (
                F.unix_micros(F.col("_last").cast("timestamp"))
                - F.unix_micros(F.col("session_start").cast("timestamp"))
            ).alias("span_us"),
        )
    )
