"""Structured Streaming ingestion path.

The reference is strictly batch (one ``parse()`` call per document —
SURVEY.md §2.7); at web scale the pages table is *continuously appended*
(new WARC dumps land hourly), so the engine also exposes the same fused
detect→validate→parse stage as a Structured Streaming job:

    readStream(pages parquet dir) → parse_pages (mapInArrow, unchanged)
      → triples_of → writeStream(parquet, checkpointed)

Because :func:`parser_rdf_spark.parse.parse_pages` is a narrow stateless
map with no driver-side actions, the *exact same code object* serves both
the batch and streaming paths — the streaming wrapper only adds source,
sink, trigger, and checkpoint. Incremental semantics (only new files are
processed on re-run) come from the checkpoint's file-source log, which is
also the streaming face of the north-rule resume requirement: kill the
job, restart with the same checkpoint dir, and it continues from the
last committed batch.

``triple_rates`` adds the canonical stateful-streaming op: a watermarked
event-time (warc_ts) windowed count of parsed triples per format — late
pages beyond the watermark are dropped, state is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .parse import parse_pages, triples_of
from .schemas import PAGES


def read_page_stream(spark: SparkSession, pages_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a pages parquet directory (the sandbox
    stand-in for an Iceberg incremental-read stream)."""
    reader = spark.readStream.schema(PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(pages_dir)


def stream_triples(pages_stream: DataFrame, fmt: str | None = None) -> DataFrame:
    """The streaming face of stage 1+2: identical plan, unbounded source."""
    return triples_of(parse_pages(pages_stream, fmt=fmt))


def run_to_parquet(
    triples_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Checkpointed parquet sink; ``availableNow`` drains everything
    currently in the source then stops (the batch-shaped trigger used in
    tests and backfills — a live job would use a processingTime trigger).
    Returns the StreamingQuery; caller awaits termination."""
    writer = (
        triples_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def first_seen_pages(
    pages_stream: DataFrame,
    state_ttl: str = "24 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-URL
    first-seen filter across micro-batches.

    Web crawls re-fetch pages continuously; downstream KG construction
    wants each URL parsed ONCE per content epoch. Keyed state holds one
    boolean per URL with an EVENT-time TTL (``state_ttl`` beyond the
    page's ``warc_ts``): the first arrival of a URL passes through,
    subsequent arrivals are dropped until the crawl's watermark passes
    first-seen + TTL (after which the URL is re-admitted — the re-crawl
    refresh semantics). Event-time expiry (vs processing time) makes the
    operator REPLAYABLE — reprocessing the same WARC dumps from a
    checkpoint yields the same epochs regardless of wall clock — and it
    lets a bounded ``availableNow`` drain terminate (a processing-time
    TTL keeps the query alive running state-cleanup batches until the
    wall-clock TTL fires). State is bounded by the TTL; this is the
    engine's ``applyInPandasWithState`` surface, complementing the
    built-in watermarked rollup in :func:`triple_rates`.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl_ms = _duration_to_ms(state_ttl)
    out_schema = PAGES
    state_schema = "seen boolean"

    def dedup(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return iter(())

        first_batch = None
        max_ts_ms = None
        for pdf in pdfs:
            if len(pdf):
                if first_batch is None:
                    first_batch = pdf.iloc[:1]
                m = pdf["warc_ts"].max()
                if pd.notna(m):
                    ms = int(m.timestamp() * 1000)
                    max_ts_ms = ms if max_ts_ms is None else max(max_ts_ms, ms)
        if state.exists:
            return iter(())
        state.update((True,))
        if max_ts_ms is not None:
            state.setTimeoutTimestamp(max_ts_ms + ttl_ms)
        if first_batch is None:
            return iter(())
        return iter([first_batch])

    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy("url")
        .applyInPandasWithState(
            dedup,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def crawl_sessions(
    pages_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: per-host crawl-activity sessions via the
    native SESSION window over event time (warc_ts). A host's fetches
    chain into one session while consecutive events are <= ``gap`` apart;
    the watermark bounds state and finalizes sessions — in append mode a
    session row is emitted once the watermark passes its end
    (last event + gap), the standard late-data contract.

    This is the streaming face of :func:`parser_rdf_spark.relops.sessionize`
    (same session_window semantics, unbounded source + keyed state instead
    of a batch shuffle).
    """
    host = F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/]+)", 1).alias("host")
    return (
        pages_stream.select(host, F.col("warc_ts").alias("event_ts"))
        .withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap).alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            "host",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_pages",
        )
    )


def _duration_to_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1000, "seconds": 1000, "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000, "day": 86_400_000, "days": 86_400_000}
    return int(n) * mult[unit]


def triple_rates(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed rollup: triples parsed per (event-time window,
    format). State is bounded by the watermark; late pages past it are
    dropped — the standard late-data contract.

    parse_pages prunes its input to url/text/html before the Arrow
    boundary, so event time rides through the stage inside the url
    fragment (#ts=epoch) and is re-materialized after — streams can't
    re-join on url without a second stateful operator.
    """
    tagged = pages_stream.withColumn(
        "url",
        F.concat(
            "url", F.lit("#ts="), F.unix_timestamp(F.coalesce("warc_ts", F.current_timestamp()))
        ),
    )
    parsed = parse_pages(tagged)
    return (
        parsed.select(
            F.to_timestamp(
                F.regexp_extract("doc_url", r"#ts=(\d+)$", 1).cast("long")
            ).alias("event_ts"),
            "format",
            F.coalesce("n_triples", F.lit(0)).alias("n_triples"),
        )
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), "format")
        .agg(F.sum("n_triples").alias("triples"), F.count(F.lit(1)).alias("pages"))
        .select(F.col("w.start").alias("window_start"), "format", "triples", "pages")
    )


def component_maintenance(
    edges_stream: DataFrame,
    labels_root: str,
    checkpoint_dir: str,
    src_col: str = "src",
    dst_col: str = "dst",
):
    """Continuous connected-components maintenance over a stream of new
    equivalence edges — the streaming face of stage 3's cross-document
    IRI resolution. Each micro-batch is a delta merged into the current
    labelling via the quotient-graph incremental CC
    (:func:`~.incremental.incremental_connected_components` — work ∝
    batch, not corpus), and each result is committed as a new snapshot
    of a :class:`~.snapshots.SnapshotTable`, so readers always see an
    atomic labelling and can time-travel to any batch boundary. A
    killed job resumes from the checkpoint with the last committed
    snapshot intact.

    foreachBatch is at-least-once: a replayed batch re-merges edges the
    labelling already absorbed, which is a semantic no-op (re-adding a
    known edge merges nothing), so the committed labelling converges to
    the batch answer regardless of replays. Returns the StreamingQuery.
    """
    from .incremental import incremental_connected_components
    from .linking import connected_components
    from .snapshots import SnapshotTable

    table = SnapshotTable(labels_root)

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if table.current_id() is None:
            labels = connected_components(batch_df, src_col=src_col, dst_col=dst_col)
        else:
            prev = table.read(batch_df.sparkSession)
            labels = incremental_connected_components(
                prev, batch_df, src_col=src_col, dst_col=dst_col
            )
        table.commit_write(
            labels.select("vertex", "component", "component_id"),
            mode="overwrite",
            operation="cc-batch",
            summary={"batch_id": int(batch_id)},
        )

    return (
        edges_stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def canonical_dedup_maintenance(
    pages_stream: DataFrame,
    registry_root: str,
    checkpoint_dir: str,
    rounds: int = 2,
):
    """Continuous GRAPH-LEVEL dedup over a page stream — the streaming
    face of :func:`~.canonical.isomorphic_duplicates`: each micro-batch
    is parsed, every document graph gets its isomorphism-invariant
    canonical hash (WL refinement, :mod:`.canonical`), and the
    (graph_hash, doc_url) membership registry is committed as a new
    :class:`~.snapshots.SnapshotTable` snapshot. Re-crawls of the same
    graph under freshly-minted blank-node labels land on an existing
    hash — readers pick ``min(doc_url)`` per hash as the canonical
    representative and the rest as drops.

    The registry stores MEMBERSHIP PAIRS, not counts: pairs merge under
    set semantics (union + distinct), which makes foreachBatch's
    at-least-once replay a no-op — a replayed batch re-asserts pairs the
    registry already holds. Counts are a read-side aggregate. At 10^12
    docs the registry write would be a hash-prefix-partitioned MERGE
    instead of the overwrite commit used here (same trade
    :func:`component_maintenance` documents for its labelling).

    Sound under WL ties (round 5): the registry key is
    :func:`~.canonical.canonical_dedup_keys`' ``dedup_key`` — the WL
    hash alone for fully-refined docs, WL hash + exact canonical-quads
    md5 for ambiguous ones — so a WL-colliding NON-isomorphic pair
    (hexagon vs two triangles) never shares a registry row, matching
    the batch :func:`~.canonical.isomorphic_duplicates` exactly; the
    key is deterministic per document content, hence replay-stable.
    Returns the StreamingQuery (availableNow drain)."""
    from .canonical import canonical_dedup_keys
    from .snapshots import SnapshotTable

    table = SnapshotTable(registry_root)

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        t = triples_of(parse_pages(batch_df))
        pairs = canonical_dedup_keys(t, rounds=rounds).select(
            F.col("dedup_key").alias("graph_hash"), "doc_url"
        )
        if table.current_id() is not None:
            pairs = table.read(batch_df.sparkSession).unionByName(pairs)
        table.commit_write(
            pairs.distinct(),
            mode="overwrite",
            operation="canonical-dedup-batch",
            summary={"batch_id": int(batch_id)},
        )

    return (
        pages_stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
