"""Structured Streaming ingestion: same fused parse stage, checkpointed
incremental file source, watermarked windowed rollup."""

import os
from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from parser_rdf_spark import streaming as st
from parser_rdf_spark import w3c_fixtures as w3c
from parser_rdf_spark.parse import parse_pages, triples_of
from parser_rdf_spark.schemas import PAGES


def _write_pages(spark, path, docs, ts_hour=0):
    ts = datetime(2026, 1, 1, ts_hour, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [(url, ts, None, text, "en") for url, text in docs.items()], schema=PAGES
    )
    df.coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "pages"),
        str(tmp_path / "triples_out"),
        str(tmp_path / "ckpt"),
    )


BATCH1 = {f"https://s.example.org/{n}": w3c.FIXTURES[n] for n in w3c.POSITIVE[:10]}
BATCH2 = {"https://s.example.org/quartet-nt": w3c.SAMPLES["sample.nt"],
          "https://s.example.org/quartet-ttl": w3c.SAMPLES["sample.ttl"]}


def test_stream_equals_batch_and_resumes_incrementally(spark, dirs):
    pages_dir, out_dir, ckpt = dirs
    _write_pages(spark, pages_dir, BATCH1)

    q = st.run_to_parquet(
        st.stream_triples(st.read_page_stream(spark, pages_dir)), out_dir, ckpt
    )
    assert q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir)
    want1 = triples_of(parse_pages(spark.read.parquet(pages_dir)))
    assert got1.count() == want1.count()
    assert got1.select("subj", "pred", "obj_value").subtract(
        want1.select("subj", "pred", "obj_value")
    ).count() == 0

    # append a second batch; same checkpoint → only new files processed
    _write_pages(spark, pages_dir, BATCH2, ts_hour=3)
    q = st.run_to_parquet(
        st.stream_triples(st.read_page_stream(spark, pages_dir)), out_dir, ckpt
    )
    assert q.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    want2 = triples_of(parse_pages(spark.read.parquet(pages_dir)))
    # append-mode sink with no reprocessing: counts match the full batch
    # run exactly (re-reading batch 1 would double those rows)
    assert got2.count() == want2.count()


def test_triple_rates_windowed_rollup(spark, dirs):
    pages_dir, _, _ = dirs
    _write_pages(spark, pages_dir, BATCH1, ts_hour=0)
    _write_pages(spark, pages_dir, BATCH2, ts_hour=3)

    rates = st.triple_rates(st.read_page_stream(spark, pages_dir), window="1 hour")
    q = (
        rates.writeStream.format("memory")
        .queryName("rates_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.sql("select * from rates_t").collect()
    got = {(r["window_start"].hour, r["format"]): (r["triples"], r["pages"]) for r in rows}

    # batch-path oracle: same parse, grouped by (hour from url tag, format)
    parsed = parse_pages(spark.read.parquet(pages_dir))
    batch = {}
    for r in parsed.collect():
        hour = 3 if "quartet" in r["doc_url"] else 0
        key = (hour, r["format"])
        t, p = batch.get(key, (0, 0))
        batch[key] = (t + (r["n_triples"] or 0), p + 1)
    assert got == batch
    assert sum(p for _, p in got.values()) == 12
    assert (0, "n-triples") in got and (3, "turtle") in got


def test_first_seen_pages_stateful_dedup(spark, dirs):
    """applyInPandasWithState surface: a URL re-fetched in a later
    micro-batch is dropped; each URL's FIRST version survives."""
    pages_dir, out_dir, ckpt = dirs
    _write_pages(spark, pages_dir, {
        "https://s.example.org/a": "<http://e/s1> <http://e/p> <http://e/o1> .",
        "https://s.example.org/b": "<http://e/s2> <http://e/p> <http://e/o2> .",
    })
    _write_pages(spark, pages_dir, {
        "https://s.example.org/a": "<http://e/s1> <http://e/p> <http://e/CHANGED> .",
        "https://s.example.org/c": "<http://e/s3> <http://e/p> <http://e/o3> .",
    }, ts_hour=3)

    stream = st.read_page_stream(spark, pages_dir, max_files_per_trigger=1)
    deduped = st.first_seen_pages(stream)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    rows = {r.url: r.text for r in got.collect()}
    assert set(rows) == {
        "https://s.example.org/a", "https://s.example.org/b", "https://s.example.org/c",
    }
    # url 'a' kept its FIRST content, the re-fetch was dropped
    assert "CHANGED" not in rows["https://s.example.org/a"]
    assert got.count() == 3


def _write_pages_at(spark, path, rows):
    """rows: list of (url, datetime) — minimal pages with event times."""
    df = spark.createDataFrame(
        [(url, ts, None, "", "en") for url, ts in rows], schema=PAGES
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_crawl_sessions_streaming_append_finalizes_on_watermark(spark, dirs):
    """Streaming sessionization (session_window + watermark, append mode):
    sessions are emitted once the watermark passes their end; unfinalized
    sessions stay in state. Two availableNow runs over one checkpoint —
    the second run's data advances the persisted watermark and flushes
    the first run's finished sessions."""
    pages_dir, out_dir, ckpt = dirs

    def t(minute):
        return datetime(2026, 1, 1, 0, 0, tzinfo=timezone.utc) + __import__(
            "datetime"
        ).timedelta(minutes=minute)

    # host a: two fetches 10min apart (one session), then one 2h later
    # (second session). host b: one fetch.
    _write_pages_at(
        spark,
        pages_dir,
        [
            ("https://a.example.org/1", t(0)),
            ("https://a.example.org/2", t(10)),
            ("https://a.example.org/3", t(120)),
            ("https://b.example.org/1", t(0)),
        ],
    )

    def run():
        q = (
            st.crawl_sessions(st.read_page_stream(spark, pages_dir))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run()  # run 1: watermark starts unset -> nothing finalized yet

    # run 2: a far-future fetch advances the watermark past the early
    # sessions' ends (watermark during run 2 = run-1 max event - 1h = 1:00)
    _write_pages_at(spark, pages_dir, [("https://z.example.org/1", t(600))])
    run()

    got = {
        (r.host, r.session_start, r.session_end, r.n_pages)
        for r in spark.read.parquet(out_dir).collect()
    }
    naive = lambda m: datetime(2026, 1, 1, 0, 0) + __import__("datetime").timedelta(minutes=m)  # noqa: E731
    # run 2 processes z (event 10:00) -> watermark advances to 9:00 and
    # Spark's no-data batch flushes every session ended before it: a's
    # first session (2 fetches chained, end = last+gap = 0:40), a's 2:00
    # session (end 2:30), b's (end 0:30). NOT emitted: z's own session
    # (end 10:30 > watermark) — state stays bounded, nothing leaks early.
    assert got == {
        ("a.example.org", naive(0), naive(40), 2),
        ("a.example.org", naive(120), naive(150), 1),
        ("b.example.org", naive(0), naive(30), 1),
    }


def test_canonical_dedup_maintenance_across_batches(spark, dirs):
    """Streaming graph-level dedup: batch 1 brings a graph, batch 2
    re-crawls the SAME graph under fresh _:genid labels plus one new
    distinct graph — the registry must land the re-crawl on the existing
    hash; an empty third drain must not grow the registry (resume
    no-op)."""
    from parser_rdf_spark.snapshots import SnapshotTable

    pages_dir, _, ckpt = dirs
    reg = ckpt + "_registry"
    ttl = """@prefix ex: <http://e/> .
ex:x ex:knows _:{a} .
_:{a} ex:name "Ann" ; ex:friend _:{b} .
_:{b} ex:name "{bob}" ."""

    def drain():
        stream = spark.readStream.schema(PAGES).parquet(pages_dir)
        q = st.canonical_dedup_maintenance(stream, reg, ckpt)
        assert q.awaitTermination(240), "availableNow drain did not finish"

    _write_pages(spark, pages_dir,
                 {"https://c/p1": ttl.format(a="a", b="b", bob="Bob")})
    drain()
    _write_pages(spark, pages_dir, {
        "https://c/p2": ttl.format(a="genid1", b="genid2", bob="Bob"),
        "https://c/p3": ttl.format(a="a", b="b", bob="Carol"),
    })
    drain()

    table = SnapshotTable(reg)
    rows = table.read(spark).collect()
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r.graph_hash, set()).add(r.doc_url)
    assert len(rows) == 3 and len(by_hash) == 2
    assert {"https://c/p1", "https://c/p2"} in by_hash.values()
    assert {"https://c/p3"} in by_hash.values()

    # a re-drain with no new files commits nothing new
    n_snaps = len(table.history())
    drain()
    assert len(SnapshotTable(reg).history()) == n_snaps
    assert SnapshotTable(reg).read(spark).count() == 3


def test_canonical_dedup_stream_sound_under_wl_ties(spark, dirs):
    """Round 5: the streaming registry keys by canonical_dedup_keys, so
    a WL-hash collision between NON-isomorphic symmetric graphs
    (hexagon vs two triangles) lands as TWO registry keys — never a
    false merge — while a renamed re-crawl of the hexagon still joins
    the existing key."""
    from parser_rdf_spark.snapshots import SnapshotTable

    pages_dir, _, ckpt = dirs
    reg = ckpt + "_registry_wl"

    def cycle_ttl(pairs):
        lines = ["@prefix ex: <http://e/> ."]
        lines += [f"_:{a} ex:n _:{b} ." for a, b in pairs]
        return "\n".join(lines)

    hexa = lambda p: cycle_ttl(  # noqa: E731
        [(f"{p}{i}", f"{p}{(i + 1) % 6}") for i in range(6)])
    tris = cycle_ttl([("t0", "t1"), ("t1", "t2"), ("t2", "t0"),
                      ("t3", "t4"), ("t4", "t5"), ("t5", "t3")])

    def drain():
        stream = spark.readStream.schema(PAGES).parquet(pages_dir)
        q = st.canonical_dedup_maintenance(stream, reg, ckpt)
        assert q.awaitTermination(240), "availableNow drain did not finish"

    _write_pages(spark, pages_dir, {"https://c/hex1": hexa("h")})
    drain()
    _write_pages(spark, pages_dir, {
        "https://c/tris": tris,            # WL-collides with the hexagon
        "https://c/hex2": hexa("z"),       # true re-crawl, renamed labels
    })
    drain()

    rows = SnapshotTable(reg).read(spark).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.graph_hash, set()).add(r.doc_url)
    assert len(rows) == 3 and len(by_key) == 2
    assert {"https://c/hex1", "https://c/hex2"} in by_key.values()
    assert {"https://c/tris"} in by_key.values()
    # ambiguous docs carry the composite wlhash:texthash key
    assert all(":" in k for k in by_key)
