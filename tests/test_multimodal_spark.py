"""Multimodal binary-column ops: schema, Arrow batch plumbing, and the
deterministic fake-decode path (real decoders are absent by design)."""

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from parser_rdf_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, n=30).persist()


def test_media_stats_match_golden(spark, media):
    rows = {r["media_id"]: r for r in mm.media_stats(media).collect()}
    assert len(rows) == 30
    for i in range(30):
        kind = ["image", "audio", "video"][i % 3]
        payload = mm.synth_payload(i, kind)
        assert rows[i]["kind"] == kind
        assert rows[i]["payload_len"] == len(payload)
        assert rows[i]["payload_md5"] == hashlib.md5(payload).hexdigest()


def test_decode_image_dims_and_buffer(spark, media):
    dec = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert len(dec) == 30
    for i in range(0, 30, 3):  # images
        r = dec[i]
        w = 8 + (i * 7919) % 24
        h = 8 + (i * 104729) % 16
        assert (r["width"], r["height"]) == (w, h)
        assert r["decoder"] == "fake"
        assert len(r["pixels"]) == w * h
    for i in range(1, 30, 3):  # audio
        assert dec[i]["sample_rate"] in (8000, 12000, 16000)
        assert len(dec[i]["pixels"]) == dec[i]["n_samples"]
    for i in range(2, 30, 3):  # video
        assert dec[i]["n_frames"] == 4 + (i % 13)


def test_decode_garbage_payload_yields_null_buffer(spark):
    df = spark.createDataFrame(
        [(99, "image", "image/x-fake", b"not-a-real-header")], schema=mm.MEDIA
    )
    r = mm.decode_media(df).collect()[0]
    assert r["pixels"] is None and r["width"] is None


def test_resize_matches_numpy_golden(spark, media):
    out = {r["media_id"]: r for r in mm.resize_images(mm.decode_media(media), 4, 4).collect()}
    assert set(out) == set(range(0, 30, 3))
    i = 6
    w = 8 + (i * 7919) % 24
    h = 8 + (i * 104729) % 16
    buf = mm.synth_payload(i, "image")[11:]
    img = np.frombuffer(buf, dtype=np.uint8, count=w * h).reshape(h, w)
    ys, xs = np.array_split(np.arange(h), 4), np.array_split(np.arange(w), 4)
    small = np.array([[int(img[np.ix_(y, x)].mean()) for x in xs] for y in ys], dtype=np.uint8)
    assert out[i]["resized_md5"] == hashlib.md5(small.tobytes()).hexdigest()
    assert (out[i]["width"], out[i]["height"]) == (4, 4)


def test_sample_frames_matches_byte_chunks(spark, media):
    got = mm.sample_frames(media, frame_len=32, every_n=2).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], {})[r["frame_idx"]] = r["frame_md5"]
    for i in range(2, 30, 3):
        payload = mm.synth_payload(i, "video")
        n_frames = 4 + (i % 13)
        want = {
            idx: hashlib.md5(payload[idx * 32: (idx + 1) * 32]).hexdigest()
            for idx in range(0, (len(payload) // 32), 2)
        }
        assert by_id[i] == want, f"media {i}: expected frames {sorted(want)}"
    assert set(by_id) == set(range(2, 30, 3))


def test_embed_media_deterministic_unit_norm(spark, media):
    e1 = {r["media_id"]: r["embedding"] for r in mm.embed_media(media, dim=16).collect()}
    e2 = {r["media_id"]: r["embedding"] for r in mm.embed_media(media, dim=16).collect()}
    assert e1 == e2
    for v in e1.values():
        assert len(v) == 16
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3


def test_embeddings_compose_with_ann(spark, media):
    from parser_rdf_spark import textops

    emb = mm.embed_media(media, dim=16)
    top = textops.ann_bruteforce_topk(emb, k=2, id_col="media_id", vec_col="embedding")
    counts = {r["query_id"]: 0 for r in top.collect()}
    for r in top.collect():
        counts[r["query_id"]] += 1
    assert all(c == 2 for c in counts.values()) and len(counts) == 30


def test_media_from_documents_payload_is_utf8_text(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "zwei"), (2, "drei")], "doc_id long, text string"
    )
    rows = {r["media_id"]: r for r in mm.media_from_documents(docs).collect()}
    assert rows[0]["kind"] == "image" and rows[1]["kind"] == "audio"
    assert bytes(rows[0]["payload"]) == b"hello world"
    assert rows[2]["mime"] == "application/x-video"


def test_real_decoder_stub_raises():
    with pytest.raises(NotImplementedError):
        mm._decode_real(0, "image", b"\x89PNG")
