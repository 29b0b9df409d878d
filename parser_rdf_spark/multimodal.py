"""Multimodal (image/audio/video) columns for the training-data pipeline.

A 100-TB web corpus is not text-only: pages carry images, audio, and
video. This module treats media as **opaque binary columns with typed
metadata** — the Spark-native pattern for multimodal data lakes — and
implements the four canonical ops over them:

- :func:`media_stats` — payload accounting, pure Column/SQL (codegen'd).
- :func:`decode_media` — binary → decoded tensor metadata. The real
  decoders (PIL / libav) are NOT in this container, so the decode step is
  gated: when the library is importable the real path runs, otherwise a
  clearly-marked deterministic fake decoder interprets our synthetic
  FAKE-header payloads. The Spark-side plumbing — schema, Arrow batch
  shape, mapInPandas signature, partitioning — is real and tested.
- :func:`resize_images` — deterministic block-mean downsample of decoded
  pixel buffers (numpy, Arrow-batched).
- :func:`sample_frames` — every-Nth-frame sampling of video payloads,
  emitting per-frame fingerprints. Frame boundaries are fixed-size byte
  chunks, so the op is also expressible as SQL substring+md5 — that is
  the DuckDB oracle surface.
- :func:`embed_media` — deterministic fake feature extraction (payload
  hash expanded to a unit-norm float vector) so the similarity-search
  ops (textops.ann_*) compose with media end-to-end.

Scale notes: payloads never leave the executor JVM except through Arrow
batches; every op is a narrow map (zero shuffles); decode output drops
the payload column so downstream stages don't re-ship bytes. At 100 TB
the media table is partitioned by ``bucket(N, media_id)`` and the decode
stage is the bandwidth hot spot — keeping it one fused mapInPandas pass
per batch (no per-row Python) is the same boundary-minimization rule as
the RDF parse stage (SURVEY.md §4 item 4).

Synthetic payload format (deterministic, no external data):
  image: b"FAKEIMG" + width:uint16be + height:uint16be + pixel bytes
         (row-major grayscale, blake2b keystream seeded by media_id)
  audio: b"FAKEAUD" + sample_rate:uint16be + n_samples:uint16be + samples
  video: b"FAKEVID" + n_frames:uint16be + frame_len:uint16be + frames
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # 'image'|'audio'|'video'
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

DECODED = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),       # image
        StructField("height", IntegerType(), True),      # image
        StructField("sample_rate", IntegerType(), True),  # audio
        StructField("n_samples", IntegerType(), True),    # audio
        StructField("n_frames", IntegerType(), True),     # video
        StructField("decoder", StringType(), False),      # 'fake'|'pil'|...
        StructField("pixels", BinaryType(), True),        # decoded buffer
    ]
)

_MAGIC = {"image": b"FAKEIMG", "audio": b"FAKEAUD", "video": b"FAKEVID"}
_MIME = {"image": "image/x-fake", "audio": "audio/x-fake", "video": "video/x-fake"}


def _keystream(seed: int, n: int) -> bytes:
    """Deterministic pseudo-random bytes (blake2b in counter mode)."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.blake2b(f"{seed}-{i}".encode(), digest_size=32).digest()
        i += 1
    return bytes(out[:n])


def synth_payload(media_id: int, kind: str) -> bytes:
    """One deterministic fake payload (driver/test-side golden path)."""
    if kind == "image":
        w = 8 + (media_id * 7919) % 24   # 8..31
        h = 8 + (media_id * 104729) % 16  # 8..23
        return (
            _MAGIC["image"]
            + w.to_bytes(2, "big")
            + h.to_bytes(2, "big")
            + _keystream(media_id, w * h)
        )
    if kind == "audio":
        sr = 8000 + (media_id % 3) * 4000
        n = 64 + (media_id * 31) % 192
        return (
            _MAGIC["audio"]
            + sr.to_bytes(2, "big")
            + n.to_bytes(2, "big")
            + _keystream(media_id ^ 0xA0D10, n)
        )
    if kind == "video":
        n_frames = 4 + (media_id % 13)
        frame_len = 32
        return (
            _MAGIC["video"]
            + n_frames.to_bytes(2, "big")
            + frame_len.to_bytes(2, "big")
            + _keystream(media_id ^ 0x51DE0, n_frames * frame_len)
        )
    raise ValueError(f"unknown media kind: {kind}")


def synth_media(spark, n: int = 60, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table (no external data). Kind cycles
    image/audio/video by media_id so every op sees every kind."""
    kinds = ["image", "audio", "video"]
    rows = [
        (i, kinds[i % 3], _MIME[kinds[i % 3]], synth_payload(i, kinds[i % 3]))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema=MEDIA).repartition(partitions)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a media table from the documents corpus with the text bytes
    as the payload (kind by doc_id mod 3). Pure Column expressions — this
    is the SQL-oracle-checkable surface (DuckDB: encode(text))."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").cast("long").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-"), kind).alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """(media_id, kind, payload_len, payload_md5) — payload accounting as
    pure JVM-side columns; the scan reads only the needed columns."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("long").alias("payload_len"),
        F.md5("payload").alias("payload_md5"),
    )


# ---------------------------------------------------------------------------
# decode (stub-gated)
# ---------------------------------------------------------------------------

def _decode_fake(media_id: int, kind: str, payload: bytes):
    """Deterministic fake decoder for the synthetic FAKE-header payloads.
    Mirrors what a real decoder returns: dims/rates + the raw buffer."""
    base = dict(width=None, height=None, sample_rate=None, n_samples=None, n_frames=None)
    if payload is None or len(payload) < 11 or payload[:7] != _MAGIC.get(kind, b"")[:7]:
        return {**base, "decoder": "fake", "pixels": None}
    a = int.from_bytes(payload[7:9], "big")
    b = int.from_bytes(payload[9:11], "big")
    body = payload[11:]
    if kind == "image":
        return {**base, "width": a, "height": b, "decoder": "fake", "pixels": body[: a * b]}
    if kind == "audio":
        return {**base, "sample_rate": a, "n_samples": b, "decoder": "fake", "pixels": body[:b]}
    return {**base, "n_frames": a, "decoder": "fake", "pixels": body[: a * b]}


def _decode_real(media_id: int, kind: str, payload: bytes):
    """Real-decoder path. The image/audio libs are not in this container;
    the plumbing is what this module makes real — the actual decode is a
    clearly-marked stub per the build contract."""
    raise NotImplementedError(
        "real media decoding requires PIL/libav, which are not installed; "
        "the deterministic fake decoder handles the synthetic payloads"
    )


def _have_real_decoder() -> bool:
    try:  # pragma: no cover - PIL absent in this container by design
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(media: DataFrame) -> DataFrame:
    """binary payload → decoded buffer + typed dims, one fused mapInPandas
    pass (Arrow batches in and out, no per-row Python at the boundary).
    Output drops the payload column so downstream stages never re-shuffle
    the original bytes."""
    use_real = _have_real_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_real if use_real else _decode_fake
        for pdf in batches:
            recs = [
                {"media_id": mid, "kind": kind, **decode(mid, kind, payload)}
                for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(recs, columns=[f.name for f in DECODED.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=DECODED)


RESIZED = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("resized_md5", StringType(), False),
    ]
)


def resize_images(decoded: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Deterministic block-mean downsample of decoded grayscale buffers to
    (out_w × out_h); emits the md5 of the resized buffer. Vectorized
    numpy inside Arrow batches; non-images are filtered JVM-side before
    the Python boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, w, h, buf in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                if buf is None or w is None or h is None or len(buf) < w * h:
                    continue
                img = np.frombuffer(buf, dtype=np.uint8, count=w * h).reshape(h, w)
                # block-mean: split each axis into out_* nearly-equal blocks
                ys = np.array_split(np.arange(h), out_h)
                xs = np.array_split(np.arange(w), out_w)
                small = np.array(
                    [[int(img[np.ix_(y, x)].mean()) for x in xs] for y in ys],
                    dtype=np.uint8,
                )
                out.append(
                    (int(mid), out_w, out_h, hashlib.md5(small.tobytes()).hexdigest())
                )
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "resized_md5"]
            )

    imgs = decoded.filter(F.col("kind") == "image").select(
        "media_id", "width", "height", "pixels"
    )
    return imgs.mapInPandas(run, schema=RESIZED)


def sample_frames(media: DataFrame, frame_len: int = 64, every_n: int = 2) -> DataFrame:
    """Every-Nth-frame sampling over video payloads: frame i covers bytes
    [i*frame_len, (i+1)*frame_len); emit (media_id, frame_idx, frame_md5)
    for i = 0, every_n, 2*every_n, …. Pure Column/SQL (substring + md5 on
    binary, posexplode of a sequence) — zero Python, and the same op in
    DuckDB SQL is the oracle."""
    vids = media.filter(F.col("kind") == "video")
    n_full = (F.octet_length("payload") / F.lit(frame_len)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_full - 1, F.lit(0)), F.lit(every_n))
    return (
        vids.filter(n_full > 0)
        .select("media_id", F.explode(idx).alias("frame_idx"), "payload")
        .select(
            "media_id",
            "frame_idx",
            F.md5(
                F.expr(f"substring(payload, frame_idx * {frame_len} + 1, {frame_len})")
            ).alias("frame_md5"),
        )
    )


def embed_media(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature extraction: blake2b(payload) expanded to
    a unit-norm float vector (the stand-in for a vision/audio encoder —
    the real model slots into this exact mapInPandas signature). Output
    composes with textops.ann_bruteforce_topk / ann_lsh_topk."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = _keystream(
                    int.from_bytes(
                        hashlib.blake2b(payload or b"", digest_size=8).digest(), "big"
                    ),
                    dim * 4,
                )
                v = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
                v = (v / 2**31) - 1.0
                v /= np.linalg.norm(v) or 1.0
                ids.append(int(mid))
                vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return media.select("media_id", "payload").mapInPandas(run, schema=schema)
