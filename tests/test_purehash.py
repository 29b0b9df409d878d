"""purehash: the pure-Python/numpy XXH64 must replicate Spark's xxhash64
bit-for-bit (it anchors the golden-VALUES oracles for the hash-derived
surfaces: minhash_lsh_near_dup, ann_ivf_topk init)."""

import numpy as np
import pytest

from parser_rdf_spark.purehash import (
    spark_hash_long,
    spark_hash_long_vec,
    spark_hash_longs,
    spark_hash_string,
    xxh64,
)

STRINGS = [
    "",
    "a",
    "abc",
    "abcd",
    "abcdefg",
    "abcdefgh",
    "exactly thirty-one bytes here!!",
    "exactly thirty-two bytes here!!!",
    "a longer string spanning well past thirty-two bytes for stripe coverage",
    "héllo wörld — unicode ✓",
]
LONGS = [0, 1, -1, 42, 123456789, -9876543210, 2**62, -(2**62), 2**63 - 1, -(2**63)]


def test_matches_spark_xxhash64(spark):
    rows = spark.sql(
        "SELECT "
        + ", ".join(f"xxhash64({s!r})" for s in STRINGS)
        + ", "
        + ", ".join(f"xxhash64({v}L)" for v in LONGS)
        + ", xxhash64(array(1L, 2L, 3L)), xxhash64(7L, 11L), xxhash64('ab', 5L)"
    ).collect()[0]
    vals = list(rows)
    for i, s in enumerate(STRINGS):
        assert vals[i] == spark_hash_string(s), s
    off = len(STRINGS)
    for i, v in enumerate(LONGS):
        assert vals[off + i] == spark_hash_long(v), v
    assert vals[-3] == spark_hash_longs([1, 2, 3])
    assert vals[-2] == spark_hash_long(11, spark_hash_long(7))
    assert vals[-1] == spark_hash_long(5, spark_hash_string("ab"))


def test_vectorized_matches_scalar():
    vals = np.array(LONGS, dtype=np.int64)
    vec = spark_hash_long_vec(vals, 42)
    for v, g in zip(LONGS, vec):
        assert int(g) == spark_hash_long(v)
    seeds = np.arange(len(LONGS), dtype=np.int64) - 3
    vec2 = spark_hash_long_vec(vals, seeds)
    for v, s, g in zip(LONGS, seeds, vec2):
        assert int(g) == spark_hash_long(v, int(s))


def test_known_xxh64_reference_vectors():
    # xxHash64 reference values (public test vectors, seed 0)
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999 - (1 << 64)
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999


@pytest.mark.parametrize("parts", [1, 7])
def test_ann_ivf_partition_invariant(spark, parts):
    """The deterministic quantizer must yield identical top-k under any
    input partitioning (the property KMeans float sums could not give)."""
    from parser_rdf_spark import textops

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = textops.ann_ivf_topk(emb.repartition(parts), k=2, n_lists=4, n_probe=2, n_iters=4)
    got = sorted((r.query_id, r.neighbor_id, r.rank) for r in out.collect())
    if not hasattr(test_ann_ivf_partition_invariant, "_ref"):
        test_ann_ivf_partition_invariant._ref = got
    assert got == test_ann_ivf_partition_invariant._ref
