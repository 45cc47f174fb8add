"""Hash-registry golden tests, mirroring the reference's literal-digest
assertions (src/hash.rs:1089-1106) and algorithm catalog (346-439)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from quichash_spark.functions.hashreg import (
    HASH_REGISTRY,
    fast_mode_md5,
    hash_column,
    multi_hash,
)


@pytest.fixture(scope="module")
def texts(spark):
    return spark.createDataFrame(
        [Row(id=1, t="hello world"), Row(id=2, t=""), Row(id=3, t="héllo wörld 🎵")]
    )


def test_golden_digests(spark, texts):
    algos = ["md5", "sha1", "sha256", "sha512", "sha3-256", "blake2b"]
    got = {
        r["id"]: r
        for r in texts.select("id", "t", *multi_hash(F.col("t"), algos)).collect()
    }
    # reference-style golden literal (src/hash.rs:1089-1106)
    assert got[1]["sha256"] == (
        "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9"
    )
    for r in got.values():
        raw = r["t"].encode("utf-8")
        assert r["md5"] == hashlib.md5(raw).hexdigest()
        assert r["sha1"] == hashlib.sha1(raw).hexdigest()
        assert r["sha512"] == hashlib.sha512(raw).hexdigest()
        assert r["sha3_256"] == hashlib.sha3_256(raw).hexdigest()
        assert r["blake2b"] == hashlib.blake2b(raw).hexdigest()


def test_unknown_algorithm_lists_catalog(spark, texts):
    with pytest.raises(KeyError, match="available"):
        hash_column(F.col("t"), "rot13")


def test_stub_algorithms_raise(spark, texts):
    with pytest.raises(NotImplementedError, match="blake3"):
        texts.select(hash_column(F.col("t"), "blake3")).collect()


def test_fast_mode_equals_full_below_threshold(spark):
    """Reference invariant (src/hash.rs:1186-1206): sampled == full for
    small inputs; differs only above the threshold, deterministically."""
    rows = [
        Row(id=1, t="x" * 50),
        Row(id=2, t="".join(chr(97 + i % 26) for i in range(1000))),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            F.md5("t").alias("full"),
            fast_mode_md5(F.col("t")).alias("fast"),
        ).collect()
    }
    assert got[1]["fast"] == got[1]["full"]  # below threshold: identical
    assert got[2]["fast"] != got[2]["full"]  # sampled digest
    # deterministic: first/mid/last 100 chars
    t = rows[1].t
    mid = (len(t) - 100) // 2
    expect = hashlib.md5((t[:100] + t[mid : mid + 100] + t[-100:]).encode()).hexdigest()
    assert got[2]["fast"] == expect


def test_registry_covers_reference_catalog():
    """Every algorithm family the reference ships (src/hash.rs:346-439)
    has a registry entry (native, vectorized, or explicit stub)."""
    expected = {
        "md5", "sha1", "sha224", "sha256", "sha384", "sha512",
        "sha3-224", "sha3-256", "sha3-384", "sha3-512",
        "blake2b", "blake2s", "blake3", "xxh64", "xxh128",
    }
    assert expected <= set(HASH_REGISTRY)
