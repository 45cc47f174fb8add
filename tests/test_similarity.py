"""Similarity-search operators: brute force as ground truth; LSH and IVF
approximations measured against it (recall floor asserted)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_bruteforce_topk_shape(emb):
    from quichash_spark.operators.similarity import topk_bruteforce

    q = emb.filter(F.col("vec_id") < 5)
    got = topk_bruteforce(q, emb, k=3).collect()
    assert len(got) == 15
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3]
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)


def test_ann_lsh_recall_vs_bruteforce(emb):
    from quichash_spark.operators.similarity import ann_lsh_topk, topk_bruteforce

    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 20)
    exact = _pairs(topk_bruteforce(q, emb, k=3))
    # this corpus has NO strong neighbors (max cosine ~0.5 => theta ~60deg
    # => p_plane ~0.66): expected bucket-hit rate 1-(1-0.66^6)^16 ~ 0.67.
    # On real near-dup data (cosine > 0.9) the same config recalls ~1.
    approx = _pairs(ann_lsh_topk(q, emb, k=3, dim=dim, n_planes=6, n_tables=16))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall


def test_ivf_recall_vs_bruteforce(emb):
    from quichash_spark.operators.similarity import ivf_topk, topk_bruteforce

    q = emb.filter(F.col("vec_id") < 20)
    exact = _pairs(topk_bruteforce(q, emb, k=3))
    approx = _pairs(ivf_topk(q, emb, k=3, n_centroids=8, n_probe=4))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall
    # full probe == brute force (the dial's end stop)
    full = _pairs(ivf_topk(q, emb, k=3, n_centroids=8, n_probe=8))
    assert full == exact


def test_ann_deterministic(emb):
    from quichash_spark.operators.similarity import ann_lsh_topk

    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 5)
    a = _pairs(ann_lsh_topk(q, emb, k=3, dim=dim))
    b = _pairs(ann_lsh_topk(q, emb, k=3, dim=dim))
    assert a == b
