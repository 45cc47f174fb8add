"""Operator-level tests over the tiny fixture corpus + handcrafted frames,
mirroring the reference's per-module scenario tests (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from quichash_spark.config import CLIPS_CONFIG
from quichash_spark.operators.connected_components import connected_components


@pytest.fixture(scope="module")
def signatures(spark, tiny_clips):
    from quichash_spark.functions.udfs import compute_signatures

    return compute_signatures(tiny_clips, CLIPS_CONFIG).cache()


def _planted(kind: str, n: int = 200) -> set[tuple[str, str]]:
    """Planted dup pairs of a given kind from truth."""
    from quichash_spark.fixtures.clips import truth_row

    groups: dict[str, list[str]] = {}
    for i in range(n):
        t = truth_row(i)
        if t["kind"] == kind:
            groups.setdefault(t["true_cluster_id"], []).append(t["clip_id"])
    out = set()
    for m in groups.values():
        m.sort()
        for k in range(1, len(m)):
            for l in range(k):
                out.add((m[l], m[k]))
    return out


def test_exact_dedup_matches_truth(signatures):
    from quichash_spark.operators.exact_dedup import exact_duplicate_edges, exact_duplicate_groups

    groups = exact_duplicate_groups(signatures).collect()
    edges = {(r["clip_a"], r["clip_b"]) for r in exact_duplicate_edges(signatures).collect()}
    planted = _planted("exact")
    assert edges == planted  # pairs of size-2 groups == star edges
    assert all(r["n"] == 2 for r in groups)
    assert len(groups) == len(planted)
    # wasted bytes: (n-1) * n_samples * 2
    sig_rows = {r["clip_id"]: r["n_samples"] for r in signatures.collect()}
    for r in groups:
        assert r["wasted_bytes"] == sig_rows[r["clip_ids"][0]] * 2


def test_lsh_finds_equal_and_near_transcripts(signatures):
    from quichash_spark.operators.lsh import lsh_candidates

    pairs, dropped = lsh_candidates(signatures, CLIPS_CONFIG, "minhash_text")
    got = {(r["clip_a"], r["clip_b"]) for r in pairs.collect()}
    # identical transcripts (exact + audio-near pairs) are always candidates
    assert _planted("exact") <= got
    assert _planted("audio_near") <= got
    # containment pairs planted at J>=0.6 — expect all found at n=200
    assert _planted("containment") <= got
    assert dropped.count() == 0  # cap 2000 >> hot-band size at n=200


def test_lsh_bucket_cap_drops_hot_band(spark, signatures):
    from dataclasses import replace

    from quichash_spark.operators.lsh import lsh_candidates

    capped = replace(CLIPS_CONFIG, band_bucket_cap=5)
    pairs, dropped = lsh_candidates(signatures, capped, "minhash_text")
    # the "ok" hot band (24 clips at n=200) exceeds cap 5 on all 32 bands
    assert dropped.count() >= 32
    ok_ids = [
        r["clip_id"]
        for r in signatures.filter(F.col("transcript") == "ok").select("clip_id").collect()
    ]
    got = {(r["clip_a"], r["clip_b"]) for r in pairs.collect()}
    hot_pairs = {(a, b) for a in ok_ids for b in ok_ids if a < b}
    assert not (got & hot_pairs)


def test_simhash_probe_equals_bruteforce(signatures):
    from quichash_spark.functions.hashing import hamming64
    from quichash_spark.operators.simhash_probe import simhash_candidates

    pairs, _ = simhash_candidates(signatures, CLIPS_CONFIG)
    got = {(r["clip_a"], r["clip_b"]) for r in pairs.collect()}
    sims = {r["clip_id"]: r["simhash"] for r in signatures.collect()}
    ids = sorted(sims)
    expect = set()
    hot = {cid for cid, s in sims.items()}
    # brute force, excluding buckets over the cap (the "ok" hot chunks)
    from collections import Counter

    from quichash_spark.functions.hashing import simhash_chunks_i64

    chunk_count: Counter = Counter()
    for cid in ids:
        for idx, val in enumerate(simhash_chunks_i64(sims[cid], CLIPS_CONFIG.simhash_chunks)):
            chunk_count[(idx, val)] += 1
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if hamming64(sims[a], sims[b]) <= CLIPS_CONFIG.simhash_hamming_r:
                shared = [
                    (idx, va)
                    for (idx, va), vb in zip(
                        enumerate(simhash_chunks_i64(sims[a], 4)),
                        simhash_chunks_i64(sims[b], 4),
                    )
                    if va == vb
                ]
                if any(
                    1 < chunk_count[(idx, val)] <= CLIPS_CONFIG.band_bucket_cap
                    for idx, val in shared
                ):
                    expect.add((a, b))
    assert got == expect
    assert _planted("text_near") <= got


def test_containment_finds_planted(signatures):
    from quichash_spark.operators.containment import containment_candidates

    got = {
        (r["clip_a"], r["clip_b"])
        for r in containment_candidates(signatures, CLIPS_CONFIG).collect()
    }
    assert _planted("containment") <= got


def test_verify_broadcast_size_guard(spark, tiny_clips, signatures):
    """Scale guard: past broadcast_pair_limit the verify slow path must
    not broadcast the membership table (10^12-row corpora can exceed the
    8 GB broadcast hard limit) — with Spark's auto-broadcast disabled the
    whole plan falls back to shuffle joins, and results are identical on
    both paths."""
    from quichash_spark.operators.verify import verify_candidates
    from quichash_spark.plans.inspect import explain_str

    pairs = sorted(_planted("audio_near")) + sorted(_planted("containment"))
    cands = spark.createDataFrame(
        [Row(clip_a=a, clip_b=b, source="lsh_text") for a, b in pairs]
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        guarded = verify_candidates(
            cands, tiny_clips, CLIPS_CONFIG, signatures=signatures,
            broadcast_pair_limit=0,
        )
        assert "BroadcastHashJoin" not in explain_str(guarded)
        hinted = verify_candidates(
            cands, tiny_clips, CLIPS_CONFIG, signatures=signatures,
            broadcast_pair_limit=1 << 40,
        )
        assert "BroadcastHashJoin" in explain_str(hinted)
        ga = sorted(map(tuple, guarded.collect()))
        gb = sorted(map(tuple, hinted.collect()))
        assert ga == gb and len(ga) == len(pairs)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_containment_hot_bucket_mid_slice():
    """Adversarial hot bucket (> FULL_MATRIX_LIMIT distinct texts): the
    Aho-Corasick path must find mid-slice containment ("A inside the middle
    of B"), which the round-1 prefix scan missed by design."""
    import pandas as pd

    from quichash_spark.operators.containment import FULL_MATRIX_LIMIT, _bucket_pairs

    texts = [f"zz filler {i} xx" for i in range(FULL_MATRIX_LIMIT + 10)]
    texts.append("needle tokens here")
    texts.append("big head needle tokens here big tail")  # mid-slice
    texts.append("needle tokens here and a suffix")       # prefix-slice
    pdf = pd.DataFrame({"transcript": texts, "thash": list(range(len(texts)))})
    out = _bucket_pairs(pdf)
    got = set(zip(out["thash_small"], out["thash_big"]))
    needle = len(texts) - 3
    assert (needle, needle + 1) in got  # mid-slice found
    assert (needle, needle + 2) in got  # prefix-slice still found
    # and agrees exactly with the brute-force matrix
    brute = {
        (i, j)
        for i, ti in enumerate(texts)
        for j, tj in enumerate(texts)
        if i != j and ti and ti != tj and f" {tj} ".find(f" {ti} ") >= 0
    }
    # map brute index pairs through the sorted-dedup order _bucket_pairs uses
    order = sorted(set(zip(texts, range(len(texts)))))
    remap = {t: h for t, h in order}
    brute_h = {(remap[texts[i]], remap[texts[j]]) for i, j in brute}
    assert got == brute_h


def test_verify_matrix(spark, tiny_clips, signatures):
    """Classification-matrix test mirroring the reference's verify tests
    (/root/reference/src/verify.rs:467-616): accept exact/near/containment,
    reject low-SNR and unrelated pairs."""
    from quichash_spark.operators.verify import verify_candidates

    cases = {
        "exact": (True, _planted("exact")),
        "audio_near": (True, _planted("audio_near")),
        "text_near": (True, _planted("text_near")),
        "containment": (True, _planted("containment")),
    }
    rows = [
        Row(clip_a=a, clip_b=b, source=kind)
        for kind, (_, pairs) in cases.items()
        for a, b in sorted(pairs)
    ]
    # negatives: hot-band pair (same transcript, unrelated audio) and the
    # planted SNR<20dB pair (clip 27 degraded vs clip 28 at block 1)
    rows.append(Row(clip_a="clip_00000086", clip_b="clip_00000087", source="neg_hotband"))
    rows.append(Row(clip_a="clip_00000027", clip_b="clip_00000028", source="neg_snr"))
    cands = spark.createDataFrame(rows)
    verdicts = verify_candidates(cands, tiny_clips, CLIPS_CONFIG).collect()
    by_source: dict[str, list] = {}
    for r in verdicts:
        by_source.setdefault(r["source"], []).append(r)
    for kind, (want, pairs) in cases.items():
        assert all(r["accepted"] == want for r in by_source[kind]), kind
        assert len(by_source[kind]) == len(pairs)
    assert all(not r["accepted"] for r in by_source["neg_hotband"])
    assert all(not r["accepted"] for r in by_source["neg_snr"])
    # SNR gates behaved as designed
    assert all(r["snr_db"] >= 30 for r in by_source["audio_near"])
    assert all(r["snr_db"] < 30 for r in by_source["neg_snr"])


def test_connected_components_shapes(spark):
    def cc(edges: list[tuple[str, str]]) -> dict[str, str]:
        df = spark.createDataFrame(
            [Row(clip_a=a, clip_b=b) for a, b in edges] or [],
            schema="clip_a string, clip_b string",
        )
        return {
            r["clip_id"]: r["cluster_id"] for r in connected_components(df).collect()
        }

    # chain a-b-c-d collapses to min
    got = cc([("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}
    # two components + duplicate/reversed edges
    got = cc([("x", "y"), ("y", "x"), ("p", "q"), ("q", "r"), ("p", "r")])
    assert got == {"x": "x", "y": "x", "p": "p", "q": "p", "r": "p"}
    # empty edges
    assert cc([]) == {}
    # star already
    got = cc([("m", "n"), ("m", "o")])
    assert got == {"m": "m", "n": "m", "o": "m"}


def test_connected_components_long_chain(spark):
    """Worst-case diameter graph: large-star/small-star converges in
    O(log n) rounds, not O(n) (the scale property the DataFrame loop
    exists for)."""
    n = 1000
    edges = spark.createDataFrame(
        [(f"n{i:05d}", f"n{i+1:05d}") for i in range(n - 1)],
        "clip_a string, clip_b string",
    )
    assign = connected_components(edges, max_iters=20)
    rows = assign.collect()
    assert len(rows) == n
    assert {r["cluster_id"] for r in rows} == {"n00000"}


def test_connected_components_local_finish_equals_distributed(spark):
    """Two-level CC: the single-task union-find tail must produce exactly
    the distributed star-rounds assignment (same min-member labeling) on
    a mixed graph of chains, stars, triangles and singleton-free noise."""
    import random

    rng = random.Random(7)
    edges = []
    for c in range(30):  # chains of varying length
        ln = rng.randint(2, 12)
        base = c * 100
        edges += [(f"v{base+i:06d}", f"v{base+i+1:06d}") for i in range(ln)]
    for s in range(10):  # stars + a triangle closing edge
        hub = f"h{s:04d}"
        edges += [(hub, f"h{s:04d}_{k}") for k in range(5)]
        edges.append((f"h{s:04d}_0", f"h{s:04d}_1"))
    rng.shuffle(edges)
    df = spark.createDataFrame(edges, "clip_a string, clip_b string")
    local = {
        r["clip_id"]: r["cluster_id"]
        for r in connected_components(df, local_finish_threshold=10**9).collect()
    }
    dist = {
        r["clip_id"]: r["cluster_id"]
        for r in connected_components(df, local_finish_threshold=0).collect()
    }
    assert local == dist and len(local) > 200


def test_verify_standalone_computes_candidates_once(spark, tiny_clips, signatures):
    """Standalone verify (no checkpoint, no row-count hint) must not
    rebuild the candidate DAG for sizing: the persist-then-count path
    evaluates each candidate input row exactly once (VERDICT r2 #5)."""
    from pyspark.sql import functions as F

    from quichash_spark.operators.verify import verify_candidates

    pairs = sorted(_planted("audio_near"))
    base = spark.createDataFrame(
        [(a, b, "lsh_text") for a, b in pairs],
        "clip_a string, clip_b string, source string",
    )
    acc = spark.sparkContext.accumulator(0)

    def counting(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    cands = base.repartition(2).mapInPandas(
        counting, "clip_a string, clip_b string, source string"
    )
    out = verify_candidates(cands, tiny_clips, CLIPS_CONFIG, signatures=signatures)
    n_out = out.count()
    assert n_out == len(pairs)
    assert acc.value == len(pairs)  # would be 2x without the persist


def test_containment_strategies_pair_identical():
    """matrix, Aho-Corasick and suffix-array containment scans must emit
    the identical pair set on randomized buckets with planted slices,
    unicode tokens, empty and duplicate transcripts."""
    import numpy as np
    import pandas as pd

    from quichash_spark.operators.containment import _bucket_pairs

    rng = np.random.default_rng(17)
    vocab = ["alpha", "bravo", "charlie", "delta", "мир", "数据", "echo",
             "foxtrot", "golf", "hotel", "🎵", "india"]
    for trial in range(8):
        texts = []
        for t in range(30):
            n = int(rng.integers(1, 12))
            toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), n)]
            texts.append(" ".join(toks))
            if rng.random() < 0.4 and n > 2:   # plant a contiguous slice
                a = int(rng.integers(0, n - 1))
                b = int(rng.integers(a + 1, n + 1))
                texts.append(" ".join(toks[a:b]))
        texts.append("")                        # empty transcript
        texts.append(texts[0])                  # duplicate text
        pdf = pd.DataFrame(
            {"transcript": texts, "thash": [hash(t) & 0x7FFFFFFF for t in texts]}
        )
        results = {}
        for strat in ("matrix", "aho", "suffix"):
            out = _bucket_pairs(pdf, strategy=strat)
            results[strat] = set(zip(out["thash_small"], out["thash_big"]))
        assert results["matrix"] == results["aho"] == results["suffix"], trial
        assert results["matrix"], f"trial {trial} planted no containment?"


def test_pq_topk_matches_sequential_replica_and_has_recall(spark):
    """PQ ANN: (a) raw-ADC cosines (refine_factor=0) are EXACTLY what the
    sequential numpy replica computes from the same seeded codebooks —
    the distributed encode/ADC path adds nothing; (b) the refined
    operator's recall@5 vs brute-force cosine is high even on this
    table's razor-thin margins."""
    import numpy as np

    from quichash_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    got = S.pq_topk(queries, emb, k=5, refine_factor=0).collect()

    rows = emb.collect()
    ids = np.array([str(r["vec_id"]) for r in rows])
    mat = np.asarray([np.asarray(r["embedding"], np.float64) for r in rows])
    books = S.train_pq_codebooks(mat[:10_000], 16, 64, 10, 13)
    qmask = np.array([int(i) < 5 for i in ids])
    qmat, qids = mat[qmask], ids[qmask]
    cos = S.pq_score_batch(S.pq_encode_batch(mat, books), books, qmat)
    expect = {}
    for qi, qid in enumerate(qids):
        order = sorted(
            ((-cos[ni, qi], ids[ni]) for ni in range(len(ids)) if ids[ni] != qid)
        )[:5]
        for rank, (negc, nid) in enumerate(order, 1):
            expect[(qid, rank)] = (nid, round(-negc, 6))
    assert len(got) == len(expect)
    for r in got:
        nid, c = expect[(r["query_id"], r["rank"])]
        assert r["neighbor_id"] == nid and abs(r["cosine_pq"] - c) < 1e-9, r

    # refined recall@5 vs exact cosine (shortlist 4k, exact re-rank)
    refined = S.pq_topk(queries, emb, k=5).collect()
    exact = {(str(r["query_id"]), str(r["neighbor_id"]))
             for r in S.topk_bruteforce(queries, emb, k=5).collect()}
    pq = {(r["query_id"], r["neighbor_id"]) for r in refined}
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.8, recall


def test_cache_scopes_release_independently(spark):
    """VERDICT r4 #8: the persist registries are pipeline-scoped now —
    two pipelines sharing one session must not release each other's
    cached bucket summaries."""
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.fixtures import clips_dataframe
    from quichash_spark.functions.udfs import compute_signatures
    from quichash_spark.operators.cache_scope import CacheScope
    from quichash_spark.operators.lsh import unified_candidates

    sigs = compute_signatures(
        clips_dataframe(spark, 20), CLIPS_CONFIG, include_minhash=False
    )
    a, b = CacheScope(), CacheScope()
    unified_candidates(sigs, CLIPS_CONFIG, scope=a)
    unified_candidates(sigs, CLIPS_CONFIG, scope=b)
    held_a, held_b = a.dataframes, b.dataframes
    assert held_a and held_b
    assert all(d.is_cached for d in held_a + held_b)
    a.release()
    assert not a.dataframes
    assert all(not d.is_cached for d in held_a)
    assert all(d.is_cached for d in held_b)  # pipeline B untouched
    b.release()
    assert all(not d.is_cached for d in held_b)


def test_verify_self_sizing_persist_lands_in_scope(spark, tiny_clips):
    """verify_candidates without the n_candidates hint persists the
    candidate input for its sizing count — into the caller's scope, so
    the caller's release (not a module global) drains it."""
    from pyspark.sql import functions as F

    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.operators.cache_scope import CacheScope
    from quichash_spark.operators.verify import verify_candidates

    cands = spark.createDataFrame(
        [("clip_000000", "clip_000001", "lsh_text")],
        "clip_a string, clip_b string, source string",
    )
    with CacheScope() as scope:
        out = verify_candidates(cands, tiny_clips, CLIPS_CONFIG, scope=scope)
        assert len(scope.dataframes) == 1
        assert scope.dataframes[0].is_cached
        held = scope.dataframes
        out.filter(F.col("accepted").isNotNull()).count()
    assert all(not d.is_cached for d in held)


def test_shingle_table_equals_inline_shingle_array(spark):
    """shingle_table (token split materialized in its own projection —
    the r6 HOF-lambda CSE fix) must produce exactly the rows of the
    inline shingle_array column, including blank / short-text edges."""
    from pyspark.sql import functions as F

    from quichash_spark.operators.doc_dedup import shingle_array, shingle_table

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j"),
            (1, ""),
            (2, "   "),
            (3, "one two"),
            (4, "x " * 40),
            (5, "  padded   tokens  here  "),
        ],
        "doc_id long, text string",
    )
    k = 3
    inline = docs.select(
        "doc_id", shingle_array(F.col("text"), k).alias("shingles")
    )
    two_step = shingle_table(docs, F.col("doc_id"), k, id_alias="doc_id")
    got = {r["doc_id"]: r["shingles"] for r in two_step.collect()}
    want = {r["doc_id"]: r["shingles"] for r in inline.collect()}
    assert got == want
    # the split must be materialized below the shingle projection (two
    # Project nodes), not inlined back by CollapseProject
    plan = two_step._jdf.queryExecution().executedPlan().toString()
    assert plan.count("split(trim(") == 1


def test_scan_task_pairs_equals_per_bucket_scan():
    """The r6 task-bucketed containment scan must reproduce the
    per-(band_idx, band_key) applyInPandas groups exactly — including
    int64 thash fidelity above 2^53 (a bare [] column is float64 and a
    careless concat upcasts, silently mangling hash low bits)."""
    import numpy as np
    import pandas as pd

    from quichash_spark.operators.containment import (
        _bucket_pairs, _scan_task_pairs,
    )

    big = np.int64(-5123798661256609751)  # not float64-representable
    pdf = pd.DataFrame({
        "band_idx": [0, 0, 1, 1, 2],
        "band_key": [5, 5, 7, 7, 9],
        "transcript": ["a b c d", "b c", "a b c d", "b c", "lone"],
        "thash": [np.int64(11), big, np.int64(11), big, np.int64(33)],
        "task_bucket": [3, 3, 3, 3, 3],
    })
    got = _scan_task_pairs(pdf, "auto")
    want = pd.concat(
        [
            _bucket_pairs(g, "auto")
            for _, g in pdf.groupby(["band_idx", "band_key"], sort=False)
            if len(_bucket_pairs(g, "auto"))
        ],
        ignore_index=True,
    )
    assert got["thash_small"].dtype == np.int64
    pd.testing.assert_frame_equal(got, want)
    assert big in set(got["thash_small"])
    # all-empty input keeps int64 columns (never float64)
    empty = _scan_task_pairs(pdf[pdf.band_idx == 2], "auto")
    assert len(empty) == 0 and empty["thash_small"].dtype == np.int64
