"""Containment-duplicate pass (stage 5 of SURVEY.md §7.0).

Detects pairs where one transcript is a contiguous token-slice of the
other (FIXTURES.md: A's tokens are a prefix slice of B's) inside LSH band
buckets — a grouped ``applyInPandas`` because a whole candidate bucket
must be seen at once (SURVEY.md §2.9).

Containment is defined at TOKEN level on canonicalized transcripts
(single-space joined):  contains(a, b)  <=>  " b " has " a " as a
substring, a != b, a non-empty.  Token-level containment avoids
pathological character-level matches (a 2-char transcript matching inside
an unrelated word).

Skew/scale notes:
- operates on DISTINCT transcripts per bucket (equal transcripts are
  handled by the exact/LSH channels), so a million-clip constant-text
  bucket contributes ONE row here;
- buckets above the LSH cap are already excluded upstream;
- small buckets (<= FULL_MATRIX_LIMIT distinct texts) use the direct
  substring matrix; larger ones build an Aho-Corasick automaton over the
  padded transcripts and scan each transcript once — COMPLETE (finds
  mid-slice containment, not just prefix slices) in
  O(total pattern chars + total haystack chars + matches) per bucket;
- a SUFFIX-ARRAY strategy (the north_rule's named technique) is also
  implemented — numpy prefix-doubling SA over the bucket's concatenated
  padded transcripts, binary-searched per pattern — and proven
  pair-identical to the other two on randomized unicode buckets
  (``_bucket_pairs(strategy=...)`` selects; Aho-Corasick stays the
  default as the asymptotically cheaper scan).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from quichash_spark.config import DedupConfig

FULL_MATRIX_LIMIT = 256

_PAIR_SCHEMA = StructType(
    [
        StructField("thash_small", LongType()),
        StructField("thash_big", LongType()),
    ]
)


def _contains(small: str, big: str) -> bool:
    return bool(small) and small != big and f" {big} ".find(f" {small} ") >= 0


def _aho_corasick_pairs(texts: list[tuple[str, int]]) -> tuple[list[int], list[int]]:
    """Complete containment scan for large buckets: automaton of all padded
    transcripts, one pass per transcript.  Same token-slice semantics as
    :func:`_contains` (padded-substring match, a != b, a non-empty)."""
    from collections import deque

    goto: list[dict[str, int]] = [{}]
    fail: list[int] = [0]
    out: list[list[int]] = [[]]
    for idx, (t, _) in enumerate(texts):
        if not t:
            continue
        node = 0
        for ch in f" {t} ":
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                fail.append(0)
                out.append([])
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node].append(idx)
    q: deque[int] = deque()
    for n1 in goto[0].values():
        q.append(n1)
    while q:
        u = q.popleft()
        for ch, v in goto[u].items():
            q.append(v)
            f = fail[u]
            while f and ch not in goto[f]:
                f = fail[f]
            nxt = goto[f].get(ch, 0)
            fail[v] = nxt if nxt != v else 0
            out[v].extend(out[fail[v]])

    out_s: list[int] = []
    out_b: list[int] = []
    for j, (tj, hj) in enumerate(texts):
        if not tj:
            continue
        node = 0
        seen: set[int] = set()
        for ch in f" {tj} ":
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                seen.update(out[node])
        for i in seen:
            if i != j and texts[i][0] != tj:
                out_s.append(texts[i][1])
                out_b.append(hj)
    return out_s, out_b


def _suffix_array(codes: "np.ndarray") -> "np.ndarray":
    """Suffix array by prefix doubling (numpy lexsort per round,
    O(n log^2 n), no per-character Python loop)."""
    import numpy as np

    n = codes.size
    rank = np.unique(codes, return_inverse=True)[1].astype(np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (
            (rank[order][1:] != rank[order][:-1])
            | (key2[order][1:] != key2[order][:-1])
        ).cumsum()
        rank[order] = changed
        if changed[-1] == n - 1:
            break
        k <<= 1
    out = np.empty(n, dtype=np.int64)
    out[rank] = np.arange(n)
    return out


def _suffix_array_pairs(texts: list[tuple[str, int]]) -> tuple[list[int], list[int]]:
    """Containment scan via a suffix array over the bucket's concatenated
    padded transcripts (the north_rule's named technique): binary-search
    each padded pattern in the SA, map hit positions to owning
    transcripts.  Same token-slice semantics as :func:`_contains`; proven
    pair-identical to the matrix and Aho-Corasick strategies in
    tests/test_operators.py."""
    import numpy as np

    padded = [f" {t} " if t else "" for t, _ in texts]
    # '\x00' separators: patterns contain none, so every SA hit lies
    # wholly inside one transcript's segment
    concat = "\x00".join(padded)
    # BIG-endian utf-32: fixed-width code units whose BYTE-wise
    # lexicographic order equals code-point order (little-endian would
    # mis-order non-ASCII — the corpus has unicode transcripts)
    data = concat.encode("utf-32-be")
    codes = np.frombuffer(data, dtype=">u4").astype(np.int64)
    sa = _suffix_array(codes)
    starts = []  # segment start (in code units) per text index
    pos = 0
    for p in padded:
        starts.append(pos)
        pos += len(p) + 1
    starts_arr = np.array(starts, dtype=np.int64)

    def suffix_cmp_ge(suf: int, pat: bytes) -> bool:
        return bytes(data[suf * 4 : suf * 4 + len(pat)]) >= pat

    out_s: list[int] = []
    out_b: list[int] = []
    n = sa.size
    for i, (ti, hi) in enumerate(texts):
        if not ti:
            continue
        pat = padded[i].encode("utf-32-be")  # same byte order as `data`
        # lower bound: first suffix >= pat
        lo, hi_b = 0, n
        while lo < hi_b:
            mid = (lo + hi_b) // 2
            if suffix_cmp_ge(int(sa[mid]), pat):
                hi_b = mid
            else:
                lo = mid + 1
        first = lo
        # upper bound: first suffix whose pat-length prefix > pat
        hi_b = n
        while lo < hi_b:
            mid = (lo + hi_b) // 2
            if bytes(data[int(sa[mid]) * 4 : int(sa[mid]) * 4 + len(pat)]) > pat:
                hi_b = mid
            else:
                lo = mid + 1
        hits = sa[first:lo]
        if hits.size == 0:
            continue
        owners = np.searchsorted(starts_arr, hits, side="right") - 1
        for j in np.unique(owners):
            j = int(j)
            if j != i and texts[j][0] != ti:
                out_s.append(hi)
                out_b.append(texts[j][1])
    return out_s, out_b


def _bucket_pairs(pdf: pd.DataFrame, strategy: str = "auto") -> pd.DataFrame:
    """Distinct-transcript containment pairs for one bucket.

    ``strategy``: 'auto' (matrix for small buckets, Aho-Corasick above
    FULL_MATRIX_LIMIT — the measured default), 'matrix', 'aho', or
    'suffix' (suffix-array substring search, the north_rule's named
    technique).  All strategies are pair-identical (tested)."""
    texts = sorted(set(zip(pdf["transcript"], pdf["thash"])))
    out_s: list[int] = []
    out_b: list[int] = []
    n = len(texts)
    if n <= 1:
        return pd.DataFrame({"thash_small": out_s, "thash_big": out_b})
    if strategy == "auto":
        strategy = "matrix" if n <= FULL_MATRIX_LIMIT else "aho"
    if strategy == "matrix":
        for i in range(n):
            ti, hi = texts[i]
            for j in range(n):
                if i != j and _contains(ti, texts[j][0]):
                    out_s.append(hi)
                    out_b.append(texts[j][1])
    elif strategy == "aho":
        out_s, out_b = _aho_corasick_pairs(texts)
    elif strategy == "suffix":
        out_s, out_b = _suffix_array_pairs(texts)
    else:
        raise ValueError(f"unknown containment strategy {strategy!r}")
    return pd.DataFrame({"thash_small": out_s, "thash_big": out_b})


def _scan_task_pairs(pdf: pd.DataFrame, strategy: str) -> pd.DataFrame:
    """Run :func:`_bucket_pairs` for every exact (band_idx, band_key)
    bucket inside one hash-bucketed task frame — output-identical to one
    applyInPandas group per bucket, minus the per-group framework cost."""
    # drop empty per-bucket frames before concat: a bare [] column
    # defaults to float64 and pd.concat would upcast the int64 hashes
    # (silent low-bit loss on values above 2^53)
    frames = [
        f
        for _, g in pdf.groupby(["band_idx", "band_key"], sort=False)
        if len(f := _bucket_pairs(g, strategy))
    ]
    if not frames:
        return pd.DataFrame({
            "thash_small": pd.Series([], dtype="int64"),
            "thash_big": pd.Series([], dtype="int64"),
        })
    return pd.concat(frames, ignore_index=True)


def containment_candidates(
    signatures: DataFrame, cfg: DedupConfig, kept: DataFrame | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Candidate pairs (clip_a < clip_b, source='containment').

    ``kept`` lets callers share the (cached) kept-bucket table with the
    LSH pair stage instead of recomputing banding + bucket sizes.
    ``strategy`` selects the per-bucket scan ('auto'/'matrix'/'aho'/
    'suffix' — see :func:`_bucket_pairs`); all are pair-identical.

    NOTE: within the pipeline this channel is subsumed — its buckets are
    exactly the LSH pair-generation buckets, so every containment pair it
    can emit is already an LSH candidate, and the verify kernel accepts
    containment pairs on its own.  It exists as a standalone operator for
    direct containment queries (and for configs where LSH pair generation
    is capped harder than bucket scans).
    """
    if kept is None:
        from quichash_spark.operators.lsh import kept_buckets

        kept, _ = kept_buckets(signatures, cfg, "minhash_text")

    texts = signatures.select(
        "clip_id", "transcript", F.xxhash64("transcript").alias("thash")
    )
    bucket_texts = (
        kept.join(texts, "clip_id")
        .select("band_idx", "band_key", "transcript", "thash")
        .dropDuplicates(["band_idx", "band_key", "thash"])
    )
    # Group by a HASH BUCKET of the band key, not the key itself (r6; the
    # verify-stage pattern): one applyInPandas group per (band_idx,
    # band_key) means one Arrow exchange + pandas frame per LSH bucket —
    # tens of thousands of ~0.2 ms framework round-trips that dominated
    # the operator (measured 15.1 s -> 3.5 s at sf0.1).
    # _scan_task_pairs resolves the exact buckets inside each frame, so
    # the per-bucket computation (and output) is unchanged.  Skew: kept
    # buckets are already capped upstream (<= band_bucket_cap members),
    # so a task bucket holds a bounded mix of bounded groups — the
    # previous salt-then-regroup shuffle is subsumed by the hash
    # distribution over n_tasks.
    par = signatures.sparkSession.sparkContext.defaultParallelism
    n_tasks = par * cfg.salt_buckets
    text_pairs = (
        bucket_texts.withColumn(
            "task_bucket",
            F.pmod(F.xxhash64("band_idx", "band_key"), F.lit(n_tasks)),
        )
        .groupBy("task_bucket")
        .applyInPandas(
            lambda pdf: _scan_task_pairs(pdf, strategy), _PAIR_SCHEMA
        )
        .dropDuplicates(["thash_small", "thash_big"])
    )
    # expand transcript pairs back to clip pairs
    ta = texts.select(F.col("clip_id").alias("cid_s"), F.col("thash").alias("thash_small"))
    tb = texts.select(F.col("clip_id").alias("cid_b"), F.col("thash").alias("thash_big"))
    return (
        text_pairs.join(ta, "thash_small")
        .join(tb, "thash_big")
        .filter(F.col("cid_s") != F.col("cid_b"))
        .select(
            F.least("cid_s", "cid_b").alias("clip_a"),
            F.greatest("cid_s", "cid_b").alias("clip_b"),
        )
        .dropDuplicates(["clip_a", "clip_b"])
        .withColumn("source", F.lit("containment"))
    )
