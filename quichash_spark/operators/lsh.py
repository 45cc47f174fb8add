"""MinHash-LSH candidate generation with explicit skew handling.

Stage 3 of SURVEY.md §7.0.  Not present in the reference (its dedup is
exact-hash only, /root/reference/src/dedup.rs:599-629) — this is the
distributed generalization the north_rule requires.

Scale design (10^12 rows):

- Band keys are computed JVM-side (``xxhash64`` over signature slices)
  inside whole-stage codegen — no Python in this hot path.
- Candidate pairs come from a self-equi-join on ``(band_idx, band_key)``:
  a shuffle-hash/sort-merge join that AQE can skew-split.
- Hot bands (e.g. a constant transcript owned by millions of clips) are
  capped: bucket sizes are counted first and buckets larger than
  ``cfg.band_bucket_cap`` are EXCLUDED from pair generation, with the drop
  logged to the metrics table (north_rule requires explicit skew handling
  + lineage).  Exact duplicates inside a dropped bucket are still found by
  the content-hash stage, which has no quadratic blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quichash_spark.config import DedupConfig
from quichash_spark.operators.cache_scope import CacheScope

#: Default scope for callers that don't pass their own (ad-hoc
#: single-pipeline sessions).  Concurrent pipelines MUST each pass a
#: private :class:`CacheScope` to :func:`unified_candidates` or they
#: release each other's bucket summaries.
_DEFAULT_SCOPE = CacheScope()


def release_cached() -> None:
    """Unpersist every intermediate cached by unified_candidates calls
    that used the default scope.  Call after the candidate/dropped
    outputs are materialized (checkpointed)."""
    _DEFAULT_SCOPE.release()


def band_table(signatures: DataFrame, cfg: DedupConfig, column: str = "minhash_text") -> DataFrame:
    """(clip_id, band_idx, band_key) — one row per band per clip.

    band_key = xxhash64(slice(sig), band_idx): equal signature slices give
    equal keys; xxhash64 is deterministic across partitions/executors.

    Slim signatures (pipeline checkpoints, ``include_minhash=False``)
    carry the precomputed ``band_keys_*`` columns instead of the raw
    MinHash vectors; exploding those gives the IDENTICAL bucketing (equal
    signature slices collide under either key function, and buckets are
    keyed, never ordered).
    """
    key_col = column.replace("minhash_", "band_keys_")
    if column not in signatures.columns and key_col in signatures.columns:
        return signatures.select(
            "clip_id", F.posexplode(key_col).alias("band_idx", "band_key")
        )
    bands = F.array(
        *[
            F.xxhash64(F.slice(F.col(column), b * cfg.rows + 1, cfg.rows), F.lit(b))
            for b in range(cfg.bands)
        ]
    )
    return signatures.select(
        "clip_id", F.posexplode(bands).alias("band_idx", "band_key")
    )


def bucket_sizes(bands: DataFrame) -> DataFrame:
    return bands.groupBy("band_idx", "band_key").agg(F.count("*").alias("bucket_n"))


def salted_repartition(df: DataFrame, key_cols: list[str], salt_buckets: int,
                       salt_source: str = "clip_id",
                       num_partitions: int | None = None) -> DataFrame:
    """Spread hot keys across ``salt_buckets`` partitions per key.

    North_rule skew control: a plain ``repartition(key)`` puts a hot LSH
    band (millions of rows under one band_key) into ONE task; salting by
    ``xxhash64(salt_source) % salt_buckets`` fans each key out over
    ``salt_buckets`` tasks.  Use before per-bucket scans (containment,
    stats) whose downstream op is salt-insensitive; pair self-joins
    instead rely on the bucket CAP (a hot bucket must not generate pairs
    at all) + AQE skew-join splitting.
    """
    salt = F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets))
    cols = [*[F.col(c) for c in key_cols], salt]
    if num_partitions:
        # explicit count: AQE won't coalesce it away (pass it when the
        # downstream op needs guaranteed fan-out, not just a hint)
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)


def kept_buckets(
    signatures: DataFrame, cfg: DedupConfig, column: str = "minhash_text"
) -> tuple[DataFrame, DataFrame]:
    """(kept(clip_id, band_idx, band_key), dropped(band_idx, band_key,
    bucket_n)) — band rows restricted to non-trivial, non-capped buckets.

    Size-1 buckets (the overwhelming majority) and hot buckets above the
    cap never reach the self-join.  Callers that need both pair generation
    and bucket-level passes (containment) should compute this ONCE and
    share it.
    """
    bands = band_table(signatures, cfg, column)
    sizes = bucket_sizes(bands)
    kept_keys = sizes.filter(
        (F.col("bucket_n") > 1) & (F.col("bucket_n") <= cfg.band_bucket_cap)
    ).select("band_idx", "band_key")
    dropped = sizes.filter(F.col("bucket_n") > cfg.band_bucket_cap)
    return bands.join(kept_keys, ["band_idx", "band_key"]), dropped


def pairs_from_buckets(kept: DataFrame, source: str, deduplicate: bool = True) -> DataFrame:
    """Self-join within buckets -> (clip_a < clip_b, source).

    ``deduplicate=False`` skips the per-channel shuffle when the caller
    already de-duplicates the unioned candidate set (the pipeline does).
    """
    a = kept.alias("a")
    b = kept.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.clip_id") < F.col("b.clip_id")),
    ).select(
        F.col("a.clip_id").alias("clip_a"),
        F.col("b.clip_id").alias("clip_b"),
    )
    if deduplicate:
        pairs = pairs.dropDuplicates(["clip_a", "clip_b"])
    return pairs.withColumn("source", F.lit(source))


def lsh_candidates(
    signatures: DataFrame,
    cfg: DedupConfig,
    column: str = "minhash_text",
    source: str = "lsh_text",
) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs from banded MinHash + a dropped-bucket report.

    Returns ``(candidates(clip_a, clip_b, source), dropped(band_idx,
    band_key, bucket_n))``.  ``clip_a < clip_b``; pairs seen in several
    bands are de-duplicated.
    """
    kept, dropped = kept_buckets(signatures, cfg, column)
    return pairs_from_buckets(kept, source), dropped


def unified_bucket_table(
    signatures: DataFrame, cfg: DedupConfig, use_pcm: bool = True
) -> DataFrame:
    """ONE bucket table for every candidate channel (the shuffle-count
    optimization: one sizes pass + one kept-join + one self-join instead
    of three of each).

    band_idx ranges encode the channel:
      [0, bands)            text MinHash bands
      [bands, 2*bands)      pcm MinHash bands           (if use_pcm)
      [2*bands, +chunks)    SimHash pigeonhole chunks

    Rows carry ``simhash`` so the Hamming-radius filter for chunk-channel
    pairs applies directly after the self-join.
    """
    width = 64 // cfg.simhash_chunks
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit(mask))
            .cast("long")
            for i in range(cfg.simhash_chunks)
        ]
    )
    # band keys were precomputed (vectorized) in the signature stage;
    # this is a pure explode — no hashing re-evaluated per plan branch
    if use_pcm:
        keys = F.concat(F.col("band_keys_text"), F.col("band_keys_pcm"), chunks)
    else:
        keys = F.concat(F.col("band_keys_text"), chunks)
    return signatures.select(
        "clip_id", "simhash", F.posexplode(keys).alias("band_idx", "band_key")
    )


def unified_candidates(
    signatures: DataFrame, cfg: DedupConfig, use_pcm: bool = True,
    strategy: str = "join", scope: CacheScope | None = None,
    restrict_ids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """All candidate channels in one shuffle plan.

    Returns (pairs(clip_a, clip_b, source), dropped buckets).  ``source``
    is the comma-joined sorted set of channels that produced the pair.
    ``scope``: registry for the persisted bucket summaries — pass a
    per-pipeline :class:`CacheScope` when several pipelines share one
    session; defaults to the module scope drained by
    :func:`release_cached`.

    ``restrict_ids`` (one ``clip_id`` column): emit only pairs with at
    least one side in the set — the INCREMENTAL shape.  Bucket sizes,
    caps and per-pair channel aggregation are still computed over the
    FULL corpus (batch-identical semantics); the restriction changes
    only pair EXPANSION, which becomes two joins each with the (small)
    restricted band rows on one side, so unrestricted-x-unrestricted
    combinations are never materialized (test-asserted equal to
    post-filtering the full pair set).

    Three physical strategies produce identical pairs (test-asserted):

    - ``"window"``: one window count partitioned by bucket key does
      size-count + cap-filter in a single exchange of the bucket table,
      and the member-list groupBy reuses that partitioning; pairs expand
      via a codegen higher-order expression.  Fewest shuffles.
    - ``"join"``: sizes aggregate, kept-keys join, then the classic band
      self-join (AQE-skew-splittable).
    - ``"agg"``: sizes + kept-join like ``"join"``, then member lists +
      codegen expansion instead of the self-join.

    In every strategy the cap filter runs BEFORE any collect_list, so a
    hot bucket is never buffered into an array at 10^12-row scale, and
    per-bucket pair arrays are bounded by cap^2/2 transient structs.
    """
    scope = scope if scope is not None else _DEFAULT_SCOPE
    _persist = scope.persist
    nb = cfg.bands
    n_channels = nb * (2 if use_pcm else 1)
    # The full bucket table is NOT persisted (caching 68 deserialized
    # rows/clip measured SLOWER than recomputing the codegen explode over
    # the page-cached parquet checkpoint).  The >1-member bucket SUMMARY
    # is: it is tiny (proportional to true-dup buckets), and both
    # children — kept_keys (pair generation) and dropped (skew metrics) —
    # read it, so the 13.6M-row sizes shuffle runs once instead of twice
    # (the dropped-metrics job used to re-run the whole explode+agg).
    buckets = unified_bucket_table(signatures, cfg, use_pcm)

    if strategy == "window":
        # ONE exchange total for size-count + cap-filter + member lists:
        # the window count partitions by bucket key, the >1 filter drops
        # the (overwhelming) size-1 majority, and the member-list groupBy
        # REUSES the window's partitioning (no second shuffle of the
        # bucket table).  Hot buckets pass through as rows (bounded: they
        # are filtered before any array is built) and surface in
        # ``dropped`` off the same persisted summary.
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_key")
        summary = _persist(
            buckets.withColumn("bucket_n", F.count("*").over(w)).filter(
                F.col("bucket_n") > 1
            )
        )
        dropped = (
            summary.filter(F.col("bucket_n") > cfg.band_bucket_cap)
            .groupBy("band_idx", "band_key")
            .agg(F.first("bucket_n").alias("bucket_n"))
        )
        members = (
            summary.filter(F.col("bucket_n") <= cfg.band_bucket_cap)
            .groupBy("band_idx", "band_key")
            .agg(F.sort_array(F.collect_list(F.struct("clip_id", "simhash"))).alias("ms"))
        )
        raw = _expand_bucket_pairs(members)
        return _pairs_from_raw(raw, cfg, nb, n_channels, use_pcm), dropped

    sizes = buckets.groupBy("band_idx", "band_key").agg(F.count("*").alias("bucket_n"))
    summary = _persist(sizes.filter(F.col("bucket_n") > 1))
    kept_keys = summary.filter(F.col("bucket_n") <= cfg.band_bucket_cap).select(
        "band_idx", "band_key"
    )
    dropped = summary.filter(F.col("bucket_n") > cfg.band_bucket_cap)

    if strategy == "agg":
        members = (
            buckets.join(kept_keys, ["band_idx", "band_key"])
            .groupBy("band_idx", "band_key")
            .agg(F.sort_array(F.collect_list(F.struct("clip_id", "simhash"))).alias("ms"))
        )
        raw = _expand_bucket_pairs(members)
        if restrict_ids is not None:
            raw = _raw_touching(raw, restrict_ids)
    else:
        kept = _persist(buckets.join(kept_keys, ["band_idx", "band_key"]))

        def side_join(left, right, extra):
            return left.alias("a").join(
                right.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.clip_id") < F.col("b.clip_id"))
                & extra,
            ).select(
                F.col("a.band_idx").alias("band_idx"),
                F.col("a.clip_id").alias("clip_a"),
                F.col("b.clip_id").alias("clip_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"),
            )

        if restrict_ids is None:
            raw = side_join(kept, kept, F.lit(True))
        else:
            # pair expansion with the restricted rows always on one side:
            # (new x all) where the NEW side is lexicographically smaller,
            # plus (all-minus-new x new) for the other orientation —
            # covers each touching pair exactly once, and old-x-old
            # combinations never expand
            flags = restrict_ids.select(
                F.col("clip_id").alias("rid")
            ).distinct()
            kept_r = _persist(
                kept.join(flags, kept["clip_id"] == flags["rid"], "left_semi")
            )
            kept_o = kept.join(flags, kept["clip_id"] == flags["rid"], "left_anti")
            raw = side_join(kept_r, kept, F.lit(True)).unionByName(
                side_join(kept_o, kept_r, F.lit(True))
            )

    return _pairs_from_raw(raw, cfg, nb, n_channels, use_pcm), dropped


def _raw_touching(raw: DataFrame, restrict_ids: DataFrame) -> DataFrame:
    """Post-filter raw pair rows to those touching the restricted set
    (the non-join strategies, where expansion already happened)."""
    flags_a = restrict_ids.select(F.col("clip_id").alias("clip_a")).distinct()
    flags_b = restrict_ids.select(F.col("clip_id").alias("clip_b")).distinct()
    a = raw.join(flags_a, "clip_a", "left_semi")
    # rows whose ONLY restricted side is clip_b (a-covered rows must not
    # repeat: the downstream channel aggregation counts raw rows)
    b = raw.join(flags_b, "clip_b", "left_semi").join(
        flags_a, "clip_a", "left_anti"
    )
    return a.unionByName(b.select(*a.columns))


def _expand_bucket_pairs(members: DataFrame) -> DataFrame:
    """i<j pair expansion of per-bucket member lists, whole-stage codegen:
    struct sort orders by clip_id (first field), so a=ms[i], b=ms[j>i]
    gives clip_a<clip_b."""
    pair_arr = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + F.lit(2), F.size(F.col("ms"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return members.select("band_idx", F.explode(pair_arr).alias("p")).select(
        "band_idx",
        F.col("p.a.clip_id").alias("clip_a"),
        F.col("p.b.clip_id").alias("clip_b"),
        F.col("p.a.simhash").alias("sh_a"),
        F.col("p.b.simhash").alias("sh_b"),
    )


def _pairs_from_raw(
    raw: DataFrame, cfg: DedupConfig, nb: int, n_channels: int, use_pcm: bool
) -> DataFrame:
    channel = (
        F.when(F.col("band_idx") < nb, F.lit("lsh_text"))
        .when(F.col("band_idx") < n_channels, F.lit("lsh_pcm") if use_pcm else F.lit("simhash"))
        .otherwise(F.lit("simhash"))
    )
    return (
        raw
        # SimHash chunk buckets are 16-bit random collisions; only pairs
        # within the Hamming ball are candidates (matches simhash_probe)
        .filter(
            (F.col("band_idx") < n_channels)
            | (
                F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
                <= cfg.simhash_hamming_r
            )
        )
        .select("clip_a", "clip_b", channel.alias("channel"))
        .groupBy("clip_a", "clip_b")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("channel"))).alias("source"),
            F.sum(F.when(F.col("channel") == "lsh_pcm", 1).otherwise(0)).alias("pcm_hits"),
        )
        # Collision-count thresholding for the noisy pcm channel: a true
        # audio near-duplicate (J >~ 0.5 on frame shingles) matches many
        # of the 32 bands; a corpus-level random word collision matches
        # exactly one.  Requiring >= min_pcm_band_hits keeps verification
        # volume linear in true-duplicate count, not corpus size.
        .filter(
            (F.col("source") != "lsh_pcm")
            | (F.col("pcm_hits") >= cfg.min_pcm_band_hits)
        )
        .drop("pcm_hits")
    )
