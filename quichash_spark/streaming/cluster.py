"""Streaming cluster assignment: a CUSTOM stateful operator via
``applyInPandasWithState``.

``stream_exact_dedup`` (dedup.py) emits only first occurrences; this
operator emits EVERY arriving clip with its cluster assignment — the
incremental analog of the batch pipeline's exact-dedup clustering
(cluster_id = the group's first-seen clip).  Per-key state holds the
representative clip_id and a running member count, persisted by
Structured Streaming's state store across micro-batches, so a duplicate
arriving hours after its original still joins the original's cluster.

The reference has no streaming surface (SURVEY.md §2.8); this is the
engine's forward extension, and the state design is the one that holds
at 10^12 scale: state size is O(distinct content hashes), each entry two
small scalars, partitioned by the shuffle on content_hash.  For bounded
state under true infinite streams, pass ``ttl`` (processing-time
timeout): an expired hash simply re-seeds a new cluster, which is the
standard recall/state tradeoff — expiries are observable in the output
(``is_first`` re-fires).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from quichash_spark.config import CLIPS_CONFIG, DedupConfig
from quichash_spark.functions.udfs import compute_signatures

OUTPUT_SCHEMA = (
    "clip_id string, content_hash string, cluster_id string, "
    "member_n long, is_first boolean"
)
STATE_SCHEMA = "rep string, n long"


def _sorted_group(pdfs: Iterator[pd.DataFrame]) -> pd.DataFrame:
    """Concatenate a state group's micro-batch rows and sort by clip_id:
    within one micro-batch the min-clip_id presenter of a new key seeds
    the state, making every assignment a pure function of BATCH
    MEMBERSHIP (which the deterministic stream layout fixes) instead of
    intra-batch shuffle/iteration order.  O(group rows) per batch — the
    same rows were already being iterated."""
    parts = [pdf for pdf in pdfs if len(pdf)]
    if not parts:
        return pd.DataFrame()
    return pd.concat(parts, ignore_index=True).sort_values(
        "clip_id", kind="mergesort"
    )


def _assign(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # processing-time TTL fired with no new data: drop the entry
        state.remove()
        return
    rep, n = state.get if state.exists else (None, 0)
    out: dict[str, list] = {
        "clip_id": [], "content_hash": [], "cluster_id": [],
        "member_n": [], "is_first": [],
    }
    pdf = _sorted_group(pdfs)
    if len(pdf):
        for cid in pdf["clip_id"]:
            first = rep is None
            if first:
                rep = cid
            n += 1
            out["clip_id"].append(cid)
            out["content_hash"].append(key[0])
            out["cluster_id"].append(rep)
            out["member_n"].append(n)
            out["is_first"].append(first)
    state.update((rep, n))
    yield pd.DataFrame(out)


def stream_cluster_assign(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig = CLIPS_CONFIG,
    max_files_per_trigger: int | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """File-stream clips -> (clip_id, content_hash, cluster_id, ...).

    Bounded test harness (availableNow + memory sink); swap source/sink
    for the unbounded production run.
    """
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    sigs = compute_signatures(stream, cfg, include_minhash=False).filter(
        F.col("decode_ok")
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def assign_with_ttl(key, pdfs, state):
        yield from _assign(key, pdfs, state)
        # after the state.update inside _assign (a timeout can only be
        # armed on existing state); re-armed every batch the key appears
        if ttl_ms and state.exists:
            state.setTimeoutDuration(ttl_ms)

    assigned = (
        sigs.select("clip_id", "content_hash")
        .groupBy("content_hash")
        .applyInPandasWithState(
            assign_with_ttl, OUTPUT_SCHEMA, STATE_SCHEMA, "append", timeout
        )
    )
    name = "qh_scluster_" + hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    q = (
        assigned.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# incremental NEAR-duplicate assignment (band-key state)
# ---------------------------------------------------------------------------

BAND_OUT_SCHEMA = (
    "clip_id string, band_idx int, band_key long, rep string, is_new boolean"
)
BAND_STATE_SCHEMA = "rep string"


def _band_assign(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State per (band_idx, band_key): the first clip that presented this
    band key (the bucket's streaming representative)."""
    if state.hasTimedOut:
        state.remove()
        return
    rep = state.get[0] if state.exists else None
    out: dict[str, list] = {
        "clip_id": [], "band_idx": [], "band_key": [], "rep": [], "is_new": [],
    }
    pdf = _sorted_group(pdfs)
    if len(pdf):
        for cid in pdf["clip_id"]:
            first = rep is None
            if first:
                rep = cid
            out["clip_id"].append(cid)
            out["band_idx"].append(key[0])
            out["band_key"].append(key[1])
            out["rep"].append(rep)
            out["is_new"].append(first)
    state.update((rep,))
    yield pd.DataFrame(out)


def stream_near_dup_assign(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    cfg: DedupConfig = CLIPS_CONFIG,
    max_files_per_trigger: int | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Incremental LSH dedup: band-key state instead of exact-hash state —
    the true streaming analog of batch stage 3 (operators/lsh.py).

    A clip arriving in any micro-batch is assigned to the cluster of the
    FIRST clip that presented any of its LSH band keys (text + pcm
    channels), so a *near*-duplicate (not byte-identical) that arrives
    hours after the original joins the original's cluster.  Two stages:

    1. ``applyInPandasWithState`` keyed by ``(band_idx, band_key)`` —
       state is one clip_id per distinct band key (the streaming
       representative); size O(distinct band keys), shuffled by key,
       TTL-boundable exactly like the exact-hash operator.
    2. per-micro-batch reduction in ``foreachBatch``: a clip's cluster is
       the min representative over the band keys it MATCHED (rows where it
       was not the seeder), else itself.  All of one clip's band rows land
       in the same micro-batch, so this is a plain batch groupBy — the
       standard escape hatch for a second stateful stage.

    Streaming tradeoff vs the batch pipeline (documented, deliberate):
    clusters are star-shaped around first-seen representatives with no
    transitive merge (batch CC merges chains) and no SNR verification —
    it is the candidate recall surface, incremental; run the batch
    verify/CC stages over the checkpointed output for the precise final
    clusters.
    """
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    sigs = compute_signatures(stream, cfg, include_minhash=False).filter(
        F.col("decode_ok")
    )
    bands = sigs.select(
        "clip_id",
        F.posexplode(F.concat("band_keys_text", "band_keys_pcm")).alias(
            "band_idx", "band_key"
        ),
    )
    return _run_band_stream(spark, bands, checkpoint_dir, out_dir, ttl_ms)


def _run_band_stream(
    spark: SparkSession,
    bands: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
    ttl_ms: int | None,
) -> DataFrame:
    """Shared tail of the band-key near-dup operators: stateful bucket
    assignment + per-micro-batch min-rep reduction -> parquet sink.
    ``bands`` is any streaming (clip_id, band_idx int, band_key long)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def assign_with_ttl(key, pdfs, state):
        yield from _band_assign(key, pdfs, state)
        if ttl_ms and state.exists:
            state.setTimeoutDuration(ttl_ms)

    assigned = bands.groupBy("band_idx", "band_key").applyInPandasWithState(
        assign_with_ttl, BAND_OUT_SCHEMA, BAND_STATE_SCHEMA, "append", timeout
    )

    def finalize(batch_df: DataFrame, _batch_id: int) -> None:
        matched = F.when(
            ~F.col("is_new") & (F.col("rep") != F.col("clip_id")), F.col("rep")
        )
        out = (
            batch_df.groupBy("clip_id")
            .agg(F.min(matched).alias("match_rep"))
            .select(
                "clip_id",
                F.coalesce("match_rep", "clip_id").alias("cluster_id"),
                F.col("match_rep").isNotNull().alias("joined_existing"),
            )
        )
        out.write.mode("append").parquet(out_dir)

    q = (
        assigned.writeStream.foreachBatch(finalize)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


EMB_BAND_OUT_SCHEMA = (
    "clip_id string, band_idx int, band_key long, rep string, "
    "is_new boolean, cosine double"
)
#: rep clip_id + the rep's embedding: the bucket verifies arrivals
#: against its seeder without any extra lookup or join
EMB_BAND_STATE_SCHEMA = "rep string, emb array<double>"


def _emb_band_assign(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State per (table_idx, bucket): the seeding clip AND its embedding,
    so every later arrival's exact cosine to the bucket representative is
    computed right here — no second stateful stage, no lookup join."""
    import numpy as np

    if state.hasTimedOut:
        state.remove()
        return
    rep, rep_emb = state.get if state.exists else (None, None)
    if rep_emb is not None:
        rep_emb = np.asarray(rep_emb, dtype=np.float64)
    out: dict[str, list] = {
        "clip_id": [], "band_idx": [], "band_key": [], "rep": [],
        "is_new": [], "cosine": [],
    }
    pdf = _sorted_group(pdfs)
    if len(pdf):
        for cid, vec in zip(pdf["clip_id"], pdf["embedding"]):
            v = np.asarray(vec, dtype=np.float64)
            first = rep is None
            if first:
                rep, rep_emb = cid, v
                cos = 1.0
            else:
                # embeddings are L2-normalized by the kernel
                cos = float(v @ rep_emb)
            out["clip_id"].append(cid)
            out["band_idx"].append(key[0])
            out["band_key"].append(key[1])
            out["rep"].append(rep)
            out["is_new"].append(first)
            out["cosine"].append(cos)
    if rep is not None:
        state.update((rep, [float(x) for x in rep_emb]))
    yield pd.DataFrame(out)


def stream_embed_neardup_assign(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    threshold: float | None = None,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    max_files_per_trigger: int | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Incremental PERCEPTUAL dedup: hyperplane-LSH buckets over
    streaming MFCC embeddings (functions/audio_embed.py), with
    ``(table_idx, bucket)`` playing the MinHash variant's
    ``(band_idx, band_key)`` role — plus an exact-cosine VERIFY the
    MinHash variant lacks: the bucket state carries its seeder's
    embedding, every arrival's cosine to the seeder is computed inside
    the stateful operator, and only matches ``>= threshold``
    (default: the batch channel's NEARDUP_THRESHOLD) join a cluster.

    Loose buckets + exact verify = batch-equivalent precision with
    candidate recall ``1-(1-(1-acos(c)/pi)^n_planes)^n_tables``
    (~0.995 for the fixture's SNR-33dB copies at 12 planes x 4
    tables).  Without the verify, bucket-only merging over-merged the
    sine-mixture corpus 3.2x (402/500 clips joined vs 125 verified).
    State is (clip_id, dim-30 embedding) per distinct (table, bucket)
    — O(distinct buckets), TTL-boundable.  Clusters remain star-shaped
    around first-seen reps (batch CC merges chains; see
    stream_near_dup_assign's tradeoff note)."""
    import numpy as np

    from quichash_spark.functions.audio_embed import (
        EMBED_CONFIG, NEARDUP_THRESHOLD, compute_audio_embeddings,
    )
    from quichash_spark.operators.similarity import hyperplane_buckets_udf

    if threshold is None:
        threshold = NEARDUP_THRESHOLD
    dim = 2 * (EMBED_CONFIG.n_mfcc - 1)
    planes = np.random.default_rng(seed).standard_normal(
        (n_tables, n_planes, dim)
    )
    buckets = hyperplane_buckets_udf(planes)
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    emb = compute_audio_embeddings(stream)
    bands = emb.select(
        "clip_id",
        "embedding",
        F.posexplode(buckets(F.col("embedding"))).alias("band_idx", "band_key"),
    ).select("band_idx", "band_key", "clip_id", "embedding")

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def assign_with_ttl(key, pdfs, state):
        yield from _emb_band_assign(key, pdfs, state)
        if ttl_ms and state.exists:
            state.setTimeoutDuration(ttl_ms)

    assigned = bands.groupBy("band_idx", "band_key").applyInPandasWithState(
        assign_with_ttl, EMB_BAND_OUT_SCHEMA, EMB_BAND_STATE_SCHEMA,
        "append", timeout,
    )

    def finalize(batch_df: DataFrame, _batch_id: int) -> None:
        matched = F.when(
            ~F.col("is_new")
            & (F.col("rep") != F.col("clip_id"))
            & (F.col("cosine") >= threshold),
            F.col("rep"),
        )
        out = (
            batch_df.groupBy("clip_id")
            .agg(F.min(matched).alias("match_rep"))
            .select(
                "clip_id",
                F.coalesce("match_rep", "clip_id").alias("cluster_id"),
                F.col("match_rep").isNotNull().alias("joined_existing"),
            )
        )
        out.write.mode("append").parquet(out_dir)

    q = (
        assigned.writeStream.foreachBatch(finalize)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
