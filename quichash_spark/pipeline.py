"""End-to-end near-duplicate detection + clustering pipeline.

Orchestrates the stage list of SURVEY.md §7.0 over an input ``clips``
DataFrame (schema per BASELINE.json input_hint), checkpointing every stage
through a :class:`~quichash_spark.storage.CheckpointStore` so a killed run
resumes by skipping completed stages (manifest-gated, idempotent writes).

    clips ─1→ signatures ─2→ exact edges ──────────────┐
                 ├─3→ LSH text candidates ──┐          │
                 ├─3b→ LSH pcm candidates ──┤          │
                 ├─4→ simhash candidates ───┼─6→ verify┼─7→ clusters
                 └─5→ containment cands ────┘          │
                                        8: metrics + manifest (all stages)
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quichash_spark.config import CLIPS_CONFIG, DedupConfig
from quichash_spark.functions.udfs import compute_signatures
from quichash_spark.operators.cache_scope import CacheScope
from quichash_spark.operators.connected_components import connected_components
from quichash_spark.operators.containment import containment_candidates
from quichash_spark.operators.exact_dedup import exact_duplicate_groups
from quichash_spark.operators.verify import verify_candidates
from quichash_spark.storage import CheckpointStore


@dataclass
class PipelineResult:
    signatures: DataFrame
    exact_groups: DataFrame
    candidates: DataFrame
    verified: DataFrame
    clusters: DataFrame
    stage_seconds: dict[str, float]


def _stage(store: CheckpointStore, name: str, build, timings: dict[str, float]) -> DataFrame:
    """Run ``build()`` and checkpoint unless the manifest says complete."""
    if store.is_complete(name):
        timings[name] = 0.0
        return store.read(name)
    t0 = time.monotonic()
    df = build()
    out = store.write(df, name)  # records per-partition lineage metrics too
    timings[name] = round(time.monotonic() - t0, 3)
    return out


def run_pipeline(
    spark: SparkSession,
    clips: DataFrame,
    checkpoint_dir: str,
    cfg: DedupConfig = CLIPS_CONFIG,
    use_pcm_lsh: bool = True,
    use_containment: bool = False,
) -> PipelineResult:
    timings: dict[str, float] = {}
    store = CheckpointStore(spark, checkpoint_dir, cfg)

    # include_minhash=False: the dedup stages consume band keys + scalars
    # only, so the checkpoint (and the Python->JVM exchange) skips the raw
    # 128-perm MinHash vectors — ~400 MB of incompressible longs per 200k
    # clips.  Containment's bucket scan reads the precomputed band_keys
    # columns (identical bucketing, see lsh.band_table).
    signatures = _stage(
        store,
        "signatures",
        lambda: compute_signatures(clips, cfg, include_minhash=False),
        timings,
    )

    exact_groups = _stage(
        store, "exact_groups", lambda: exact_duplicate_groups(signatures), timings
    )
    # star edges derive from the (tiny) groups table — no second
    # checkpoint stage; clip_ids are sorted so element 1 is the group min
    exact_edges = exact_groups.select(
        F.element_at("clip_ids", 1).alias("clip_a"),
        F.explode("clip_ids").alias("clip_b"),
    ).filter(F.col("clip_a") != F.col("clip_b"))

    # per-run registry: concurrent pipelines in one session each release
    # only their own persisted bucket summaries (not each other's)
    scope = CacheScope()

    def build_candidates() -> DataFrame:
        from quichash_spark.operators.lsh import unified_candidates

        # every channel (text LSH, pcm LSH, simhash chunks) through ONE
        # bucket table => one sizes pass, one kept-join, one self-join
        pairs, dropped = unified_candidates(
            signatures, cfg, use_pcm=use_pcm_lsh, scope=scope
        )
        store.append_metrics("buckets_dropped", dropped)
        if use_containment:
            # redundant with lsh_text + the verify kernel's containment
            # acceptance (same buckets) — off by default, available for
            # configs that cap pair generation harder than bucket scans
            cont = containment_candidates(signatures, cfg)
            pairs = (
                pairs.unionByName(cont.withColumnRenamed("source", "source"))
                .groupBy("clip_a", "clip_b")
                .agg(F.concat_ws(",", F.sort_array(F.collect_set("source"))).alias("source"))
            )
        return pairs

    try:
        candidates = _stage(store, "candidates", build_candidates, timings)
    finally:
        # the bucket summaries persisted inside unified_candidates are
        # fully consumed once the candidates checkpoint exists (and dead
        # weight if the stage failed); release THIS run's caches only
        scope.release()

    # exact pairs need no re-verification (proven identical by content
    # hash) but they also cost nothing: identical pcm_hash routes them
    # through the JVM fast path where transcript equality accepts them —
    # so no anti-join barrier is spent carving them out
    def build_verified() -> DataFrame:
        # manifest row count: sizing without a count job (even the
        # footer-metadata count is free to skip)
        return verify_candidates(
            candidates, clips, cfg, signatures=signatures,
            n_candidates=store.rows("candidates"), scope=scope,
        )

    try:
        verified = _stage(store, "verified_edges", build_verified, timings)
    finally:
        # no-op when the manifest count fed n_candidates; drains the
        # self-sizing persist otherwise (ADVICE r4: don't defer to a
        # manual module-level release)
        scope.release()

    def build_clusters() -> DataFrame:
        edges = (
            verified.filter(F.col("accepted"))
            .select("clip_a", "clip_b")
            .unionByName(exact_edges.select("clip_a", "clip_b"))
        )
        assign = connected_components(edges, cfg.cc_max_iters)
        all_clips = signatures.select("clip_id")
        return (
            all_clips.join(assign, "clip_id", "left")
            .select(
                "clip_id",
                F.coalesce("cluster_id", "clip_id").alias("cluster_id"),
            )
        )

    clusters = _stage(store, "clusters", build_clusters, timings)

    return PipelineResult(
        signatures=signatures,
        exact_groups=exact_groups,
        candidates=candidates,
        verified=verified,
        clusters=clusters,
        stage_seconds=timings,
    )


def incremental_update(
    spark: SparkSession,
    prior_checkpoint_dir: str,
    new_clips: DataFrame,
    all_clips: DataFrame,
    checkpoint_dir: str,
    cfg: DedupConfig = CLIPS_CONFIG,
    use_pcm_lsh: bool = True,
) -> PipelineResult:
    """Add NEW clips to an already-clustered corpus without re-running
    the full pipeline — the production shape for a growing 10^12-clip
    table, where daily increments cannot re-decode history.

    What is reused vs recomputed:

    - old clips' SIGNATURES come from the prior run's checkpoint — the
      decode-everything stage (the dominant cost) runs on the increment
      only, and old ``bytes`` are never re-read except for the bounded
      set of old clips that participate in a new candidate pair (the
      verify stage's existing semi-join pruning);
    - CANDIDATES run the identical unified bucket machinery over the
      signature union, then keep only pairs touching a new clip —
      bucket sizes (and therefore the skew caps) are computed over the
      FULL corpus, exactly as a batch run would see them;
    - CLUSTERS: prior assignments enter connected components as
      (cluster_id, clip_id) edges — the transitive reduction of every
      previously-accepted pair — unioned with the newly verified
      edges, so the result equals the batch run's transitive closure
      (new bridge clips correctly MERGE previously-separate clusters;
      tests assert batch == incremental exactly).

    At 10^12 scale the band-key explode over old signatures would be
    replaced by a maintained bucket table (same keys, persisted);
    checkpoint reuse already removes the decode, which dominates.

    ``all_clips`` must contain every clip (old + new) — it is only read
    through verification's byte-pruned path.
    """
    timings: dict[str, float] = {}
    prior = CheckpointStore(spark, prior_checkpoint_dir, cfg)
    for stage in ("signatures", "clusters"):
        if not prior.is_complete(stage):
            raise ValueError(
                f"prior checkpoint missing completed stage {stage!r}"
            )
    old_sigs = prior.read("signatures")
    old_clusters = prior.read("clusters")
    store = CheckpointStore(spark, checkpoint_dir, cfg)

    new_sigs = _stage(
        store,
        "signatures",
        lambda: compute_signatures(new_clips, cfg, include_minhash=False),
        timings,
    )
    signatures = old_sigs.unionByName(new_sigs)
    new_ids = new_sigs.select(F.col("clip_id").alias("nid"))

    def _touching_new(pairs: DataFrame) -> DataFrame:
        """Pairs with at least one NEW side (either column)."""
        a = pairs.join(
            new_ids, pairs["clip_a"] == new_ids["nid"], "left_semi"
        )
        b = pairs.join(
            new_ids, pairs["clip_b"] == new_ids["nid"], "left_semi"
        )
        return a.unionByName(b).dropDuplicates(["clip_a", "clip_b"])

    exact_groups = _stage(
        store, "exact_groups",
        lambda: exact_duplicate_groups(signatures), timings,
    )
    exact_edges = _touching_new(
        exact_groups.select(
            F.element_at("clip_ids", 1).alias("clip_a"),
            F.explode("clip_ids").alias("clip_b"),
        ).filter(F.col("clip_a") != F.col("clip_b"))
    )

    scope = CacheScope()

    def build_candidates() -> DataFrame:
        from quichash_spark.operators.lsh import unified_candidates

        # restrict_ids: pair expansion keeps the (small) new band rows on
        # one join side, so old-x-old combinations never materialize —
        # bucket sizes/caps still see the full corpus (batch-identical)
        pairs, dropped = unified_candidates(
            signatures, cfg, use_pcm=use_pcm_lsh, scope=scope,
            restrict_ids=new_ids.select(F.col("nid").alias("clip_id")),
        )
        store.append_metrics("buckets_dropped", dropped)
        return pairs

    try:
        candidates = _stage(store, "candidates", build_candidates, timings)
    finally:
        scope.release()

    def build_verified() -> DataFrame:
        return verify_candidates(
            candidates, all_clips, cfg, signatures=signatures,
            n_candidates=store.rows("candidates"), scope=scope,
        )

    try:
        verified = _stage(store, "verified_edges", build_verified, timings)
    finally:
        scope.release()

    def build_clusters() -> DataFrame:
        prior_edges = (
            old_clusters.filter(F.col("clip_id") != F.col("cluster_id"))
            .select(
                F.col("cluster_id").alias("clip_a"),
                F.col("clip_id").alias("clip_b"),
            )
        )
        edges = (
            verified.filter(F.col("accepted"))
            .select("clip_a", "clip_b")
            .unionByName(exact_edges.select("clip_a", "clip_b"))
            .unionByName(prior_edges)
        )
        assign = connected_components(edges, cfg.cc_max_iters)
        all_ids = signatures.select("clip_id")
        return (
            all_ids.join(assign, "clip_id", "left")
            .select(
                "clip_id",
                F.coalesce("cluster_id", "clip_id").alias("cluster_id"),
            )
        )

    clusters = _stage(store, "clusters", build_clusters, timings)

    return PipelineResult(
        signatures=new_sigs,
        exact_groups=exact_groups,
        candidates=candidates,
        verified=verified,
        clusters=clusters,
        stage_seconds=timings,
    )
