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
from quichash_spark.operators.connected_components import connected_components
from quichash_spark.operators.containment import containment_candidates
from quichash_spark.operators.exact_dedup import exact_duplicate_edges, exact_duplicate_groups
from quichash_spark.operators.lsh import lsh_candidates
from quichash_spark.operators.simhash_probe import simhash_candidates
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
    out = store.write(df, name)
    store.append_metrics(name, out)
    timings[name] = round(time.monotonic() - t0, 3)
    return out


def run_pipeline(
    spark: SparkSession,
    clips: DataFrame,
    checkpoint_dir: str,
    cfg: DedupConfig = CLIPS_CONFIG,
    use_pcm_lsh: bool = True,
) -> PipelineResult:
    timings: dict[str, float] = {}
    store = CheckpointStore(spark, checkpoint_dir, cfg)

    signatures = _stage(store, "signatures", lambda: compute_signatures(clips, cfg), timings)

    exact_groups = _stage(
        store, "exact_groups", lambda: exact_duplicate_groups(signatures), timings
    )
    exact_edges = _stage(
        store, "exact_edges", lambda: exact_duplicate_edges(signatures), timings
    )

    def build_candidates() -> DataFrame:
        text_pairs, text_dropped = lsh_candidates(signatures, cfg, "minhash_text", "lsh_text")
        sim_pairs, sim_dropped = simhash_candidates(signatures, cfg)
        cont_pairs = containment_candidates(signatures, cfg)
        parts = [text_pairs, sim_pairs, cont_pairs]
        if use_pcm_lsh:
            pcm_pairs, pcm_dropped = lsh_candidates(signatures, cfg, "minhash_pcm", "lsh_pcm")
            parts.append(pcm_pairs)
            store.append_metrics("lsh_pcm_dropped", pcm_dropped)
        store.append_metrics("lsh_text_dropped", text_dropped)
        store.append_metrics("simhash_dropped", sim_dropped)
        cands = parts[0]
        for p in parts[1:]:
            cands = cands.unionByName(p)
        # one verification per pair; keep the list of generating channels
        return (
            cands.groupBy("clip_a", "clip_b")
            .agg(F.concat_ws(",", F.sort_array(F.collect_set("source"))).alias("source"))
        )

    candidates = _stage(store, "candidates", build_candidates, timings)

    # exact pairs are proven identical by content hash — skip re-verification
    # (the reference's verify recomputes because files can change under it;
    # our signatures checkpoint is immutable within a run)
    def build_verified() -> DataFrame:
        exact_keys = exact_edges.select("clip_a", "clip_b")
        todo = candidates.join(exact_keys, ["clip_a", "clip_b"], "left_anti")
        return verify_candidates(todo, clips, cfg)

    verified = _stage(store, "verified_edges", build_verified, timings)

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
