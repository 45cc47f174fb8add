"""Skew-handling tests: salted repartitioning + hot-bucket caps."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from quichash_spark.operators.lsh import salted_repartition


def test_salted_repartition_spreads_hot_key(spark):
    # one hot key owning 90% of rows
    rows = [Row(clip_id=f"c{i}", band_key=0 if i < 900 else i) for i in range(1000)]
    df = spark.createDataFrame(rows)
    salted = salted_repartition(df, ["band_key"], salt_buckets=8, num_partitions=16)
    per_part = (
        salted.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum(F.when(F.col("band_key") == 0, 1).otherwise(0)).alias("hot"))
        .filter(F.col("hot") > 0)
        .collect()
    )
    # the hot key's 900 rows land on several partitions, none dominant
    assert len(per_part) >= 4
    assert max(r["hot"] for r in per_part) < 900
    # no rows lost
    assert salted.count() == 1000


def test_unified_candidates_drops_hot_and_reports(spark, tiny_clips):
    from dataclasses import replace

    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.functions.udfs import compute_signatures
    from quichash_spark.operators.lsh import unified_candidates

    sigs = compute_signatures(tiny_clips, CLIPS_CONFIG).cache()
    capped = replace(CLIPS_CONFIG, band_bucket_cap=5)
    pairs, dropped = unified_candidates(sigs, capped, use_pcm=True)
    # the "ok" hot band exceeds cap on all 32 text bands AND all 4
    # simhash chunks (identical simhash)
    assert dropped.count() >= 36
    ok_ids = {
        r["clip_id"]
        for r in sigs.filter(F.col("transcript") == "ok").select("clip_id").collect()
    }
    got = {(r["clip_a"], r["clip_b"]) for r in pairs.collect()}
    assert not {(a, b) for a in ok_ids for b in ok_ids if a < b} & got


def test_unified_candidates_strategies_agree(spark, tiny_clips):
    """The one-shuffle agg expansion must produce byte-identical pairs,
    sources, and pcm-hit filtering to the reference band self-join."""
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.functions.udfs import compute_signatures
    from quichash_spark.operators.lsh import unified_candidates

    sigs = compute_signatures(tiny_clips, CLIPS_CONFIG).cache()
    results = {}
    drops = {}
    for s in ("window", "join", "agg"):
        pairs, dropped = unified_candidates(sigs, CLIPS_CONFIG, strategy=s)
        results[s] = {tuple(r) for r in pairs.collect()}
        drops[s] = {(r["band_idx"], r["band_key"], r["bucket_n"]) for r in dropped.collect()}
    assert results["window"] == results["join"] == results["agg"]
    assert results["join"]
    assert drops["window"] == drops["join"] == drops["agg"]


def test_slim_signatures_equivalent_buckets(spark, tiny_clips):
    """Pipeline checkpoints omit the raw MinHash vectors; bucket-based
    operators must behave identically off the precomputed band keys."""
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.functions.udfs import compute_signatures
    from quichash_spark.operators.containment import containment_candidates
    from quichash_spark.operators.lsh import unified_candidates

    full = compute_signatures(tiny_clips, CLIPS_CONFIG).cache()
    slim = compute_signatures(tiny_clips, CLIPS_CONFIG, include_minhash=False).cache()
    assert "minhash_text" not in slim.columns
    pf, _ = unified_candidates(full, CLIPS_CONFIG)
    ps, _ = unified_candidates(slim, CLIPS_CONFIG)
    assert {tuple(r) for r in pf.collect()} == {tuple(r) for r in ps.collect()}
    cf = {tuple(r) for r in containment_candidates(full, CLIPS_CONFIG).collect()}
    cs = {tuple(r) for r in containment_candidates(slim, CLIPS_CONFIG).collect()}
    assert cf == cs and cf


def test_unified_candidates_restrict_ids_equals_postfilter(spark, tiny_clips):
    """restrict_ids (the incremental expansion shape) must produce
    EXACTLY the pairs of the unrestricted run that touch the set —
    same channel sources, same pcm-hit thresholding — for both the
    join strategy (one-sided expansion) and the agg strategy
    (post-filter of raw rows)."""
    from pyspark.sql import functions as F

    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.functions.udfs import compute_signatures
    from quichash_spark.operators.lsh import unified_candidates

    sigs = compute_signatures(tiny_clips, CLIPS_CONFIG, include_minhash=False)
    sigs = sigs.localCheckpoint(eager=True)
    new_ids = sigs.select("clip_id").filter(F.col("clip_id") >= "clip_00000150")

    full, _ = unified_candidates(sigs, CLIPS_CONFIG)
    want = sorted(
        (r["clip_a"], r["clip_b"], r["source"])
        for r in full.collect()
        if r["clip_a"] >= "clip_00000150" or r["clip_b"] >= "clip_00000150"
    )
    for strategy in ("join", "agg"):
        got_df, _ = unified_candidates(
            sigs, CLIPS_CONFIG, strategy=strategy, restrict_ids=new_ids
        )
        got = sorted(
            (r["clip_a"], r["clip_b"], r["source"]) for r in got_df.collect()
        )
        assert got == want, strategy
