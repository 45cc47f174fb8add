"""Plan-shape assertions: pushdown, pruning, broadcast, codegen.

These encode the scale contract: a scan that reads every column for a
two-column projection, or a filter evaluated above the scan, is a bug
even when results are correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quichash_spark.plans.inspect import (
    codegen_stage_count,
    pushed_filters,
    read_schema,
    uses_broadcast_join,
)

SF_DIR = "/root/testdata/sf0.001"


def test_filter_pushdown_to_parquet(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    pf = pushed_filters(q)
    assert "lang" in pf and "en" in pf, pf


def test_column_pruning(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.select("doc_id", "n_chars")
    rs = read_schema(q)
    assert "text" not in rs, rs  # the wide column must not be read
    assert "doc_id" in rs and "n_chars" in rs


def test_small_dim_join_broadcasts(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    q = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .count()
    )
    assert uses_broadcast_join(q)


def test_verify_fast_path_is_jvm_only(spark, tiny_clips):
    """The fast verification path must contain no Python evaluation."""
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.functions.udfs import compute_signatures
    from quichash_spark.operators.lsh import unified_candidates
    from quichash_spark.operators.verify import verify_candidates
    from quichash_spark.plans.inspect import explain_str

    sigs = compute_signatures(tiny_clips, CLIPS_CONFIG)
    cands, _ = unified_candidates(sigs, CLIPS_CONFIG)
    verified = verify_candidates(cands, tiny_clips, CLIPS_CONFIG, signatures=sigs)
    plan = explain_str(verified, mode="simple")
    # no row-at-a-time Python anywhere; exactly one grouped-Arrow node
    # (the slow-path SNR kernel) — the fast-path branch is pure JVM
    assert "BatchEvalPython" not in plan
    assert (
        plan.count("FlatMapGroupsInArrow") + plan.count("FlatMapGroupsInPandas") == 1
    )


def test_scan_agg_stays_in_codegen(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
    )
    assert codegen_stage_count(q) >= 1


def test_ann_plan_build_submits_no_probe_job(spark):
    """VERDICT r3 #6: building the ANN query's plan must not run a Spark
    job beyond the parquet read's own schema-inference job (which every
    query pays) — the embedding dim is a fixture constant
    (EMBEDDING_DIM), not a .first() probe at plan-build time."""
    from quichash_spark.entry_queries import QUERIES

    sc = spark.sparkContext

    def n_jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None))

    before = n_jobs()
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    read_jobs = n_jobs() - before  # schema-inference cost of a bare read

    before = n_jobs()
    df = QUERIES["sim_ann_lsh"](spark, SF_DIR)
    ann_jobs = n_jobs() - before
    assert ann_jobs <= read_jobs, (
        f"ANN plan build submitted {ann_jobs - read_jobs} extra job(s) "
        "beyond the bare parquet read"
    )
    assert df.count() > 0  # the plan still runs


def test_audio_embed_queries_have_no_quadratic_join(spark):
    """VERDICT r4 #1: the registered audio-embedding queries must build
    candidates via the hyperplane-bucket equi-join — no CartesianProduct
    or BroadcastNestedLoopJoin node anywhere in their executed plans."""
    from quichash_spark.entry_queries import QUERIES

    for key in ("audio_embed_neardup", "audio_sem_dedup",
                "audio_pair_verdict"):
        df = QUERIES[key](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, key
        assert "BroadcastNestedLoopJoin" not in plan, key


def test_text_repetition_is_shuffle_free(spark):
    """r5: the repetition signals compute inside each document's own row
    (array_sort + aggregate run-length fold in codegen) — the plan must
    be scan + project with NO Exchange and no Python node."""
    from quichash_spark.entry_queries import QUERIES

    df = QUERIES["text_repetition"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert df.count() > 0
