"""Benchmark decontamination: flag training documents that share k-gram
shingles with an evaluation set (training-data pipeline op).

The standard LLM-corpus hygiene pass (as popularized by the public GPT-3 /
Dolma / FineWeb data-curation writeups): any training document containing
a long-enough verbatim overlap with an eval benchmark is contaminated and
must be dropped before training.

Spark-first shape: both sides shingle JVM-side (the same
``doc_dedup.shingle_array`` whole-stage-codegen expression), the EVAL side
— benchmarks are small by construction — explodes to distinct shingles
and broadcasts, and the train side streams through one hash join:

    train (10^12 rows) ─ explode shingles ─┐
                                           ├─ broadcast hash join ─ groupBy
    eval  (10^4 rows)  ─ explode+distinct ─┘          (train_id, eval_id)

No shuffle of the training corpus beyond the final per-document
aggregation of matched shingles; filters/pruning reach the train scan.
For eval sets too large to broadcast, drop the hint — AQE keeps the plan
correct with a shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quichash_spark.operators.doc_dedup import shingle_table


def contamination_hits(
    train: DataFrame,
    evals: DataFrame,
    k: int = 8,
    min_shared: int = 1,
    train_id: str = "doc_id",
    eval_id: str = "eval_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """(train_doc, eval_doc, shared k-gram count, eval shingle count).

    ``min_shared`` is the contamination gate: a single shared k-token
    shingle already means a k-token verbatim overlap.
    """
    # join on xxhash64(shingle) longs, not the raw k-token strings: the
    # join key shrinks from ~8 tokens of text (~50-100 B) to 8 B, cutting
    # the broadcast (or shuffle-fallback) width by ~10x at corpus scale.
    # A 64-bit collision would add a false POSITIVE hit — the conservative
    # direction for decontamination (never un-flags real contamination),
    # at ~n^2/2^65 odds per eval set.
    # shingle_table materializes the token split in its own projection so
    # the k-gram lambda does not re-run the regex per element (guide §4.2:
    # interpreted HOF lambdas have no CSE; measured 4x on this pass)
    ev_sh = shingle_table(evals, F.col(eval_id), k, text_col, eval_id).select(
        eval_id, F.explode("shingles").alias("sh")
    ).select(eval_id, F.xxhash64("sh").alias("sh_key")).distinct()
    ev_sizes = ev_sh.groupBy(eval_id).agg(F.count("*").alias("eval_shingles"))
    if broadcast_eval:
        ev_sh = F.broadcast(ev_sh)
        ev_sizes = F.broadcast(ev_sizes)
    tr_sh = shingle_table(train, F.col(train_id), k, text_col, train_id).select(
        train_id,
        F.explode(F.array_distinct(F.col("shingles"))).alias("sh"),
    ).select(train_id, F.xxhash64("sh").alias("sh_key"))
    return (
        tr_sh.join(ev_sh, "sh_key")
        .groupBy(train_id, eval_id)
        .agg(F.count("*").cast("long").alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= min_shared)
        .join(ev_sizes, eval_id)
    )


def decontaminate(
    train: DataFrame,
    evals: DataFrame,
    k: int = 8,
    min_shared: int = 1,
    train_id: str = "doc_id",
    eval_id: str = "eval_id",
    text_col: str = "text",
) -> DataFrame:
    """Training rows with every contaminated document removed (anti-join
    against the hit list — the reference's U2 anti-join shape,
    /root/reference/src/verify.rs new-files pass, pointed at corpus
    hygiene)."""
    hits = contamination_hits(
        train, evals, k, min_shared, train_id, eval_id, text_col
    ).select(train_id).distinct()
    return train.join(hits, train_id, "left_anti")
