"""Driver-contract conformance: a fast subset of queries() checked against
oracle_sql() in DuckDB at sf0.001 — the same comparison the driver runs
at sf0.01 (tools/check_oracle.py covers the full set)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

FAST_QUERIES = [
    "dedup_exact_groups",
    "text_stats",
    "text_langid",
    "text_pii_scrub",
    "text_repetition",
    "doc_fingerprint",
    "multi_hash",
    "hashdb_roundtrip",
    "verify_classification",
    "verify_fast_mode",
    "compare_dbs",
    "moved_detection",
    "anti_new_files",
    "analyze_summary",
    "scan_stats_by_source",
    "top_docs_by_chars",
    "events_windowed",
    "events_json",
    "pricing_summary",
    "revenue_by_nation",
    "sim_topk",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    return con


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.sql(entrymod.oracle_sql()[name]).df()
    a, b = _normalize(sdf), _normalize(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6, rtol=1e-9)


def test_every_query_has_callable_and_oracle_coverage():
    import __spark_entry__ as entrymod

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    # every non-SQL query is one of the documented rows-only families
    rows_only = set(qs) - set(sqls)
    for name in rows_only:
        assert name.startswith(
            ("clips_", "dedup_simhash", "sim_ann", "sim_ivf", "sim_pq",
             "doc_winnow", "stream_", "video_")
        ), name
