"""Pipeline-scoped registry for persisted intermediate DataFrames.

The LSH and verify stages persist small intermediates (bucket summaries,
self-sized candidate inputs) that must outlive the function that created
them — the caller materializes the returned DataFrames, THEN the caches
can go.  A module-global list (rounds 1-4) assumed one pipeline per
session: two concurrent pipelines calling ``release_cached()`` would
unpersist each other's blocks mid-run.  Each ``run_pipeline`` now owns a
:class:`CacheScope` and passes it down, so releases are scoped to the
run; the module-level ``release_cached()`` helpers remain as the default
scope for ad-hoc single-pipeline sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheScope:
    """Collects ``persist()``-ed DataFrames and releases them together.

    Usable as a context manager::

        with CacheScope() as scope:
            pairs, dropped = unified_candidates(sigs, cfg, scope=scope)
            pairs.write.parquet(...)   # materialize while cached
        # caches released here, only THIS run's blocks
    """

    def __init__(self) -> None:
        self._dfs: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        df = df.persist()
        self._dfs.append(df)
        return df

    @property
    def dataframes(self) -> tuple[DataFrame, ...]:
        """Currently-registered (not yet released) DataFrames."""
        return tuple(self._dfs)

    def release(self) -> None:
        while self._dfs:
            self._dfs.pop().unpersist()

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc) -> bool:
        self.release()
        return False
