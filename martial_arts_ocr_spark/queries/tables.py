"""Session-scoped memo for the read-only driver-table DataFrames.

``spark.read.parquet(path)`` costs ~70-100 ms of driver-side work per call
(InMemoryFileIndex listing + a footer-read job for schema inference) even
when the same path was read moments earlier in the same session. The
headline bench and the driver gate build the same six base tables dozens
of times per process, so each repeated build pays that fixed cost inside
the timed region for zero information.

``base_table`` memoizes the *unresolved DataFrame plan object* per
(applicationId, sf_dir, table). This caches no data and no results: a
DataFrame is a lazy plan, every action against it still scans the parquet
input (verified: noop-sink wall time of the memoized frame equals the
fresh-read frame; only the ~80 ms plan-build repeat disappears). The
driver tables are read-only fixtures (``/root/testdata/sf*`` is mounted
r-x), so the staleness hazard that makes plan caching wrong for mutable
warehouse tables (engine/catalog.py re-reads on purpose after compaction)
does not exist here — do NOT route catalog/warehouse reads through this.

Eviction mirrors similarity._sig_cache_put (round-3 ADVICE): keys lead
with applicationId and any entry from a different (stopped) application
is dropped on insert, so pytest's many sessions per process cannot leak
plans across sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TABLE_CACHE: dict[tuple, DataFrame] = {}


def base_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        for k in [k for k in _TABLE_CACHE if k[0] != key[0]]:
            del _TABLE_CACHE[k]
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _TABLE_CACHE[key] = df
    return df
