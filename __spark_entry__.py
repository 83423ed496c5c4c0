"""Driver contract for the spark-graft builder (PySpark target).

entry()    — flagship: inverted-index build + block-max BM25 top-k over
             the sf0.001 documents table.
queries()  — one entry per implemented operator (SURVEY.md §2 +
             training-data prep); implementations live in
             data_prepper_spark/entry_queries.py.
oracle_sql() — DuckDB twins.  As of round 2 every queries() key has an
             oracle EXCEPT `anomaly_rcf` (rows-only by design: the RRCF
             score is a sequential function of per-key forest state —
             non-relational; pinned by tests/test_anomaly.py instead).
             The banded-LSH / hyperplane-LSH / IVF blocking topologies
             and the distributed BM25 path ARE fully oracled (md5-family
             hashes and folded plane literals make them reproducible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_prepper_spark import entry_queries as _eq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _eq.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_eq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_eq.ORACLES)
