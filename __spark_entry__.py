"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -- flagship: LSH-bucketed ANN over the embeddings table at
                 sf0.001 (hash -> bucket join -> cosine -> per-query top-K:
                 operators O4, O7/O8, O10, O12 in one plan).
queries()     -- one callable per implemented operator from SURVEY.md §2
                 plus the BASELINE.json training-data extensions.
oracle_sql()  -- DuckDB-runnable ANSI SQL equivalents (omitted for
                 UDF-only/audio paths, which get rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_lsh_spark.entry_queries import QUERIES, q_ann_lsh  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_ann_lsh(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql() for name, (_fn, sql) in QUERIES.items() if sql is not None}
