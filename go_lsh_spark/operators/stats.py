"""O15: Stats — false-negative probability curve + doc count.

The curve is pure driver-side math (lsh/lsh.go:267-287); NumDocs is a
DataFrame count. Golden values at /root/reference/lsh/lsh_test.go:474-486.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from go_lsh_spark.config import LSHConfig
from go_lsh_spark.oracle import compute_stats


def stats(cfg: LSHConfig, forward: DataFrame | None = None, num_docs: int | None = None) -> dict:
    if num_docs is None:
        num_docs = forward.select("uid").distinct().count() if forward is not None else 0
    return compute_stats(cfg, num_docs)
