"""Physical-plan inspection: the perf suite asserts that filters reach the
parquet scan (PushedFilters), projections prune columns (ReadSchema), and
hot expressions stay inside WholeStageCodegen -- the 100TB design rules
from the build brief.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_contains(df: DataFrame, *fragments: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    for frag in fragments:
        assert frag in plan, f"plan missing {frag!r}:\n{plan[:4000]}"
    return plan


def count_codegen_stages(df: DataFrame) -> int:
    plan = explain_str(df, "simple")
    ids = re.findall(r"\*\((\d+)\)", plan)
    return len(set(ids))


def pushed_filters(df: DataFrame) -> list[str]:
    plan = explain_str(df, "formatted")
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
