"""Suffix-array substring verification (BASELINE.json transcript path).

Longest-common-substring between candidate transcript pairs via a suffix
array + Kasai LCP over the concatenation -- verification-stage only (never
all-pairs), applied with a grouped pandas UDF over candidate pairs
(SURVEY.md §2.2).

Suffix array: prefix-doubling with numpy lexsort (O(n log^2 n), no Python
per-character loops). LCP: Kasai et al. linear scan (numpy-assisted).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array via prefix doubling."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int64)
    idx = np.arange(n)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        new_rank = np.empty(n, dtype=np.int64)
        prev = (rank[order][1:] != rank[order][:-1]) | (
            key2[order][1:] != key2[order][:-1]
        )
        new_rank[order] = np.concatenate([[0], np.cumsum(prev)])
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2
        if k >= n:
            return order.astype(np.int64)


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = common prefix length of suffixes sa[i-1], sa[i]."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: str, b: str) -> int:
    """Length of the longest common substring via suffix array + LCP of
    a + SEP + b (SEP below both alphabets)."""
    if not a or not b:
        return 0
    xa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) + 2
    xb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) + 2
    s = np.concatenate([xa, [1], xb])
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    na = len(xa)
    from_a = sa < na  # suffixes starting in a (separator belongs to neither)
    is_sep = sa == na
    best = 0
    for i in range(1, len(s)):
        if is_sep[i] or is_sep[i - 1]:
            continue
        if from_a[i] != from_a[i - 1]:
            if lcp[i] > best:
                best = int(lcp[i])
    return best


_LCS_UDF = None


def _lcs_udf():
    """The LCS pandas UDF, created once per process: pandas_udf creation
    costs a cloudpickle + py4j registration round trip per call, which the
    frozen bench times at every pipeline construction. The UDF closes over
    nothing, so one instance serves every caller."""
    global _LCS_UDF
    if _LCS_UDF is None:

        @F.pandas_udf(IntegerType())
        def lcs_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
            for a, b in it:
                yield pd.Series(
                    [
                        longest_common_substring(x or "", y or "")
                        for x, y in zip(a, b)
                    ],
                    dtype="int32",
                )

        _LCS_UDF = lcs_udf
    return _LCS_UDF


def lcs_pairs(
    pairs: DataFrame, text_a: str = "transcript_a", text_b: str = "transcript_b"
) -> DataFrame:
    """Add `lcs_len` to a candidate-pair DataFrame carrying both transcripts.
    Arrow-batched; one suffix array per pair (verification-stage cost only)."""
    return pairs.withColumn("lcs_len", _lcs_udf()(F.col(text_a), F.col(text_b)))
