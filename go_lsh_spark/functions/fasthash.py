"""Vectorized numpy hashing kernels for the fused clip-signature UDF.

splitmix64-style mixing over uint64 with natural modular wraparound -- all
operations vectorize, no Python-level per-shingle loops. These hashes are
engine-internal (bucket keys, MinHash permutations, winnowing); the
SQL-cross-checkable query surface keeps the md5/xxhash64 families that
DuckDB can reproduce (functions/text.py).
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, elementwise over uint64."""
    with np.errstate(over="ignore"):
        x = np.asarray(x, dtype=np.uint64).copy()
        x ^= x >> np.uint64(30)
        x *= _C1
        x ^= x >> np.uint64(27)
        x *= _C2
        x ^= x >> np.uint64(31)
    return x


def shingle_hashes_bytes(data: bytes, k: int) -> np.ndarray:
    """uint64 hashes of all k-byte shingles of `data` (utf-8 text bytes),
    fully vectorized: sliding windows dotted with base powers under modular
    wraparound, then mixed."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size < k:
        return np.empty(0, dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = np.uint64(1)
        base = np.uint64(1099511628211)  # FNV prime as polynomial base
        for i in range(1, k):
            powers[i] = powers[i - 1] * base
        raw = (windows * powers[::-1]).sum(axis=1, dtype=np.uint64)
    return mix64(raw)


def perm_seeds(num_perm: int, seed: int = 0x5EED) -> np.ndarray:
    with np.errstate(over="ignore"):
        base = np.uint64(seed) * _GOLDEN
        return mix64(np.arange(num_perm, dtype=np.uint64) + base)


def minhash_from_hashes(hashes: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """(num_perm,) int64 MinHash signature: min over shingles of
    mix64(h + seed_i); empty input -> all int64.max."""
    if hashes.size == 0:
        return np.full(seeds.size, np.iinfo(np.int64).max, dtype=np.int64)
    with np.errstate(over="ignore"):
        grid = hashes[None, :] + seeds[:, None]
    return mix64(grid).min(axis=1).astype(np.int64)


def winnow_from_hashes(hashes: np.ndarray, window: int) -> np.ndarray:
    """Sorted distinct winnowing fingerprints (min of each sliding window)
    as int64; empty when fewer hashes than the window."""
    if hashes.size < window:
        return np.empty(0, dtype=np.int64)
    mins = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
    return np.unique(mins).astype(np.int64)
