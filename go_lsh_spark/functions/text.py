"""Text kernels: shingles, MinHash, token-SimHash, language id, quality,
token counts, fingerprints.

Everything in this module except token-SimHash is built from pyspark.sql
built-ins (whole-stage codegen, and — deliberately — expressible in ANSI SQL
so the driver's DuckDB oracle can cross-check them). Hash function choice:
the SQL-checkable paths use md5-prefix-as-int64 (identical in Spark and
DuckDB); hot internal paths use xxhash64 (JVM, faster, Spark-only).

MinHash-over-shingles and the banding construction are the BASELINE.json
transcript path; banding semantics mirror the reference's table construction
(one band == one table, collision prob p^r — /root/reference/lsh/lsh.go:42-49
as analyzed in SURVEY.md §1.5).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# English stopwords for the language-id / quality heuristics (public,
# standard top-frequency list).
EN_STOPWORDS = (
    "the of and a to in is you that it he was for on are as with his they i "
    "at be this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if"
).split()

TOKEN_PATTERN = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish pieces


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def char_shingles(text: Column | str, k: int) -> Column:
    """All k-character shingles of a string as an array (positions 1..n-k+1).
    JVM-side: sequence + transform + substring."""
    text = _c(text)
    n = F.length(text)
    shingles = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.substring(text, i, k),
    )
    # sequence(1, x) counts *down* when x < 1 -- guard short strings
    return F.when(n >= F.lit(k), shingles).otherwise(
        F.array().cast("array<string>")
    )


def md5_int64(col: Column | str, bits: int = 60) -> Column:
    """First 15 hex chars of md5 as a non-negative int64. Chosen because
    DuckDB computes the identical value:
      CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)."""
    col = _c(col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_from_shingles(
    shingles: Column | str, num_perm: int, hash_fn: str = "xxhash64"
) -> Column:
    """MinHash signature from a MATERIALIZED distinct-shingle array column.

    Callers must project the shingle array into its own column first
    (`df.withColumn("sh", array_distinct(char_shingles(...)))`): Catalyst
    does not common-subexpression-eliminate across lambda boundaries, so
    referencing the shingle expression inside every permutation's transform
    re-shingles the string num_perm times (observed 40s -> 3s on 2000 rows).

    Permutation i hashes ("i:" || shingle); the signature element is the min
    over shingles. hash_fn='md5' is the DuckDB-reproducible variant;
    'xxhash64' the fast internal one. Empty shingle sets produce nulls.
    """
    sh = _c(shingles)

    def perm(i: int) -> Column:
        if hash_fn == "md5":
            h = lambda s: md5_int64(F.concat(F.lit(f"{i}:"), s))  # noqa: E731
        else:
            h = lambda s: F.xxhash64(F.lit(i), s)  # noqa: E731
        return F.array_min(F.transform(sh, h))

    return F.array(*[perm(i) for i in range(num_perm)])


def minhash_signature(
    text: Column | str, k: int, num_perm: int, hash_fn: str = "xxhash64"
) -> Column:
    """One-expression convenience for narrow inputs; hot paths must use the
    two-step char_shingles -> minhash_from_shingles form (see that doc)."""
    return minhash_from_shingles(
        F.array_distinct(char_shingles(text, k)), num_perm, hash_fn
    )


def minhash_band_hash(sig: Column | str, band: int, rows_per_band: int) -> Column:
    """Bucket key for one MinHash band (static band id): xxhash64 over the
    band's signature components -- typed element_at args, no string
    round-trip."""
    sig = _c(sig)
    start = band * rows_per_band
    return F.xxhash64(*[F.element_at(sig, start + i + 1) for i in range(rows_per_band)])


def jaccard_estimate(sig_a: Column | str, sig_b: Column | str) -> Column:
    """Estimated Jaccard = fraction of matching signature components."""
    a, b = _c(sig_a), _c(sig_b)
    matches = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when(x == y, 1.0).otherwise(0.0)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return matches / F.size(a).cast("double")


def ngram_jaccard(text_a: Column | str, text_b: Column | str, k: int) -> Column:
    """Exact n-gram Jaccard similarity of two strings (JVM-side set ops)."""
    a = F.array_distinct(char_shingles(text_a, k))
    b = F.array_distinct(char_shingles(text_b, k))
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def whitespace_tokens(text: Column | str) -> Column:
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via the piece regex (letters runs, digit
    runs, punctuation singles)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(TOKEN_PATTERN), 0))


def stopword_ratio(text: Column | str) -> Column:
    toks = whitespace_tokens(F.lower(_c(text)))
    stops = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    n = F.size(toks)
    return F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    t = _c(text)
    n = F.length(t)
    n_punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, n_punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_length(text: Column | str) -> Column:
    toks = whitespace_tokens(_c(text))
    total = F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length factor, moderate word
    length, low punctuation. Deterministic arithmetic only (SQL-portable)."""
    t = _c(text)
    length_factor = F.least(F.length(t).cast("double") / F.lit(200.0), F.lit(1.0))
    wl = mean_word_length(t)
    wl_factor = F.lit(1.0) - F.least(F.abs(wl - F.lit(5.0)) / F.lit(5.0), F.lit(1.0))
    punct_factor = F.lit(1.0) - F.least(punct_ratio(t) * F.lit(4.0), F.lit(1.0))
    return F.round((length_factor + wl_factor + punct_factor) / F.lit(3.0), 6)


def lang_id(text: Column | str, threshold: float = 0.08) -> Column:
    """Stopword-ratio language heuristic: 'en' when at least `threshold` of
    tokens are English stopwords, else 'unknown'. (The corpus here is
    synthetic; the operator shape is what matters: pure JVM expression,
    extendable with per-language stoplists.)"""
    return F.when(stopword_ratio(text) >= F.lit(threshold), F.lit("en")).otherwise(
        F.lit("unknown")
    )


def doc_fingerprint(text: Column | str, k: int = 8) -> Column:
    """Single-value document fingerprint: min md5-int64 over k-shingles
    (MinHash with one permutation -- SQL-reproducible)."""
    sh = F.array_distinct(char_shingles(text, k))
    return F.array_min(F.transform(sh, lambda s: md5_int64(s)))


def shingle_hashes(text: Column | str, k: int = 8, hash_fn: str = "xxhash64") -> Column:
    """Rolling k-gram hash array (materialize this as its own column
    before windowed ops -- Catalyst does not CSE across lambda boundaries,
    so inlining it into every window's slice re-hashes the whole string per
    window). hash_fn='md5' is the DuckDB-reproducible family; 'xxhash64'
    the fast JVM-internal one."""
    h = md5_int64 if hash_fn == "md5" else F.xxhash64
    return F.transform(char_shingles(text, k), lambda s: h(s))


def winnowing_from_hashes(hashes: Column | str, window: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer et al. 2003) from a materialized
    hash array: min of each sliding window, distinct, sorted."""
    hashes = _c(hashes)
    n = F.size(hashes)
    starts = F.sequence(F.lit(1), n - F.lit(window - 1))
    mins = F.transform(starts, lambda i: F.array_min(F.slice(hashes, i, window)))
    # sequence counts down when the stop is < 1 -- guard short strings
    return F.when(
        n >= F.lit(window), F.array_sort(F.array_distinct(mins))
    ).otherwise(F.array().cast("array<bigint>"))


def winnowing_fingerprints(text: Column | str, k: int = 8, window: int = 4) -> Column:
    """One-expression convenience; for wide scans prefer the two-step
    shingle_hashes -> winnowing_from_hashes form (see shingle_hashes doc)."""
    return winnowing_from_hashes(shingle_hashes(text, k), window)


# ---------------------------------------------------------------------------
# token-SimHash
# ---------------------------------------------------------------------------


_TOKEN_SIMHASH_EXPRS: dict = {}


def _token_simhash_exprs(bits: int) -> tuple:
    """The 60 vote aggregates and the bit-reassembly column of
    token_simhash_frame, built once per `bits` (they reference only the
    fixed internal column names `_h`/`_v{j}`): Column objects are reusable
    expression wrappers, and building these trees costs hundreds of py4j
    round trips per query construction, which the frozen bench times."""
    cached = _TOKEN_SIMHASH_EXPRS.get(bits)
    if cached is None:
        h = F.col("_h")
        votes = tuple(
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_v{j}")
            for j in range(bits)
        )
        sig = None
        for j in range(bits):
            term = F.when(F.col(f"_v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            sig = term if sig is None else sig + term
        cached = (votes, sig.cast("long").alias("simhash"))
        _TOKEN_SIMHASH_EXPRS[bits] = cached
    return cached


def token_simhash_frame(
    df, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
):
    """(id, text) frame -> (id, simhash): weighted SimHash over whitespace
    tokens, entirely as built-in expressions (explode + 60 conditional sums
    + bit reassembly -- whole-stage codegen, no Python). Bit j of the
    signature is set iff the sum over token occurrences of
    (+1 if bit j of md5_int64(token) else -1) is positive.

    bits=60 and the md5-int64 token hash make this DuckDB-reproducible
    (same CASE/SUM construction in ANSI SQL); docs with no tokens get NULL.
    The explode shuffles on nothing (narrow), and the groupBy is map-side
    combined on id -- at 100TB this is one shuffle keyed by doc id.
    """
    # hash each token ONCE in a projection below the aggregate: inlining
    # md5_int64(_tok) into every vote re-embedded the whole md5 chain in
    # each of the `bits` sum expressions -- a 60x larger tree for Catalyst
    # to analyze and codegen (and an eval per vote wherever subexpression
    # elimination does not reach). Same values: bit j still tests
    # shiftright(md5_int64(token), j) & 1.
    toks = df.select(
        id_col, F.explode(whitespace_tokens(text_col)).alias("_tok")
    ).select(id_col, md5_int64("_tok").alias("_h"))
    votes, sig = _token_simhash_exprs(bits)
    agg = toks.groupBy(id_col).agg(*votes)
    sigs = agg.select(id_col, sig)
    return df.select(id_col).join(sigs, id_col, "left")


def make_token_simhash_udf(bits: int = 64):
    """text -> SimHash over whitespace tokens (Arrow-batched, vectorized):
    hash the batch's UNIQUE tokens once (blake2b, stable across runs unlike
    Python's salted hash()), expand to a (tokens x bits) +/-1 matrix, and
    segment-sum votes per row -- no per-token Python loop in the hot path
    (r1 reviewed the row-at-a-time version as the repo's one per-row UDF).

    For the SQL-cross-checkable query surface use token_simhash_frame
    (md5-int64 family) instead; this is the engine-internal fast path.
    """
    import hashlib

    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint64)
    weights = np.uint64(1) << shifts

    @F.pandas_udf(LongType())
    def token_simhash(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            tok_lists = [(t or "").split() for t in s]
            counts = np.fromiter(
                (len(tl) for tl in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            flat = [tok for tl in tok_lists for tok in tl]
            votes = np.zeros((len(s), bits), dtype=np.int64)
            if flat:
                uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
                uh = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.blake2b(u.encode(), digest_size=8).digest(), "big"
                        )
                        for u in uniq
                    ),
                    dtype=np.uint64,
                    count=len(uniq),
                )
                hashes = uh[inv]
                pm = ((hashes[:, None] >> shifts) & np.uint64(1)).astype(np.int64) * 2 - 1
                seg = np.repeat(np.arange(len(s)), counts)
                np.add.at(votes, seg, pm)
            sig = ((votes > 0).astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
            yield pd.Series(sig)

    return token_simhash
