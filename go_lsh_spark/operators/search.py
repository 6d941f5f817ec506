"""Query path (O7-O14): the full search pipeline as one DataFrame plan.

Reference trace (SURVEY.md §3.2): hash query -> per-table bucket lookup with
lag-bounded row enumeration (tables/tables.go:103-155) -> union across
tables and across the pos/neg sign branches (lsh/lsh.go:132-209) -> Pearson
scoring against zero-padded forward-index windows (lsh/lsh.go:212-224) ->
threshold/sign predicate (results/results.go:35-40) -> bounded top-K sorted
by descending |score| (results/results.go:43-69).

Spark shape:
  * goroutine-per-table fan-out (lsh/lsh.go:188-205)  => explode over
    table_id + ONE shuffle equi-join on (table_id, hash)
  * lag row enumeration => `row_index BETWEEN start_row AND end_row`
    range predicate -- pushes down to parquet/Iceberg partition pruning when
    buckets is partitioned by row_index
  * mutex-merged candidate union => dropDuplicates
  * negation trick (lsh/lsh.go:163-166) => second hash column from -v,
    computed in the same UDF pass
  * bounded heap => window row_number (per-query) / ORDER BY..LIMIT (global,
    Catalyst rewrites to TakeOrderedAndProject)

Scale notes: the bucket join shuffles on (table_id, hash) -- hot hashes are
handled by AQE skew-join (enabled in session.py); the scoring join on uid
broadcasts the candidate side when queries are few. No Python in the plan
except the two hash-UDF projections and none of it is per-row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_lsh_spark.config import (
    ALL_LAGS,
    SIGN_FILTER_ANY,
    SIGN_FILTER_NEG,
    SIGN_FILTER_POS,
    LSHConfig,
    SearchOptions,
)
from go_lsh_spark.functions import vector as V
from go_lsh_spark.hyperplanes import PlaneSet
from go_lsh_spark.operators.index import lag_bounds


@dataclass
class SearchResult:
    """Lazy handles on the two outputs of Search (scores + NumScored,
    lsh/lsh.go:128)."""

    scores: DataFrame      # query_id, uid, index, score, rank
    candidates: DataFrame  # pre-threshold scored candidates (NumScored basis)

    def num_scored(self) -> dict[int, int]:
        rows = self.candidates.groupBy("query_id").count().collect()
        return {r["query_id"]: r["count"] for r in rows}


def hash_queries(
    queries: DataFrame, cfg: LSHConfig, planes: PlaneSet, opts: SearchOptions,
    vector="vector",
) -> DataFrame:
    """(query_id, index, vector) -> exploded (query_id, index, table_id, hash)
    covering the sign branches requested by opts.sign_filter.

    POS/ANY hashes v; NEG/ANY additionally hashes -v (lsh/lsh.go:148-177).
    Both arrays come from one UDF projection; explode unions the branches.
    """
    hash_udf = V.make_hash_tables_udf(planes, normalize=cfg.normalize)
    q = queries
    branches = []
    if opts.sign_filter in (SIGN_FILTER_ANY, SIGN_FILTER_POS):
        branches.append(F.col("_pos_hashes"))
        q = q.withColumn("_pos_hashes", hash_udf(F.col(vector)))
    if opts.sign_filter in (SIGN_FILTER_ANY, SIGN_FILTER_NEG):
        branches.append(F.col("_neg_hashes"))
        q = q.withColumn(
            "_neg_hashes", hash_udf(F.transform(F.col(vector), lambda x: -x))
        )
    exploded = []
    for b in branches:
        exploded.append(
            q.select(
                "query_id",
                F.col("index").cast("long").alias("index"),
                F.posexplode(b).alias("table_id", "hash"),
            )
        )
    out = exploded[0]
    for e in exploded[1:]:
        out = out.unionByName(e)
    # same (table_id, hash) from both branches would double-count candidates
    return out.dropDuplicates(["query_id", "table_id", "hash"])


def candidate_join(
    query_hashes: DataFrame, buckets: DataFrame, cfg: LSHConfig, opts: SearchOptions
) -> DataFrame:
    """The bucket lookup as an equi-join on (table_id, hash) with the
    MaxLag range predicates (tables/tables.go:109-150).

    Returns distinct (query_id, query_index, uid, index) candidates --
    the dropDuplicates is the Spark analogue of the reference's
    mutex-merged set union (lsh/lsh.go:192-203).
    """
    qh = query_hashes.withColumnRenamed("index", "query_index")
    b = buckets
    cond = [qh.table_id == b.table_id, qh.hash == b.hash]
    joined = qh.join(b, cond, "inner")
    if opts.max_lag > ALL_LAGS:
        start_idx, end_idx, start_row, end_row = lag_bounds(
            F.col("query_index"), opts.max_lag, cfg.row_size
        )
        # row-range predicate prunes bucket partitions; index-range is the
        # exact timestamp refinement (tables/tables.go:145-150)
        joined = joined.filter(
            b.row_index.between(start_row, end_row)
            & b.index.between(start_idx, end_idx)
        )
    return joined.select(
        "query_id", "query_index", b.uid.alias("uid"), b.index.alias("index")
    ).dropDuplicates(["query_id", "uid", "index"])


def score_candidates(
    candidates: DataFrame,
    queries: DataFrame,
    forward: DataFrame,
    cfg: LSHConfig,
    query_vector="vector",
) -> DataFrame:
    """O10: join candidates back to the forward index on uid, slice the
    zero-padded window at the candidate's index (forwardindex/inmemory.go:
    61-82), and compute Pearson correlation against the (normalized) query
    (lsh/lsh.go:212-224). Inner joins reproduce the nil-vector skip
    (lsh/lsh.go:215-217).

    Entirely JVM-side: window slice + Pearson are built-in expressions.
    """
    qv = queries.select(
        "query_id",
        V.l2_normalize(query_vector).alias("_qvec")
        if cfg.normalize
        else F.col(query_vector).alias("_qvec"),
    )
    window = V.window_at(
        "series", "series_index", F.col("index"), cfg.sample_period, cfg.vector_length
    )
    cand_vec = (
        candidates.join(forward, "uid", "inner")
        .withColumn("_cvec_raw", window)
        .withColumn(
            "_cvec", V.l2_normalize("_cvec_raw") if cfg.normalize else F.col("_cvec_raw")
        )
    )
    return (
        cand_vec.join(F.broadcast(qv), "query_id", "inner")
        .withColumn("score", V.pearson("_qvec", "_cvec"))
        .select("query_id", "uid", "index", "score")
    )


def threshold_filter(scored: DataFrame, opts: SearchOptions) -> DataFrame:
    """O11 (results/results.go:35-40): |score| >= threshold AND sign matches.
    NULL scores (zero variance -> Go NaN) always fail."""
    pred = F.col("score").isNotNull() & (F.abs(F.col("score")) >= F.lit(opts.threshold))
    if opts.sign_filter == SIGN_FILTER_POS:
        pred = pred & (F.col("score") > 0)
    elif opts.sign_filter == SIGN_FILTER_NEG:
        pred = pred & (F.col("score") < 0)
    return scored.filter(pred)


def top_k(passed: DataFrame, k: int) -> DataFrame:
    """O12/O13: per-query bounded top-K by descending |score|, ties broken by
    descending index then uid (inverse of the heap's Less,
    results/results.go:82-101; Fetch emits descending |score|,
    results/results.go:59-69)."""
    w = Window.partitionBy("query_id").orderBy(
        F.abs(F.col("score")).desc(), F.col("index").desc(), F.col("uid").desc()
    )
    return (
        passed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def search(
    queries: DataFrame,
    buckets: DataFrame,
    forward: DataFrame,
    cfg: LSHConfig,
    planes: PlaneSet,
    opts: SearchOptions | None = None,
) -> SearchResult:
    """O14: the composite pipeline (lsh/lsh.go:106-129).

    queries: (query_id, index, vector); buckets/forward from operators.index.
    """
    opts = (opts or SearchOptions()).validate()
    if opts.max_lag > ALL_LAGS:
        # global row-range prefilter for the whole query batch: queries are
        # small (driver-submitted), so min/max(index) is a cheap scalar pass,
        # and the literal BETWEEN it produces reaches the bucket scan as a
        # partition / parquet filter -- without it a batch of queries scans
        # every row partition and the lag bound only applies post-join
        # (engine.search's single-query pruning, generalized; r2 verdict #3).
        # The exact per-query lag refinement still applies in candidate_join.
        from go_lsh_spark.oracle import go_div  # noqa: PLC0415

        row = queries.agg(F.min("index").alias("lo"), F.max("index").alias("hi")).collect()[0]
        if row["lo"] is not None:
            rs = cfg.row_size
            start_row = go_div(int(row["lo"]) - opts.max_lag, rs) * rs
            end_row = go_div(int(row["hi"]) + opts.max_lag, rs) * rs
            buckets = buckets.filter(F.col("row_index").between(start_row, end_row))
    qh = hash_queries(queries, cfg, planes, opts)
    cands = candidate_join(qh, buckets, cfg, opts)
    scored = score_candidates(cands, queries, forward, cfg)
    passed = threshold_filter(scored, opts)
    return SearchResult(scores=top_k(passed, opts.num_to_return), candidates=scored)
