"""Streaming ingest of clips -> incremental signature/bucket maintenance.

The reference is fully synchronous/batch (SURVEY.md §2.1 Streaming: none);
its Index() call is, however, naturally incremental -- new documents only
*append* bucket rows (tables/tables.go:68-101). That maps exactly onto
Structured Streaming with append-mode sinks:

  clips stream --readStream--> decode/feature/signature projection
               --writeStream--> signatures & buckets tables (append)

Candidate generation against the accumulated corpus is done per microbatch
via foreachBatch (new-vs-all join), reusing the batch operators -- the
standard pattern for stateful-but-table-backed pipelines. Watermarks are
unnecessary: dedup state is keyed by clip_id, not event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_lsh_spark.config import DedupConfig
from go_lsh_spark.hyperplanes import PlaneSet
from go_lsh_spark.functions import vector as V
from go_lsh_spark.operators.dedup import (
    build_buckets,
    build_signatures,
    extract_features,
)

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string"
)


def read_clip_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def signature_stream(clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """The same projection chain as the batch path, applied to a streaming
    DataFrame (pandas UDFs are streaming-safe: stateless projections)."""
    planes = PlaneSet(cfg.lsh_config())
    return build_signatures(extract_features(clips, cfg), cfg, planes)


def start_signature_sink(
    clips: DataFrame, cfg: DedupConfig, out_path: str, checkpoint: str
):
    """Append signatures+buckets per microbatch via foreachBatch (one sink
    for two tables)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        planes = PlaneSet(cfg.lsh_config())
        sigs = build_signatures(
            extract_features(batch_df, cfg), cfg, planes
        ).withColumn("_batch_id", F.lit(batch_id))
        sigs.persist()
        sigs.drop("features", "minhash").write.mode("append").parquet(
            f"{out_path}/signatures"
        )
        build_buckets(sigs, cfg).withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{out_path}/buckets")
        sigs.unpersist()

    return (
        clips.writeStream.option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .foreachBatch(write_batch)
        .start()
    )


def _incremental_pairs(new_buckets: DataFrame, all_buckets: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Candidate pairs touching at least one NEW clip: new buckets join the
    accumulated bucket table on the bucket key. Old-old pairs were emitted
    by earlier microbatches, so the join is new x all, canonicalized --
    per-batch cost is O(|new| x collision rate), not O(|corpus|^2)."""
    a, b = new_buckets.alias("a"), all_buckets.alias("b")
    ham_ok = (F.col("a.src") != F.lit("simhash")) | (
        V.hamming64(F.col("a.sig64"), F.col("b.sig64")) <= cfg.max_hamming
    )
    first_is_a = F.col("a.clip_id") < F.col("b.clip_id")
    joined = (
        a.join(
            b,
            [
                F.col("a.src") == F.col("b.src"),
                F.col("a.band") == F.col("b.band"),
                F.col("a.hash") == F.col("b.hash"),
                F.col("a.clip_id") != F.col("b.clip_id"),
            ],
        )
        .filter(ham_ok)
        .select(
            F.col("a.src").alias("src"),
            F.when(first_is_a, F.col("a.clip_id")).otherwise(F.col("b.clip_id")).alias("clip_id_a"),
            F.when(first_is_a, F.col("b.clip_id")).otherwise(F.col("a.clip_id")).alias("clip_id_b"),
            F.when(first_is_a, F.col("a.sig64")).otherwise(F.col("b.sig64")).alias("sig64_a"),
            F.when(first_is_a, F.col("b.sig64")).otherwise(F.col("a.sig64")).alias("sig64_b"),
        )
    )
    return (
        joined.groupBy("clip_id_a", "clip_id_b")
        .agg(
            F.max(F.when(F.col("src") == "simhash", 1).otherwise(0)).alias("from_simhash"),
            F.max(F.when(F.col("src") == "minhash", 1).otherwise(0)).alias("from_minhash"),
            F.sum(F.when(F.col("src") == "winnow", 1).otherwise(0)).alias("n_winnow"),
            F.first("sig64_a").alias("sig64_a"),
            F.first("sig64_b").alias("sig64_b"),
        )
        .withColumn(
            "from_winnow", (F.col("n_winnow") >= cfg.winnow_min_matches).cast("int")
        )
        .filter(
            (F.col("from_simhash") == 1)
            | (F.col("from_minhash") == 1)
            | (F.col("from_winnow") == 1)
        )
        .drop("n_winnow")
    )


def start_incremental_dedup(
    clips: DataFrame, cfg: DedupConfig, out_path: str, checkpoint: str
):
    """Streaming near-duplicate detection: per microbatch, the NEW clips'
    signatures/buckets append to the accumulated tables and candidate pairs
    against the whole accumulated corpus are verified (Hamming + Pearson +
    Jaccard, the batch `verify_pairs` semantics minus the LCS tail) and
    appended to `<out>/verified_pairs`. The reference's incremental
    Index()+Search() usage (lsh/lsh.go:62-129) expressed as
    foreachBatch-over-tables; clusters are derived from the accumulated
    verified pairs with the batch connected-components when needed."""
    from go_lsh_spark.operators.dedup import clips_to_signatures, verify_pairs  # noqa: PLC0415

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        planes = PlaneSet(cfg.lsh_config())
        sigs = clips_to_signatures(batch_df, cfg, planes).persist()
        new_buckets = build_buckets(sigs, cfg).persist()
        sigs.write.mode("append").parquet(f"{out_path}/signatures")
        new_buckets.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{out_path}/buckets")
        all_buckets = spark.read.parquet(f"{out_path}/buckets").drop("_batch_id")
        all_sigs = spark.read.parquet(f"{out_path}/signatures")
        pairs = _incremental_pairs(new_buckets, all_buckets, cfg)
        verified = verify_pairs(pairs, all_sigs, cfg)
        verified.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{out_path}/verified_pairs")
        new_buckets.unpersist()
        sigs.unpersist()

    return (
        clips.writeStream.option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .foreachBatch(process_batch)
        .start()
    )
