"""SparkSession factory tuned for the dedup pipeline.

Local testing uses local[N]; the same conf block is what we'd submit with
spark-submit --py-files on a real cluster (BASELINE.json north_rule). All
settings are plain upstream Spark knobs:

  * AQE on (coalesce + skew-join) -- hot LSH buckets are the known skew
    source (SURVEY.md §4).
  * Arrow on -- every Python crossing is a vectorized pandas UDF
    (input_hint: "no per-row Python").
  * shuffle partitions sized by caller (tests: 32; 100TB cluster: O(cores*3)
    with AQE coalescing down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "go-lsh-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small Arrow batches let the JVM producer and the Python worker
        # pipeline WITHIN a task: with one batch per partition the two sides
        # strictly alternate (measured 0.61 -> 0.82 scaling efficiency and
        # 13.2s -> 8.6s absolute on the 100k-clip decode stage at 8 cores)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # local mode: keep the UI off and the driver lean
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Hadoop's ChecksumFileSystem wraps local reads in a Java-side CRC
        # layer that serializes concurrent scans (measured: 7GB parquet scan
        # 4.4s -> 3.4s at 16 cores with it off); parquet carries its own
        # page-level CRCs, so the wrapper is pure overhead for this engine.
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        # big-binary UDF stages want many concurrent JVM->Python Arrow
        # streams: cap input splits well below the 128MB default so a
        # 100TB scan fans out to O(10^6) tasks, not O(10^5) oversized ones
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        # the streaming point-lookup path pushes chunked In(clip_id)
        # literals of up to 2x streaming.ingest._LOOKUP_CHUNK values into
        # parquet scans (where per-file bloom filters act on them); the
        # default threshold (10) silently demotes them to post-scan
        # filters. Session-level, NOT mutated per batch (r5 verdict #5).
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "4000")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
