"""Per-batch FIXED-COST budget for the streaming dedup path (r5 verdict #2).

Streams a small corpus in many tiny microbatches -- at ~40 clips/batch the
per-clip work is negligible, so the measured per-batch wall IS the fixed
driver cost (sink writes, partition-id collects, CC, remap snapshot).
Reports the per-batch wall distribution from <out>/_batch_metrics.jsonl and
the stream==batch checksum.

Usage: python tools/stream_fixed_cost.py [--clips 400] [--files 10]
       [--cores 8] [--label before]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=400)
    ap.add_argument("--files", type=int, default=10)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--label", default="")
    args = ap.parse_args()

    from go_lsh_spark.config import DedupConfig
    from go_lsh_spark.operators.dedup import dedup_pipeline
    from go_lsh_spark.session import build_session
    from go_lsh_spark.sources.synth import clips_to_spark, synth_clips
    from go_lsh_spark.streaming.ingest import (
        read_clip_stream,
        read_clusters,
        start_incremental_dedup,
    )
    from pyspark.sql import functions as F

    spark = build_session(
        app_name="stream-fixed-cost",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="sfc_")
    src, out, ck = f"{work}/src", f"{work}/out", f"{work}/ck"
    res = synth_clips(n_clips=args.clips, seed=13)
    clips, _ = clips_to_spark(spark, res)
    clips = clips.cache()
    clips.count()
    clips.repartition(args.files).write.parquet(src)

    q = start_incremental_dedup(
        read_clip_stream(spark, src, max_files=1), DedupConfig(), out, ck
    )
    q.awaitTermination(1800)

    records = [
        json.loads(line)
        for line in open(f"{out}/_batch_metrics.jsonl")
    ]
    walls = [r["wall_secs"] for r in records if "wall_secs" in r]
    phase_keys = sorted(
        {k for r in records if "phase_secs" in r for k in r["phase_secs"]}
    )
    phases = {
        k: round(
            statistics.median(
                r["phase_secs"][k] for r in records if "phase_secs" in r
            ),
            3,
        )
        for k in phase_keys
    }

    # raw (pre-reconcile) checksum: the refactor-stability witness -- the
    # same corpus must produce the same incremental state bit-for-bit
    checksum_row = (
        read_clusters(spark, out)
        .agg(F.bit_xor(F.xxhash64("clip_id", "cluster_id")).alias("cs"))
        .collect()[0]
    )
    # batch equality holds AFTER reconcile (the df-cap/stop-gram semantics
    # drift mid-stream by design; reconcile restores exact batch semantics)
    from go_lsh_spark.streaming.ingest import reconcile

    reconcile(spark, out, DedupConfig())
    got = {r.clip_id: r.cluster_id for r in read_clusters(spark, out).collect()}
    batch = dedup_pipeline(spark, clips, DedupConfig())
    exp = {r.clip_id: r.cluster_id for r in batch.clusters.collect()}

    print(
        json.dumps(
            {
                "label": args.label,
                "n_batches": len(walls),
                "wall_median": round(statistics.median(walls), 3),
                "wall_min": round(min(walls), 3),
                "wall_mean": round(statistics.mean(walls), 3),
                "walls": walls,
                "phase_medians": phases,
                "stream_eq_batch": got == exp,
                "checksum": checksum_row["cs"],
                "clips": args.clips,
                "files": args.files,
                "cores": args.cores,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
