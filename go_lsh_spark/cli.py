"""spark-submit entry point (BASELINE.json: launched via
`spark-submit --py-files go_lsh_spark.zip cli.py <cmd>` on multi-executor
clusters; on local mode the session factory builds local[N]).

Commands:
  synth  --out DIR --n-clips N            write a deterministic clips table
  dedup  --clips DIR --warehouse DIR      run the checkpointed pipeline
                                          (manifest-mode warehouse by default:
                                          atomic commits, file-pruned deletes)
  delete --warehouse DIR --stage S --uids a,b   remove rows from a stage
  stream-dedup --clips DIR --out DIR --checkpoint DIR
                                          incremental dedup over a clips
                                          directory via Structured Streaming
                                          (availableNow: drains what exists,
                                          then stops; re-run to pick up new
                                          files -- per-batch cost is
                                          O(batch), see streaming/ingest.py)
  reconcile --out DIR                     compact streaming state to exact
                                          batch semantics (stop-gram cap)
  search --docs PARQUET --vector CSV      one LSH search over a documents table
  stats                                   print the false-negative curve
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="go-lsh-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth")
    sp.add_argument("--out", required=True)
    sp.add_argument("--n-clips", type=int, default=1000)
    sp.add_argument("--seed", type=int, default=42)

    dp = sub.add_parser("dedup")
    dp.add_argument("--clips", required=True)
    dp.add_argument("--warehouse", required=True)
    dp.add_argument("--threshold", type=float, default=0.85)
    dp.add_argument(
        "--fmt",
        default="parquet+manifest",
        choices=["parquet+manifest", "parquet", "iceberg"],
        help="warehouse table format (default: manifest mode -- atomic "
        "commits + file-pruned deletes)",
    )

    st = sub.add_parser("stream-dedup", help="incremental dedup via streaming")
    st.add_argument("--clips", required=True)
    st.add_argument("--out", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--max-files", type=int, default=4,
                    help="files per microbatch (maxFilesPerTrigger)")
    st.add_argument("--threshold", type=float, default=0.85)
    st.add_argument("--expected-corpus-rows", type=int, default=0,
                    help="sizes the state-table partition counts (0 = sandbox floors)")
    st.add_argument("--timeout", type=int, default=0,
                    help="awaitTermination seconds (0 = wait until drained)")
    st.add_argument("--compact-every", type=int, default=None,
                    help="fold the append sinks + cluster cells in-stream "
                    "after every N microbatches (size-tiered; 0 = off; "
                    "default = DedupConfig.stream_compact_every)")

    rp = sub.add_parser("reconcile", help="compact streaming state to batch semantics")
    rp.add_argument("--out", required=True)
    rp.add_argument("--threshold", type=float, default=0.85)
    rp.add_argument("--expected-corpus-rows", type=int, default=0)

    cp = sub.add_parser(
        "compact", help="fold committed per-batch sink partitions (file-count bound)"
    )
    cp.add_argument("--out", required=True)
    cp.add_argument(
        "--through-batch", type=int, default=-1,
        help="fold batches <= this id; -1 = all existing (safe after the "
        "availableNow stream has drained -- every batch is then committed)",
    )

    xp = sub.add_parser("delete", help="remove uids from a persisted stage")
    xp.add_argument("--warehouse", required=True)
    xp.add_argument("--stage", required=True)
    xp.add_argument("--uids", required=True, help="comma-separated ids")
    xp.add_argument("--uid-col", default="uid")
    xp.add_argument(
        "--fmt",
        default="parquet+manifest",
        choices=["parquet+manifest", "parquet", "iceberg"],
    )

    qp = sub.add_parser("search")
    qp.add_argument("--docs", required=True)
    qp.add_argument("--vector", required=True, help="comma-separated floats")
    qp.add_argument("--index", type=int, default=0)
    qp.add_argument("--k", type=int, default=10)
    qp.add_argument("--threshold", type=float, default=0.85)
    qp.add_argument("--sign", type=int, default=0)
    qp.add_argument("--max-lag", type=int, default=900)

    sub.add_parser("stats")

    args = p.parse_args(argv)

    from go_lsh_spark.config import DedupConfig, LSHConfig, SearchOptions
    from go_lsh_spark.session import build_session

    if args.cmd == "stats":
        from go_lsh_spark.oracle import compute_stats

        print(json.dumps(compute_stats(LSHConfig(), 0), indent=2))
        return 0

    from pyspark.sql import SparkSession

    # embedded calls (tests, notebooks) may already own a session --
    # getOrCreate would hand it back and stopping it here would kill the
    # caller's session, so only stop what this entry point created
    preexisting = SparkSession.getActiveSession() is not None
    spark = build_session(app_name=f"go-lsh-spark-{args.cmd}")
    try:
        if args.cmd == "synth":
            from go_lsh_spark.sources.synth import clips_to_spark, synth_clips

            res = synth_clips(n_clips=args.n_clips, seed=args.seed)
            df, truth = clips_to_spark(spark, res)
            df.write.mode("overwrite").parquet(f"{args.out}/clips")
            truth.write.mode("overwrite").parquet(f"{args.out}/truth")
            print(json.dumps({"written": args.n_clips, "out": args.out}))
        elif args.cmd == "dedup":
            from go_lsh_spark.operators.dedup import dedup_pipeline
            from go_lsh_spark.sources.catalog import Warehouse, external_input_id

            clips = spark.read.parquet(args.clips)
            wh = Warehouse(spark, args.warehouse, fmt=args.fmt)
            res = dedup_pipeline(
                spark,
                clips,
                DedupConfig(threshold=args.threshold),
                warehouse=wh,
                input_id=external_input_id(args.clips),
            )
            n = res.clusters.count()
            print(json.dumps({"clusters_rows": n, "stages": wh.metrics()}, indent=2))
        elif args.cmd == "stream-dedup":
            from go_lsh_spark.streaming.ingest import (
                read_clip_stream,
                start_incremental_dedup,
            )

            cfg = DedupConfig(
                threshold=args.threshold,
                expected_corpus_rows=args.expected_corpus_rows,
            )
            from go_lsh_spark.streaming.ingest import _has_parquet, read_clusters

            stream = read_clip_stream(spark, args.clips, max_files=args.max_files)
            q = start_incremental_dedup(
                stream, cfg, args.out, args.checkpoint,
                compact_every=args.compact_every,
            )
            if args.timeout:
                # awaitTermination(timeout) returns False while the query is
                # still running -- ignoring that and reading the tables would
                # observe a half-applied batch, and spark.stop() would then
                # kill the in-flight batch without surfacing its error (r4
                # ADVICE #5). Stop the query, wait for it to wind down, and
                # surface any failure before reading state.
                if not q.awaitTermination(args.timeout):
                    q.stop()
                    q.awaitTermination()
                exc = q.exception()
                if exc is not None:
                    raise exc
            else:
                q.awaitTermination()
            cpath = f"{args.out}/clusters"
            # read_clusters filters to the live compaction generations, so a
            # crashed lazy cleanup's leftover cell dirs can't double-count
            n = read_clusters(spark, args.out).count() if _has_parquet(cpath) else 0
            print(json.dumps({"clusters_rows": n, "out": args.out}))
        elif args.cmd == "reconcile":
            from go_lsh_spark.streaming.ingest import reconcile

            cfg = DedupConfig(
                threshold=args.threshold,
                expected_corpus_rows=args.expected_corpus_rows,
            )
            print(json.dumps(reconcile(spark, args.out, cfg)))
        elif args.cmd == "compact":
            from pyspark.sql import functions as F

            from go_lsh_spark.streaming.ingest import (
                _has_parquet,
                _read_compaction,
                compact_appends,
                compact_clusters,
            )

            through = args.through_batch
            if through < 0:
                # derive from the newest LIVE batch: negative ids are
                # compacted generations, and folding "through" one of those
                # would regress the watermark and resurrect lazily-cleaned
                # batch ranges (r4 ADVICE #3). Floored at the committed
                # watermarks so leftover batch dirs from a crashed cleanup
                # (all <= watermark) can't derive a regressing value either;
                # an empty/fully-compacted table has nothing new to fold.
                bpath = f"{args.out}/buckets"
                live_max = None
                if _has_parquet(bpath):
                    live_max = (
                        spark.read.parquet(bpath)
                        .filter(F.col("_batch_id") >= 0)
                        .agg(F.max("_batch_id"))
                        .collect()[0][0]
                    )
                marks = [
                    c["compacted_through"]
                    for c in (
                        _read_compaction(f"{args.out}/{t}")
                        for t in ("buckets", "signatures", "clusters")
                    )
                    if c
                ]
                candidates = [v for v in [live_max, *marks] if v is not None]
                through = max(candidates) if candidates else None
            if through is None:
                print(json.dumps({}))
            else:
                stats = compact_appends(spark, args.out, int(through))
                stats.update(compact_clusters(spark, args.out, int(through)))
                print(json.dumps(stats))
        elif args.cmd == "delete":
            from go_lsh_spark.sources.catalog import Warehouse

            wh = Warehouse(spark, args.warehouse, fmt=args.fmt)
            uids = [u for u in args.uids.split(",") if u]
            # uid column type drives parsing (clip_id is string, uid is long)
            typ = wh.read(args.stage).schema[args.uid_col].dataType.simpleString()
            if typ in ("bigint", "int", "long", "smallint"):
                uids = [int(u) for u in uids]
            rows = wh.delete_uids(args.stage, uids, uid_col=args.uid_col)
            print(json.dumps({"stage": args.stage, "rows_after": rows}))
        elif args.cmd == "search":
            from go_lsh_spark.engine import SparkLSH

            docs = spark.read.parquet(args.docs)
            vec = [float(x) for x in args.vector.split(",")]
            # vector_length is a property of the *index*, not the query
            # (configs/lshconfigs.go:46): infer from the docs table so a
            # wrong-length query raises ErrInvalidDocument instead of
            # silently rejecting every document
            first = docs.select("vector").first()
            cfg = LSHConfig(vector_length=len(first["vector"]) if first else len(vec))
            eng = SparkLSH(spark, cfg).index(docs)
            scores, n_scored = eng.search(
                vec,
                args.index,
                SearchOptions(
                    num_to_return=args.k,
                    threshold=args.threshold,
                    sign_filter=args.sign,
                    max_lag=args.max_lag,
                ),
            )
            print(json.dumps({"scores": scores, "num_scored": n_scored}))
    finally:
        if not preexisting:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
