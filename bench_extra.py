"""Extra measurement harness for optimization rounds (bench.py is frozen).

Per headline query: best-of-N `.count()` timing (the frozen bench.py
methodology) plus `.explain("formatted")` capture into plans/<tag>/.

Usage:
  python bench_extra.py [--queries q1,q2,...] [--runs 3] [--plans-dir plans/r06]
                        [--suffix before|after] [--no-dedup]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "simhash_buckets",
    "bucket_join_pairs",
    "pearson_scores",
    "topk_cosine",
    "ann_lsh",
    "ann_ivf",
    "ann_recall",
    "ann_recall_ivf",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "exact_dedup",
    "token_counts",
    "token_simhash",
    "simhash_neardup_pairs",
    "cosine_neardup_pairs",
    "winnowing_fingerprints",
    "row_index_pruning",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-dedup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from go_lsh_spark.session import build_session

    spark = build_session(
        app_name="go-lsh-spark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from go_lsh_spark.entry_queries import QUERIES

    names = args.queries.split(",") if args.queries else list(HEADLINE)
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name][0]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        rs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            rs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if not rs:
            continue
        runs[name] = rs
        timings[name] = min(rs)
        print(f"{name}: {min(rs):.3f}  {rs}", file=sys.stderr)

    if not args.no_dedup and args.queries is None:
        from bench import N_CLIPS_BENCH, run_dedup

        rs, fps = [], set()
        for _ in range(args.runs):
            secs, fp = run_dedup(spark, N_CLIPS_BENCH)
            rs.append(round(secs, 3))
            fps.add(tuple(sorted(fp.items())))
        runs["audio_dedup_e2e"] = rs
        timings["audio_dedup_e2e"] = min(rs)
        print(f"audio_dedup_e2e: {min(rs):.3f}  {rs}  fp={fps}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "bench_extra_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "sf_dir": sf_dir,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
