"""Adversarial boilerplate corpus (r4 verdict #8): a corpus where a large
fraction of winnowing fingerprints exceed the document-frequency cap must
not blow up reconcile()'s blast radius (the de-collected stop-gram set, r4
verdict #4) and must still converge to exact batch semantics.

Two planted patterns:
  * boilerplate A on EVERY clip -- floods the winnow_df table with over-cap
    fingerprints (>10% of all distinct fingerprints), stressing the
    over-cap set that is now a DataFrame/broadcast join instead of a
    driver-side collect;
  * boilerplate B on 12 clips spread evenly across microbatches -- its
    fingerprints stay under the cap for the first batches (pairs get
    emitted and clustered) and cross it later, so reconcile must DROP those
    early pairs and split the clusters back, matching the batch pipeline
    (which sees the final df and never emits them).
"""

import time

import pytest
from pyspark.sql import functions as F

from go_lsh_spark.config import DedupConfig
from go_lsh_spark.sources.synth import clips_to_spark, synth_clips
from go_lsh_spark.streaming.ingest import read_clusters

BOILER_A = (
    "terms and conditions apply to this recording please consult the "
    "documentation for further details about licensing redistribution "
    "and attribution requirements before any use of this material in "
    "derived works or public performances of any kind whatsoever"
)
BOILER_B = (
    "standard broadcast intro jingle station identification segment with "
    "the usual sponsor acknowledgement and the regulatory disclosure read "
    "at speed before the program begins"
)


@pytest.mark.slow
def test_adversarial_boilerplate_reconcile_stays_exact(spark, tmp_path):
    from go_lsh_spark.operators.dedup import dedup_pipeline
    from go_lsh_spark.streaming.ingest import (
        read_clip_stream,
        reconcile,
        start_incremental_dedup,
    )

    n_clips = 200
    res = synth_clips(n_clips=n_clips, seed=17)
    clips, _ = clips_to_spark(spark, res)
    # every clip carries boilerplate A; a deterministic ~1/13 subset (~15
    # clips, comfortably past the df cap of 8) also carries B, spread
    # across microbatches by the hash so its fingerprints stay under the
    # cap for the early batches and cross it later
    clips = clips.withColumn(
        "transcript",
        F.concat_ws(
            " ",
            F.col("transcript"),
            F.lit(BOILER_A),
            F.when(
                F.pmod(F.xxhash64("clip_id"), F.lit(13)) == 0, F.lit(BOILER_B)
            ).otherwise(F.lit("")),
        ),
    )
    src = str(tmp_path / "clips_in")
    clips.repartition(4).write.parquet(src)
    clips = spark.read.parquet(src)

    cfg = DedupConfig()
    out = str(tmp_path / "out")
    q = start_incremental_dedup(
        read_clip_stream(spark, src, max_files=1), cfg, out, str(tmp_path / "ck")
    )
    q.awaitTermination(900)

    # the corpus is genuinely adversarial: a large share of all distinct
    # fingerprints sits over the df cap
    wdf = spark.read.parquet(f"{out}/winnow_df")
    n_fps = wdf.count()
    n_over = wdf.filter(F.col("df") > cfg.winnow_max_df).count()
    assert n_over > 0.10 * n_fps, (n_over, n_fps)

    t0 = time.time()
    stats = reconcile(spark, out, cfg)
    reconcile_secs = time.time() - t0
    # bounded blast radius: the pass completes in a sane budget even with
    # hundreds of over-cap fingerprints marking most of the corpus suspect
    assert reconcile_secs < 900, reconcile_secs
    assert stats["over_cap_fps"] == n_over
    # the cross-batch cap crossing actually happened and was undone
    assert stats["dropped_pairs"] > 0, stats

    # exact batch equality under the adversarial corpus
    batch = dedup_pipeline(spark, clips, cfg)
    exp = {r.clip_id: r.cluster_id for r in batch.clusters.collect()}
    got = {
        r.clip_id: r.cluster_id
        for r in read_clusters(spark, out).collect()
    }
    assert got == exp

    # idempotent second pass
    stats2 = reconcile(spark, out, cfg)
    assert stats2["dropped_pairs"] == 0
