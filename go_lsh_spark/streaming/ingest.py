"""Streaming ingest of clips -> incremental signature/bucket/cluster state.

The reference is fully synchronous/batch (SURVEY.md §2.1 Streaming: none);
its Index() call is, however, naturally incremental -- new documents only
*append* bucket rows (tables/tables.go:68-101). That maps exactly onto
Structured Streaming with append-mode sinks:

  clips stream --readStream--> fused decode/feature/signature kernel
               --writeStream--> signatures & buckets tables (append)

Candidate generation against the accumulated corpus is done per microbatch
via foreachBatch (new-vs-old join + new-vs-new self-join), reusing the batch
operators -- the standard pattern for stateful-but-table-backed pipelines.
Watermarks are unnecessary: dedup state is keyed by clip_id, not event time.

Replay safety: Structured Streaming re-runs a microbatch after a failure, so
every append sink here is written `partitionBy("_batch_id")` with DYNAMIC
partition overwrite -- a replayed batch overwrites its own partition instead
of appending duplicate rows (duplicated signature/bucket rows would multiply
the verify joins and corrupt accumulated state). The clusters table is not an
append sink; its per-batch update is a convergent rewrite of affected
partitions and is idempotent by construction (re-applying a merge mapping on
already-merged state is the identity).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_lsh_spark.config import DedupConfig
from go_lsh_spark.hyperplanes import PlaneSet
from go_lsh_spark.functions import vector as V
from go_lsh_spark.operators.connected_components import connected_components
from go_lsh_spark.operators.dedup import build_buckets, clips_to_signatures

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string"
)

# hash-partition count for the incremental clusters table: assignments are
# partitioned by pmod(xxhash64(clip_id), N) so (a) per-batch updates rewrite
# only affected partitions (dynamic overwrite) and (b) "what cluster is clip
# X in, now?" point-lookups partition-prune. Rows never move partitions
# (keyed by immutable clip_id, not the mutable cluster_id), so a dynamic
# overwrite can never leave stale rows behind in an untouched partition.
N_CLUSTER_PARTS = 64


def _cpart(col) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_CLUSTER_PARTS)).cast("int")


def read_clip_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def signature_stream(clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """The fused batch signature kernel (one mapInArrow crossing: decode +
    features + sig64 + MinHash + winnowing) applied to a streaming DataFrame
    -- mapInArrow is streaming-safe for stateless projections."""
    planes = PlaneSet(cfg.lsh_config())
    return clips_to_signatures(clips, cfg, planes)


def _write_batch_partition(df: DataFrame, batch_id: int, path: str) -> None:
    """Idempotent per-microbatch append: the batch's rows land in their own
    _batch_id partition and a replayed batch OVERWRITES that partition
    (dynamic mode leaves every other batch's partition untouched)."""
    (
        df.withColumn("_batch_id", F.lit(batch_id))
        .write.partitionBy("_batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def start_signature_sink(
    clips: DataFrame, cfg: DedupConfig, out_path: str, checkpoint: str
):
    """Append signatures+buckets per microbatch via foreachBatch (one sink
    for two tables), through the fused clips->signatures kernel."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        planes = PlaneSet(cfg.lsh_config())
        sigs = clips_to_signatures(batch_df, cfg, planes)
        sigs.persist()
        _write_batch_partition(
            sigs.drop("features", "minhash"), batch_id, f"{out_path}/signatures"
        )
        _write_batch_partition(
            build_buckets(sigs, cfg), batch_id, f"{out_path}/buckets"
        )
        sigs.unpersist()

    return (
        clips.writeStream.option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .foreachBatch(write_batch)
        .start()
    )


def _pair_rollup(bucket_pairs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(src, clip_id_a < clip_id_b, sig64s) bucket-collision rows -> distinct
    candidate pairs with evidence flags -- identical aggregation semantics to
    the batch candidate_pairs tail (operators/dedup.py)."""
    return (
        bucket_pairs.groupBy("clip_id_a", "clip_id_b")
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


def _incremental_pairs(
    new_buckets: DataFrame, old_buckets: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Candidate pairs touching at least one NEW clip, with batch-identical
    bucket semantics:

    * new x OLD join (old = accumulated table MINUS this batch, so each
      cross-batch collision appears in exactly one orientation) plus a
      one-sided new x new self-join (a.clip_id < b.clip_id) for same-batch
      pairs -- previously new buckets were also in the `all` side, so
      same-batch collisions appeared in both orientations and n_winnow was
      double-counted (r2 ADVICE).
    * the winnowing stop-gram document-frequency cap (cfg.winnow_max_df) is
      enforced against the WHOLE accumulated corpus each batch, mirroring
      the batch candidate_pairs sizing pass: a common-phrase fingerprint
      whose bucket has grown past the cap stops generating candidates, so
      per-batch join cost stays O(|new| x bounded collision rate) instead of
      O(|new| x |corpus|) on hot fingerprints (r2 ADVICE). Hot non-winnow
      buckets are split at runtime by AQE's skew join (the join keys on the
      bucket key); the new side is bounded by the microbatch size.

    Old-old pairs were emitted by earlier microbatches, so coverage over the
    full corpus is the union across batches.
    """
    # winnow df cap over the accumulated corpus: fingerprint rows are unique
    # per (hash, clip_id), so the bucket count IS the document frequency
    all_winnow = old_buckets.filter(F.col("src") == "winnow").unionByName(
        new_buckets.filter(F.col("src") == "winnow")
    )
    capped = (
        all_winnow.groupBy("src", "band", "hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > cfg.winnow_max_df)
        .select("src", "band", "hash")
    )
    new_ok = new_buckets.join(capped, ["src", "band", "hash"], "left_anti")
    old_ok = old_buckets.join(capped, ["src", "band", "hash"], "left_anti")

    ham_ok = (F.col("a.src") != F.lit("simhash")) | (
        V.hamming64(F.col("a.sig64"), F.col("b.sig64")) <= cfg.max_hamming
    )
    on = [
        F.col("a.src") == F.col("b.src"),
        F.col("a.band") == F.col("b.band"),
        F.col("a.hash") == F.col("b.hash"),
    ]
    first_is_a = F.col("a.clip_id") < F.col("b.clip_id")
    cross = (
        new_ok.alias("a")
        .join(old_ok.alias("b"), on + [F.col("a.clip_id") != F.col("b.clip_id")])
        .filter(ham_ok)
        .select(
            F.col("a.src").alias("src"),
            F.when(first_is_a, F.col("a.clip_id")).otherwise(F.col("b.clip_id")).alias("clip_id_a"),
            F.when(first_is_a, F.col("b.clip_id")).otherwise(F.col("a.clip_id")).alias("clip_id_b"),
            F.when(first_is_a, F.col("a.sig64")).otherwise(F.col("b.sig64")).alias("sig64_a"),
            F.when(first_is_a, F.col("b.sig64")).otherwise(F.col("a.sig64")).alias("sig64_b"),
        )
    )
    within = (
        new_ok.alias("a")
        .join(new_ok.alias("b"), on + [F.col("a.clip_id") < F.col("b.clip_id")])
        .filter(ham_ok)
        .select(
            F.col("a.src").alias("src"),
            F.col("a.clip_id").alias("clip_id_a"),
            F.col("b.clip_id").alias("clip_id_b"),
            F.col("a.sig64").alias("sig64_a"),
            F.col("b.sig64").alias("sig64_b"),
        )
    )
    return _pair_rollup(cross.unionByName(within), cfg)


def read_clusters(spark: SparkSession, out_path: str) -> DataFrame:
    """Current cluster assignments (clip_id, cluster_id). Point lookups
    should add `.filter(_cpart(...) == p)`-style predicates implicitly via
    the partition column: filter on clip_id equality is rewritten by the
    caller as a _cpart literal for pruning (see cluster_of)."""
    return spark.read.parquet(f"{out_path}/clusters").select("clip_id", "cluster_id")


def cluster_of(spark: SparkSession, out_path: str, clip_id: str):
    """Partition-pruned point lookup: 'what cluster is this clip in, now?'
    reads exactly one of the N_CLUSTER_PARTS partitions."""
    df = spark.read.parquet(f"{out_path}/clusters")
    rows = (
        df.filter(
            (F.col("_cpart") == _cpart(F.lit(clip_id))) & (F.col("clip_id") == clip_id)
        )
        .select("cluster_id")
        .collect()
    )
    return rows[0]["cluster_id"] if rows else None


def _update_clusters(
    spark: SparkSession,
    out_path: str,
    new_clips: DataFrame,
    new_edges: DataFrame,
) -> None:
    """Incrementally maintain the clusters table: merge this batch's verified
    pairs into stored assignments without re-running connected components
    over the full history (r2 verdict #2).

    Method (per batch):
      1. contract: map each edge endpoint to its CURRENT cluster id
         (prior assignment, or its own clip_id if new) -- the contracted
         graph has one node per touched cluster, so it is bounded by the
         batch's pair count, never by corpus size.
      2. run the batch connected-components on the contracted edges; the
         resulting mapping old_cluster -> new_root merges exactly the
         clusters this batch's evidence connects. Roots stay the global
         minimum clip_id of the merged component (the same id the batch
         pipeline's CC would assign), because each old root was already its
         component's minimum.
      3. rewrite ONLY affected partitions: assignments are partitioned by
         pmod(xxhash64(clip_id), N) -- rows never change partition, so the
         affected set is (partitions holding rows of merged clusters) +
         (partitions of this batch's new clips), and a dynamic partition
         overwrite of that set can't strand stale rows. Detection of rows in
         merged clusters is a full columnar scan of 2 columns with a
         broadcast semi-join -- scan-only, no shuffle; at larger scale a
         cluster_id->partitions inverted summary would prune it further.

    Idempotent on replay: re-applying the mapping on already-merged state
    contracts every edge to a self-loop (empty mapping), and new clips
    already present are rewritten with their existing assignment.
    """
    path = f"{out_path}/clusters"
    new_clips = new_clips.select("clip_id").distinct()
    edges = new_edges.select("clip_id_a", "clip_id_b")
    nodes = (
        new_clips.unionByName(edges.select(F.col("clip_id_a").alias("clip_id")))
        .unionByName(edges.select(F.col("clip_id_b").alias("clip_id")))
        .distinct()
    )

    if not os.path.exists(path):
        # first batch: everything is new; CC over raw edges, singletons self
        comp = connected_components(
            edges.select(F.col("clip_id_a").alias("src"), F.col("clip_id_b").alias("dst"))
        )
        assign = (
            nodes.join(comp.withColumnRenamed("node", "clip_id"), "clip_id", "left")
            .select(
                "clip_id",
                F.coalesce(F.col("component"), F.col("clip_id")).alias("cluster_id"),
            )
        )
        (
            assign.withColumn("_cpart", _cpart(F.col("clip_id")))
            .write.partitionBy("_cpart")
            .mode("overwrite")
            .parquet(path)
        )
        return

    prior = spark.read.parquet(path).select("clip_id", "cluster_id", "_cpart")
    # current cluster of every touched clip (own id if unseen). The touched
    # set is small; the join shuffles only the pruned prior side under AQE.
    touched_parts = [
        r["p"] for r in nodes.select(_cpart(F.col("clip_id")).alias("p")).distinct().collect()
    ]
    prior_touched = prior.filter(F.col("_cpart").isin(touched_parts))
    cur = (
        nodes.join(prior_touched.select("clip_id", "cluster_id"), "clip_id", "left")
        .select(
            "clip_id",
            F.coalesce(F.col("cluster_id"), F.col("clip_id")).alias("cluster"),
        )
    )
    ca = cur.select(F.col("clip_id").alias("clip_id_a"), F.col("cluster").alias("_ca"))
    cb = cur.select(F.col("clip_id").alias("clip_id_b"), F.col("cluster").alias("_cb"))
    contracted = (
        edges.join(ca, "clip_id_a")
        .join(cb, "clip_id_b")
        .select(F.col("_ca").alias("src"), F.col("_cb").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    comp = connected_components(contracted)
    mapping = comp.filter(F.col("node") != F.col("component"))

    # partitions to rewrite: rows of merged clusters (full 2-column scan +
    # broadcast semi-join -- no shuffle) plus this batch's new clips
    merged_parts = [
        r["_cpart"]
        for r in prior.join(
            F.broadcast(mapping.select(F.col("node").alias("cluster_id"))),
            "cluster_id",
            "left_semi",
        )
        .select("_cpart")
        .distinct()
        .collect()
    ]
    parts = sorted(
        set(merged_parts)
        | {
            r["p"]
            for r in new_clips.select(_cpart(F.col("clip_id")).alias("p"))
            .distinct()
            .collect()
        }
    )
    if not parts:
        return

    remap = F.broadcast(
        mapping.select(F.col("node").alias("cluster_id"), F.col("component"))
    )
    rewritten = (
        prior.filter(F.col("_cpart").isin(parts))
        .join(remap, "cluster_id", "left")
        .select(
            "clip_id",
            F.coalesce(F.col("component"), F.col("cluster_id")).alias("cluster_id"),
        )
        .join(new_clips, "clip_id", "left_anti")
    )
    new_assign = (
        new_clips.join(cur, "clip_id")
        .join(
            F.broadcast(mapping.select(F.col("node").alias("cluster"), "component")),
            "cluster",
            "left",
        )
        .select(
            "clip_id",
            F.coalesce(F.col("component"), F.col("cluster")).alias("cluster_id"),
        )
    )
    (
        rewritten.unionByName(new_assign)
        .withColumn("_cpart", _cpart(F.col("clip_id")))
        .write.partitionBy("_cpart")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def start_incremental_dedup(
    clips: DataFrame, cfg: DedupConfig, out_path: str, checkpoint: str
):
    """Streaming near-duplicate detection: per microbatch, the NEW clips'
    signatures/buckets append to the accumulated tables (idempotently, via
    _batch_id dynamic partition overwrite), candidate pairs against the whole
    accumulated corpus are verified (the batch `verify_pairs` semantics:
    Hamming + Pearson + Jaccard + suffix-array LCS) and appended to
    `<out>/verified_pairs`, and the `<out>/clusters` table is incrementally
    merged so per-clip cluster assignments are current after every batch --
    the reference's incremental Index()+Search() usage (lsh/lsh.go:62-129)
    expressed as foreachBatch-over-tables."""
    from go_lsh_spark.operators.dedup import verify_pairs  # noqa: PLC0415

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        planes = PlaneSet(cfg.lsh_config())
        sigs = clips_to_signatures(batch_df, cfg, planes).persist()
        new_buckets = build_buckets(sigs, cfg).persist()
        _write_batch_partition(sigs, batch_id, f"{out_path}/signatures")
        _write_batch_partition(new_buckets, batch_id, f"{out_path}/buckets")
        # old = accumulated minus THIS batch (also correct on replay):
        # partition pruning skips the current partition at scan time
        old_buckets = (
            spark.read.parquet(f"{out_path}/buckets")
            .filter(F.col("_batch_id") != batch_id)
            .drop("_batch_id")
        )
        all_sigs = spark.read.parquet(f"{out_path}/signatures").drop("_batch_id")
        pairs = _incremental_pairs(new_buckets, old_buckets, cfg)
        verified = verify_pairs(pairs, all_sigs, cfg).persist()
        _write_batch_partition(verified, batch_id, f"{out_path}/verified_pairs")
        _update_clusters(
            spark,
            out_path,
            sigs.select("clip_id"),
            verified.select("clip_id_a", "clip_id_b"),
        )
        verified.unpersist()
        new_buckets.unpersist()
        sigs.unpersist()

    return (
        clips.writeStream.option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .foreachBatch(process_batch)
        .start()
    )
