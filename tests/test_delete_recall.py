"""Persisted delete path (O6 against Warehouse tables) and the ANN recall
loop-closer against the reference's Stats formula."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_lsh_spark.config import SIGN_FILTER_POS, LSHConfig, SearchOptions
from go_lsh_spark.engine import SparkLSH
from go_lsh_spark.oracle import DocumentNotStored
from go_lsh_spark.sources.catalog import Warehouse

DOC_SCHEMA = "uid long, index long, vector array<double>"
BASIC_DOCS = [
    (0, 0, [0.0, 0.0, 5.0]),
    (1, 0, [0.0, 0.1, 3.0]),
    (2, 0, [0.0, 0.1, 2.0]),
    (3, 0, [0.0, 0.1, 1.0]),
    (4, 0, [0.0, -0.1, -4.0]),
]


def _persisted_engine(spark, tmp_path):
    """Index the reference fixture, persist buckets+forward through the
    Warehouse, and return an engine reading the persisted tables."""
    eng = SparkLSH(spark, LSHConfig()).index(
        spark.createDataFrame(BASIC_DOCS, DOC_SCHEMA), cache=False
    )
    wh = Warehouse(spark, str(tmp_path / "wh_del"))
    wh.run("buckets", lambda: eng.buckets)
    wh.run("forward", lambda: eng.forward)
    eng2 = SparkLSH(spark, LSHConfig())
    eng2.buckets = wh.read("buckets")
    eng2.forward = wh.read("forward")
    return eng2, wh


def test_warehouse_delete_then_search_matches_reference_golden(spark, tmp_path):
    """lsh_test.go:55-66: after deleting uid 2, POS top-3 returns [0,1,3].
    Here the delete rewrites the PERSISTED tables, not an in-memory frame."""
    eng, wh = _persisted_engine(spark, tmp_path)
    so = SearchOptions(num_to_return=3, sign_filter=SIGN_FILTER_POS)
    scores, _ = eng.search([0, 0, 0.1], 0, so)
    assert [u for u, _, _ in scores] == [0, 1, 2]

    wh.delete_uids("buckets", [2])
    wh.delete_uids("forward", [2])
    eng.buckets = wh.read("buckets")
    eng.forward = wh.read("forward")
    scores, _ = eng.search([0, 0, 0.1], 0, so)
    assert [u for u, _, _ in scores] == [0, 1, 3]
    assert eng.forward.filter(F.col("uid") == 2).count() == 0


def test_warehouse_delete_unknown_uid_raises(spark, tmp_path):
    eng, wh = _persisted_engine(spark, tmp_path)
    with pytest.raises(DocumentNotStored):
        wh.delete_uids("buckets", [999])
    # reference semantics: existing uids in the same call ARE removed
    with pytest.raises(DocumentNotStored):
        wh.delete_uids("forward", [3, 999])
    assert wh.read("forward").filter(F.col("uid") == 3).count() == 0


def test_manifest_delete_touches_strict_subset_of_files(spark, tmp_path):
    """fmt='parquet+manifest': deleting uids rewrites ONLY the data files
    containing them -- every other file must survive byte-identical."""
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet+manifest")
    df = spark.range(100).select(
        F.col("id").alias("uid"), (F.col("id") * 2).alias("v")
    ).repartition(8)
    wh.run("t", lambda: df)
    before = set(wh.manifest_files("t"))
    assert len(before) == 8

    # uid 5 lives in exactly one file
    target_file = (
        wh.read("t")
        .withColumn("_f", F.col("_metadata.file_path"))
        .filter(F.col("uid") == 5)
        .select("_f")
        .collect()[0]["_f"]
    )
    wh.delete_uids("t", [5])
    after = set(wh.manifest_files("t"))
    kept = before & after
    assert len(kept) == 7, (before, after)  # 7 of 8 files untouched
    assert len(after) == 8  # one rewritten replacement
    out = wh.read("t")
    assert out.count() == 99
    assert out.filter(F.col("uid") == 5).count() == 0
    # the dropped file is the one that held uid 5, and is gone from disk
    import os

    from go_lsh_spark.sources.catalog import _strip_uri

    assert not os.path.exists(_strip_uri(target_file))


def test_manifest_delete_partitioned_stage(spark, tmp_path):
    """File-pruned delete must preserve partition-directory columns and
    place rewritten files back under their partition dirs."""
    wh = Warehouse(spark, str(tmp_path / "whp"), fmt="parquet+manifest")
    df = spark.range(40).select(
        F.col("id").alias("uid"), (F.col("id") % 4).alias("p"), F.col("id").alias("v")
    )
    wh.run("t", lambda: df.repartition(2, "p"), partition_by=["p"])
    before = set(wh.manifest_files("t"))
    wh.delete_uids("t", [8])  # p = 0
    out = wh.read("t")
    assert out.count() == 39
    assert sorted(r["p"] for r in out.select("p").distinct().collect()) == [0, 1, 2, 3]
    after = set(wh.manifest_files("t"))
    assert before & after, "some files must survive untouched"
    # reference semantics still hold in manifest mode
    with pytest.raises(DocumentNotStored):
        wh.delete_uids("t", [8])


def test_plain_parquet_delete_rename_aside(spark, tmp_path):
    """fmt='parquet' (explicit, no longer the default): deletes are full
    rewrites with the crash-recoverable rename-aside swap, leaving no
    __old/__rewrite residue on success."""
    import os

    wh = Warehouse(spark, str(tmp_path / "whpp"), fmt="parquet")
    wh.run("t", lambda: spark.range(20).select(F.col("id").alias("uid")))
    assert wh.delete_uids("t", [3, 7]) == 18
    assert wh.read("t").filter(F.col("uid").isin([3, 7])).count() == 0
    assert not os.path.exists(str(tmp_path / "whpp" / "t__old"))
    assert not os.path.exists(str(tmp_path / "whpp" / "t__rewrite"))


def test_manifest_is_default_and_empty_table_stays_readable(spark, tmp_path):
    """The default warehouse format is parquet+manifest (r3 verdict #3), and
    a delete that empties the table leaves it READABLE as an empty frame
    with the recorded schema instead of crashing on a zero-path parquet
    read (r3 ADVICE)."""
    wh = Warehouse(spark, str(tmp_path / "whe"))
    assert wh.fmt == "parquet+manifest"
    wh.run("t", lambda: spark.range(5).select(F.col("id").alias("uid")))
    assert wh.manifest_files("t")
    wh.delete_uids("t", list(range(5)))
    out = wh.read("t")
    assert out.count() == 0
    assert out.columns == ["uid"]
    # and a legacy plain-parquet directory opened under manifest mode is
    # adopted via a backfilled manifest
    legacy = Warehouse(spark, str(tmp_path / "whl"), fmt="parquet")
    legacy.run("t", lambda: spark.range(4).select(F.col("id").alias("uid")))
    adopted = Warehouse(spark, str(tmp_path / "whl"))
    assert adopted.read("t").count() == 4
    assert adopted.manifest_files("t")


def test_strip_uri_rejects_remote_authority():
    from go_lsh_spark.sources.catalog import _strip_uri

    assert _strip_uri("/a/b.parquet") == "/a/b.parquet"
    assert _strip_uri("file:/a/b.parquet") == "/a/b.parquet"
    assert _strip_uri("file:///a/b.parquet") == "/a/b.parquet"
    with pytest.raises(ValueError, match="remote authority"):
        _strip_uri("file://host/a/b.parquet")
    with pytest.raises(ValueError, match="non-local"):
        _strip_uri("hdfs://nn/a/b.parquet")
    # a plain relative path with a colon in its first segment is NOT a URI:
    # it must pass through unchanged, not urlparse into scheme 'data'
    assert _strip_uri("data:v2/part.parquet") == "data:v2/part.parquet"
    assert _strip_uri("c:stuff") == "c:stuff"


def test_iceberg_fmt_requires_runtime_jar(spark, tmp_path):
    """fmt='iceberg' is a sketch: without the runtime jar it must refuse
    loudly at construction, not fail obscurely at first write."""
    with pytest.raises(NotImplementedError, match="Iceberg runtime jar"):
        Warehouse(spark, str(tmp_path / "whi"), fmt="iceberg")


@pytest.mark.slow
def test_cli_dedup_writes_manifests_and_delete_prunes_files(spark, tmp_path, capsys):
    """CLI round-trip (r3 verdict #3): `dedup` builds a manifest-mode
    warehouse, `delete` removes a clip touching a strict subset of the
    signatures stage's files."""
    import json as _json

    from go_lsh_spark import cli
    from go_lsh_spark.sources.synth import clips_to_spark, synth_clips

    res = synth_clips(n_clips=30, seed=5)
    clips, _ = clips_to_spark(spark, res)
    clips_dir = str(tmp_path / "clips")
    clips.repartition(4).write.parquet(clips_dir)
    whdir = str(tmp_path / "wh")

    assert cli.main(["dedup", "--clips", clips_dir, "--warehouse", whdir]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["clusters_rows"] == 30

    wh = Warehouse(spark, whdir)
    before = set(wh.manifest_files("signatures"))
    assert before, "dedup must have committed a signatures manifest"
    victim = wh.read("signatures").select("clip_id").first()["clip_id"]
    assert (
        cli.main(
            ["delete", "--warehouse", whdir, "--stage", "signatures",
             "--uids", victim, "--uid-col", "clip_id"]
        )
        == 0
    )
    after = set(wh.manifest_files("signatures"))
    assert before & after, "delete must leave untouched files alone"
    assert before != after
    assert wh.read("signatures").filter(F.col("clip_id") == victim).count() == 0


def test_warehouse_records_shuffle_metrics(spark, tmp_path):
    """Stage sidecars record shuffle read/write byte deltas (from the JVM
    AppStatusStore) so shuffle-width claims are assertable, not inferred."""
    import json
    import os

    wh = Warehouse(spark, str(tmp_path / "whm"))
    wh.run(
        "agg",
        lambda: spark.range(50000)
        .selectExpr("id % 97 as k", "id as v")
        .groupBy("k")
        .agg(F.sum("v").alias("s")),
    )
    with open(os.path.join(str(tmp_path / "whm"), "agg_stage.json")) as f:
        meta = json.load(f)
    shuf = meta["shuffle"]
    assert shuf is not None
    assert shuf["shuffle_write_bytes"] > 0
    assert wh.metrics()["agg"]["shuffle"] == shuf


def test_ann_recall_meets_stats_prediction(spark):
    """Measured recall@K of the LSH-bucketed ANN must beat the reference
    Stats formula's prediction (lsh/lsh.go:277-282: p_diff = 2/pi*acos(s),
    P(found) = 1 - (1 - (1-p_diff)^H)^T) averaged over the true top-K
    similarities."""
    from go_lsh_spark.entry_queries import (
        N_HYPER,
        N_TABLES,
        q_ann_recall,
        q_topk_cosine,
    )

    sf_dir = "/root/testdata/sf0.001"
    rec = q_ann_recall(spark, sf_dir).collect()
    measured = float(np.mean([r["recall"] for r in rec]))

    sims = [r["cos_sim"] for r in q_topk_cosine(spark, sf_dir).collect()]

    def predicted(theta: float) -> float:
        p_same = max(1.0 - 2.0 / math.pi * math.acos(max(min(theta, 1.0), -1.0)), 0.0)
        return 1.0 - (1.0 - p_same**N_HYPER) ** N_TABLES

    expect = float(np.mean([predicted(s) for s in sims]))
    assert measured >= expect, (measured, expect)


@pytest.mark.slow
def test_ivf_refined_centroids_beat_seeded_baseline(spark):
    """One k-means (Lloyd) iteration over the seeded-sample centroids must
    (a) cut the quantization error -- the provable Lloyd property -- and
    (b) lift recall@K at IVF_NPROBE on the sf0.1 embeddings (recall is
    noisier than inertia at toy scale, so the recall claim is pinned at the
    larger SF where the effect is stable: 0.55 -> 0.61 measured)."""
    from pyspark.sql import functions as F

    from go_lsh_spark import entry_queries as EQ
    from go_lsh_spark.functions import vector as V

    sf_dir = "/root/testdata/sf0.1"
    brute = EQ.q_topk_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    brute = brute.persist()
    n_q = brute.select("query_id").distinct().count()

    stats = {}
    for iters in (0, 1, 2):
        _, cent, assigned = EQ._ivf_assignments(spark, sf_dir, lloyd_iters=iters)
        dist = (
            V.dot("emb", "cemb") * F.lit(-2.0)
            + V.dot("cemb", "cemb")
            + V.dot("emb", "emb")
        )
        inertia = (
            assigned.join(cent, "cid")
            .select(dist.alias("_d"))
            .agg(F.sum("_d"))
            .collect()[0][0]
        )
        hits = (
            brute.join(
                EQ.q_ann_ivf(spark, sf_dir, lloyd_iters=iters).select(
                    "query_id", "neighbor_id"
                ),
                ["query_id", "neighbor_id"],
            ).count()
        )
        stats[iters] = (inertia, hits / (n_q * EQ.TOPK))
    brute.unpersist()

    # Lloyd property: quantization error is monotone non-increasing in the
    # iteration count (tiny tolerance for the 6dp centroid rounding), and
    # the first iteration is a real cut
    assert stats[1][0] < stats[0][0] * 0.75, stats
    assert stats[2][0] <= stats[1][0] * 1.001, stats
    # recall@K is monotone over 0/1/2 on this seeded corpus
    assert stats[0][1] <= stats[1][1] <= stats[2][1], stats


@pytest.mark.slow
def test_ivf_nprobe_monotone_recall(spark, sf_dir):
    """nprobe is the IVF recall/cost dial: recall@K must be monotone
    non-decreasing in the probe count, and probing every list (nprobe =
    IVF_K) must equal exact search (recall 1.0) -- the other half of the
    IVF quality story next to the Lloyd-iteration knob."""
    from go_lsh_spark import entry_queries as EQ

    brute = EQ.q_topk_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    brute = brute.persist()
    n_pairs = brute.count()

    recall = {}
    for nprobe in (1, 2, 4, EQ.IVF_K):
        hits = brute.join(
            EQ.q_ann_ivf(spark, sf_dir, nprobe=nprobe).select(
                "query_id", "neighbor_id"
            ),
            ["query_id", "neighbor_id"],
        ).count()
        recall[nprobe] = hits / n_pairs
    brute.unpersist()

    assert recall[1] <= recall[2] <= recall[4] <= recall[EQ.IVF_K], recall
    assert recall[EQ.IVF_K] == 1.0, recall
    # the dial must actually dial: probing 1/16th of the lists cannot
    # already be exact on a non-degenerate corpus
    assert recall[1] < 1.0, recall


def test_buckets_single_pass_matches_union(spark, sf_dir):
    """_buckets_single_pass (one posexplode pass) must emit exactly the
    row multiset of the N_TABLES-branch union form it replaced for the
    pair-building queries (r6 optimization; q_simhash_buckets keeps the
    union form for count-pruning)."""
    from go_lsh_spark import entry_queries as EQ

    emb = EQ._emb_double(EQ._read(spark, sf_dir, "embeddings"))
    cols = ["vec_id", "table_id", "hash"]
    fp = lambda df: df.select(cols).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*cols)).alias("x"),
        F.sum(F.xxhash64(*cols) % F.lit(10**12)).alias("s"),
    ).collect()[0]
    got = fp(EQ._buckets_single_pass(emb))
    want = fp(EQ._buckets_from(emb))
    assert (got.n, got.x, got.s) == (want.n, want.x, want.s)
    assert EQ._buckets_single_pass(emb).schema == EQ._buckets_from(emb).schema


def test_ivf_fold_assign_and_probe_match_joined_forms(spark, sf_dir):
    """The r6 IVF restructure (argmin fold over a broadcast centroid array,
    sorted-slice probes) must reproduce EXACTLY the rows of the
    crossJoin+min_by assignment and the row_number-window probe selection
    it replaced -- same distances (same IEEE ops, same order), ties to the
    lowest cid."""
    from pyspark.sql.window import Window

    from go_lsh_spark import entry_queries as EQ
    from go_lsh_spark.functions import vector as Vf

    emb = EQ._emb_mat(spark, sf_dir, norm=True)
    n = EQ._read(spark, sf_dir, "embeddings", parallel=False).count()
    step = max(n // EQ.IVF_K, 1)
    cent = (
        emb.filter((F.col("vec_id") % step == 0) & (F.col("vec_id") / step < EQ.IVF_K))
        .select(
            (F.col("vec_id") / step).cast("int").alias("cid"),
            F.col("emb").alias("cemb"),
        )
        .withColumn("_c2", Vf.dot("cemb", "cemb"))
    )
    # -- assignment: fold form vs the min_by groupBy form it replaced
    dist = Vf.dot("emb", "cemb") * F.lit(-2.0) + F.col("_c2")
    old = (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", "emb", "cid", dist.alias("_d"), "_nrm")
        .groupBy("vec_id")
        .agg(
            F.min_by("cid", F.struct(F.col("_d"), F.col("cid"))).alias("cid"),
            F.first("emb").alias("emb"),
            F.first("_nrm").alias("_nrm"),
        )
    )
    new = EQ._ivf_assign(emb, cent)
    assert new.columns == ["vec_id", "cid", "emb", "_nrm"]
    got = {(r["vec_id"], r["cid"]) for r in new.select("vec_id", "cid").collect()}
    want = {(r["vec_id"], r["cid"]) for r in old.select("vec_id", "cid").collect()}
    assert got == want
    # -- probes: sorted-slice form vs the row_number window form
    q = new.filter(F.col("vec_id") < EQ.N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("_nrm").alias("_qn"),
    )
    for probe_n in (1, EQ.IVF_NPROBE):
        qdist = Vf.dot("qemb", "cemb") * F.lit(-2.0) + F.col("_c2")
        old_probes = (
            q.crossJoin(F.broadcast(cent))
            .select("query_id", "cid", qdist.alias("_d"))
            .withColumn(
                "_r",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("_d").asc(), F.col("cid").asc()
                    )
                ),
            )
            .filter(F.col("_r") <= probe_n)
            .select("query_id", "cid")
        )
        new_probes = (
            q.crossJoin(F.broadcast(EQ._cent_fold(cent)))
            .select("query_id", F.explode(EQ._ivf_probe_col(probe_n)).alias("_p"))
            .select("query_id", F.col("_p.cid").alias("cid"))
        )
        got_p = {(r["query_id"], r["cid"]) for r in new_probes.collect()}
        want_p = {(r["query_id"], r["cid"]) for r in old_probes.collect()}
        assert got_p == want_p, probe_n


def test_scoring_with_precomputed_stats_bit_identical(spark, sf_dir):
    """cosine_with_norms / pearson_with_stats over per-vector columns must
    be BIT-identical (no rounding tolerance) to the inline cosine/pearson
    they replaced in the scoring queries: same IEEE ops in the same order,
    just hoisted out of the per-pair expression."""
    from go_lsh_spark import entry_queries as EQ
    from go_lsh_spark.functions import vector as Vf

    emb = EQ._emb_double(EQ._read(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "emb",
        Vf.vector_norm("emb").alias("_nrm"),
        Vf.pearson_sum("emb").alias("_ps"),
        Vf.pearson_var("emb").alias("_pv"),
    )
    a = emb.select(
        F.col("vec_id").alias("ia"), F.col("emb").alias("xa"),
        F.col("_nrm").alias("na"), F.col("_ps").alias("sa"), F.col("_pv").alias("va"),
    )
    b = emb.select(
        F.col("vec_id").alias("ib"), F.col("emb").alias("xb"),
        F.col("_nrm").alias("nb"), F.col("_ps").alias("sb"), F.col("_pv").alias("vb"),
    )
    # a deterministic sample of cross pairs, including self-pairs
    pairs = a.join(b, (F.col("ia") % 29 == F.col("ib") % 29)).limit(5000)
    mism = pairs.select(
        Vf.cosine("xa", "xb").alias("c0"),
        Vf.cosine_with_norms("xa", "xb", "na", "nb").alias("c1"),
        Vf.pearson("xa", "xb").alias("p0"),
        Vf.pearson_with_stats("xa", "xb", "sa", "sb", "va", "vb").alias("p1"),
    ).filter(
        (~F.col("c0").eqNullSafe(F.col("c1")))
        | (~F.col("p0").eqNullSafe(F.col("p1")))
    )
    assert mism.count() == 0
