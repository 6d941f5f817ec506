"""fasthash kernels + distributed synth determinism."""

import numpy as np
from pyspark.sql import functions as F

from go_lsh_spark.functions import fasthash as FH


def test_mix64_deterministic_and_diffuse():
    x = np.arange(1000, dtype=np.uint64)
    a, b = FH.mix64(x), FH.mix64(x)
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) == 1000
    # avalanche-ish: consecutive inputs produce uncorrelated high bits
    high = (a >> np.uint64(63)).astype(int)
    assert 0.4 < high.mean() < 0.6


def test_shingle_hashes_shift_invariant_content():
    a = FH.shingle_hashes_bytes(b"hello world, hello there", 5)
    b = FH.shingle_hashes_bytes(b"XXhello world, hello thereYY", 5)
    # every shingle of the first string appears among the second's hashes
    assert set(a.tolist()) <= set(b.tolist())
    assert FH.shingle_hashes_bytes(b"abc", 5).size == 0


def test_minhash_similarity_tracks_jaccard():
    seeds = FH.perm_seeds(128)
    a = b"the quick brown fox jumps over the lazy dog " * 3
    b2 = b"the quick brown fox jumps over the lazy cat " * 3
    c = b"zxqwv jkmnp aeiou bcdfg hjklz qwert yuiop"
    ha = FH.minhash_from_hashes(FH.shingle_hashes_bytes(a, 5), seeds)
    hb = FH.minhash_from_hashes(FH.shingle_hashes_bytes(b2, 5), seeds)
    hc = FH.minhash_from_hashes(FH.shingle_hashes_bytes(c, 5), seeds)
    sim_ab = (ha == hb).mean()
    sim_ac = (ha == hc).mean()
    assert sim_ab > 0.5 > sim_ac
    assert (ha == ha).all()


def test_winnow_guarantee():
    # any common substring of length >= k + w - 1 shares a fingerprint
    k, w = 12, 8
    run = b"0123456789abcdefghijklmnop"  # 26 chars > 19
    a = b"AAA" + run + b"BBBBBBBBBBBBBBBBBBBBBBB"
    b2 = b"CCCCCCCCCCCCCCCCCCCCCCCCC" + run + b"DDD"
    fa = set(FH.winnow_from_hashes(FH.shingle_hashes_bytes(a, k), w).tolist())
    fb = set(FH.winnow_from_hashes(FH.shingle_hashes_bytes(b2, k), w).tolist())
    assert fa & fb


def test_distributed_synth_matches_truth_and_schema(spark):
    from go_lsh_spark.sources.synth import synth_clips_distributed

    clips, truth = synth_clips_distributed(spark, 40, seed=3)
    rows = clips.collect()
    assert len(rows) == 40
    assert clips.columns == ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    # group members share identical duration/sr (same base rendering)
    j = clips.join(truth, "clip_id").groupBy("group_id").agg(
        F.countDistinct("dur_ms").alias("nd"), F.countDistinct("sr_hz").alias("ns")
    )
    for r in j.collect():
        assert r.nd == 1 and r.ns == 1
