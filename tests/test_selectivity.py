"""The reference's realistic-benchmark selectivity invariant at reduced
scale (/root/reference/lsh/lsh_test.go:626-702): 5 noisy waveform families,
a family query at theta=0.65 POS with a large NumToReturn must return
exactly the brute-force |corr|>=theta POS count (in the reference: exactly
the 20k family members out of 100k)."""

import numpy as np

from go_lsh_spark.config import SIGN_FILTER_POS, LSHConfig, SearchOptions
from go_lsh_spark.engine import SparkLSH
from go_lsh_spark.sources.synth import family_envelope

N_PER_FAMILY = 40
VEC_LEN = 60


def _corpus(rng):
    families = ["spike", "risingstep", "loweringstep", "triangle", "dip"]
    vecs, uids = [], []
    for n in range(N_PER_FAMILY * len(families)):
        base = family_envelope(families[n % len(families)], VEC_LEN)
        vecs.append(base + rng.uniform(0, 1, VEC_LEN))
        uids.append(n)
    return np.array(uids), np.array(vecs)


def test_realistic_selectivity(spark):
    rng = np.random.default_rng(77)
    uids, vecs = _corpus(rng)
    docs = spark.createDataFrame(
        [(int(u), 0, [float(x) for x in v]) for u, v in zip(uids, vecs)],
        "uid long, index long, vector array<double>",
    )
    cfg = LSHConfig(vector_length=VEC_LEN)  # H=8, T=128 defaults
    eng = SparkLSH(spark, cfg).index(docs)

    query = family_envelope("risingstep", VEC_LEN)
    so = SearchOptions(
        num_to_return=1000, threshold=0.65, sign_filter=SIGN_FILTER_POS, max_lag=900
    )
    scores, _ = eng.search(query, 0, so)

    # brute-force POS count (the reference's hard invariant: every family
    # member passes, nothing else does)
    qc = query - query.mean()
    vc = vecs - vecs.mean(axis=1, keepdims=True)
    corr = (vc @ qc) / (np.linalg.norm(vc, axis=1) * np.linalg.norm(qc))
    expected = {int(u) for u, c in zip(uids, corr) if c >= 0.65}
    assert expected, "degenerate fixture"
    got = {u for u, _, _ in scores}
    assert got == expected
    # family purity: everything returned is a risingstep member
    assert all(u % 5 == 1 for u in got)
