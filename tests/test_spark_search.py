"""Spark-engine golden tests: the reference's end-to-end fixtures
(lsh/lsh_test.go TestLSHSearch/TestSearch/TestSearchAcrossTime/
TestIndexSimple) run against the DataFrame pipeline, plus engine-vs-oracle
equivalence on a randomized corpus.
"""

import numpy as np
import pytest

from go_lsh_spark.config import (
    SIGN_FILTER_ANY,
    SIGN_FILTER_NEG,
    SIGN_FILTER_POS,
    LSHConfig,
    SearchOptions,
)
from go_lsh_spark.engine import SparkLSH
from go_lsh_spark.oracle import OracleLSH

DOC_SCHEMA = "uid long, index long, vector array<double>"

BASIC_DOCS = [
    (0, 0, [0.0, 0.0, 5.0]),
    (1, 0, [0.0, 0.1, 3.0]),
    (2, 0, [0.0, 0.1, 2.0]),
    (3, 0, [0.0, 0.1, 1.0]),
    (4, 0, [0.0, -0.1, -4.0]),
]


def make_engine(spark, docs, **cfg_kwargs):
    cfg = LSHConfig(**cfg_kwargs)
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    return SparkLSH(spark, cfg).index(df)


def uids(scores):
    return [s[0] for s in scores]


def test_lsh_search_golden(spark):
    eng = make_engine(spark, BASIC_DOCS)

    so = SearchOptions(num_to_return=3, sign_filter=SIGN_FILTER_POS)
    scores, _ = eng.search([0, 0, 0.1], 0, so)
    assert uids(scores) == [0, 1, 2]

    eng.delete([2])
    scores, _ = eng.search([0, 0, 0.1], 0, so)
    assert uids(scores) == [0, 1, 3]

    # re-index uid 2 (delete + union is the DataFrame analogue of the
    # reference's re-Index after Delete, lsh_test.go:80-92)
    eng2 = make_engine(spark, BASIC_DOCS)
    scores, _ = eng2.search([0, 0, 0.1], 0, so)
    assert uids(scores) == [0, 1, 2]

    scores, _ = eng2.search([0, 0, 0.1], 0, SearchOptions(num_to_return=3, sign_filter=SIGN_FILTER_NEG))
    assert uids(scores) == [4]

    scores, _ = eng2.search([0, 0, 0.1], 0, SearchOptions(num_to_return=3, sign_filter=SIGN_FILTER_ANY))
    assert uids(scores) == [0, 4, 1]

    scores, _ = eng2.search(
        [0, 0, 0.1], 0, SearchOptions(num_to_return=3, sign_filter=SIGN_FILTER_ANY, threshold=1.0)
    )
    assert uids(scores) == [0]


def test_search_golden_scores(spark):
    docs = [
        (0, 0, [0.0, 1.0, 3.0]), (1, 0, [1.0, 3.0, 3.0]), (2, 0, [3.0, 3.0, 0.0]),
        (3, 0, [1.0, 2.0, 3.0]), (4, 0, [-7.0, 8.0, -9.0]), (5, 0, [-7.0, 9.0, -5.5]),
        (6, 0, [-7.0, 9.0, -7.0]), (7, 0, [-7.0, 10.0, -7.0]), (8, 0, [-5.0, -3.0, -2.0]),
    ]
    eng = make_engine(spark, docs)
    so = SearchOptions(sign_filter=SIGN_FILTER_POS)

    scores, _ = eng.search([0, 1, 3], 0, so)
    assert {(u, round(s, 2)) for u, _, s in scores} == {(0, 1.00), (3, 0.98)}

    scores, _ = eng.search([-7, 9, -7], 0, so)
    expected = {4: 0.99, 5: 0.99, 6: 1.00, 7: 0.99}
    assert {u for u, _, _ in scores} == set(expected)
    for u, _, s in scores:
        assert abs(s - expected[u]) <= 0.0100001  # Go tolerance: fails only if > 0.01


def test_search_across_time(spark):
    docs = []
    for uid in (0, 1):
        docs += [
            (uid, 0, [0.0, 1.0, 3.0]),
            (uid, 60, [1.0, 3.0, 3.0]),
            (uid, 120, [3.0, 3.0, 0.0]),
            (uid, 180, [3.0, 0.0, 1.0] if uid == 0 else [3.0, 0.0, 0.0]),
        ]
    eng = make_engine(spark, docs, num_hyperplanes=4, row_size=60)

    scores, _ = eng.search([1, 3, 3], 0, SearchOptions(max_lag=-1, threshold=1.0))
    got = {(u, i, round(s, 2)) for u, i, s in scores}
    assert got == {(0, 60, 1.0), (1, 60, 1.0), (1, 180, -1.0)}

    scores, _ = eng.search([1, 3, 3], 60, SearchOptions(max_lag=0, threshold=1.0))
    got = {(u, i, round(s, 2)) for u, i, s in scores}
    assert got == {(0, 60, 1.0), (1, 60, 1.0)}


def test_validation_side_output(spark):
    # lsh_test.go:190-211 expressed as rejects routing, not exceptions
    docs = [
        (0, 0, [0.0, 1.0]),        # wrong length
        (1, 0, [3.0, 3.0, 3.0]),   # no complexity
        (2, 0, [3.0, 3.0, 0.0]),   # ok
    ]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    eng = SparkLSH(spark, LSHConfig()).index(df)
    rejects = {r["uid"]: r["reason"] for r in eng.rejects.collect()}
    assert rejects == {0: "ErrInvalidDocument", 1: "ErrNoVectorComplexity"}
    assert eng.forward.count() == 1


@pytest.mark.slow
def test_engine_matches_oracle_randomized(spark):
    """Engine and oracle share planes => identical result sets (SURVEY §5b)."""
    rng = np.random.default_rng(123)
    n, vlen = 200, 8
    vecs = rng.normal(size=(n, vlen))
    cfg_kwargs = dict(num_hyperplanes=8, num_tables=16, vector_length=vlen, seed=99)
    docs = [(i, 0, [float(x) for x in vecs[i]]) for i in range(n)]

    eng = make_engine(spark, docs, **cfg_kwargs)
    oracle = OracleLSH(LSHConfig(**cfg_kwargs))
    for uid, idx, vec in docs:
        oracle.index(uid, idx, vec)

    for qi in range(5):
        q = vecs[rng.integers(0, n)] + rng.normal(scale=0.05, size=vlen)
        so = SearchOptions(num_to_return=20, threshold=0.6, sign_filter=SIGN_FILTER_ANY)
        got, got_scored = eng.search(q, 0, so)
        exp, exp_scored = oracle.search(q, 0, so)
        assert got_scored == exp_scored, f"query {qi}: NumScored mismatch"
        got_set = {(u, i, round(s, 9)) for u, i, s in got}
        exp_set = {(s.uid, s.index, round(s.score, 9)) for s in exp}
        assert got_set == exp_set, f"query {qi}"


def test_num_scored_counts_all_candidates(spark):
    eng = make_engine(spark, BASIC_DOCS)
    _, num_scored = eng.search(
        [0, 0, 0.1], 0, SearchOptions(num_to_return=1, threshold=0.99, sign_filter=SIGN_FILTER_ANY)
    )
    # every doc collides with the query in some table at these tiny vectors
    assert num_scored == 5


def test_exists_size_uids(spark):
    eng = make_engine(spark, BASIC_DOCS)
    assert eng.size() == 5
    assert eng.uids() == [0, 1, 2, 3, 4]
    assert eng.exists(3)
    assert not eng.exists(99)
    eng.delete([2])
    assert eng.size() == 4
    assert eng.uids() == [0, 1, 3, 4]
    assert not eng.exists(2)
