"""Exact sign-hash parity fixtures.

Hand-built axis-aligned planes and expected hash values are transcribed from
/root/reference/hyperplanes/hyperplanes_test.go:48-202 — the single most
important parity fixture (SURVEY.md §5): they pin the strict >0 comparison,
MSB-first bit packing, and big-endian width behavior.
"""

import math

import numpy as np
import pytest

from go_lsh_spark.config import LSHConfig
from go_lsh_spark.hyperplanes import Hyperplanes, PlaneSet, band_hash_from_sig64

AXIS_PLANES = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
S3 = math.sqrt(1.0 / 3.0)

# (vector, expected msb-first bit pattern over the 3 planes)
CASES = [
    ([0.0, 0.0, 1.0], 0b100),
    ([0.0, 1.0, 0.0], 0b010),
    ([1.0, 0.0, 0.0], 0b001),
    ([S3, S3, S3], 0b111),
    ([-S3, -S3, -S3], 0b000),
    ([0.0, 0.0, -1.0], 0b000),
]


@pytest.mark.parametrize("vec,bits", CASES)
def test_hash16_fixtures(vec, bits):
    # hyperplanes_test.go:141-151: Hash16 places plane i at bit 15-i
    h = Hyperplanes(AXIS_PLANES)
    assert h.hash16(vec) == bits << 13


@pytest.mark.parametrize("vec,bits", CASES)
def test_hash8_fixtures(vec, bits):
    h = Hyperplanes(AXIS_PLANES)
    assert h.hash8(vec) == bits << 5


@pytest.mark.parametrize("vec,bits", CASES)
def test_hash32_fixtures(vec, bits):
    h = Hyperplanes(AXIS_PLANES)
    assert h.hash32(vec) == bits << 29


@pytest.mark.parametrize("vec,bits", CASES)
def test_hash64_fixtures(vec, bits):
    h = Hyperplanes(AXIS_PLANES)
    assert h.hash64(vec) == bits << 61


def test_zero_dot_is_zero_bit():
    # strict > 0: an orthogonal vector sets no bit (hyperplanes.go:111)
    h = Hyperplanes(np.array([[0.0, 1.0, 0.0]]))
    assert h.hash16([1.0, 0.0, 1.0]) == 0


def test_generated_planes_unit_norm():
    # hyperplanes_test.go:13-46
    h = Hyperplanes.generate(8, 60, seed=42)
    assert h.planes.shape == (8, 60)
    np.testing.assert_allclose(np.linalg.norm(h.planes, axis=1), 1.0, atol=1e-12)


def test_generation_is_seed_deterministic():
    a = Hyperplanes.generate(8, 60, seed=7).planes
    b = Hyperplanes.generate(8, 60, seed=7).planes
    c = Hyperplanes.generate(8, 60, seed=8).planes
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_width_overflow_rejected():
    h = Hyperplanes.generate(9, 3, seed=1)
    with pytest.raises(ValueError):
        h.hash8([1.0, 2.0, 3.0])


def test_planeset_hash_tables_matches_per_table_hash16():
    cfg = LSHConfig(num_hyperplanes=8, num_tables=4, vector_length=6, seed=11)
    ps = PlaneSet(cfg)
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(10, 6))
    got = ps.hash_tables(vecs)
    for t in range(cfg.num_tables):
        ht = Hyperplanes(ps.tensor[t])
        for i in range(10):
            assert got[i, t] == ht.hash16(vecs[i]), (i, t)


def test_signature64_band_slices_match_hash_tables():
    # banded form: band b of sig64 == per-table hash of the banded PlaneSet
    cfg = LSHConfig(
        num_hyperplanes=8, num_tables=8, vector_length=16, seed=3,
        independent_tables=False,
    )
    ps = PlaneSet(cfg)
    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(32, 16))
    sig = ps.signature64(vecs)
    bands = band_hash_from_sig64(sig, cfg.num_tables, cfg.num_hyperplanes)
    per_table = ps.hash_tables(vecs)  # uint16-packed: hash16 = band << 8 for H=8
    np.testing.assert_array_equal(bands, per_table >> 8)
