"""Config/options validation + analytic Stats goldens.

Validation cases mirror /root/reference/configs/lshconfig_tests.go and
options/searchoptions_test.go; Stats goldens are the plane-independent curve
from lsh/lsh_test.go:474-486.
"""

import pytest

from go_lsh_spark.config import ALL_LAGS, LSHConfig, SearchOptions
from go_lsh_spark.oracle import compute_stats


@pytest.mark.parametrize(
    "kwargs",
    [
        {"num_hyperplanes": 0},
        {"num_hyperplanes": 17},
        {"num_tables": 0},
        {"vector_length": 0},
        {"sample_period": 0},
        {"row_size": 0},
    ],
)
def test_invalid_configs_rejected(kwargs):
    with pytest.raises(ValueError):
        LSHConfig(**kwargs)


def test_default_config_matches_reference():
    # configs/lshconfigs.go:42-51
    cfg = LSHConfig()
    assert (cfg.num_hyperplanes, cfg.num_tables, cfg.vector_length) == (8, 128, 3)
    assert (cfg.sample_period, cfg.row_size) == (60, 7200)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"num_to_return": 0},
        {"threshold": -0.1},
        {"threshold": 1.1},
        {"sign_filter": 2},
    ],
)
def test_invalid_search_options_rejected(kwargs):
    with pytest.raises(ValueError):
        SearchOptions(**kwargs).validate()


def test_max_lag_clamped_not_rejected():
    # options/searchoptions.go:47-49: MaxLag < -1 silently clamps to AllLags
    o = SearchOptions(max_lag=-5).validate()
    assert o.max_lag == ALL_LAGS


def test_default_search_options():
    o = SearchOptions()
    assert (o.num_to_return, o.threshold, o.sign_filter, o.max_lag) == (10, 0.85, 0, 900)


def test_stats_golden_curve():
    # lsh/lsh_test.go:474-486 (H=8, T=128), +/-0.001
    expected = {
        0.60: 0.903, 0.65: 0.804, 0.70: 0.636, 0.75: 0.395,
        0.80: 0.149, 0.85: 0.018, 0.90: 0.000, 0.95: 0.000,
    }
    got = compute_stats(LSHConfig(), num_docs=0)
    assert len(got["false_negative_errors"]) == 8
    for e in got["false_negative_errors"]:
        assert abs(e["probability"] - expected[e["threshold"]]) < 1e-3, e
