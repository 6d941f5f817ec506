import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from go_lsh_spark.session import build_session

    s = build_session(
        app_name="go-lsh-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.session.timeZone": "UTC",
            # the full suite runs thousands of stages in one session; the
            # AppStatusStore's default retention (1000) trims old stages
            # mid-suite, which makes cumulative _shuffle_totals deltas go
            # BACKWARDS and flips the shuffle-width assertions into flakes
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "20000",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA
