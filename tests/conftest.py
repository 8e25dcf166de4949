from __future__ import annotations

import os

import pytest

# Must run at collection time, BEFORE any session fixture starts the
# JVM: workers inherit PYTHONPATH from the driver environment, and the
# transformWithStateInPandas e2e tests need google.protobuf on both
# sides (installed, or the deploy-module shim over a vendored runtime).
from talknet_segmentation_batchprocessing_spark.deploy import (  # noqa: E402
    ensure_protobuf_runtime,
)

ensure_protobuf_runtime()

TESTDATA = "/root/testdata"
# SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 runs the parity suite at
# the driver's correctness-gate scale instead of the fast smoke scale.
SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", f"{TESTDATA}/sf0.001")
SF_CORRECT = f"{TESTDATA}/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from talknet_segmentation_batchprocessing_spark.session import get_spark

    s = get_spark(app_name="tests", driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()
