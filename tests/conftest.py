from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from etl_workflow_spark.session import get_spark

    import tempfile

    # fresh warehouse per pytest session: managed-table locations outlive
    # the in-memory catalog, so a fixed dir collides on the next run
    warehouse = tempfile.mkdtemp(prefix="spark-graft-warehouse-")
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": warehouse,
            # the suite issues thousands of SQL executions in ONE JVM;
            # the status store retains 1000 of them (plan graphs +
            # metrics) by default, and that accumulation measurably
            # drags long sessions (same finding as bench.py's r14
            # note). Nothing reads the UI state in tests.
            "spark.sql.ui.retainedExecutions": "8",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "200",
            "spark.ui.retainedTasks": "2000",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
