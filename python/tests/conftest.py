import os
import sys

import pytest

REPO = os.environ.get("GRAFT_REPO", "/root/repo")
GRAFT_PY = os.path.join(REPO, "python")
sys.path.insert(0, GRAFT_PY)
# Executor Python workers are forked with PYTHONPATH from the env, not the
# driver's sys.path: without this, cloudpickled functions that reference the
# graft package die with ModuleNotFoundError on the workers.
os.environ["PYTHONPATH"] = GRAFT_PY + (
    (":" + os.environ["PYTHONPATH"]) if os.environ.get("PYTHONPATH") else ""
)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    classpath = ":".join(
        [
            os.path.join(REPO, "target", "scala-2.13", "classes"),
            "/opt/spark/jars/jts-core-1.20.0.jar",
        ]
    )
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graft-pytest")
        .config("spark.driver.extraClassPath", classpath)
        .config("spark.executorEnv.PYTHONPATH", GRAFT_PY)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    import graft

    graft.init(spark)
    yield spark
    spark.stop()
