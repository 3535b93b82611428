"""Opportunistic Iceberg sink integration (skips without a runtime jar).

The `iceberg:` branch of ocr_spark.sinks.writers targets the public
Iceberg Spark-runtime API but the sandbox provides no jar, so it is
labeled EXPERIMENTAL there.  This test makes the label self-retiring:
wherever the environment DOES provide an iceberg-spark-runtime jar
(SPARK_HOME/jars, pyspark's jars, the ivy cache, or
$SPARK_GRAFT_ICEBERG_JAR), the full create/overwrite-idempotence/
append/read drive in tools/iceberg_check.py runs in a subprocess (jars
and catalogs are fixed at JVM launch, and the pytest session already
holds a jarless SparkContext)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.iceberg_check import find_iceberg_jar  # noqa: E402


def test_iceberg_sink_roundtrip_subprocess():
    if find_iceberg_jar() is None:
        pytest.skip("no iceberg-spark-runtime jar in this environment")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "iceberg_check.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "ICEBERG-OK" in res.stdout, res.stdout[-2000:]
