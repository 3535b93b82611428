"""Iceberg sink integration drive (runs ONLY where a runtime jar exists).

The sandbox ships no Iceberg Spark-runtime jar, so the `iceberg:` branch
of ocr_spark.sinks.writers is EXPERIMENTAL there (tests/test_iceberg.py
skips).  The moment an environment provides the jar — $SPARK_HOME/jars,
pyspark's bundled jars dir, the local ivy cache, or an explicit
$SPARK_GRAFT_ICEBERG_JAR — this drive exercises the real branch
end-to-end against a Hadoop-catalog warehouse in a temp dir:

  1. create a bucket-partitioned Iceberg table
  2. write_extracted twice for the same buckets (overwritePartitions
     idempotence: second write must REPLACE, not duplicate)
  3. write_extracted for a disjoint bucket (must not touch the others)
  4. write_lineage append x2 (must accumulate)
  5. read_output round-trips the rows

Prints ICEBERG-OK on success.  Run standalone or via
tests/test_iceberg.py (subprocess — the pytest session already holds a
non-Iceberg SparkContext, and jars/catalogs are fixed at JVM launch).
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_iceberg_jar() -> str | None:
    """First Iceberg Spark-runtime jar discoverable in this environment."""
    explicit = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if explicit and os.path.exists(explicit):
        return explicit
    roots = []
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:
        pass
    roots.append(os.path.expanduser("~/.ivy2/jars"))
    roots.append(os.path.expanduser("~/.ivy2.5.2/jars"))
    for root in roots:
        hits = sorted(glob.glob(os.path.join(root, "*iceberg-spark-runtime*.jar")))
        if hits:
            return hits[0]
    return None


def main() -> None:
    jar = find_iceberg_jar()
    if jar is None:
        print("ICEBERG-SKIP: no iceberg-spark-runtime jar found")
        sys.exit(3)

    from pyspark.sql import SparkSession

    from ocr_spark.sinks.writers import (
        read_output,
        write_extracted,
        write_lineage,
    )

    warehouse = tempfile.mkdtemp(prefix="iceberg_wh_")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-check")
        .config("spark.jars", jar)
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions"
                ".IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.ice",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.ice.type", "hadoop")
        .config("spark.sql.catalog.ice.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sql(
        "CREATE TABLE ice.db.extracted "
        "(conv_id STRING, turn_idx INT, extracted_text STRING, bucket INT) "
        "USING iceberg PARTITIONED BY (bucket)"
    )
    dest = "iceberg:ice.db.extracted"

    def rows(bucket: int, tag: str):
        return spark.createDataFrame(
            [(f"c{i}", i, f"{tag}-{i}", bucket) for i in range(5)],
            "conv_id string, turn_idx int, extracted_text string, bucket int",
        )

    # idempotent per-bucket overwrite: rewrite of bucket 0 replaces it
    write_extracted(rows(0, "v1"), dest)
    write_extracted(rows(0, "v2"), dest)
    got = read_output(spark, dest).collect()
    assert len(got) == 5, got
    assert all(r.extracted_text.startswith("v2") for r in got), got
    # disjoint bucket joins, earlier bucket untouched
    write_extracted(rows(1, "v3"), dest)
    got = {(r.bucket, r.extracted_text[:2]) for r in
           read_output(spark, dest).collect()}
    assert got == {(0, "v2"), (1, "v3")}, got

    spark.sql(
        "CREATE TABLE ice.db.lineage (run_id STRING, bucket INT, n LONG) "
        "USING iceberg"
    )
    ldf = spark.createDataFrame([("r1", 0, 5)], "run_id string, bucket int, n long")
    write_lineage(ldf, "iceberg:ice.db.lineage")
    write_lineage(ldf, "iceberg:ice.db.lineage")
    assert read_output(spark, "iceberg:ice.db.lineage").count() == 2

    spark.stop()
    print("ICEBERG-OK")


if __name__ == "__main__":
    main()
