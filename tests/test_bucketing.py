"""Bucketed-table co-located join (SURVEY §4.2 / PLANS.md): writing both
join sides bucketed+sorted on the key lets a later join run with ZERO
exchanges — the physical strategy that makes repeated big-dim joins cheap
at 100 TB (pay the shuffle once at write time, reuse it every join)."""

import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # uses the session's default warehouse (spark-warehouse/, gitignored);
    # warehouse.dir is a static conf and cannot move on a live session
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, ct = bucketed_tables
    # disable auto-broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ot).join(
            spark.table(ct),
            spark.table(ot).o_custkey == spark.table(ct).c_custkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        po = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        pc = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        expected = po.join(pc, po.o_custkey == pc.c_custkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
