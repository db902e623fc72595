"""Bucketed co-located join: the sort-merge join over two tables
bucketed on the join key must plan WITHOUT a shuffle Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.sources.bucketing import (
    bucketed_join,
    plan_has_shuffle,
    write_bucketed,
)
from cli_rag_spark.sources.documents import load_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8, path=str(tmp_path / "ob"))
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 8, path=str(tmp_path / "lb"))
    try:
        joined = bucketed_join(
            spark, "t_lineitem_b", "t_orders_b",
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert not plan_has_shuffle(joined), "bucketed join must not shuffle"
        # same join un-bucketed DOES shuffle (sanity for the assertion)
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert plan_has_shuffle(plain)
        # and the result is right
        n = joined.count()
        assert n == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
