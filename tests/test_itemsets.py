"""A-priori frequent-pairs tests (operators/itemsets.py)."""

from __future__ import annotations

import pytest

from cli_rag_spark.operators.itemsets import frequent_pairs


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


class TestFrequentPairs:
    def test_basic_support_counting(self, spark):
        # 4 baskets; (a,b) in 3, (a,c) in 1
        df = _baskets(
            spark,
            [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
             (3, "a"), (3, "b"), (4, "a"), (4, "c")],
        )
        # min support 1/2 of 4 baskets = 2
        rows = frequent_pairs(df, "basket", "item", 1, 2).collect()
        assert [(r["item_a"], r["item_b"], r["support"]) for r in rows] == [("a", "b", 3)]

    def test_duplicate_rows_count_distinct_baskets(self, spark):
        # item repeated within a basket must count once
        df = _baskets(spark, [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")])
        rows = frequent_pairs(df, "basket", "item", 1, 1).collect()
        assert [(r["item_a"], r["item_b"], r["support"]) for r in rows] == [("a", "b", 2)]

    def test_threshold_boundary_is_inclusive(self, spark):
        # support 1 of 2 baskets at threshold 1/2: 1*2 >= 1*2 passes
        df = _baskets(spark, [(1, "a"), (1, "b"), (2, "c")])
        rows = frequent_pairs(df, "basket", "item", 1, 2).collect()
        assert [(r["item_a"], r["item_b"]) for r in rows] == [("a", "b")]

    def test_infrequent_item_pruned_before_pairing(self, spark):
        # 'z' appears in 1 of 10 baskets — below 1/4 support — so the
        # (a, z) pair never forms even though they share basket 1
        rows = [(i, "a") for i in range(1, 11)] + [(1, "z")]
        df = _baskets(spark, rows)
        out = frequent_pairs(df, "basket", "item", 1, 4).collect()
        assert out == []

        # the prune is also visible in the plan: a left-semi join
        plan = (
            frequent_pairs(df, "basket", "item", 1, 4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan

    def test_param_guards(self, spark):
        df = _baskets(spark, [(1, "a")])
        with pytest.raises(ValueError, match="support"):
            frequent_pairs(df, "basket", "item", 0, 2)
        with pytest.raises(ValueError, match="support"):
            frequent_pairs(df, "basket", "item", 1, 0)
