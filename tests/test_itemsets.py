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


class TestAssociationRules:
    def test_directionality_and_measures(self, spark):
        from cli_rag_spark.operators.itemsets import association_rules

        # support(a)=4, support(b)=3, pair=3, n_baskets=4:
        #   a -> b: confidence 3/4 = 0.75, lift 3*4/(4*3) = 1.0
        #   b -> a: confidence 3/3 = 1.00, lift 1.0
        df = _baskets(
            spark,
            [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
             (3, "a"), (3, "b"), (4, "a")],
        )
        rows = {
            (r["antecedent"], r["consequent"]): r
            for r in association_rules(df, "basket", "item", 1, 2, 0, 1).collect()
        }
        assert rows[("a", "b")]["confidence"] == 0.75
        assert rows[("b", "a")]["confidence"] == 1.0
        assert rows[("a", "b")]["lift"] == 1.0
        assert rows[("a", "b")]["pair_support"] == 3

    def test_confidence_gate_is_directional(self, spark):
        from cli_rag_spark.operators.itemsets import association_rules

        df = _baskets(
            spark,
            [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
             (3, "a"), (3, "b"), (4, "a")],
        )
        # gate 4/5: keeps b -> a (1.0) and drops a -> b (0.75)
        rows = association_rules(df, "basket", "item", 1, 2, 4, 5).collect()
        assert [(r["antecedent"], r["consequent"]) for r in rows] == [("b", "a")]

    def test_lift_detects_anti_correlation(self, spark):
        from cli_rag_spark.operators.itemsets import association_rules

        # a and b co-occur in 2 baskets but each appears in 3 of 4:
        # lift = 2*4/(3*3) = 0.888889 < 1 (co-occurrence BELOW chance)
        df = _baskets(
            spark,
            [(1, "a"), (1, "b"), (2, "a"), (3, "a"), (4, "b"), (2, "b")],
        )
        rows = association_rules(df, "basket", "item", 1, 4, 0, 1).collect()
        by_dir = {(r["antecedent"], r["consequent"]): r["lift"] for r in rows}
        assert by_dir[("a", "b")] == round(2 * 4 / (3 * 3), 6)

    def test_conf_param_guard(self, spark):
        from cli_rag_spark.operators.itemsets import association_rules

        df = _baskets(spark, [(1, "a")])
        with pytest.raises(ValueError, match="confidence"):
            association_rules(df, "basket", "item", 1, 2, -1, 2)
        with pytest.raises(ValueError, match="confidence"):
            association_rules(df, "basket", "item", 1, 2, 1, 0)


def test_frequent_pairs_matches_bruteforce_on_random_baskets(spark):
    import itertools
    import random

    rng = random.Random(7)
    rows = []
    for b in range(60):
        for item in rng.sample("abcdefghij", rng.randint(1, 5)):
            rows.append((b, item))
            if rng.random() < 0.2:
                rows.append((b, item))  # duplicates must not inflate support
    # brute force: distinct per basket, all pairs, threshold 1/10
    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    n = len(baskets)
    support = {}
    for items in baskets.values():
        for a, c in itertools.combinations(sorted(items), 2):
            support[(a, c)] = support.get((a, c), 0) + 1
    want = sorted(
        (a, c, s) for (a, c), s in support.items() if s * 10 >= 1 * n
    )
    got = sorted(
        (r["item_a"], r["item_b"], r["support"])
        for r in frequent_pairs(
            _baskets(spark, rows), "basket", "item", 1, 10
        ).collect()
    )
    assert got == want
