"""Frequent itemset mining — A-priori 2-itemsets at corpus scale.

Market-basket co-occurrence (Agrawal & Srikant 1994): which item
pairs appear together in at least a minimum fraction of baskets. The
distributed shape is the SON / A-priori recipe: a frequent-ITEM pass
first (monotonicity — a pair can only be frequent if both members
are), then pair generation restricted to frequent items only. The
prefilter is the scale lever: a pathological basket of m items emits
m² pairs, but only its FREQUENT items (a small, data-bounded set when
min-support is meaningful) survive to the quadratic step.

Support thresholds are RELATIVE and rational (``support_num /
support_den`` of the basket count) so one query definition is
scale-free across SF, and the filter is the exact integer
cross-multiply ``support * den >= num * n_baskets`` — no ceil, no
float, replayed verbatim in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs_from_parts(
    bi: DataFrame,
    nb: DataFrame,
    item_counts: DataFrame,
    basket_col: str,
    item_col: str,
    support_num: int,
    support_den: int,
) -> DataFrame:
    """:func:`frequent_pairs`'s pair derivation over ALREADY-BUILT
    ``bi`` / ``nb`` / ``item_counts`` frames (r15, guide §1.2): the
    caller materializes the basket-item table once and every
    aggregation reads the materialized rows instead of replaying the
    upstream derivation (for the judged brand queries: the
    lineitem⋈part join) per consumer. Arithmetic verbatim from the
    pre-r15 body."""
    freq_items = (
        item_counts.crossJoin(F.broadcast(nb))
        .where(F.col("_s") * support_den >= F.lit(support_num) * F.col("_nb"))
        .select(item_col)
    )
    pruned = bi.join(F.broadcast(freq_items), item_col, "left_semi")
    sets = pruned.groupBy(basket_col).agg(
        F.sort_array(F.collect_set(item_col)).alias("_items")
    )
    pairs = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(_items, (x, i) -> "
                    "transform(slice(_items, i + 2, size(_items)), "
                    "y -> struct(x AS item_a, y AS item_b))))"
                )
            ).alias("_p")
        )
        .select("_p.item_a", "_p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    return (
        pairs.crossJoin(F.broadcast(nb))
        .where(F.col("support") * support_den >= F.lit(support_num) * F.col("_nb"))
        .select("item_a", "item_b", "support")
    )


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    support_num: int,
    support_den: int,
) -> DataFrame:
    """Item pairs co-occurring in ``>= support_num/support_den`` of
    baskets. Returns [item_a, item_b, support] with item_a < item_b
    and ``support`` the exact distinct-basket co-occurrence count.

    Plan: the basket-item projection is materialized ONCE
    (localCheckpoint, lazily inside the run — r15, guide §1.2: it
    feeds the basket count, the item supports AND the pruned pair
    pass, and the optimizer reuses none of the three subtrees, so
    before r15 the upstream derivation ran 3×); basket count as a
    1-row broadcast (no driver collect — the threshold comparison
    stays in-plan); frequent items via one distinct-aggregate groupBy,
    broadcast-semi-joined back (the A-priori prune); then ONE shuffle
    on the basket key builds each basket's sorted frequent-item set
    (``collect_set`` dedups, so no separate distinct pass) and the
    pairs expand IN-ROW with a higher-order transform — the m² pair
    stream never shuffles raw: the pair-support groupBy sees it
    through map-side combine on the small (item, item) key space. Two
    wide shuffles total, versus three plus a self-join for the naive
    spelling.

    Skew bound: per-basket pair fan-out is |frequent items in
    basket|², and the number of frequent items is data-independently
    capped at ``(support_den / support_num) * avg basket size`` (their
    supports must sum to at most the total item-occurrence count) —
    min-support IS the skew guard, the A-priori observation.
    """
    if support_num < 1 or support_den < 1:
        raise ValueError("support_num/support_den must be positive integers")
    bi = df.select(basket_col, item_col).localCheckpoint(eager=False)
    nb = bi.agg(F.count_distinct(basket_col).alias("_nb"))
    item_counts = bi.groupBy(item_col).agg(
        F.count_distinct(basket_col).alias("_s")
    )
    return _pairs_from_parts(
        bi, nb, item_counts, basket_col, item_col, support_num, support_den
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    support_num: int,
    support_den: int,
    confidence_num: int,
    confidence_den: int,
    round_digits: int = 6,
) -> DataFrame:
    """Directional rules ``antecedent -> consequent`` over the
    frequent pairs: confidence = support(pair) / support(antecedent),
    kept when ``>= confidence_num/confidence_den`` — the classic
    second half of A-priori (Agrawal & Srikant 1994 §1.1).

    Both thresholds stay exact integer cross-multiplies
    (``s_pair * conf_den >= conf_num * s_ant``); the emitted
    ``confidence`` and ``lift`` columns are the only floats, computed
    once from exact integer counts and rounded. lift =
    confidence / (support(consequent)/n_baskets) > 1 means the
    antecedent genuinely raises the consequent's odds — the measure
    that separates co-occurrence from popularity.

    Returns [antecedent, consequent, pair_support, confidence, lift].
    Plan: the basket-item projection is materialized ONCE and shared
    with the pair derivation (r15, guide §1.2 — before r15 this
    function re-derived ``bi``/``nb``/``item_counts`` from ``df`` on
    top of :func:`frequent_pairs`'s own three derivations, 5
    upstream replays in one plan); each frequent pair emits both
    directions via a union of two projections (map-side); item
    supports broadcast-join in (the frequent-item table is small by
    construction).
    """
    if confidence_num < 0 or confidence_den < 1:
        raise ValueError("confidence_num/confidence_den must be non-negative / positive")
    if support_num < 1 or support_den < 1:
        raise ValueError("support_num/support_den must be positive integers")
    bi = df.select(basket_col, item_col).localCheckpoint(eager=False)
    nb = bi.agg(F.count_distinct(basket_col).alias("_nb"))
    item_counts = bi.groupBy(item_col).agg(
        F.count_distinct(basket_col).cast("long").alias("_s")
    )
    pairs = _pairs_from_parts(
        bi, nb, item_counts, basket_col, item_col, support_num, support_den
    )
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        F.col("support").alias("pair_support"),
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            F.col("support").alias("pair_support"),
        )
    )
    ant = item_counts.select(
        F.col(item_col).alias("antecedent"), F.col("_s").alias("_s_ant")
    )
    con = item_counts.select(
        F.col(item_col).alias("consequent"), F.col("_s").alias("_s_con")
    )
    return (
        directed.join(F.broadcast(ant), "antecedent")
        .join(F.broadcast(con), "consequent")
        .crossJoin(F.broadcast(nb))
        .where(
            F.col("pair_support") * confidence_den
            >= F.lit(confidence_num) * F.col("_s_ant")
        )
        .select(
            "antecedent",
            "consequent",
            "pair_support",
            F.round(F.col("pair_support") / F.col("_s_ant"), round_digits).alias(
                "confidence"
            ),
            F.round(
                (F.col("pair_support") * F.col("_nb"))
                / (F.col("_s_ant") * F.col("_s_con")),
                round_digits,
            ).alias("lift"),
        )
    )
