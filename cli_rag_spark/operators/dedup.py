"""E8 — deduplication family for LLM training-data pipelines.

The reference has no dedup (SURVEY §2.b); this is the north-star
extension designed for 100 TB. Five strategies, all declarative:

* exact        — md5 fingerprint groupBy; one shuffle on a 32-char
                 key, map-side partial agg; the 100 TB workhorse.
* minhash LSH  — shingle → k string-minhashes → bands → equi-join on
                 (band, key). Candidate generation never compares
                 all pairs: the shuffle key is the band hash, so cost
                 scales with bucket collisions, not N².
* simhash      — 16-bit sign fingerprint over tokens; identical keys
                 are near-dup candidates. One groupBy on a tiny key.
* n-gram Jaccard — exact verification metric (and a standalone
                 brute-force path for small candidate sets).
* embedding    — cosine-near pairs over the vector column via the E7
                 kNN machinery.

All hashing is md5-based (functions/hashing.py) so every strategy is
DuckDB-oracle-checkable. Spark's native murmur3 would be faster per
byte but unverifiable; at scale the md5 cost is dwarfed by the
shuffle, and the choice is documented here as deliberate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cli_rag_spark.functions.hashing import band_keys, minhash_signature, simhash_str
from cli_rag_spark.functions.text import fingerprint, tokens, word_shingles


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per normalized-text fingerprint.

    Plan shape: project → groupBy(fp) with min(id) → semi-join back.
    At 100 TB: two narrow shuffles on the 32-char fp / id keys; no
    row ever carries the full text through a shuffle.
    """
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("_fp"))
    keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return df.join(keep.select(id_col), on=id_col, how="semi")


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band.

    Shuffle profile: one explode (n_bands rows/doc), one equi-join on
    (band, key) — never a crossJoin. Band keys are md5 strings so
    bucket skew is bounded by true duplicate clusters only.
    """
    rows_per_band = n_hashes // n_bands
    sig = minhash_signature(word_shingles(F.col(text_col), shingle_words), n_hashes)
    banded = (
        df.select(F.col(id_col), sig.alias("_sig"))
        # docs with fewer words than the shingle width have no
        # signature (array_min of empty → NULL): exclude
        .where(F.col("_sig").getItem(0).isNotNull())
        .select(id_col, F.explode(band_keys(F.col("_sig"), n_bands, rows_per_band)).alias("_b"))
        .select(id_col, F.col("_b.band").alias("band"), F.col("_b.key").alias("key"))
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard for given candidate pairs — or all
    pairs when ``pairs`` is None (brute force; only for bounded sets).

    Set algebra via exploded distinct shingles + equi-join on the
    shingle: intersection counts come from one shuffle on the shingle
    string; union = |A| + |B| − |A∩B| without a second pass.
    """
    sh = (
        df.select(
            F.col(id_col),
            F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle_words))).alias("shingle"),
        )
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if pairs is not None:
        inter = inter.join(pairs, on=["id_a", "id_b"], how="semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6).alias("jaccard"),
        )
    )


def simhash_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 16,
) -> DataFrame:
    """Docs sharing an identical simhash key (near-dup clusters)."""
    keyed = df.select(
        F.col(id_col), simhash_str(tokens(F.col(text_col)), n_bits).alias("simhash")
    )
    return (
        keyed.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("min_doc_id"))
    )


def embedding_near_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine distance < threshold.

    Brute force O(N²) here; the scale path routes candidates through
    minhash/LSH banding (operators/knn.knn_join_lsh) first. Kept exact
    for the oracle gate.
    """
    from cli_rag_spark.functions.vectors import cosine_distance

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.round(cosine_distance(F.col("_va"), F.col("_vb")), round_digits))
        .where(F.col("dist") < threshold)
        .select("id_a", "id_b", "dist")
    )
