"""Unit tests for the LLM-pipeline filter operators: Gopher-style
quality heuristics, PII scrubbing, and source-mixture sampling.
(The judged queries are value-checked in test_parity; these pin the
operator semantics on hand-built fixtures.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cli_rag_spark.functions.quality import (
    duplicate_word_fraction,
    gopher_keep,
    mean_word_length,
    n_words,
    stopword_count,
    top_word_fraction,
)
from cli_rag_spark.operators.pii import pii_scrub
from cli_rag_spark.operators.training import mixture_sample


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], ["text"]).select(expr.alias("v")).first()["v"]


class TestQuality:
    def test_repetition_metrics(self, spark):
        t = "spam spam spam spam ham"
        assert _one(spark, t, top_word_fraction(F.col("text"))) == pytest.approx(0.8)
        assert _one(spark, t, duplicate_word_fraction(F.col("text"))) == pytest.approx(0.6)

    def test_word_stats(self, spark):
        t = "ab cdef"
        assert _one(spark, t, n_words(F.col("text"))) == 2
        assert _one(spark, t, mean_word_length(F.col("text"))) == pytest.approx(3.0)

    def test_empty_text_is_zero_not_null(self, spark):
        for expr in (mean_word_length, top_word_fraction, duplicate_word_fraction):
            assert _one(spark, "", expr(F.col("text"))) == 0.0

    def test_stopwords_case_insensitive(self, spark):
        assert _one(spark, "The cat ON a mat", stopword_count(F.col("text"))) == 3

    def test_keep_flag(self, spark):
        good = "the quick brown fox jumps over a lazy dog near the old barn"
        spammy = "buy buy buy buy buy buy buy buy buy the"
        assert _one(spark, good, gopher_keep(F.col("text"))) is True
        # top_word_frac 0.9 breaches the 0.2 cap
        assert _one(spark, spammy, gopher_keep(F.col("text"))) is False


class TestPii:
    def test_scrub_all_types(self, spark):
        t = "mail a.b+c@test.org or call +1 555-123-4567 from 192.168.0.1 ok"
        out = _one(spark, t, pii_scrub(F.col("text")))
        assert out == "mail [EMAIL] or call [PHONE] from [IP] ok"

    def test_ip_not_half_eaten_by_phone(self, spark):
        # dotted quads must redact as [IP] even when digit runs
        # resemble phone groups
        t = "host 555.123.456.100 end"
        out = _one(spark, t, pii_scrub(F.col("text")))
        assert "[IP]" in out and "[PHONE]" not in out

    def test_scrub_idempotent(self, spark):
        t = "x@y.io and 10.0.0.1"
        once = _one(spark, t, pii_scrub(F.col("text")))
        twice = _one(spark, once, pii_scrub(F.col("text")))
        assert once == twice

    def test_clean_text_unchanged(self, spark):
        t = "no secrets here just words"
        assert _one(spark, t, pii_scrub(F.col("text"))) == t


class TestMixture:
    def test_rates_respected_and_deterministic(self, spark):
        df = spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], ["doc_id", "source"]
        )
        kept = mixture_sample(df, "source", {"a": 1.0}, default_rate=0.0)
        rows = kept.groupBy("source").count().collect()
        by_src = {r["source"]: r["count"] for r in rows}
        assert by_src == {"a": 1000}  # rate 1.0 keeps all, default 0.0 drops all
        again = mixture_sample(df, "source", {"a": 1.0}, default_rate=0.0)
        assert sorted(r["doc_id"] for r in again.collect()) == sorted(
            r["doc_id"] for r in kept.collect()
        )

    def test_half_rate_close_to_half(self, spark):
        df = spark.createDataFrame([(i, "a") for i in range(2000)], ["doc_id", "source"])
        n = mixture_sample(df, "source", {}, default_rate=0.5).count()
        assert 850 <= n <= 1150  # md5 buckets ~uniform

    def test_bad_rate_rejected(self, spark):
        df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
        with pytest.raises(ValueError, match="rate"):
            mixture_sample(df, "source", {"a": 1.5}, default_rate=0.1)
        with pytest.raises(ValueError, match="default_rate"):
            mixture_sample(df, "source", {}, default_rate=-0.1)


class TestNullSafety:
    def test_null_text_scores_as_empty_doc(self, spark):
        from cli_rag_spark.functions.quality import with_quality_metrics

        df = spark.createDataFrame([(0, None), (1, "the cat")], "doc_id long, text string")
        rows = {r["doc_id"]: r for r in with_quality_metrics(df).collect()}
        assert rows[0]["n_words"] == 0
        assert rows[0]["n_stop"] == 0
        assert rows[0]["mean_word_len"] == 0.0
        assert rows[0]["keep"] is False

    def test_null_text_passes_through_scrub(self, spark):
        df = spark.createDataFrame([(None,), ("x@y.io",)], "text string")
        out = [r[0] for r in df.select(pii_scrub(F.col("text"))).collect()]
        assert out == [None, "[EMAIL]"]

    def test_convenience_functions_null_safe_too(self, spark):
        # the per-column functions must agree with with_quality_metrics
        # on NULL text (empty-doc semantics, not NULL poisoning)
        from cli_rag_spark.functions.quality import gopher_keep

        df = spark.createDataFrame([(None,)], "text string")

        def one(expr):
            return df.select(expr.alias("v")).first()["v"]

        assert one(n_words(F.col("text"))) == 0
        assert one(stopword_count(F.col("text"))) == 0
        assert one(mean_word_length(F.col("text"))) == 0.0
        assert one(gopher_keep(F.col("text"))) is False
