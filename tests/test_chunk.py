"""Chunker edge cases pinned to load-texts.c behavior (SURVEY §5.2)."""

from __future__ import annotations

import pytest

from cli_rag_spark.operators.chunk import cut_clean, cut_reference


class TestCutReference:
    def test_short_text_passthrough(self):
        # text_length < requested_length → whole text, one chunk
        # (load-texts.c:48-57)
        assert cut_reference("hi there", 100) == ["hi there"]

    def test_exact_length_drops_last_char(self):
        # L == R: loop skipped, tail = text[0:L-1] (load-texts.c:87-99)
        assert cut_reference("abcd efgh", 9) == ["abcd efg"]

    def test_backtrack_to_space(self):
        # cut at 6 backtracks to the space at index 3; each later chunk
        # starts with the space it backtracked to (load-texts.c:61-63, 83)
        text = "abc def ghi"
        assert cut_reference(text, 6) == ["abc", " def", " gh"]

    def test_no_space_window_fallback(self):
        # no space in [prev+1, prev+R] → full fixed window
        # (load-texts.c:65-68)
        text = "abcdefghij klm"
        out = cut_reference(text, 5)
        assert out[0] == "abcde"
        # reassembly: all chunks concatenated = text minus final char
        assert "".join(out) == text[:-1]

    def test_final_char_always_dropped(self):
        # tail ends at text_length-1 (load-texts.c:89)
        text = "aa bb cc dd ee"
        out = cut_reference(text, 6)
        assert "".join(out) == text[:-1]

    def test_reassembly_property(self):
        # concatenation of chunks == text[:-1] whenever L >= R
        texts = [
            "the quick brown fox jumps over the lazy dog " * 5,
            "nospacesatallinthisstring" * 4,
            "a " * 50,
            "word " * 13,
        ]
        for t in texts:
            for r in (8, 16, 64):
                if len(t) >= r:
                    assert "".join(cut_reference(t, r)) == t[:-1], (t[:20], r)

    def test_empty_tail_chunk_possible(self):
        # if a space lands exactly at L-1 territory the tail can be tiny
        out = cut_reference("abcde x", 6)
        assert "".join(out) == "abcde "


class TestCutClean:
    def test_no_char_dropped(self):
        t = "the quick brown fox jumps over the lazy dog"
        chunks = cut_clean(t, 10)
        # clean mode must cover every word
        assert " ".join(chunks).split() == t.split()

    def test_short_text(self):
        assert cut_clean("short", 100) == ["short"]

    def test_empty(self):
        assert cut_clean("", 10) == []

    def test_bad_args(self):
        with pytest.raises(ValueError):
            cut_clean("x", 0)
        with pytest.raises(ValueError):
            cut_clean("x", 4, overlap=4)

    def test_overlap(self):
        t = "aaaa bbbb cccc dddd eeee"
        chunks = cut_clean(t, 10, overlap=5)
        assert len(chunks) >= 3
        for c in chunks:
            assert len(c) <= 10


class TestChunkModeRouting:
    def test_fixed_mode_routes_to_jvm_path(self, spark):
        # the CLI advertises --chunk-mode fixed; chunk() must accept it
        from cli_rag_spark.operators.chunk import chunk, chunk_fixed

        df = spark.createDataFrame(
            [(0, "abcdefghij"), (1, "klm")], ["doc_id", "text"]
        )
        got = sorted(chunk(df, 4, mode="fixed").collect())
        want = sorted(chunk_fixed(df, 4).collect())
        assert got == want

    def test_fixed_mode_rejects_overlap(self, spark):
        from cli_rag_spark.operators.chunk import chunk

        df = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="overlap"):
            chunk(df, 4, mode="fixed", overlap=2)


def _cut_reference_loop(text: str, r: int) -> list[str]:
    """The original per-character backtrack form of cut_reference —
    kept as the differential reference for the str.rfind rewrite."""
    n = len(text)
    if n < r:
        return [text]
    chunks, prev, pos = [], 0, r
    while pos < n - 1:
        while pos > prev and text[pos] != " ":
            pos -= 1
        if pos == prev:
            pos += r
        chunks.append(text[prev:pos])
        prev = pos
        pos += r
    if prev < n and pos >= n - 1:
        pos = n - 1
        chunks.append(text[prev:pos])
    return chunks


def test_rfind_rewrite_matches_loop_reference():
    """20k randomized cases: the rfind form must be bit-identical to
    the original backtrack loop across adversarial space layouts."""
    import random

    rng = random.Random(7)
    for _ in range(20000):
        n = rng.randint(0, 60)
        text = "".join(rng.choice("ab ") for _ in range(n))
        r = rng.randint(1, 20)
        assert cut_reference(text, r) == _cut_reference_loop(text, r), (text, r)


# --- chunk_sliding ----------------------------------------------------


def test_chunk_sliding_windows_and_tail_rule(spark):
    from cli_rag_spark.operators.chunk import chunk_sliding

    df = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 8), (3, ""), (4, "c" * 20)],
        "doc_id long, text string",
    )
    rows = chunk_sliding(df, size=8, stride=4).orderBy("doc_id", "chunk_index").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1 (n=10 > size): windows at 0 and 4; window 1 reaches the end
    # (4+8 >= 10) so no redundant third window at 8
    assert [(r["start_char"], r["chunk_text"]) for r in by_doc[1]] == [
        (0, "a" * 8), (4, "a" * 6)
    ]
    # doc 2 (n == size): exactly one full window
    assert [(r["start_char"], r["n_chars"]) for r in by_doc[2]] == [(0, 8)]
    # empty text: no rows
    assert 3 not in by_doc
    # doc 4 (n=20): starts 0,4,8,12 (12+8 >= 20 stops); full coverage
    assert [r["start_char"] for r in by_doc[4]] == [0, 4, 8, 12]
    covered = set()
    for r in by_doc[4]:
        covered.update(range(r["start_char"], r["start_char"] + r["n_chars"]))
    assert covered == set(range(20))


def test_chunk_sliding_overlap_content(spark):
    from cli_rag_spark.operators.chunk import chunk_sliding

    text = "abcdefghijklmnop"  # n=16
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_sliding(df, size=8, stride=4).orderBy("chunk_index").collect()
    assert [r["chunk_text"] for r in rows] == ["abcdefgh", "efghijkl", "ijklmnop"]
    # consecutive windows share size - stride = 4 chars
    for a, b in zip(rows, rows[1:]):
        assert a["chunk_text"][4:] == b["chunk_text"][:4]


def test_chunk_sliding_validates_params(spark):
    import pytest

    from cli_rag_spark.operators.chunk import chunk_sliding

    df = spark.createDataFrame([(1, "xx")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_sliding(df, size=8, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_sliding(df, size=8, stride=9)
    with pytest.raises(ValueError, match="size"):
        chunk_sliding(df, size=0, stride=1)
