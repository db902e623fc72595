"""Text-analysis expressions (E9 + the LLM-pipeline text operators).

Everything here is built-in-function composition — no Python UDFs —
so the hot path stays inside whole-stage codegen and each expression
has a direct DuckDB-SQL equivalent for the oracle gate.

Token model: whitespace tokenization via ``split(trim(x), '\\s+')``;
a BPE-ish regex tokenizer (words / numbers / punctuation runs) is
provided for token *counting* parity with common tokenizers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for the n-gram/stopword
# language-ID heuristic. Deliberately small and public-knowledge.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "en", "du"],
}

BPE_ISH_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens; empty string → empty array (split of '' gives
    [''], filtered out so counts are honest)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of word/number/punct tokens — a deterministic stand-in for
    a BPE tokenizer's pre-tokenization pass (regexp-extract-all)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_TOKEN_RE), 0))


def word_shingles(text: Column, n: int) -> Column:
    """Array of n-word shingles (space-joined), for MinHash / Jaccard.
    Documents with fewer than n words → empty array.

    Built as a chain of ``zip_with`` concats (token[i] ⊕ token[i+1] ⊕ …)
    rather than per-shingle ``array_join(slice(...))`` — the zip_with
    lambda is a single concat, ~2× cheaper in the interpreted HOF
    evaluator, and the whole construction stays narrow (no shuffle,
    unlike a posexplode+lead formulation that would move every token
    through a window shuffle at scale). The trailing n−1 NULL-padded
    entries are cut with one slice."""
    toks = tokens(text)
    sh = toks
    for i in range(1, n):
        sh = F.zip_with(
            sh,
            F.slice(toks, i + 1, F.greatest(F.size(toks) - i, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.slice(sh, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    cleaned = F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")
    return F.length(cleaned) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punct +
    mean word length band. A deterministic, SQL-expressible analog of
    the Gopher/C4-style quality rules."""
    n = F.length(text)
    toks = tokens(text)
    n_words = F.greatest(F.size(toks), F.lit(1))
    mean_wl = (
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_words
    )
    len_ok = (n >= 50) & (n <= 100000)
    wl_ok = (mean_wl >= 2.0) & (mean_wl <= 12.0)
    return (
        len_ok.cast("double") * 0.4
        + wl_ok.cast("double") * 0.3
        + (F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))) * 0.3
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID heuristic)."""
    toks = tokens(F.lower(text))
    out = {}
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def lang_id(text: Column) -> Column:
    """argmax over lang_scores with deterministic tie-break (lexical
    language order); no hits at all → 'und' (undetermined)."""
    scores = lang_scores(text)
    pairs = sorted(scores.items())  # deterministic tie-break: en<es<fr<de alphabetical
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fold left: strictly-greater wins, so earlier (alphabetical) languages win ties
    for lang, score in pairs:
        take = score > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lowercased text — the canonical exact-dup key (E8)."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)
