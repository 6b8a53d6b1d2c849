"""Text-analysis column builders for training-data pipelines.

All pure Catalyst column expressions (whole-stage codegen, no Python):
token counting, quality scoring, n-gram heuristic language ID, and
order-sensitive document fingerprinting.  The md5-based word hash is
engine-portable (same values in DuckDB — see queries.py) so results
are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

M31 = 1_000_000_007

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the BPE-ish regex variant below)."""
    return F.size(words(text))


def token_count_bpe_ish(text: Column | str) -> Column:
    """Sub-word-ish token estimate: split on word boundaries AND digits,
    counting punctuation runs — a cheap stand-in for a BPE tokenizer."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.filter(
            F.split(F.regexp_replace(c, r"(\d)|([^\w\s])", " $1$2 "), r"\s+"),
            lambda w: w != F.lit(""),
        )
    )


def word_hash(word: Column) -> Column:
    """Portable 60-bit md5-prefix hash reduced mod 1e9+7."""
    return (
        F.conv(F.substring(F.md5(word), 1, 15), 16, 10).cast("long") % F.lit(M31)
    )


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    ws = words(text)
    return F.size(F.filter(ws, lambda w: w.isin(*stopwords))).cast("double") / F.size(
        ws
    ).cast("double")


def quality_score(text: Column | str) -> Column:
    """Length / mean-word-length / stopword-ratio blend in [0, 1]."""
    c = F.col(text) if isinstance(text, str) else text
    n_words = token_count(c).cast("double")
    awl = F.length(c).cast("double") / n_words
    return F.round(
        F.least(F.lit(1.0), n_words / F.lit(100.0)) * 0.5
        + (F.lit(1.0) / (F.lit(1.0) + F.abs(awl - F.lit(5.0)))) * 0.3
        + stopword_ratio(c) * 0.2,
        4,
    )


def lang_guess(text: Column | str) -> Column:
    """Stopword-ratio n-gram heuristic (coarse 3-way)."""
    r = stopword_ratio(text)
    return (
        F.when(r > 0.08, F.lit("en"))
        .when(r > 0.03, F.lit("latin"))
        .otherwise(F.lit("other"))
    )


def doc_fingerprint(text: Column | str) -> Column:
    """Order-sensitive rolling polynomial hash of the word sequence."""
    ws = words(text)
    hashed = F.transform(ws, word_hash)
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(M31),
    )
