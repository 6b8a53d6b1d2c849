"""Intra-document repetition signals — the Gopher-style quality rules
(Rae et al. 2021, "Scaling Language Models", table A1) that catch
boilerplate and degenerate generations which length/stopword scoring
(functions/text.quality_score) misses: a document whose text is one
phrase looped 200 times has fine length and stopword stats.

Per document, over word n-grams:

- ``top{n}_frac``  — occurrences of the single most frequent n-gram /
  total n-gram occurrences (Gopher: "fraction of characters in the
  most common n-gram"; word-occurrence form here — portable and
  length-robust);
- ``dup{n}_frac``  — fraction of n-gram occurrences that are repeats
  (1 − distinct/total — Gopher's "fraction of duplicate n-grams").

Scale shape: one projection computes ALL signals per document with
higher-order functions on the word array — aggregate over the sorted
n-gram list, no explode, no shuffle at all.  The operator is a pure
map-side column block: filters stack directly onto the scan, exactly
like stratified sampling.  (An explode → groupBy(doc, gram) form
would shuffle one row per n-gram occurrence — ~|corpus tokens| rows —
for a per-doc statistic; sorting each doc's own n-grams locally is
O(len·log len) per doc and never leaves the task.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.functions.text import words


def _ngrams(ws: Column, n: int) -> Column:
    """Word n-grams as strings (underscore-joined), empty for short docs."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
        lambda i: F.concat_ws("_", F.slice(ws, i, n)),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _run_stats(sorted_grams: Column) -> Column:
    """(max_run, n_distinct) over a SORTED gram array in one pass:
    equal grams are adjacent, so runs are countable with a single
    higher-order aggregate carrying (prev, run, max_run, distinct)."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("max_run"),
        F.lit(0).alias("n_distinct"),
    )

    def step(a, x):
        same = a["prev"].isNotNull() & (a["prev"] == x)
        run = F.when(same, a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(a["max_run"], run).alias("max_run"),
            (a["n_distinct"] + F.when(same, 0).otherwise(1)).alias("n_distinct"),
        )

    return F.aggregate(sorted_grams, acc0, step)


def array_repetition_signals(
    arr: Column, ns: tuple[int, ...] = (2, 3)
) -> list[Column]:
    """Repetition fractions over ANY element array — the token-array
    form runs the same boilerplate rules on already-tokenized sequences
    (the CDC target table carries ``tokens array<int>``, no text).
    Elements are stringified for gram keys; semantics and column names
    match ``repetition_signals``."""
    ws = F.transform(arr, lambda x: x.cast("string"))
    cols: list[Column] = []
    for n in ns:
        st = _run_stats(F.array_sort(_ngrams(ws, n)))
        total = (F.size(ws) - F.lit(n - 1)).cast("double")
        ok = total > 0
        cols.append(
            F.round(
                F.when(ok, st["max_run"].cast("double") / total).otherwise(0.0), 6
            ).alias(f"top{n}_frac")
        )
        cols.append(
            F.round(
                F.when(
                    ok, F.lit(1.0) - st["n_distinct"].cast("double") / total
                ).otherwise(0.0),
                6,
            ).alias(f"dup{n}_frac")
        )
    return cols


def repetition_signals(
    text: Column | str, ns: tuple[int, ...] = (2, 3)
) -> list[Column]:
    """Column block of repetition fractions for each n in ``ns``:
    ``top{n}_frac`` and ``dup{n}_frac`` (0.0 for docs shorter than n
    words), rounded to 6 places for engine portability."""
    return array_repetition_signals(words(text), ns)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Per-document repetition signal frame: (id, n_words,
    top{n}_frac, dup{n}_frac ...)."""
    return df.select(
        F.col(id_col),
        F.size(words(F.col(text_col))).alias("n_words"),
        *repetition_signals(F.col(text_col), ns),
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    max_top2: float = 0.2,
    max_dup3: float = 0.3,
) -> DataFrame:
    """Drop documents above the repetition thresholds (Gopher-style
    defaults) — composes with the curation funnel's quality stage as a
    second pure map-side filter."""
    top2, _d2, _t3, dup3 = repetition_signals(F.col(text_col), (2, 3))
    return df.where((top2 <= F.lit(max_top2)) & (dup3 <= F.lit(max_dup3)))
