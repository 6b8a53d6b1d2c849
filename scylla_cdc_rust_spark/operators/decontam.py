"""Benchmark decontamination: n-gram overlap against a held-out set.

The standard training-data hygiene step: any document sharing enough
word n-grams with an evaluation benchmark is flagged (and usually
dropped) so the model is not trained on its own test set.

Scale shape — the part that matters at 100 TB:

- the BENCHMARK side is tiny (thousands of documents); its distinct
  n-gram hashes are aggregated first and enter the corpus join as a
  **broadcast** hash join — the corpus n-gram stream is never shuffled;
- the corpus side is one projection (split → slide → hash → explode)
  feeding a per-doc aggregate whose partial runs map-side, so the only
  exchange carries one row per (doc, matched) — bounded by the corpus
  row count, not its n-gram count;
- hashes use the engine-portable md5-prefix bigint (queries.py idiom),
  so the whole operator is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.functions.text import word_hash, words


def ngram_hashes(
    text: Column | str, n: int, hash_impl: str = "portable"
) -> Column:
    """Array of hashes of the word n-grams of ``text``.

    Sliding window via sequence+slice — pure Catalyst, no explode yet
    (callers explode only when they need the stream shape).  Documents
    with fewer than n words contribute no n-grams.

    ``hash_impl``: ``"portable"`` is the md5-prefix bigint every DuckDB
    oracle reproduces; ``"xxhash64"`` is the production mode — same
    operator shape, one cheap JVM hash instead of md5 (the md5 cost
    dominated doc_ngram_contamination at 5.75 s/sf0.1, VERDICT r3 #5).
    The two select statistically-equivalent contamination sets (they
    differ only through hash collisions) — pinned by
    tests/test_training_ops.py's parity test.
    """
    ws = words(text)
    if hash_impl == "portable":
        grams = F.transform(
            F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
            lambda i: word_hash(F.concat_ws(" ", F.slice(ws, i, n))),
        )
    elif hash_impl == "xxhash64":
        # one xxhash64 of the joined gram string — same operator shape
        # as portable with the md5+conv+mod pipeline replaced by a
        # single cheap JVM hash.  (A prehash-words + per-gram
        # xxhash64-fold variant was A/B'd in round 5: the fold's extra
        # HigherOrderFunction evaluation costs more than the string
        # concat it saves — 1.15 s vs 1.05 s median at sf0.1, with a
        # 4× worse first-leg codegen warmup.)
        grams = F.transform(
            F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(ws, i, n))),
        )
    else:
        raise ValueError(f"unknown hash_impl: {hash_impl!r}")
    # sequence(1, stop) DESCENDS when stop < 1 — guard short documents
    # to an empty array instead of emitting bogus reversed windows
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<long>")
    )


def token_ngram_hashes(
    tokens: Column | str, n: int, hash_impl: str = "portable"
) -> Column:
    """Array of hashes of the token-id n-grams of an ``array<int>``
    column — decontamination for the input_hint shape (pre-tokenized
    training sequences), no text round-trip.

    ``"portable"`` folds ``a = (a·31 + t) % M31`` (closed-form
    reproducible in DuckDB, ANSI-safe: a < M31 so a·31 + t < 2^35);
    ``"xxhash64"`` folds the JVM hash (production mode — ints need no
    pre-hash, so the fold variant that lost the word A/B is the right
    shape here).
    """
    from scylla_cdc_rust_spark.functions.text import M31

    ts = F.col(tokens) if isinstance(tokens, str) else tokens
    if hash_impl == "portable":
        fold = lambda a, x: (a * 31 + x) % F.lit(M31).cast(  # noqa: E731
            "long"
        )
    elif hash_impl == "xxhash64":
        fold = lambda a, x: F.xxhash64(a, x)  # noqa: E731
    else:
        raise ValueError(f"unknown hash_impl: {hash_impl!r}")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ts) - F.lit(n - 1)),
        lambda i: F.aggregate(
            F.slice(ts, i, n), F.lit(0).cast("long"), fold
        ),
    )
    return F.when(F.size(ts) >= n, grams).otherwise(
        F.array().cast("array<long>")
    )


def _contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    grams_of,
    id_col: str,
) -> DataFrame:
    """Shared skeleton: per-document distinct-gram overlap counts vs the
    benchmark's broadcast gram set.  ``grams_of(df_side)`` returns the
    gram-array Column for a side."""
    from scylla_cdc_rust_spark.functions.generate_util import explode_nonnull
    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    # the benchmark side stays un-fanned: it is catalog-sized and the
    # extra AQE stage boundaries of a fan-out exchange cost more than
    # its serial gram hashing saves (A/B'd at sf0.1).  explode_nonnull
    # (not explode): the inferred size>0 filter would re-evaluate the
    # whole gram hash in the scan stage (generate_util docstring)
    bench = explode_nonnull(benchmark, grams_of(benchmark), "h").distinct()
    # ONE corpus scan: per-doc distinct grams with the doc's total
    # carried alongside, exploded into the broadcast probe.  Small
    # inputs are fanned out first — the gram projection is the cost
    # center and must not serialize on one scan task (no-op at scale)
    corpus = ensure_min_parallelism(corpus, by=id_col)
    # n_ngrams must be projected BELOW the explode: referencing size(gs)
    # next to explode(gs) makes the Generate carry the whole gram array
    # through every exploded row — O(grams²) bytes per document
    # (measured 4.3s → 0.6s at sf0.1)
    doc_grams = explode_nonnull(
        corpus.select(
            F.col(id_col).alias("id"),
            F.array_distinct(grams_of(corpus)).alias("gs"),
        ).select("id", F.size("gs").alias("n_ngrams"), "gs"),
        F.col("gs"),
        "h",
        "id",
        "n_ngrams",
    )
    return (
        doc_grams.join(F.broadcast(bench), "h")
        .groupBy("id", "n_ngrams")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
        .select(
            F.col("id").alias(id_col),
            "n_ngrams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double")
                / F.col("n_ngrams").cast("double"),
                6,
            ).alias("contamination"),
        )
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_impl: str = "portable",
) -> DataFrame:
    """Per-document contamination stats vs a benchmark set.

    Returns one row per corpus document that has ≥1 n-gram also present
    in the benchmark: (id, n_ngrams, n_contaminated, contamination) —
    contamination = distinct matched n-grams / distinct own n-grams.
    Documents with no overlap are absent (filter the corpus with a
    left-anti join on the result to decontaminate).

    ``hash_impl="xxhash64"`` is the production mode (see
    ``ngram_hashes``); the default stays oracle-portable.
    """
    return _contamination_stats(
        corpus,
        benchmark,
        lambda _df: ngram_hashes(text_col, n, hash_impl),
        id_col,
    )


def token_ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hash_impl: str = "portable",
) -> DataFrame:
    """``ngram_contamination`` for PRE-TOKENIZED sequences — the engine's
    target-table shape (doc_id, tokens array<int>): token-id n-gram
    overlap vs a benchmark set, same broadcast-probe scale shape, no
    detokenization round-trip."""
    return _contamination_stats(
        corpus,
        benchmark,
        lambda _df: token_ngram_hashes(tokens_col, n, hash_impl),
        id_col,
    )


def contamination_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hash_impl: str = "portable",
) -> DataFrame:
    """Token-SPAN contamination: merge a document's contaminated n-grams
    into maximal covered token intervals.

    Flagging a document is enough to drop it; EXCISING benchmark
    leakage (the cheaper remedy for long documents with one bad
    paragraph) needs the actual spans.  A gram at position i covers
    tokens [i, i+n); two hits whose positions differ by ≤ n-1 overlap
    in token space and merge into one span.

    Returns one row per contaminated document: (id, n_spans,
    max_span_tok, covered_tok) — span count, longest span's token
    length, and total tokens covered by any span.

    Scale shape: the gram stream stays map-side into the broadcast
    probe exactly as ``token_ngram_contamination``; only HIT positions
    (bounded by matched grams, typically ≪ corpus grams) reach the one
    exchange, where per-document windows (lag → island id → bounds)
    run inside each hash partition.  The window partitions by document
    — no global sort, no skew beyond a document's own hit count.
    """
    from scylla_cdc_rust_spark.functions.generate_util import explode_nonnull
    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    bench = explode_nonnull(
        benchmark, token_ngram_hashes(tokens_col, n, hash_impl), "h"
    ).distinct()
    corpus = ensure_min_parallelism(corpus, by=id_col)
    # posexplode keeps the gram's token position — the span coordinate
    hits = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.posexplode_outer(
                token_ngram_hashes(tokens_col, n, hash_impl)
            ).alias("pos", "h"),
        )
        .where(F.col("h").isNotNull())
        .join(F.broadcast(bench), "h")
        .select("id", "pos")
        .distinct()
    )
    return _hits_to_spans(hits, n, id_col)


def _hits_to_spans(hits: DataFrame, n: int, id_col: str) -> DataFrame:
    """Merge per-document gram-hit positions ``(id, pos)`` into maximal
    covered token intervals and aggregate per-document span stats.

    Shared tail of ``contamination_spans`` / ``duplicate_spans``: the
    window partitions by document — no global sort, no skew beyond a
    document's own hit count."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy("pos")
    # island id: a hit starts a new span only when its gram's token
    # interval neither overlaps NOR touches the previous hit's (a
    # position gap > n) — touching intervals union into one maximal
    # covered interval, so contiguous coverage is always ONE span
    new_span = F.when(
        F.col("pos") - F.lag("pos").over(w) > F.lit(n), 1
    ).otherwise(0)
    islands = hits.select(
        "id",
        "pos",
        F.sum(new_span).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("span_id"),
    )
    spans = islands.groupBy("id", "span_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + F.lit(n)).alias("e")
    )
    return spans.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.max(F.col("e") - F.col("s")).cast("long").alias("max_span_tok"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("covered_tok"),
    ).select(F.col("id").alias(id_col), "n_spans", "max_span_tok", "covered_tok")


def duplicate_spans(
    corpus: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hash_impl: str = "portable",
) -> DataFrame:
    """Cross-document duplicate token SPANS — the window-granularity
    analog of exact-substring training-data dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): any
    n-token window that occurs verbatim in ≥2 distinct documents is a
    duplicated window, and a document's duplicated windows merge into
    maximal covered intervals — the spans an excision pass would cut
    while keeping the unique remainder of the document.

    Returns one row per affected document: (id, n_spans, max_span_tok,
    covered_tok) — same shape as ``contamination_spans``.

    Scale shape — unlike decontamination there is no small side to
    broadcast (the corpus probes ITSELF), so one full gram-keyed
    exchange is unavoidable; everything else is arranged so that
    exchange happens exactly once over exactly one corpus scan:

    - the gram stream (id, pos, h) is built once in one projection
      (posexplode_outer — no inferred-filter double eval, see
      functions/generate_util.py);
    - "occurs in ≥2 distinct documents" is ``min(id) != max(id)`` over
      each gram's occurrences, computed as WINDOW functions partitioned
      by h — never a count(distinct) expansion, and crucially never the
      groupBy+self-join topology, whose two consumers of the gram
      stream each shuffle (and under column pruning each rebuild) their
      own copy — 2 scans + 2 wide exchanges measured vs 1 + 1 here
      (pinned by tests/test_training_ops.py's plan-shape test);
    - gram groups are tiny (a hash's occurrence list), so the window's
      per-group buffering is bounded; the local sort on h is per
      shuffle partition, never global;
    - (id, pos) is unique by construction (one gram per position), so
      the hit stream needs no distinct — only duplicated-window HIT
      positions reach the per-document span windows of
      ``_hits_to_spans``.

    Reference analog: none (scylla-cdc-rust has no corpus operators);
    this extends the training-data surface mandated by the round brief.
    """
    from pyspark.sql.window import Window

    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    corpus = ensure_min_parallelism(corpus, by=id_col)
    grams = corpus.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(
            token_ngram_hashes(tokens_col, n, hash_impl)
        ).alias("pos", "h"),
    ).where(F.col("h").isNotNull())
    w = Window.partitionBy("h")
    hits = (
        grams.select(
            "id",
            "pos",
            F.min("id").over(w).alias("lo_id"),
            F.max("id").over(w).alias("hi_id"),
        )
        .where(F.col("lo_id") != F.col("hi_id"))
        .select("id", "pos")
    )
    return _hits_to_spans(hits, n, id_col)
