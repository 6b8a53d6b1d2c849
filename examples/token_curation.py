#!/usr/bin/env python
"""Curate a pre-tokenized corpus (the input_hint table shape) for training.

One CLI over a parquet table of (doc_id, tokens array<int>, source):

1. cross-document duplicate-span stats (operators/decontam.
   duplicate_spans) — drop documents whose duplicated coverage exceeds
   ``--max-dup-frac`` (the exact-substring-dedup policy of Lee et al.
   2021 at window granularity);
2. optional benchmark decontamination (token_ngram_contamination vs a
   held-out parquet of the same shape) — drop any overlap;
3. domain-mixture resampling to ``--mixture`` weights
   (operators/sampling.mixture_sample, zero-shuffle hash threshold);
4. context-window chunking (operators/chunking.chunk_tokens) into
   ``--max-len``/``--stride`` windows.

Writes the chunk table to ``--out/chunks`` and a funnel manifest
(per-stage document counts + final chunk/token counts) to
``--out/manifest.json``.  Every stage is a declarative DataFrame op:
the survivors' scan stays pushed-down/pruned, the only wide exchange
is the duplicate-span gram shuffle, and nothing collects row data.

    python examples/token_curation.py --corpus CORPUS.parquet \
        --out OUT [--bench-path BENCH.parquet] [--max-dup-frac 0.5] \
        [--mixture web=6,books=1] [--max-len 2048] [--stride 1536] \
        [--dup-n 5] [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_mixture(spec: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if not k or not v:
            raise ValueError(f"bad --mixture entry: {part!r} (want domain=weight)")
        out[k.strip()] = int(v)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True, help="parquet: doc_id, tokens, source")
    ap.add_argument("--out", required=True)
    ap.add_argument("--bench-path", default=None,
                    help="optional benchmark parquet (same shape) to decontaminate against")
    ap.add_argument("--max-dup-frac", type=float, default=0.5,
                    help="drop docs with duplicated-span coverage above this fraction")
    ap.add_argument("--dup-n", type=int, default=5, help="duplicate-span window size")
    ap.add_argument("--mixture", default=None, help="e.g. web=6,books=1 (omit to skip)")
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--stride", type=int, default=None)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scylla_cdc_rust_spark.operators.chunking import chunk_tokens
    from scylla_cdc_rust_spark.operators.decontam import (
        duplicate_spans,
        token_ngram_contamination,
    )
    from scylla_cdc_rust_spark.operators.sampling import mixture_sample
    from scylla_cdc_rust_spark.session import get_spark

    spark = get_spark(cores=args.cores)
    corpus = spark.read.parquet(args.corpus)
    funnel: dict[str, int] = {"input_docs": corpus.count()}

    # 1. duplicate-span policy: anti-join the over-covered docs (the span
    # table only holds AFFECTED docs, so absent means clean)
    spans = duplicate_spans(corpus, n=args.dup_n)
    too_dup = (
        corpus.join(spans, "doc_id")
        .where(
            F.col("covered_tok")
            > F.size("tokens").cast("double") * F.lit(args.max_dup_frac)
        )
        .select("doc_id")
    )
    corpus = corpus.join(too_dup, "doc_id", "left_anti")
    funnel["after_dup_spans"] = corpus.count()

    # 2. optional benchmark decontamination: drop ANY overlap
    if args.bench_path:
        bench = spark.read.parquet(args.bench_path)
        hits = token_ngram_contamination(corpus, bench).where(
            F.col("n_contaminated") > 0
        ).select("doc_id")
        corpus = corpus.join(hits, "doc_id", "left_anti")
    funnel["after_decontam"] = corpus.count()

    # 3. domain-mixture resampling
    if args.mixture:
        corpus = mixture_sample(corpus, _parse_mixture(args.mixture))
    funnel["after_mixture"] = corpus.count()

    # 4. context-window chunking, written as the training-ready table
    chunks = chunk_tokens(corpus, max_len=args.max_len, stride=args.stride)
    chunks.write.mode("overwrite").parquet(os.path.join(args.out, "chunks"))
    written = spark.read.parquet(os.path.join(args.out, "chunks"))
    funnel["chunks"] = written.count()
    funnel["chunk_tokens"] = int(
        written.agg(F.sum("n_chunk_tok")).first()[0] or 0
    )

    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(funnel, f, indent=2, sort_keys=True)
    print(json.dumps(funnel, sort_keys=True))


if __name__ == "__main__":
    main()
