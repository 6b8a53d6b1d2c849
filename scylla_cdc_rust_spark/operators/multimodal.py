"""Multimodal payload columns — opaque binary + typed metadata.

A 100 TB training-data lake carries image/audio/video next to token
sequences.  The engine treats those as ``binary`` payload columns with
a typed metadata struct; all Spark-side plumbing (schema, partitioning,
Arrow batch shape, UDF signatures) is real and tested, while the actual
codec work is stubbed behind ``DecoderRegistry`` — the container has no
image/audio libraries, so the default decoders are deterministic fakes
that preserve shape contracts (documented NotImplementedError for real
codecs).

Design notes for scale:
- decode runs in ``mapInPandas`` so one Arrow batch moves per worker
  roundtrip; batch size is bounded by bytes not rows
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` + payload size).
- feature columns come back as fixed-length ``array<float>`` so
  downstream ANN (operators/ann.py) consumes them directly.
- payloads are filtered/pruned BEFORE decode (predicate pushdown on the
  metadata struct — never decode what a filter would drop).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


class DecoderRegistry:
    """Pluggable codec registry; real codecs raise until provided."""

    def __init__(self):
        self._decoders: dict[str, Callable[[bytes, dict], np.ndarray]] = {}

    def register(self, media_type: str, fn: Callable[[bytes, dict], np.ndarray]):
        self._decoders[media_type] = fn

    def decode(self, media_type: str, payload: bytes, meta: dict) -> np.ndarray:
        fn = self._decoders.get(media_type)
        if fn is None:
            raise NotImplementedError(
                f"no decoder registered for {media_type!r}; production deploys "
                "register PIL/torchaudio/pyav codecs here"
            )
        return fn(payload, meta)


def deterministic_fake_decoder(dim: int = 16) -> Callable[[bytes, dict], np.ndarray]:
    """Shape-preserving stand-in: sha256(payload) → unit float vector."""

    def fn(payload: bytes, _meta: dict) -> np.ndarray:
        h = hashlib.sha256(payload or b"").digest()
        raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
        v = (raw % 1000).astype(np.float32) / 1000.0
        n = float(np.linalg.norm(v)) or 1.0
        return v / n

    return fn


def extract_features(
    media: DataFrame,
    registry: DecoderRegistry | None = None,
    dim: int = 16,
    media_types: tuple[str, ...] | None = None,
) -> DataFrame:
    """binary payload → fixed-length feature vector (mapInPandas).

    Returns (doc_id, media_type, features array<float>, n_bytes).
    """
    reg = registry
    if reg is None:
        reg = DecoderRegistry()
        fake = deterministic_fake_decoder(dim)
        for mt in ("image", "audio", "video"):
            reg.register(mt, fake)
    if media_types:
        media = media.where(F.col("meta.media_type").isin(*media_types))
    # prune before decode: only the columns the kernel needs cross Arrow
    media = media.select("doc_id", "payload", "meta")

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, mts, nb = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                meta = meta or {}
                mt = (meta.get("media_type") if isinstance(meta, dict) else meta["media_type"]) or "image"
                feats.append(reg.decode(mt, payload, dict(meta)).tolist())
                mts.append(mt)
                nb.append(len(payload or b""))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": mts,
                    "features": feats,
                    "n_bytes": nb,
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata accounting without touching payload bytes (column pruning:
    the binary column must NOT appear in this plan's scan)."""
    return media.groupBy(F.col("meta.media_type").alias("media_type")).agg(
        F.count("*").alias("n"),
        F.sum("meta.n_bytes").cast("long").alias("total_bytes"),
        F.avg("meta.width").alias("avg_width"),
    )
