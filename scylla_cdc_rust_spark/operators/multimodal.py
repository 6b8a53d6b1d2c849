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


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    transformer: Callable[[bytes, dict, int, int], bytes] | None = None,
) -> DataFrame:
    """binary image payload → resized binary payload (mapInPandas).

    Returns (doc_id, payload binary, meta) with meta.width/height set to
    the target size and meta.n_bytes updated.  ``transformer`` is the
    codec hook (production: PIL/libvips); the default is the documented
    deterministic fake — sha256 keystream of ~w·h/64 bytes so payload
    size tracks the target resolution without a real codec.
    """
    if transformer is None:

        def transformer(payload: bytes, _meta: dict, w: int, h: int) -> bytes:
            n = max(16, (w * h) // 64)
            seed = hashlib.sha256((payload or b"") + f"{w}x{h}".encode()).digest()
            return (seed * (n // len(seed) + 1))[:n]

    media = media.where(F.col("meta.media_type") == "image").select(
        "doc_id", "payload", "meta"
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                meta = dict(meta or {})
                out = transformer(payload, meta, width, height)
                meta.update(width=width, height=height, n_bytes=len(out))
                payloads.append(out)
                metas.append(meta)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(run, schema=out_schema)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 32,
    frame_decoder: Callable[[bytes, dict, int], bytes] | None = None,
) -> DataFrame:
    """video payload → one row per sampled frame (mapInPandas, 1→N rows).

    Returns (doc_id, frame_idx, ts_ms, frame binary).  Demonstrates the
    expanding Arrow batch shape: each input row yields
    min(duration_ms // every_ms + 1, max_frames) output rows.  The
    default ``frame_decoder`` is a deterministic fake (sha256 of
    payload+index); production registers pyav here.
    """
    if frame_decoder is None:

        def frame_decoder(payload: bytes, _meta: dict, idx: int) -> bytes:
            return hashlib.sha256((payload or b"") + idx.to_bytes(4, "big")).digest()

    media = media.where(F.col("meta.media_type") == "video").select(
        "doc_id", "payload", "meta"
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                meta = dict(meta or {})
                dur = int(meta.get("duration_ms") or 0)
                n = min(dur // every_ms + 1, max_frames)
                for i in range(n):
                    ids.append(doc)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(frame_decoder(payload, meta, i))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
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
