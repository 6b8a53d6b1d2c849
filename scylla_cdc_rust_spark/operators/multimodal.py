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
    """Pluggable codec registry; unregistered media types raise."""

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


# ---------------------------------------------------------------------------
# Real numpy-only codecs (no external image/audio libraries needed):
# PPM (P6 binary), BMP (24-bit uncompressed BI_RGB), WAV (PCM16).
# PNG/JPEG/MP3/... still raise a documented NotImplementedError naming
# the production codec — the registry contract stays honest.
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 PPM."""
    h, w, c = pixels.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM → (h, w, 3) uint8.  Handles comment lines and any
    whitespace split between the three header tokens."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 whitespace-separated ints (w, h, maxval), with
    # optional '#' comment lines; pixel data starts after the single
    # whitespace byte following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (bottom-up, BGR,
    4-byte-padded rows — the standard Windows layout)."""
    h, w, c = pixels.shape
    assert c == 3
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    header = (
        b"BM"
        + (54 + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    bgr = pixels[::-1, :, ::-1].astype(np.uint8)  # bottom-up + BGR
    if pad:
        padded = np.zeros((h, row + pad), dtype=np.uint8)
        padded[:, :row] = bgr.reshape(h, row)
        body = padded.tobytes()
    else:
        body = bgr.tobytes()
    return header + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bits = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bits != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, :row]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if bottom_up else img).copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-sniffing image decode → (h, w, 3) uint8 RGB.

    Ships PPM (P6) and BMP (24-bit); compressed formats name the
    production codec they need instead of silently faking."""
    if not payload:
        raise ValueError("empty image payload")
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "PNG/JPEG require a real codec (PIL/libvips); register one on "
            "DecoderRegistry — only PPM/BMP decode numpy-only"
        )
    raise ValueError(f"unrecognized image magic {payload[:4]!r}")


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """1-D int16 mono PCM → RIFF/WAVE."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (samples int16 [n, channels], sample_rate).
    Walks the chunk list, so extra chunks (LIST/fact) are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError("only PCM16 WAV supported")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels), rate


def nearest_resize(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Floor nearest-neighbor resample: src_x = x·W // width (the exact
    integer mapping the DuckDB resize oracle reproduces)."""
    h, w, _ = pixels.shape
    xs = (np.arange(width) * w) // width
    ys = (np.arange(height) * h) // height
    return pixels[np.ix_(ys, xs)]


def image_resize_transformer(payload: bytes, _meta: dict, w: int, h: int) -> bytes:
    """decode → nearest-neighbor → re-encode in the SAME container."""
    out = nearest_resize(decode_image(bytes(payload)), w, h)
    return encode_bmp(out) if bytes(payload[:2]) == b"BM" else encode_ppm(out)


def image_feature_decoder(dim: int = 16) -> Callable[[bytes, dict], np.ndarray]:
    """Real image features: [width, height, n_px, sum_r, sum_g, sum_b,
    mean_r, mean_g, mean_b, ...] zero-padded/truncated to ``dim``.
    The first six entries are exact integers (float32-representable for
    any image below ~16M-pixel channel sums / 2^24 px), which is what
    lets the driver oracle check real pixel math bit-for-bit."""

    def fn(payload: bytes, _meta: dict) -> np.ndarray:
        px = decode_image(bytes(payload))
        h, w, _ = px.shape
        sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        n = h * w
        feats = [
            float(w),
            float(h),
            float(n),
            float(sums[0]),
            float(sums[1]),
            float(sums[2]),
            float(sums[0]) / n,
            float(sums[1]) / n,
            float(sums[2]) / n,
        ]
        v = np.zeros(dim, dtype=np.float32)
        v[: min(dim, len(feats))] = feats[:dim]
        return v

    return fn


def audio_feature_decoder(dim: int = 16) -> Callable[[bytes, dict], np.ndarray]:
    """Real audio features from WAV PCM16: [channels, sample_rate,
    n_samples, sum_abs, mean_abs, ...] zero-padded to ``dim``."""

    def fn(payload: bytes, _meta: dict) -> np.ndarray:
        samples, rate = decode_wav(bytes(payload))
        n = samples.shape[0]
        sum_abs = float(np.abs(samples.astype(np.int64)).sum())
        feats = [
            float(samples.shape[1]),
            float(rate),
            float(n),
            sum_abs,
            sum_abs / max(1, n * samples.shape[1]),
        ]
        v = np.zeros(dim, dtype=np.float32)
        v[: min(dim, len(feats))] = feats[:dim]
        return v

    return fn


def fake_resize_transformer(payload: bytes, _meta: dict, w: int, h: int) -> bytes:
    """Deterministic non-codec stand-in (tests / non-image payloads):
    sha256 keystream of ~w·h/64 bytes so size tracks resolution."""
    n = max(16, (w * h) // 64)
    seed = hashlib.sha256((payload or b"") + f"{w}x{h}".encode()).digest()
    return (seed * (n // len(seed) + 1))[:n]


def default_registry(dim: int = 16) -> DecoderRegistry:
    """The shipped defaults: REAL image (PPM/BMP) and audio (WAV PCM16)
    decoders; video remains a deterministic fake until a real container
    parser is registered (no numpy-only video demuxer exists)."""
    reg = DecoderRegistry()
    reg.register("image", image_feature_decoder(dim))
    reg.register("audio", audio_feature_decoder(dim))
    reg.register("video", deterministic_fake_decoder(dim))
    return reg


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
    reg = registry if registry is not None else default_registry(dim)
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
    the target size and meta.n_bytes updated.  The default
    ``transformer`` is the REAL shipped codec path: magic-sniffed
    PPM/BMP decode → floor nearest-neighbor resample → re-encode in the
    same container (``image_resize_transformer``).  Pass a custom hook
    for compressed formats (PIL/libvips) or ``fake_resize_transformer``
    for payloads that are not actual images.
    """
    if transformer is None:
        transformer = image_resize_transformer

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


def synthetic_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic image corpus for tests/driver oracles.

    One image per input id with a CLOSED-FORM pixel law a SQL oracle can
    reproduce without any codec:

        W = 8 + id % 5,  H = 6 + id % 4
        v(x, y, c) = (id·31 + (y·W + x)·3 + c·7) % 256

    Even ids encode as PPM (P6), odd ids as BMP (24-bit) — so a consumer
    exercises BOTH shipped decoders.  Runs in mapInPandas (one Arrow
    batch per roundtrip), the same plumbing real ingestion uses.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 8 + did % 5, 6 + did % 4
                p = np.arange(h * w, dtype=np.int64).reshape(h, w, 1)
                c = np.arange(3, dtype=np.int64).reshape(1, 1, 3)
                px = ((did * 31 + p * 3 + c * 7) % 256).astype(np.uint8)
                payload = encode_ppm(px) if did % 2 == 0 else encode_bmp(px)
                ids.append(str(did))
                payloads.append(payload)
                metas.append(
                    {
                        "media_type": "image",
                        "codec": "ppm" if did % 2 == 0 else "bmp",
                        "width": w,
                        "height": h,
                        "duration_ms": None,
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "meta": metas}
            )

    return docs.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthetic_wavs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic WAV corpus (mono PCM16 @ 8 kHz) with a
    closed-form sample law a SQL oracle reproduces without a codec:

        n = 64 + id % 32
        s(i) = ((id·7 + i·13) % 4001) − 2000      (i = 0..n−1)
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for did in pdf[id_col]:
                did = int(did)
                n = 64 + did % 32
                i = np.arange(n, dtype=np.int64)
                samples = ((did * 7 + i * 13) % 4001 - 2000).astype(np.int16)
                payload = encode_wav(samples, 8000)
                ids.append(str(did))
                payloads.append(payload)
                metas.append(
                    {
                        "media_type": "audio",
                        "codec": "pcm16",
                        "width": None,
                        "height": None,
                        "duration_ms": (n * 1000) // 8000,
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "meta": metas}
            )

    return docs.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata accounting without touching payload bytes (column pruning:
    the binary column must NOT appear in this plan's scan)."""
    return media.groupBy(F.col("meta.media_type").alias("media_type")).agg(
        F.count("*").alias("n"),
        F.sum("meta.n_bytes").cast("long").alias("total_bytes"),
        F.avg("meta.width").alias("avg_width"),
    )
