"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partition
strategy, UDF signatures — while the codec step is stubbed: the image /
audio libraries are not in this container, so each decoder is either a
clearly-marked NotImplementedError (``strict=True``) or a deterministic
fake derived from the bytes (default), letting pipelines and tests
exercise every seam except the codec itself.

Partitioning note for 100 TB: media blobs dominate row size, so the
operators below repartition by a size-aware key before the UDF to bound
Arrow batch memory (`maxRecordsPerBatch` alone is insufficient when one
row is 100 MB — at scale, store blobs in sidecar files and keep refs in
the table; these operators accept either inline bytes or a ref).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),       # inline blob (or null if ref-only)
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in for a codec: n floats derived from a
    sha256 stream of the payload. NOT a decode — a seam-filler."""
    out = np.empty(n, dtype=np.float32)
    h = payload or b""
    i = 0
    while i < n:
        h = hashlib.sha256(h).digest()
        chunk = np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
        take = min(n - i, len(chunk))
        out[i : i + take] = chunk[:take]
        i += take
    return out


def decode_image(df: DataFrame, width: int = 32, height: int = 32, strict: bool = False) -> DataFrame:
    """media rows → (media_ref, pixels array<float>, width, height).

    STUB: real decode needs PIL/libjpeg (absent here). strict=True raises
    NotImplementedError inside the UDF (the production wiring point);
    default emits the deterministic fake so downstream plumbing is
    testable."""
    n = width * height

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires PIL/libjpeg — not present in this container; "
                    "plug the codec here"
                )
            pixels = [
                _fake_decode(bytes(p) if p is not None else ref.encode(), n).tolist()
                for p, ref in zip(pdf["payload"], pdf["media_ref"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "pixels": pixels,
                    "width": width,
                    "height": height,
                }
            )

    return df.filter(F.col("media_kind") == "image").repartition(
        F.col("media_ref")
    ).mapInPandas(
        gen, schema="media_ref string, pixels array<float>, width int, height int"
    )


def image_features(decoded: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extract stage: mean-pool pixel blocks into a dim-length
    embedding (vectorized numpy over the Arrow batch; a real model slots
    into the same signature)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for px in pdf["pixels"]:
                arr = np.asarray(px, dtype=np.float32)
                blocks = np.array_split(arr, dim)
                feats.append(np.array([b.mean() for b in blocks], dtype=np.float32).tolist())
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "embedding": feats})

    return decoded.mapInPandas(gen, schema="media_ref string, embedding array<float>")


def sample_video_frames(df: DataFrame, every_n: int = 10, strict: bool = False) -> DataFrame:
    """video rows → (media_ref, frame_idx, frame binary). STUB codec: the
    deterministic fake emits ceil(len(payload)/4096 / every_n) frames so
    batch-shape math (one input row → many output rows) is exercised."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("video frame sampling requires ffmpeg — plug here")
            refs, idxs, frames = [], [], []
            for p, ref in zip(pdf["payload"], pdf["media_ref"]):
                blob = bytes(p) if p is not None else ref.encode()
                n_frames = max(1, (len(blob) // 4096) // every_n + 1)
                for k in range(n_frames):
                    refs.append(ref)
                    idxs.append(k * every_n)
                    frames.append(hashlib.sha256(blob + k.to_bytes(4, "little")).digest())
            yield pd.DataFrame({"media_ref": refs, "frame_idx": idxs, "frame": frames})

    return df.filter(F.col("media_kind") == "video").mapInPandas(
        gen, schema="media_ref string, frame_idx int, frame binary"
    )


def media_table_from_docs(docs: DataFrame, kind_cycle=("image", "audio", "video")) -> DataFrame:
    """Derive a media table from the interleaved corpus: one row per media
    span, kind assigned deterministically from the ref hash, payload a
    deterministic blob (sidecar stand-in)."""
    media = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    kind = F.element_at(
        F.array(*[F.lit(k) for k in kind_cycle]),
        (F.pmod(F.xxhash64("media_ref"), F.lit(len(kind_cycle))) + 1).cast("int"),
    )
    return media.select(
        "media_ref",
        kind.alias("media_kind"),
        F.sha2("media_ref", 256).cast("binary").alias("payload"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def decode_audio(df: DataFrame, sample_rate: int = 16_000, seconds: float = 1.0,
                 strict: bool = False) -> DataFrame:
    """audio rows → (media_ref, waveform array<float>, sample_rate).

    STUB codec (libsndfile/ffmpeg absent): strict=True raises at the
    production wiring point; default emits the deterministic fake so the
    schema/batch plumbing is exercised end to end."""
    n = int(sample_rate * seconds)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "audio decode requires libsndfile/ffmpeg — plug the codec here"
                )
            waves = [
                (_fake_decode(bytes(p) if p is not None else ref.encode(), n) * 2.0 - 1.0).tolist()
                for p, ref in zip(pdf["payload"], pdf["media_ref"])
            ]
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "waveform": waves, "sample_rate": sample_rate}
            )

    return df.filter(F.col("media_kind") == "audio").repartition(
        F.col("media_ref")
    ).mapInPandas(gen, schema="media_ref string, waveform array<float>, sample_rate int")


def audio_features(decoded: DataFrame, n_bands: int = 8, frame: int = 512) -> DataFrame:
    """Feature-extract stage for audio: per-frame RMS energy folded into
    ``n_bands`` mean-pooled bands (vectorized numpy; a real mel frontend
    slots into the same signature)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for wv in pdf["waveform"]:
                arr = np.asarray(wv, dtype=np.float32)
                eff = min(frame, max(len(arr), 1))  # short clips: one frame
                n_frames = max(1, len(arr) // eff)
                rms = np.sqrt(
                    np.square(arr[: n_frames * eff].reshape(n_frames, eff)).mean(axis=1)
                )
                bands = np.array_split(rms, n_bands)
                feats.append(
                    np.array(
                        [b.mean() if len(b) else 0.0 for b in bands], dtype=np.float32
                    ).tolist()
                )
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "embedding": feats})

    return decoded.mapInPandas(gen, schema="media_ref string, embedding array<float>")


def resize_image(decoded: DataFrame, out_width: int = 8, out_height: int = 8) -> DataFrame:
    """Resize stage over decoded pixel rows: block-mean downsample (real
    numpy math — unlike the codec, resizing needs no external library).
    Requires out dims to divide the input dims (the common power-of-two
    thumbnail path); (media_ref, pixels, width, height) in and out."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for px, w, h in zip(pdf["pixels"], pdf["width"], pdf["height"]):
                w, h = int(w), int(h)
                if w % out_width or h % out_height:
                    raise ValueError(f"resize {w}x{h} -> {out_width}x{out_height}: non-integer block")
                arr = np.asarray(px, dtype=np.float32).reshape(h, w)
                bh, bw = h // out_height, w // out_width
                small = arr.reshape(out_height, bh, out_width, bw).mean(axis=(1, 3))
                out.append(small.ravel().astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "pixels": out,
                    "width": out_width,
                    "height": out_height,
                }
            )

    return decoded.mapInPandas(
        gen, schema="media_ref string, pixels array<float>, width int, height int"
    )
