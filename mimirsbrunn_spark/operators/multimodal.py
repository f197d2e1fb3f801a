"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partition
strategy, UDF signatures — and the codec step is a backend SEAM (the
tiles.get_cell_ops pattern): each decoder probes the real wheel on the
worker (PIL / soundfile / PyAV — absent from this container, present on
real clusters), then tries the pure-numpy BUILTIN codecs for
uncompressed formats (BMP / PGM / PPM images, RIFF-PCM WAV audio —
`operators/codecs.py`, a true decode with no wheel at all), and only
then falls back to a deterministic fake derived from the bytes, so
pipelines and tests exercise every stage here while a cluster with the
wheels gets real decodes with no code change. ``strict=True`` (== backend
"real") refuses to silently fake. The real wheel paths are unit-tested
via injected stand-in modules; the builtin paths are golden-tested on
encoder round-trips.

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


# ---------------------------------------------------------------------------
# Codec backend seam (VERDICT r02 #6): the import-time selection pattern of
# tiles.get_cell_ops applied to media decode. Each *_decoder factory probes
# the real wheel (PIL / soundfile / PyAV) and falls back to the deterministic
# fake; a cluster WITH the wheels gets real decodes with no code change.
# Selection runs WORKER-side (inside the mapInPandas generator), so the
# closure ships no module object; factories accept an injected module so the
# real path is unit-testable where the wheels are absent.
# ---------------------------------------------------------------------------


def _import_pil():
    try:
        from PIL import Image  # noqa: F401  (absent from this image; present on real clusters)

        return Image
    except ImportError:
        return None


def _import_soundfile():
    try:
        import soundfile  # noqa: F401

        return soundfile
    except ImportError:
        return None


def _import_av():
    try:
        import av  # noqa: F401  (PyAV / ffmpeg)

        return av
    except ImportError:
        return None


def _pick(backend: str, mod, kind: str, wheel: str):
    """Shared selection rule: auto → real iff importable; real → raise if
    not; fake → always the deterministic stand-in. ``builtin`` is handled
    by the callers before this runs (it needs no module)."""
    if backend == "fake":
        return None
    if mod is None:
        if backend == "real":
            raise NotImplementedError(
                f"{kind} decode requested backend='real' but {wheel} is not installed"
            )
        return None
    return mod


def image_decoder(width: int, height: int, backend: str = "auto", image_mod=None):
    """blob → flat grayscale [0,1] pixel list of width*height.

    Backends: ``real`` = PIL open→convert("L")→resize; ``builtin`` =
    pure-numpy decode of uncompressed BMP / PGM / PPM (operators.codecs —
    a TRUE decode, no wheel needed) → BT.601 luma → nearest resize, raising
    on any other format; ``fake`` = the deterministic stand-in; ``auto`` =
    real when PIL is importable, else builtin per-blob when the magic
    bytes sniff as an uncompressed format, else fake."""
    from . import codecs

    mod = _pick(backend, image_mod if image_mod is not None else _import_pil(),
                "image", "PIL") if backend != "builtin" else None
    n = width * height

    def builtin(blob: bytes) -> list:
        luma = codecs.to_luma(codecs.decode_image_builtin(blob))
        return codecs.resize_nearest(luma, width, height).astype(
            np.float32
        ).ravel().tolist()

    if backend == "builtin":
        return builtin
    if mod is None:
        if backend == "fake":
            return lambda blob: _fake_decode(blob, n).tolist()

        # auto without the wheel: true decode when the bytes ARE an
        # uncompressed image, deterministic fake otherwise. The sniff
        # only checks magic bytes, so a sniffed-but-undecodable variant
        # (RLE/compressed BMP, PNM maxval > 255) falls back to the fake
        # instead of failing the stage (ADVICE r05 #1) — auto never
        # raised without a wheel before the sniffing path and must not
        # start now; ``strict`` still surfaces decode errors.
        def sniffing(blob: bytes) -> list:
            if codecs.sniff(blob) in ("bmp", "pnm"):
                try:
                    return builtin(blob)
                except ValueError:
                    pass
            return _fake_decode(blob, n).tolist()

        return sniffing

    def real(blob: bytes) -> list:
        import io

        img = mod.open(io.BytesIO(blob)).convert("L").resize((width, height))
        return (np.asarray(img, dtype=np.float32) / 255.0).ravel().tolist()

    return real


def _fit_wave(wav: np.ndarray, sr: int, sample_rate: int, n: int) -> list:
    """mono float wave at ``sr`` → linear-interp resample to
    ``sample_rate``, zero-pad/trim to ``n`` (shared by the soundfile and
    builtin WAV paths so both produce the identical contract)."""
    wav = np.asarray(wav, dtype=np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=1)
    if sr != sample_rate and len(wav) > 1:
        t_out = np.linspace(0.0, len(wav) - 1.0, int(len(wav) * sample_rate / sr))
        wav = np.interp(t_out, np.arange(len(wav)), wav).astype(np.float32)
    out = np.zeros(n, dtype=np.float32)
    out[: min(n, len(wav))] = wav[:n]
    return out.tolist()


def audio_decoder(sample_rate: int, n: int, backend: str = "auto", audio_mod=None):
    """blob → n-sample mono waveform in [-1, 1] at sample_rate.

    Backends: ``real`` = soundfile read → mono mean → linear-interp
    resample → pad/trim; ``builtin`` = pure-numpy RIFF/PCM WAV decode
    (operators.codecs, u8/s16/s32 — a TRUE decode, no wheel needed) →
    the same mono/resample/fit, raising on non-WAV bytes; ``fake`` = the
    deterministic stand-in; ``auto`` = real when soundfile is importable,
    else builtin per-blob when the bytes sniff as WAV, else fake."""
    from . import codecs

    mod = _pick(backend, audio_mod if audio_mod is not None else _import_soundfile(),
                "audio", "soundfile") if backend != "builtin" else None

    def builtin(blob: bytes) -> list:
        wav, sr = codecs.decode_wav(blob)
        return _fit_wave(wav, sr, sample_rate, n)

    if backend == "builtin":
        return builtin
    if mod is None:
        if backend == "fake":
            return lambda blob: (_fake_decode(blob, n) * 2.0 - 1.0).tolist()

        def sniffing(blob: bytes) -> list:
            # fall back on undecodable sniffed variants (float/extensible
            # WAV) rather than failing the stage — ADVICE r05 #1
            if codecs.sniff(blob) == "wav":
                try:
                    return builtin(blob)
                except ValueError:
                    pass
            return (_fake_decode(blob, n) * 2.0 - 1.0).tolist()

        return sniffing

    def real(blob: bytes) -> list:
        import io

        data, sr = mod.read(io.BytesIO(blob))
        return _fit_wave(np.asarray(data, dtype=np.float32), sr, sample_rate, n)

    return real


def video_frame_sampler(every_n: int, backend: str = "auto", video_mod=None):
    """blob → list of (frame_idx, frame_bytes) for every every_n-th frame.

    Backends: ``real`` = PyAV demux/decode, frames as raw rgb24 bytes;
    ``builtin`` = pure-numpy uncompressed-DIB AVI decode
    (operators.codecs.decode_avi — a TRUE decode, no wheel needed),
    frames as the same rgb24 top-down byte layout, raising on any other
    container; ``fake`` = sha256-derived frames sized from the blob;
    ``auto`` = real when PyAV is importable, else builtin per-blob when
    the bytes sniff as RIFF/AVI, else fake."""
    from . import codecs

    mod = _pick(backend, video_mod if video_mod is not None else _import_av(),
                "video", "av (PyAV)") if backend != "builtin" else None

    def builtin(blob: bytes) -> list:
        frames, _, _ = codecs.decode_avi(blob)
        return [
            (idx, f.tobytes()) for idx, f in enumerate(frames) if idx % every_n == 0
        ]

    if backend == "builtin":
        return builtin
    if mod is None:

        def fake(blob: bytes) -> list:
            n_frames = max(1, (len(blob) // 4096) // every_n + 1)
            return [
                (k * every_n, hashlib.sha256(blob + k.to_bytes(4, "little")).digest())
                for k in range(n_frames)
            ]

        if backend == "fake":
            return fake

        def sniffing(blob: bytes) -> list:
            # fall back on undecodable sniffed variants (compressed AVI)
            # rather than failing the stage — ADVICE r05 #1
            if codecs.sniff_video(blob) == "avi":
                try:
                    return builtin(blob)
                except ValueError:
                    pass
            return fake(blob)

        return sniffing

    def real(blob: bytes) -> list:
        import io

        out = []
        with mod.open(io.BytesIO(blob)) as container:
            for idx, frame in enumerate(container.decode(video=0)):
                if idx % every_n == 0:
                    out.append((idx, frame.to_ndarray(format="rgb24").tobytes()))
        return out

    return real


def decode_image(df: DataFrame, width: int = 32, height: int = 32, strict: bool = False,
                 backend: str = "auto") -> DataFrame:
    """media rows → (media_ref, pixels array<float>, width, height).

    Backend seam: ``auto`` uses PIL when importable on the worker, else
    the deterministic fake; ``real`` raises where PIL is absent;
    ``strict=True`` is shorthand for never-silently-fake (== real)."""
    n = width * height
    eff_backend = "real" if strict else backend

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = image_decoder(width, height, backend=eff_backend)  # worker-side probe
        for pdf in batches:
            pixels = [
                dec(bytes(p) if p is not None else ref.encode())
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
                arr = np.asarray(px if px is not None else [], dtype=np.float32)
                blocks = np.array_split(arr, dim)
                # a pixel array shorter than dim leaves empty blocks —
                # mean() of an empty slice is NaN, which would silently
                # poison every downstream cosine; pool to 0.0 instead
                # (same guard as audio_features' bands)
                feats.append(
                    np.array(
                        [b.mean() if len(b) else 0.0 for b in blocks], dtype=np.float32
                    ).tolist()
                )
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "embedding": feats})

    return decoded.mapInPandas(gen, schema="media_ref string, embedding array<float>")


def sample_video_frames(df: DataFrame, every_n: int = 10, strict: bool = False,
                        backend: str = "auto") -> DataFrame:
    """video rows → (media_ref, frame_idx, frame binary). Backend seam:
    ``auto`` uses PyAV when importable on the worker (raw rgb24 frames),
    else the deterministic fake (sha256-derived, frame count sized from
    the blob so one-row→many-rows batch-shape math is exercised);
    ``strict=True`` == backend "real" (never silently fake)."""
    eff_backend = "real" if strict else backend

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sampler = video_frame_sampler(every_n, backend=eff_backend)  # worker-side probe
        for pdf in batches:
            refs, idxs, frames = [], [], []
            for p, ref in zip(pdf["payload"], pdf["media_ref"]):
                blob = bytes(p) if p is not None else ref.encode()
                for idx, frame in sampler(blob):
                    refs.append(ref)
                    idxs.append(idx)
                    frames.append(frame)
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
                 strict: bool = False, backend: str = "auto") -> DataFrame:
    """audio rows → (media_ref, waveform array<float>, sample_rate).

    Backend seam: ``auto`` uses soundfile when importable on the worker
    (mono-ized, resampled, padded/trimmed to the clip length), else the
    deterministic fake; ``strict=True`` == backend "real" (never
    silently fake)."""
    n = int(sample_rate * seconds)
    eff_backend = "real" if strict else backend

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = audio_decoder(sample_rate, n, backend=eff_backend)  # worker-side probe
        for pdf in batches:
            waves = [
                dec(bytes(p) if p is not None else ref.encode())
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
                arr = np.asarray(wv if wv is not None else [], dtype=np.float32)
                if len(arr) == 0:
                    # empty waveform: reshape(1, 1) of a size-0 slice
                    # raises; emit the all-zero embedding directly
                    feats.append([0.0] * n_bands)
                    continue
                eff = min(frame, len(arr))  # short clips: one frame
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
