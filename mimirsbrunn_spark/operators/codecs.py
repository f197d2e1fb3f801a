"""Pure-numpy builtin codecs for uncompressed media formats.

The multimodal seam (`operators/multimodal.py`) probes real codec wheels
(PIL / soundfile / PyAV) and falls back to a deterministic fake when they
are absent. That leaves a gap this module closes: UNCOMPRESSED formats
need no codec library at all — their byte layout is a header plus raw
samples, decodable with numpy slicing. Supported here:

- **BMP** (Windows bitmap, BI_RGB uncompressed, 24/32 bpp, the format
  every screenshot tool can emit): bottom-up or top-down rows, 4-byte row
  padding, BGR(A) channel order.
- **PGM / PPM** (netpbm ``P5`` grayscale / ``P6`` RGB, binary, maxval
  ≤ 255): the lingua franca of image-pipeline test fixtures.
- **WAV** (RIFF PCM, 8-bit unsigned / 16-bit / 32-bit signed, any channel
  count): chunked header walk, then one ``np.frombuffer``.

Every decoder is whole-buffer numpy (no per-pixel Python), so the builtin
path keeps the same vectorized-batch shape as the wheel-backed path.
Encoders for the same formats are provided so tests and data generators
can synthesize REAL media blobs deterministically.

Reference relationship: the reference carries no media decode (its docs
are text-only); this is part of the repo's beyond-reference multimodal
surface (brief: decode/feature-extract/resize/frame-sample as Spark-side
plumbing). With this module, the decode step is a true decode for the
uncompressed formats even in a container with no imaging/audio wheels —
the seam order is real wheel > builtin sniff > deterministic fake.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-R BT.601 luma weights — what PIL's convert("L") uses (L = R*299/1000
# + G*587/1000 + B*114/1000), so builtin and PIL grayscales agree to
# rounding on the same pixels.
_LUMA = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def sniff(blob: bytes) -> str | None:
    """Magic-byte format sniff: 'bmp' | 'pnm' | 'wav' | None. Length
    guards are per-format minima (a 2x2 P5 is only 15 bytes), so a
    sniffed blob always has enough header for its decoder to start."""
    if blob is None or len(blob) < 8:
        return None
    if blob[:2] == b"BM" and len(blob) >= 54:  # 14 + BITMAPINFOHEADER
        return "bmp"
    if blob[:2] in (b"P5", b"P6") and blob[2:3] in (b" ", b"\t", b"\r", b"\n"):
        return "pnm"
    if len(blob) >= 44 and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------------------
# images
# ---------------------------------------------------------------------------


def decode_bmp(blob: bytes) -> np.ndarray:
    """BI_RGB 24/32-bpp BMP → (h, w, 3) float32 RGB in [0, 1]."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size} (need BITMAPINFOHEADER+)")
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression} (only BI_RGB)")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bpp {bpp} (only 24/32)")
    if w <= 0 or h_raw == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    h = abs(h_raw)
    nch = bpp // 8
    stride = ((w * nch + 3) // 4) * 4  # rows pad to 4 bytes
    need = data_off + stride * h
    if len(blob) < need:
        raise ValueError(f"truncated BMP: {len(blob)} bytes, need {need}")
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=data_off)
    px = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if h_raw > 0:  # bottom-up storage (the common case)
        px = px[::-1]
    bgr = px[:, :, :3].astype(np.float32) / 255.0
    return bgr[:, :, ::-1]  # BGR → RGB


def decode_pnm(blob: bytes) -> np.ndarray:
    """Binary netpbm P5 (gray) / P6 (RGB), maxval ≤ 255 →
    (h, w, 3) float32 RGB in [0, 1] (gray broadcast to 3 channels)."""
    magic = blob[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM (P5/P6)")
    # header = magic + 3 ints (w h maxval), '#' comments legal between
    # tokens, single whitespace after maxval then raw samples
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos : pos + 1] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported PNM maxval {maxval} (only 1..255)")
    nch = 1 if magic == b"P5" else 3
    need = w * h * nch
    if len(blob) - pos < need:
        raise ValueError(f"truncated PNM: {len(blob) - pos} sample bytes, need {need}")
    px = np.frombuffer(blob, dtype=np.uint8, count=need, offset=pos)
    arr = px.reshape(h, w, nch).astype(np.float32) / float(maxval)
    if nch == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def decode_image_builtin(blob: bytes) -> np.ndarray:
    """Sniff + decode → (h, w, 3) float32 RGB in [0, 1]."""
    kind = sniff(blob)
    if kind == "bmp":
        return decode_bmp(blob)
    if kind == "pnm":
        return decode_pnm(blob)
    raise ValueError("builtin image decode: not an uncompressed BMP/PGM/PPM blob")


def to_luma(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB → (h, w) BT.601 luma, same scale as the input."""
    return rgb @ _LUMA


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of a (h, w[, c]) array to (out_h, out_w[, c])
    — pure index math, any size ratio (PIL-compatible center sampling:
    src = floor((i + 0.5) * in/out))."""
    h, w = arr.shape[:2]
    ri = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    ci = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return arr[ri][:, ci]


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM (u8 / s16 / s32) → (mono float32 in [-1, 1], rate).

    Walks the chunk list (fmt may be followed by LIST/fact/etc. before
    data), averages channels to mono — the same mono-ization the
    soundfile-backed path applies."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                # keep the module's ValueError contract — struct.error
                # here would escape the fallback callers catch
                raise ValueError("WAV fmt chunk shorter than 16 bytes")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format tag {audio_format} (only PCM=1)")
    if n_channels < 1:
        raise ValueError("WAV with zero channels")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        raw = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif bits == 32:
        raw = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits} (only 8/16/32)")
    n_frames = len(raw) // n_channels
    wav = raw[: n_frames * n_channels].reshape(n_frames, n_channels)
    return wav.mean(axis=1).astype(np.float32), sample_rate


# ---------------------------------------------------------------------------
# video — uncompressed-DIB AVI (RIFF 'AVI ' container, BI_RGB '00db'
# frames: the same row layout as BMP, one chunk per frame)
# ---------------------------------------------------------------------------


def sniff_video(blob: bytes) -> str | None:
    """'avi' for a RIFF/AVI container, else None (kept separate from
    `sniff` so an AVI never routes to the image/audio decoders)."""
    if blob is None or len(blob) < 64:
        return None
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        return "avi"
    return None


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Yield (chunk_id, body) over a RIFF chunk run; LIST chunks yield
    (b'LIST:<type>', inner body) so callers can descend."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body_start = pos + 8
        body_end = min(body_start + size, end)
        if cid == b"LIST" and size >= 4:
            yield b"LIST:" + buf[body_start : body_start + 4], (body_start + 4, body_end)
        else:
            yield cid, (body_start, body_end)
        pos = body_start + size + (size & 1)


def decode_avi(blob: bytes) -> tuple[list[np.ndarray], int, int]:
    """Uncompressed-DIB AVI → (frames as (h, w, 3) uint8 RGB top-down,
    width, height). Only BI_RGB 24-bpp '00db'/'00dc' frames; the stream
    format comes from the first 'strf' BITMAPINFOHEADER."""
    if sniff_video(blob) != "avi":
        raise ValueError("not a RIFF/AVI blob")
    strf = None
    frame_spans: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal strf
        for cid, (s, e) in _riff_chunks(blob, pos, end):
            if cid.startswith(b"LIST:"):
                walk(s, e)
            elif cid == b"strf" and strf is None:
                strf = blob[s:e]
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                frame_spans.append((s, e))

    walk(12, len(blob))
    if strf is None or len(strf) < 40:
        raise ValueError("AVI missing a BITMAPINFOHEADER 'strf' chunk")
    w, h_raw = struct.unpack_from("<ii", strf, 4)
    bpp = struct.unpack_from("<H", strf, 14)[0]
    compression = struct.unpack_from("<I", strf, 16)[0]
    if compression != 0 or bpp != 24:
        raise ValueError(f"unsupported AVI stream (bpp={bpp}, compression={compression})")
    h = abs(h_raw)
    stride = ((w * 3 + 3) // 4) * 4
    frames = []
    for s, e in frame_spans:
        if e - s < stride * h:
            raise ValueError(f"truncated AVI frame: {e - s} bytes, need {stride * h}")
        rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=s)
        px = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if h_raw > 0:  # bottom-up rows, like BMP
            px = px[::-1]
        frames.append(px[:, :, ::-1].copy())  # BGR → RGB
    return frames, w, h


# ---------------------------------------------------------------------------
# encoders (test fixtures / deterministic datagen of REAL blobs)
# ---------------------------------------------------------------------------


def encode_avi_dib(frames: "list[np.ndarray]", fps: int = 10) -> bytes:
    """(h, w, 3) uint8 RGB frames → minimal uncompressed-DIB AVI bytes
    (RIFF 'AVI ' with hdrl avih/strh/strf + movi '00db' chunks)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    stride = ((w * 3 + 3) // 4) * 4
    bodies = []
    for f in frames:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
        bodies.append(rows.tobytes())
    frame_size = stride * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII", 1_000_000 // fps, frame_size * fps, 0, 0x10,
        len(frames), 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), frame_size, 0, 0, 0)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", b) for b in bodies))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_bmp24(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → BI_RGB 24-bpp bottom-up BMP bytes."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    body = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def encode_pnm(arr: np.ndarray, gray: bool = False) -> bytes:
    """uint8 (h, w, 3) → P6, or (h, w) → P5 when ``gray``."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    magic = b"P5" if gray else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int, n_channels: int = 1) -> bytes:
    """float32 [-1, 1] (n,) mono or (n, ch) → 16-bit PCM WAV bytes."""
    x = np.asarray(samples, dtype=np.float32)
    if x.ndim == 1:
        x = x[:, None]
    n_channels = x.shape[1]
    pcm = np.clip(np.rint(x * 32768.0), -32768, 32767).astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_channels, sample_rate,
                                byte_rate, n_channels * 2, 16)
        + b"data" + struct.pack("<I", len(pcm))
    )
    return hdr + pcm
