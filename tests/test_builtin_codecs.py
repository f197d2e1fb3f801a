"""Golden tests for the pure-numpy builtin codecs (operators/codecs.py)
and their seam wiring in operators/multimodal.py.

The builtin backend is a TRUE decode of uncompressed formats — so these
tests assert exact pixel/sample values on encoder round-trips and
hand-assembled byte layouts (BMP row padding + bottom-up order, PNM
header comments, WAV chunk walk), then drive the full Spark operators
(`decode_image`/`decode_audio`) with backend="builtin" and with the
auto-sniff path mixing real and non-media blobs in one batch.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mimirsbrunn_spark.operators import codecs
from mimirsbrunn_spark.operators.multimodal import (
    audio_decoder,
    decode_audio,
    decode_image,
    image_decoder,
)

# ---------------------------------------------------------------------------
# codec unit goldens
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_exact():
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3) * 10
    blob = codecs.encode_bmp24(rgb)
    assert codecs.sniff(blob) == "bmp"
    dec = codecs.decode_bmp(blob)
    assert dec.shape == (2, 3, 3)
    np.testing.assert_allclose(dec, rgb.astype(np.float32) / 255.0, atol=0)


def test_bmp_row_padding_and_bottom_up():
    """w=1 forces 1 padding byte per 3-byte row; bottom-up means the first
    stored row is the LAST image row."""
    rgb = np.array([[[255, 0, 0]], [[0, 0, 255]]], dtype=np.uint8)  # red over blue
    blob = codecs.encode_bmp24(rgb)
    stride = 4  # 3 bytes BGR + 1 pad
    data_off = struct.unpack_from("<I", blob, 10)[0]
    # first stored row = bottom image row = blue = BGR (255, 0, 0)
    assert blob[data_off : data_off + 3] == bytes([255, 0, 0])
    assert len(blob) == data_off + stride * 2
    dec = codecs.decode_bmp(blob)
    np.testing.assert_allclose(dec[0, 0], [1.0, 0.0, 0.0])  # red back on top
    np.testing.assert_allclose(dec[1, 0], [0.0, 0.0, 1.0])


def test_bmp_top_down_negative_height():
    rgb = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
    blob = bytearray(codecs.encode_bmp24(rgb))
    h = struct.unpack_from("<i", blob, 22)[0]
    struct.pack_into("<i", blob, 22, -h)  # declare top-down
    dec_td = codecs.decode_bmp(bytes(blob))
    # a 1-row image is identical either way
    np.testing.assert_allclose(dec_td, rgb.astype(np.float32) / 255.0)


def test_bmp_rejects_compressed_and_truncated():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = bytearray(codecs.encode_bmp24(rgb))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        codecs.decode_bmp(bytes(blob))
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_bmp(codecs.encode_bmp24(rgb)[:-3])


def test_pnm_p6_and_p5_with_comment():
    rgb = np.arange(12, dtype=np.uint8).reshape(2, 2, 3) * 20
    p6 = codecs.encode_pnm(rgb)
    assert codecs.sniff(p6) == "pnm"
    np.testing.assert_allclose(codecs.decode_pnm(p6), rgb.astype(np.float32) / 255.0)
    # P5 grayscale broadcast to 3 channels; header comment is legal
    gray = np.array([[0, 128], [255, 64]], dtype=np.uint8)
    p5 = b"P5\n# a comment\n2 2\n255\n" + gray.tobytes()
    dec = codecs.decode_pnm(p5)
    assert dec.shape == (2, 2, 3)
    np.testing.assert_allclose(dec[:, :, 0], gray.astype(np.float32) / 255.0)
    np.testing.assert_allclose(dec[:, :, 0], dec[:, :, 1])


def test_wav_pcm16_roundtrip_and_mono_mean():
    x = np.array([0.0, 0.5, -0.5, 0.999], dtype=np.float32)
    blob = codecs.encode_wav_pcm16(x, 8000)
    assert codecs.sniff(blob) == "wav"
    wav, sr = codecs.decode_wav(blob)
    assert sr == 8000
    np.testing.assert_allclose(wav, x, atol=1.0 / 32768.0)
    # stereo: decode averages channels
    st = np.stack([x, -x], axis=1)
    wav2, _ = codecs.decode_wav(codecs.encode_wav_pcm16(st, 8000))
    np.testing.assert_allclose(wav2, np.zeros(4), atol=1.0 / 32768.0)


def test_wav_chunk_walk_skips_extra_chunks():
    x = np.array([0.25, -0.25], dtype=np.float32)
    blob = codecs.encode_wav_pcm16(x, 16000)
    # splice a LIST chunk (odd size → padded) between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    wav, sr = codecs.decode_wav(spliced)
    assert sr == 16000
    np.testing.assert_allclose(wav, x, atol=1.0 / 32768.0)


def test_wav_rejects_non_pcm():
    blob = bytearray(codecs.encode_wav_pcm16(np.zeros(4, dtype=np.float32), 8000))
    struct.pack_into("<H", blob, 20, 3)  # IEEE float tag
    with pytest.raises(ValueError, match="format tag"):
        codecs.decode_wav(bytes(blob))


def test_resize_nearest_center_sampling():
    arr = np.arange(16, dtype=np.float32).reshape(4, 4)
    small = codecs.resize_nearest(arr, 2, 2)
    # centers of 2x2 blocks land on indices 1 and 3
    np.testing.assert_allclose(small, [[5.0, 7.0], [13.0, 15.0]])
    # upsample keeps exact source values
    big = codecs.resize_nearest(small, 4, 2)
    np.testing.assert_allclose(big, [[5, 5, 7, 7], [13, 13, 15, 15]])


def test_sniff_rejects_short_and_junk():
    assert codecs.sniff(None) is None
    assert codecs.sniff(b"BM") is None  # too short
    assert codecs.sniff(b"x" * 64) is None
    assert codecs.sniff(b"P6junk-no-whitespace" + b"\x00" * 16) is None


# ---------------------------------------------------------------------------
# decoder-closure seam goldens (no Spark needed)
# ---------------------------------------------------------------------------


def test_image_decoder_builtin_luma_and_resize():
    # 2x2 pure-channel image: BT.601 luma of red/green/blue/white
    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    dec = image_decoder(2, 2, backend="builtin")
    px = np.array(dec(codecs.encode_bmp24(rgb)), dtype=np.float32)
    np.testing.assert_allclose(px, [0.299, 0.587, 0.114, 1.0], atol=1e-6)
    with pytest.raises(ValueError, match="builtin image decode"):
        dec(b"not an image at all, just bytes")


def test_audio_decoder_builtin_resample_pad():
    x = np.array([0.5, -0.5, 0.5, -0.5], dtype=np.float32)
    blob = codecs.encode_wav_pcm16(x, 8000)
    dec = audio_decoder(sample_rate=8000, n=6, backend="builtin")
    wav = np.array(dec(blob), dtype=np.float32)
    np.testing.assert_allclose(wav[:4], x, atol=1.0 / 32768.0)
    np.testing.assert_allclose(wav[4:], [0.0, 0.0])  # zero-padded to n
    # resample 8k → 4k halves the sample count before padding
    dec2 = audio_decoder(sample_rate=4000, n=4, backend="builtin")
    wav2 = np.array(dec2(blob), dtype=np.float32)
    assert np.count_nonzero(wav2) <= 2 and len(wav2) == 4


def test_auto_sniffs_builtin_else_fake():
    """auto without any wheel: a real BMP decodes truly, junk bytes get
    the deterministic fake — in the same decoder closure."""
    rgb = np.full((2, 2, 3), 255, dtype=np.uint8)
    dec = image_decoder(2, 2, backend="auto", image_mod=None)
    assert np.allclose(dec(codecs.encode_bmp24(rgb)), 1.0)
    fake = dec(b"junk bytes that sniff as nothing")
    assert len(fake) == 4 and not np.allclose(fake, 1.0)
    a = audio_decoder(8000, 4, backend="auto", audio_mod=None)
    truly = a(codecs.encode_wav_pcm16(np.zeros(4, dtype=np.float32), 8000))
    np.testing.assert_allclose(truly, np.zeros(4), atol=1.0 / 32768.0)
    assert not np.allclose(a(b"junk bytes that sniff as nothing"), 0.0)


def test_strict_still_requires_the_wheel():
    with pytest.raises(NotImplementedError, match="PIL"):
        image_decoder(2, 2, backend="real", image_mod=None)


def test_avi_roundtrip_and_sampling():
    frames = [
        np.full((2, 2, 3), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50)
    ]
    frames[0][0, 0] = [255, 0, 0]  # make frame 0 asymmetric
    blob = codecs.encode_avi_dib(frames)
    assert codecs.sniff_video(blob) == "avi"
    assert codecs.sniff(blob) is None  # never routes to image/audio
    dec, w, h = codecs.decode_avi(blob)
    assert (w, h, len(dec)) == (2, 2, 5)
    for a, b in zip(dec, frames):
        np.testing.assert_array_equal(a, b)
    # the sampler seam: builtin keeps every_n-th frame with true indices
    from mimirsbrunn_spark.operators.multimodal import video_frame_sampler

    sampler = video_frame_sampler(every_n=2, backend="builtin")
    got = sampler(blob)
    assert [idx for idx, _ in got] == [0, 2, 4]
    assert got[1][1] == frames[2].tobytes()  # rgb24 top-down bytes
    with pytest.raises(ValueError, match="RIFF/AVI"):
        sampler(b"junk bytes that are not a container at all" * 4)
    # auto without the wheel: AVI truly decodes, junk takes the fake
    auto = video_frame_sampler(every_n=2, backend="auto", video_mod=None)
    assert auto(blob) == got
    fake = auto(b"junk bytes that are not a container at all" * 4)
    assert fake and len(fake[0][1]) == 32  # sha256-sized fake frame


def test_avi_rejects_compressed_stream():
    frames = [np.zeros((2, 2, 3), dtype=np.uint8)]
    blob = bytearray(codecs.encode_avi_dib(frames))
    i = blob.index(b"strf")
    struct.pack_into("<I", blob, i + 8 + 16, 0x30323449)  # 'I420' fourcc
    with pytest.raises(ValueError, match="unsupported AVI"):
        codecs.decode_avi(bytes(blob))


# ---------------------------------------------------------------------------
# full Spark operators over real blobs
# ---------------------------------------------------------------------------


def test_decode_image_builtin_through_spark(spark):
    from mimirsbrunn_spark.operators.multimodal import MEDIA_SCHEMA

    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    rgb[:2] = 255  # top half white, bottom half black
    rows = [
        ("img:bmp", "image", bytearray(codecs.encode_bmp24(rgb)), {"fmt": "bmp"}),
        ("img:ppm", "image", bytearray(codecs.encode_pnm(rgb)), {"fmt": "ppm"}),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["media_ref"]: r["pixels"]
        for r in decode_image(df, width=2, height=2, backend="builtin").collect()
    }
    for ref in ("img:bmp", "img:ppm"):
        np.testing.assert_allclose(got[ref], [1.0, 1.0, 0.0, 0.0], atol=1e-6)


def test_decode_audio_auto_mixed_batch_through_spark(spark):
    """One micro-batch mixing a REAL WAV and a ref-only row: the auto
    seam truly decodes the first and deterministically fakes the second."""
    from mimirsbrunn_spark.operators.multimodal import MEDIA_SCHEMA

    x = np.array([0.5, -0.5, 0.25, -0.25], dtype=np.float32)
    rows = [
        ("aud:real", "audio", bytearray(codecs.encode_wav_pcm16(x, 8000)), {}),
        ("aud:ref-only", "audio", None, {}),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["media_ref"]: np.array(r["waveform"], dtype=np.float32)
        for r in decode_audio(df, sample_rate=8000, seconds=4 / 8000).collect()
    }
    np.testing.assert_allclose(got["aud:real"], x, atol=1.0 / 32768.0)
    assert got["aud:ref-only"].shape == (4,)  # fake keeps the contract shape
    assert not np.allclose(got["aud:ref-only"], x, atol=1e-3)


def test_sample_video_frames_builtin_through_spark(spark):
    from mimirsbrunn_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_video_frames,
    )

    frames = [np.full((2, 2, 3), v, dtype=np.uint8) for v in (1, 2, 3)]
    rows = [("vid:avi", "video", bytearray(codecs.encode_avi_dib(frames)), {})]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = sorted(
        (r["frame_idx"], bytes(r["frame"]))
        for r in sample_video_frames(df, every_n=2, backend="builtin").collect()
    )
    assert [i for i, _ in got] == [0, 2]
    assert got[0][1] == frames[0].tobytes()
    assert got[1][1] == frames[2].tobytes()
