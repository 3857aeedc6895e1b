"""REAL multimodal codecs (stdlib+numpy WAV / BMP) — decoded-value
checks against byte-exact synthesized media, plus corrupt-blob
robustness (decode_ok=false rows, never task failures)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from gmall_spark.operators import multimodal as M


def make_wav(samples, rate=8000, n_ch=1, width=2) -> bytes:
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(n_ch)
    w.setsampwidth(width)
    w.setframerate(rate)
    fmt = {1: "B", 2: "h", 4: "i"}[width]
    w.writeframes(struct.pack(f"<{len(samples)}{fmt}", *samples))
    w.close()
    return buf.getvalue()


def make_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = b""
    for y in reversed(range(h)):
        row = pixels[y][:, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + rows


def test_wav_decode_exact_stats(spark):
    square = [1000, -1000] * 4000  # 1 s @ 8 kHz, RMS exactly 1000
    rows = [
        (1, make_wav(square)),
        (2, make_wav([128 + 50, 128 - 50] * 100, rate=4000, n_ch=2, width=1)),
        (3, b"not a wav at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    got = {r.doc_id: r for r in M.decode_wav(df).collect()}
    a = got[1]
    assert a.decode_ok and a.sample_rate == 8000 and a.n_channels == 1
    assert a.bit_depth == 16 and a.n_samples == 8000
    assert a.duration_ms == 1000.0 and a.rms == 1000.0 and a.peak == 1000
    b = got[2]  # 8-bit unsigned, centered at 128 -> |sample| = 50
    assert b.decode_ok and b.n_channels == 2 and b.bit_depth == 8
    assert b.n_samples == 100 and b.rms == 50.0 and b.peak == 50
    assert not got[3].decode_ok and got[3].sample_rate is None


def test_bmp_decode_exact_means_with_row_padding(spark):
    # width 3 -> 9-byte rows padded to 12: exercises the stride path
    solid = np.full((2, 3, 3), (10, 20, 30), dtype=np.uint8)
    grad = np.zeros((4, 8, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(8, dtype=np.uint8) * 30  # R ramps by column
    rows = [(1, make_bmp(solid)), (2, make_bmp(grad)), (3, b"BMbogus")]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    got = {r.doc_id: r for r in M.decode_bmp(df).collect()}
    a = got[1]
    assert a.decode_ok and (a.width, a.height, a.bpp) == (3, 2, 24)
    assert (a.mean_r, a.mean_g, a.mean_b) == (10.0, 20.0, 30.0)
    b = got[2]
    assert b.decode_ok and (b.width, b.height) == (8, 4)
    assert b.mean_r == float(np.mean(np.arange(8) * 30))
    assert not got[3].decode_ok


def test_bmp_resize_real_is_deterministic_and_content_sensitive(spark):
    img1 = np.zeros((4, 8, 3), dtype=np.uint8)
    img1[:, :, 1] = 200
    img2 = img1.copy()
    img2[0, 0, 1] = 0  # pixel kept by nearest-neighbor (index 0 maps to 0)
    rows = [(1, make_bmp(img1)), (2, make_bmp(img2)), (1000, make_bmp(img1))]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    got = {r.doc_id: r for r in M.resize_bmp_real(df, target_w=4).collect()}
    a = got[1]
    assert a.decode_ok and (a.src_width, a.src_height) == (8, 4)
    assert (a.out_width, a.out_height) == (4, 2)
    assert a.resized_sha256 == got[1000].resized_sha256  # same bytes, same hash
    assert a.resized_sha256 != got[2].resized_sha256  # content-sensitive
