"""Unit tests for the stdlib media codecs (no Spark session needed).

The PNG decoder is checked two ways: encode→decode roundtrips (filter-0
scanlines) and a handcrafted IDAT stream exercising ALL FIVE scanline
filters against an independent straight-from-spec reference unfilter.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from procurement_data_pipeline_spark.llm_ops.codecs import (
    PNG_MAGIC,
    decode_png,
    decode_wav,
    encode_png,
    luma,
    resize_nearest,
)


def test_png_roundtrip_all_channel_counts():
    rng = np.random.default_rng(0)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, (13, 7, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img), ch
    # 2-D grayscale input is accepted
    g = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g))[..., 0], g)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def test_png_all_five_filters_match_spec_reference():
    """Craft one scanline per filter type (0..4) and compare the decoder
    against an independent per-byte implementation of the spec recurrences."""
    rng = np.random.default_rng(1)
    w, h, ch = 6, 5, 3

    def ref_unfilter(raws):
        out, prev = [], [0] * (w * ch)
        for f, line in raws:
            cur = list(line)
            for i in range(w * ch):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
            out.append(cur)
            prev = cur
        return np.array(out, dtype=np.uint8).reshape(h, w, ch)

    raws = [
        (f, bytes(rng.integers(0, 256, w * ch, dtype=np.uint8)))
        for f in (0, 1, 2, 3, 4)
    ]
    stream = b"".join(bytes([f]) + line for f, line in raws)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(stream))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), ref_unfilter(raws))


def test_png_rejects_out_of_subset():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF not a png")
    # 16-bit depth is outside the subset
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(png)


def test_resize_nearest_exact_mapping():
    img = np.zeros((4, 4, 1), dtype=np.uint8)
    img[:, 2:] = 255
    small = resize_nearest(img, 2, 2)
    assert small[0, 0, 0] == 0 and small[0, 1, 0] == 255
    assert np.array_equal(resize_nearest(small, 4, 4), img)


def test_luma_weights():
    assert luma(np.full((2, 2, 3), 255, np.uint8)) == pytest.approx(1.0)
    red = np.zeros((1, 1, 3), np.uint8)
    red[..., 0] = 255
    assert luma(red) == pytest.approx(0.299)
    grey = np.full((3, 3, 1), 128, np.uint8)
    assert luma(grey) == pytest.approx(128 / 255)


def test_wav_decode_sine_rms():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        t = np.arange(16000 * 2)
        wv.writeframes(
            (np.sin(2 * np.pi * 440 * t / 16000) * 16384).astype("<i2").tobytes()
        )
    info = decode_wav(buf.getvalue())
    assert info["sample_rate"] == 16000
    assert info["n_channels"] == 2
    assert info["duration_s"] == pytest.approx(1.0)
    assert info["rms"] == pytest.approx(0.5 / 2**0.5, abs=0.01)


def test_wav_8bit_unsigned_midpoint():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(1)
        wv.setframerate(8000)
        wv.writeframes(bytes([128] * 100))  # silence at the unsigned midpoint
    assert decode_wav(buf.getvalue())["rms"] == pytest.approx(0.0)


def test_gif_roundtrip_and_width_growth():
    """encode_gif → decode_gif across palette sizes, including one large
    enough that the LZW code width must grow past its minimum."""
    import numpy as np

    from procurement_data_pipeline_spark.llm_ops.codecs import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(7)
    for h, w, ncol in [(1, 5, 4), (8, 8, 16), (30, 40, 256), (3, 3, 3)]:
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, (h, w), dtype=np.uint8)
        img = decode_gif(encode_gif(idx, pal))
        assert img.shape == (h, w, 3)
        assert (img == pal[idx]).all()


def test_gif_decodes_real_lzw_compression():
    """A hand-packed stream exercising REAL compression: pixels 1,1,1,1,1
    with min code size 2 encode (per the spec's algorithm) to codes
    [CLEAR, 1, 6, 6, END] where 6 is a dictionary entry emitted through
    the KwKwK case and END lands after a width growth — packed LSB-first
    that is bytes 8C 5D. Proves the decoder handles compressed input, not
    just our literal-code encoder."""
    import struct

    import numpy as np

    from procurement_data_pipeline_spark.llm_ops.codecs import (
        _gif_lzw_decode,
        decode_gif,
    )

    assert list(_gif_lzw_decode(bytes([0x8C, 0x5D]), 2, 5)) == [1, 1, 1, 1, 1]
    pal = bytes([0, 0, 0, 10, 20, 30, 0, 0, 0, 0, 0, 0])
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 5, 1, 0x81, 0, 0)
        + pal
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 5, 1, 0)
        + bytes([2])
        + bytes([2, 0x8C, 0x5D, 0])
        + b"\x3b"
    )
    img = decode_gif(gif)
    assert img.shape == (1, 5, 3)
    assert (img == np.array([10, 20, 30], dtype=np.uint8)).all()


def test_gif_rejects_out_of_subset():
    import struct

    import numpy as np
    import pytest

    from procurement_data_pipeline_spark.llm_ops.codecs import (
        decode_gif,
        encode_gif,
    )

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    pal = np.zeros((4, 3), dtype=np.uint8)
    gif = bytearray(encode_gif(np.zeros((2, 2), dtype=np.uint8), pal))
    # flip the interlace flag in the image descriptor (after 6+7+12 header
    # bytes: block id + 8 geometry bytes, flags at offset +9)
    gif[6 + 7 + 12 + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(gif))
