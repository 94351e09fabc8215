"""Pure-stdlib media codecs for the multimodal operators.

The container ships no PIL/imageio/opencv (probed 2026-08-14: all absent),
but REAL decode is still possible for two formats whose specs need nothing
beyond the standard library:

* PNG — zlib-compressed filtered scanlines (RFC 2083 / W3C PNG spec):
  :func:`decode_png` inflates the IDAT stream and reverses all five scanline
  filters for 8-bit greyscale/RGB/grey+alpha/RGBA, non-interlaced images;
  :func:`encode_png` writes the same subset (filter 0 rows). Together they
  give the Spark layer a true decode→transform→re-encode path.
* WAV — RIFF PCM via the stdlib ``wave`` module: :func:`decode_wav` returns
  the sample array plus rate/channels/width.

These are correctness-first reference codecs for the ``mapInPandas`` decode
stage (fixtures, tests, small media): a production deployment swaps in
libpng/ffmpeg behind the same function signatures. Filters 1/3/4 reverse
byte-serially (the spec's data dependency), so throughput is bounded by
Python — that's a per-image constant, not a Spark plan concern.

No code here is derived from the reference repo (it contains no media
handling at all); the formats are public specifications.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type → channel count (spec §11.2.2). Palette (3) needs a PLTE
# lookup pass — not implemented; raise rather than guess.
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Supports the 8-bit, non-interlaced subset (color types 0/2/4/6) with
    full filter reversal (None/Sub/Up/Average/Paeth). Raises ``ValueError``
    on a non-PNG payload and ``NotImplementedError`` outside the subset.
    """
    if not payload or not payload.startswith(PNG_MAGIC):
        raise ValueError("payload is not a PNG (bad signature)")
    pos, ihdr, idat = len(PNG_MAGIC), None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + payload + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR chunk")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG subset is 8-bit non-interlaced color types 0/2/4/6; got "
            f"bit_depth={bit_depth} color_type={color_type} interlace={interlace}"
        )
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline data has the wrong length")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        )
        if f == 0:  # None
            cur = line.copy()
        elif f == 2:  # Up (uint8 addition wraps mod 256 — the spec's math)
            cur = line + prev
        elif f in (1, 3, 4):  # Sub/Average/Paeth: serial left-dependency
            cur_b = bytearray(line.tobytes())
            pv = prev
            for i in range(stride):
                a = cur_b[i - ch] if i >= ch else 0  # left
                b = int(pv[i])  # up
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(pv[i - ch]) if i >= ch else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur_b[i] = (cur_b[i] + pred) & 0xFF
            cur = np.frombuffer(bytes(cur_b), dtype=np.uint8)
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (H, W) or (H, W, C) with C in {1,2,3,4} → PNG bytes
    (8-bit, non-interlaced, filter-0 scanlines) — decodable by any PNG
    reader, including :func:`decode_png`."""
    a = np.ascontiguousarray(np.atleast_3d(np.asarray(arr, dtype=np.uint8)))
    height, width, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(height))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W, C) uint8 array — the classic
    index-mapping form: output pixel (x, y) reads input
    (floor(x·W_in/W_out), floor(y·H_in/H_out))."""
    h_in, w_in = img.shape[:2]
    ys = np.minimum((np.arange(height) * h_in) // height, h_in - 1).astype(np.intp)
    xs = np.minimum((np.arange(width) * w_in) // width, w_in - 1).astype(np.intp)
    return img[ys][:, xs]


def luma(img: np.ndarray) -> float:
    """Mean luminance in [0, 1]: Rec.601 weights over RGB for 3/4-channel
    images, the grey channel for 1/2-channel (alpha never contributes)."""
    a = img.astype(np.float64)
    if img.shape[2] >= 3:
        y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    else:
        y = a[..., 0]
    return float(y.mean() / 255.0)


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE PCM bytes → dict(sample_rate, n_channels, n_frames,
    sample_width, duration_s, rms) via the stdlib ``wave`` reader.

    ``rms`` is the root-mean-square amplitude normalized to [0, 1]
    (computed in numpy — no deprecated ``audioop``). 8-bit WAV is unsigned
    with a 128 midpoint; 16/32-bit are signed little-endian.
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch = w.getframerate(), w.getnchannels()
        nframes, width = w.getnframes(), w.getsampwidth()
        frames = w.readframes(nframes)
    if width == 1:
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        full = 128.0
    elif width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        full = 32768.0
    elif width == 4:
        samples = np.frombuffer(frames, dtype="<i4").astype(np.float64)
        full = 2147483648.0
    else:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    rms = float(np.sqrt(((samples / full) ** 2).mean())) if samples.size else 0.0
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_frames": nframes,
        "sample_width": width,
        "duration_s": nframes / float(rate) if rate else 0.0,
        "rms": rms,
    }


__all__ = [
    "PNG_MAGIC",
    "decode_png",
    "encode_png",
    "resize_nearest",
    "luma",
    "decode_wav",
]
