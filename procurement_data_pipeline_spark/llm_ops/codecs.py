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
    "GIF_MAGICS",
    "decode_gif",
    "encode_gif",
]


GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW (spec appendix F): variable-width codes read
    LSB-first, CLEAR resets the dictionary, widths grow at 2^w up to 12
    bits. Handles the KwKwK case (code == next unassigned entry)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    acc = nbits = 0

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                continue
            if code == end:
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError(f"corrupt GIF LZW stream (code {code})")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return bytes(out)
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → uint8 RGB array (height, width, 3) of the FIRST frame.

    Full LZW decompression plus global/local color-table lookup for
    non-interlaced frames (GIF87a/89a); extensions are skipped, later
    frames ignored, interlace raises ``NotImplementedError``. Raises
    ``ValueError`` on a non-GIF payload.
    """
    if not payload or payload[:6] not in GIF_MAGICS:
        raise ValueError("payload is not a GIF (bad signature)")
    try:
        return _decode_gif_inner(payload)
    except (IndexError, struct.error) as exc:
        # a payload cut off mid-block walks past the end — that is a
        # corrupt GIF, classified as the documented ValueError, never an
        # unhandled IndexError escaping the decode worker
        raise ValueError(f"truncated or corrupt GIF payload: {exc}") from None


def _decode_gif_inner(payload: bytes) -> np.ndarray:
    _sw, _sh, flags, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    global_ct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label byte then sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _lx, _ly, w, h, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
            pos += 10
            ct = global_ct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF frames not supported")
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(lzw), min_code_size, w * h), np.uint8
            )
            if idx.size < w * h:
                raise ValueError("GIF pixel data ended early")
            idx = idx[: w * h]
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("GIF pixel index outside the color table")
            return ct[idx].reshape(h, w, 3)
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def encode_gif(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Index array (H, W) + palette (N, 3) → single-frame GIF89a bytes.

    Emits literal LZW codes with spec-correct width growth and a CLEAR
    whenever the next width step would be needed — valid output any
    decoder accepts, ~0% compression (a fixture/test encoder, mirroring
    encode_png's role for the decode→transform→re-encode path)."""
    h, w = idx.shape
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (N<=256, 3)")
    if idx.max(initial=0) >= len(palette):
        raise ValueError("index out of palette range")
    bits = max(2, int(len(palette) - 1).bit_length())
    n = 1 << bits
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(bits)  # LZW min code size
    clear, end = n, n + 1
    # One initial CLEAR, then every pixel as a literal code, then END.
    # Code width mirrors the decoder's table growth exactly: the decoder
    # appends one entry per data code AFTER the first since a clear, and
    # widens when the table reaches 2^width (capped at 12 bits — a full
    # table just stops growing, and literal codes stay < clear, so the
    # stream remains valid at any length with no further clears).
    acc = nbits = 0
    packed = bytearray()
    width = bits + 1
    size = clear + 2
    first = True

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for px in idx.reshape(-1).tolist():
        emit(int(px))
        if first:
            first = False
        elif size < 4096:
            size += 1
            if size == (1 << width) and width < 12:
                width += 1
    emit(end)
    if nbits:
        packed.append(acc & 0xFF)
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
