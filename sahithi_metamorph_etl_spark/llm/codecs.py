"""Real (library-free) image codecs for the multimodal operators.

The container ships no PIL/OpenCV/ffmpeg, so this module implements the
decode path directly from the public file-format specs using only the
stdlib (``zlib``, ``struct``) and numpy:

- PNG  — full pixel decode (8-bit gray / gray+alpha / RGB / RGBA,
  non-interlaced; all five scanline filters per the PNG spec) and a
  filter-0 encoder for the resize write-back path.
- BMP  — full pixel decode (uncompressed 24/32-bit BITMAPINFOHEADER).
- JPEG — header decode (width/height/channels from the SOF segment;
  pixel-level JPEG entropy decode genuinely needs a codec library and
  raises ``UnsupportedImageError`` rather than faking it).
- GIF  — header decode (logical screen descriptor).

If PIL is importable (not in this container, but in a production image)
it is preferred automatically for both decode and resize; everything
here is the self-contained fallback. All functions are plain
bytes/ndarray transforms so they can run inside Arrow-batched
``mapInPandas`` closures (multimodal.py) without shipping module state
to executors — import this module INSIDE the closure.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedImageError(ValueError):
    """Payload is a recognized image format but outside the subset this
    library-free codec implements (e.g. interlaced/palette/16-bit PNG,
    JPEG pixel decode). Callers should treat it as 'needs a real codec
    library', distinct from 'not an image at all'."""


def sniff_format(payload: bytes) -> str | None:
    """Identify an image payload by magic bytes; None if not an image.

    The BMP check also requires the header's reserved word (bytes 6-10)
    to be zero, as the spec mandates — plain text starting with "BM"
    ("BMW…", "BMI…") must not be mistaken for an image. The GIF check
    similarly requires nonzero screen dimensions and the mandatory
    trailer byte (0x3B) after the header, so prose that happens to open
    with "GIF89a " does not sniff as an image."""
    if payload.startswith(_PNG_SIG):
        return "png"
    if payload.startswith(b"BM") and len(payload) >= 26 and payload[6:10] == b"\x00\x00\x00\x00":
        return "bmp"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 14:
        w, h = struct.unpack("<HH", payload[6:10])
        if w > 0 and h > 0 and b"\x3b" in payload[13:]:
            return "gif"
    return None


# ---------------------------------------------------------------- PNG


def _png_chunks(payload: bytes):
    pos = len(_PNG_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IEND":
            return


def png_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR without decompressing pixels."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            if color == 3:
                return w, h, 3  # palette expands to RGB
            return w, h, _PNG_CHANNELS.get(color, 0)
    raise ValueError("PNG payload has no IHDR chunk")


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering. ``raw`` is the decompressed stream:
    ``height`` rows of (1 filter byte + ``stride`` data bytes). Filters
    0 (None), 1 (Sub), 2 (Up) vectorize; 3 (Average) and 4 (Paeth) have
    a left-dependency and fall back to a per-byte loop on those rows
    (rare in practice — most encoders emit 0/1/2 for small images)."""
    rows = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint16)
    for y in range(height):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.uint16)
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint16)
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            # per-lane cumulative sum mod 256 (lane = byte position mod bpp)
            for lane in range(bpp):
                out[y, lane::bpp] = np.cumsum(line[lane::bpp]) % 256
        elif ftype == 2:  # Up
            out[y] = (line + prev) % 256
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (line[x] + (int(left) + int(prev[x])) // 2) % 256
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[y, x] = (line[x] + pred) % 256
        else:
            raise UnsupportedImageError(f"unknown PNG filter type {ftype}")
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array. 8-bit depth, color types
    0/2/4/6, non-interlaced (the overwhelmingly common subset)."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            if depth != 8:
                raise UnsupportedImageError(f"PNG bit depth {depth} (only 8 supported)")
            if color not in _PNG_CHANNELS:
                raise UnsupportedImageError(f"PNG color type {color} (palette needs PLTE expansion)")
            if interlace != 0:
                raise UnsupportedImageError("interlaced PNG not supported")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None or not idat:
        raise ValueError("PNG payload missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if raw.size != height * (stride + 1):
        raise UnsupportedImageError(
            f"unexpected PNG stream size {raw.size} for {width}x{height}x{channels}"
        )
    return _unfilter(raw, height, stride, bpp=channels).reshape(height, width, channels)


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W, C) or (H, W) uint8 array -> PNG bytes (filter 0, 8-bit).
    Round-trips through :func:`decode_png` losslessly."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"cannot encode {c}-channel pixels as PNG")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * c)], axis=1
    )
    idat = zlib.compress(scanlines.tobytes(), 6)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


# ---------------------------------------------------------------- BMP


def bmp_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from a BITMAPINFOHEADER BMP."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    return width, abs(height), bpp // 8


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, C) uint8 (uncompressed 24/32-bit, BGR->RGB)."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedImageError(f"BMP bpp={bpp} compression={compression} not supported")
    c = bpp // 8
    bottom_up = height > 0
    height = abs(height)
    row_bytes = ((bpp * width + 31) // 32) * 4  # rows pad to 4 bytes
    raw = np.frombuffer(payload, dtype=np.uint8, count=height * row_bytes, offset=data_offset)
    rows = raw.reshape(height, row_bytes)[:, : width * c].reshape(height, width, c)
    if bottom_up:
        rows = rows[::-1]
    # BGR(A) -> RGB(A)
    order = [2, 1, 0] + ([3] if c == 4 else [])
    return np.ascontiguousarray(rows[:, :, order])


# --------------------------------------------------------- JPEG / GIF


def jpeg_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the JPEG SOF segment — a real
    header parse (marker walk), no pixel decode."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (spec-permitted)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0..SOF3
            _prec, h, w, ncomp = struct.unpack(">BHHB", payload[pos + 4 : pos + 10])
            return w, h, ncomp
        pos += 2 + seg_len
    raise ValueError("JPEG payload has no SOF segment")


def gif_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the GIF logical screen descriptor."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", payload[6:10])
    return w, h, 3


# ------------------------------------------------------------ facade


def image_stats(payload: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) for any recognized image payload, or
    None when the payload is not an image at all. Prefers PIL when the
    environment has it; otherwise the format parsers above. Raises
    ``UnsupportedImageError`` for recognized-but-unsupported variants."""
    fmt = sniff_format(payload)
    if fmt is None:
        return None
    try:  # PIL is absent in this container; first choice when present
        from PIL import Image  # type: ignore
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands())
    except ImportError:
        pass
    if fmt == "png":
        return png_header(payload)
    if fmt == "bmp":
        return bmp_header(payload)
    if fmt == "jpeg":
        return jpeg_header(payload)
    return gif_header(payload)


def decode_image(payload: bytes) -> np.ndarray:
    """Pixel decode for any supported image payload -> (H, W, C) uint8.
    PNG and BMP decode here without any library; JPEG/GIF pixel decode
    requires a codec library (PIL path) and otherwise raises
    ``UnsupportedImageError`` — never fake pixels."""
    fmt = sniff_format(payload)
    if fmt is None:
        raise ValueError("payload is not a recognized image format")
    try:
        from PIL import Image  # type: ignore
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im)
    except ImportError:
        pass
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise UnsupportedImageError(f"{fmt} pixel decode requires a codec library (PIL)")


def module_source() -> str:
    """This module's full source text, for shipping INTO Arrow-batch
    closures by value: executor Python workers don't share the driver's
    ``sys.path``, so a ``mapInPandas`` closure cannot assume this
    package is importable worker-side. Call sites capture the returned
    string in the closure and ``exec`` it there — the closure stays
    fully self-contained (the repo-wide UDF rule) while this file stays
    the single source of truth for the codec."""
    import inspect
    import sys

    return inspect.getsource(sys.modules[__name__])


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — deterministic
    (pure index arithmetic), the library-free core of the image resize
    stage. Matches the standard sample-point convention
    ``src = floor((dst + 0.5) * src_size / dst_size)``."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("output dimensions must be positive")
    h, w = pixels.shape[:2]
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return pixels[ys][:, xs]
