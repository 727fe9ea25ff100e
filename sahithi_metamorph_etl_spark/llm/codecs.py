"""Real (library-free) image codecs for the multimodal operators.

The container ships no PIL/OpenCV/ffmpeg, so this module implements the
decode path directly from the public file-format specs using only the
stdlib (``zlib``, ``struct``) and numpy:

- PNG  — full pixel decode (8-bit gray / gray+alpha / RGB / RGBA,
  non-interlaced; all five scanline filters per the PNG spec) and a
  filter-0 encoder for the resize write-back path.
- BMP  — full pixel decode (uncompressed 24/32-bit BITMAPINFOHEADER).
- JPEG — FULL pixel decode from spec for baseline sequential
  (SOF0/SOF1: DQT/DHT read from the stream, Huffman entropy decode,
  dequant, IDCT, 4:4:4/4:2:2/4:2:0 upsampling, YCbCr->RGB, DRI/RSTn)
  AND progressive (SOF2: T.81 Annex G spectral selection + successive
  approximation — DC/AC first and refinement scans, EOB runs,
  coefficient accumulation across scans). Encoders for both modes
  (Annex K tables; baseline 4:4:4/4:2:0, progressive 4:4:4 with a
  configurable successive-approximation depth) power the round-trip
  tests and the resize write-back path. Arithmetic coding and
  non-interleaved *sequential* multi-scan raise
  ``UnsupportedImageError`` rather than faking pixels.
- GIF  — first-frame FULL pixel decode from spec (variable-width LZW,
  global/local color tables, interlace, screen composition) and a
  single-frame GIF89a encoder (<=256-color input) for fixtures.

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


# ------------------------------------------------- baseline JPEG codec
#
# Full pixel decode for baseline sequential (SOF0/SOF1, Huffman) AND
# progressive (SOF2, Annex G) JPEG — together the two modes cover
# essentially every real-web Huffman JPEG — plus from-spec encoders for
# both, used by the round-trip tests and the resize write-back path.
# Arithmetic coding stays an honest UnsupportedImageError.
#
# Decoder correctness does NOT depend on this module's table constants:
# quantization and Huffman tables are read from the payload's own
# DQT/DHT segments, per spec. The Annex K constants below only shape
# what the ENCODER emits (and it emits them in its own DQT/DHT, so any
# spec-compliant decoder agrees).

# zigzag scan: _JPEG_ZIGZAG[i] = natural-order index of the i-th
# coefficient in zigzag order
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K quantization tables (quality-50 reference)
_JPEG_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_JPEG_Q_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int64,
).reshape(8, 8)

# Annex K Huffman table specs: (bits[1..16], values)
_JPEG_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_JPEG_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_JPEG_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_JPEG_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis M: forward F = M @ f @ M.T equals
    the T.81 FDCT normalization; inverse f = M.T @ F @ M."""
    x = np.arange(8, dtype=np.float64)
    u = np.arange(8, dtype=np.float64)[:, None]
    m = np.cos((2.0 * x + 1.0) * u * np.pi / 16.0) * np.sqrt(2.0 / 8.0)
    m[0] = np.sqrt(1.0 / 8.0)
    return m


def _jpeg_build_codes(bits, vals) -> dict:
    """Canonical Huffman codes per T.81 C.2: symbol -> (code, length)."""
    codes: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K base table (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((code >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:
            self.write(1, 1)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _jpeg_encode_block(
    writer: _JpegBitWriter,
    block: np.ndarray,
    qtable: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
    dct_m: np.ndarray,
) -> int:
    """FDCT + quantize + entropy-encode one level-shifted 8x8 block;
    returns the new DC predictor."""
    coef = dct_m @ block @ dct_m.T
    quant = np.round(coef / qtable).astype(np.int64)
    zz = quant.flatten()[_JPEG_ZIGZAG]
    dc = int(zz[0])
    size, bits = _jpeg_magnitude(dc - pred)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _jpeg_magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def _jpeg_dht_segment(tc: int, th: int, spec) -> bytes:
    bits, vals = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_baseline(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W) or (H, W, 3) uint8 -> baseline sequential JFIF bytes.

    ``subsampling``: "444" (one block per component per MCU) or "420"
    (2x2 luma blocks + box-mean-downsampled chroma per 16x16 MCU).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    if not gray and arr.shape[2] != 3:
        raise ValueError("JPEG encoder takes grayscale or RGB pixels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    dct_m = _jpeg_dct_matrix()
    q_lum = _jpeg_scale_qtable(_JPEG_Q_LUM, quality)
    q_chrom = _jpeg_scale_qtable(_JPEG_Q_CHROM, quality)
    dc_lum = _jpeg_build_codes(*_JPEG_DC_LUM)
    ac_lum = _jpeg_build_codes(*_JPEG_AC_LUM)
    dc_chrom = _jpeg_build_codes(*_JPEG_DC_CHROM)
    ac_chrom = _jpeg_build_codes(*_JPEG_AC_CHROM)

    planes = _jpeg_rgb_to_ycbcr_planes(arr, gray)
    if gray:
        samp = [(1, 1)]
    elif subsampling == "420":
        # pad to even dims, then 2x2 box mean for chroma
        y, cb, cr = planes
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]

    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)
    padded = []
    for plane, (sh, sv) in zip(planes, samp):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        ph, pw = plane.shape
        padded.append(
            np.pad(plane, ((0, th - ph), (0, tw - pw)), mode="edge") - 128.0
        )

    writer = _JpegBitWriter()
    preds = [0] * len(planes)
    qtables = [q_lum] + [q_chrom] * (len(planes) - 1)
    dc_tbls = [dc_lum] + [dc_chrom] * (len(planes) - 1)
    ac_tbls = [ac_lum] + [ac_chrom] * (len(planes) - 1)
    entropy = bytearray()
    rst = 0
    n_mcus = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcus and n_mcus % restart_interval == 0:
                writer, rst = _jpeg_flush_restart(entropy, writer, rst)
                preds = [0] * len(planes)
            for ci, (plane, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        preds[ci] = _jpeg_encode_block(
                            writer,
                            plane[y0 : y0 + 8, x0 : x0 + 8],
                            qtables[ci],
                            dc_tbls[ci],
                            ac_tbls[ci],
                            preds[ci],
                            dct_m,
                        )
            n_mcus += 1
    writer.flush()
    entropy += writer.out

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(q_lum.flatten()[_JPEG_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, b"\x01" + bytes(q_chrom.flatten()[_JPEG_ZIGZAG].astype(np.uint8)))
    ncomp = len(planes)
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, bytes(sof))
    out += _jpeg_dht_segment(0, 0, _JPEG_DC_LUM)
    out += _jpeg_dht_segment(1, 0, _JPEG_AC_LUM)
    if not gray:
        out += _jpeg_dht_segment(0, 1, _JPEG_DC_CHROM)
        out += _jpeg_dht_segment(1, 1, _JPEG_AC_CHROM)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, pads with 1-bits at
    a marker boundary (T.81 F.2.2.5), and consumes RSTn on request."""

    def __init__(self, data: bytes, pos: int) -> None:
        self._d = data
        self._pos = pos
        self._cur = 0
        self._n = 0

    def _advance(self) -> None:
        d = self._d
        if self._pos >= len(d):
            self._cur, self._n = 0xFF, 8  # 1-fill past the end
            return
        b = d[self._pos]
        if b != 0xFF:
            self._pos += 1
            self._cur, self._n = b, 8
            return
        nxt = d[self._pos + 1] if self._pos + 1 < len(d) else 0xD9
        if nxt == 0x00:
            self._pos += 2
            self._cur, self._n = 0xFF, 8
            return
        # a real marker (RST/EOI): leave it unconsumed, emit 1-fill
        self._cur, self._n = 0xFF, 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._advance()
        self._n -= 1
        return (self._cur >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume the next RSTn marker."""
        self._n = 0
        d = self._d
        while self._pos + 1 < len(d):
            if d[self._pos] == 0xFF and 0xD0 <= d[self._pos + 1] <= 0xD7:
                self._pos += 2
                return
            self._pos += 1
        raise UnsupportedImageError("JPEG stream missing expected restart marker")


def _jpeg_decode_table(table: dict) -> dict:
    """symbol -> (code, length) table to (length, code) -> symbol."""
    return {(length, code): sym for sym, (code, length) in table.items()}


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise UnsupportedImageError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _jpeg_decode_block(
    reader: _JpegBitReader, dc_tbl: dict, ac_tbl: dict, pred: int
) -> tuple[np.ndarray, int]:
    """One block of zigzag coefficients (still quantized) + DC pred."""
    size = _jpeg_huff_decode(reader, dc_tbl)
    dc = pred + _jpeg_extend(reader.read_bits(size), size)
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _jpeg_huff_decode(reader, ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise UnsupportedImageError("JPEG AC coefficient index overflow")
        zz[k] = _jpeg_extend(reader.read_bits(size), size)
        k += 1
    return zz, dc


def _jpeg_parse_dqt(body: bytes, qtables: dict) -> None:
    """Parse one DQT segment body (possibly several tables) into
    natural-order (8, 8) int64 tables keyed by table id — shared by the
    baseline and progressive decoders."""
    bp = 0
    while bp < len(body):
        pq, tq = body[bp] >> 4, body[bp] & 0x0F
        bp += 1
        if pq == 0:
            vals = np.frombuffer(body[bp : bp + 64], dtype=np.uint8).astype(np.int64)
            bp += 64
        else:
            vals = np.frombuffer(body[bp : bp + 128], dtype=">u2").astype(np.int64)
            bp += 128
        nat = np.zeros(64, dtype=np.int64)
        nat[_JPEG_ZIGZAG] = vals
        qtables[tq] = nat.reshape(8, 8)


def _jpeg_parse_dht(body: bytes, huff: dict) -> None:
    """Parse one DHT segment body (possibly several tables) into decode
    tables keyed by (class, id) — shared by both decoders."""
    bp = 0
    while bp < len(body):
        tc, th = body[bp] >> 4, body[bp] & 0x0F
        bits = list(body[bp + 1 : bp + 17])
        nvals = sum(bits)
        vals = list(body[bp + 17 : bp + 17 + nvals])
        huff[(tc, th)] = _jpeg_decode_table(_jpeg_build_codes(bits, vals))
        bp += 17 + nvals


def _jpeg_planes_to_image(
    comps: list[dict], planes: dict, h: int, w: int, max_h: int, max_v: int
) -> np.ndarray:
    """Shared decoder tail: upsample subsampled component planes
    (replicated samples), crop to the frame, and convert 1 plane to
    gray / 3 planes from YCbCr (BT.601) to RGB uint8."""
    full = []
    for c in comps:
        plane = planes[c["id"]]
        ry, rx = max_v // c["v"], max_h // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _jpeg_rgb_to_ycbcr_planes(arr: np.ndarray, gray: bool) -> list[np.ndarray]:
    """Shared encoder head: grayscale -> [Y]; RGB -> BT.601 [Y, Cb, Cr]
    float64 planes (Cb/Cr offset to the 0..255 range)."""
    if gray:
        return [arr.astype(np.float64)]
    rgb = arr.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    return [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]


def _decode_jpeg_progressive(payload: bytes) -> np.ndarray:
    """Progressive (SOF2) JPEG bytes -> (H, W, C) uint8. Coefficients
    accumulate across scans (spectral selection + successive
    approximation, T.81 Annex G); dequant+IDCT run once at the end."""
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}  # comp id -> (by, bx, 64) int32
    comp_qt: dict[int, int] = {}
    pos = 2
    saw_eoi = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            saw_eoi = True
            break
        if pos + 4 > len(payload):
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            _jpeg_parse_dqt(body, qtables)
        elif marker == 0xC4:
            _jpeg_parse_dht(body, huff)
        elif marker == 0xC2:
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise UnsupportedImageError(f"JPEG precision {prec} (only 8-bit)")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
                raise UnsupportedImageError("JPEG sampling factors beyond 2 not supported")
            max_h = max(c["h"] for c in comps)
            max_v = max(c["v"] for c in comps)
            mcus_x = (fw + 8 * max_h - 1) // (8 * max_h)
            mcus_y = (fh + 8 * max_v - 1) // (8 * max_v)
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "max_h": max_h, "max_v": max_v,
                "mcus_x": mcus_x, "mcus_y": mcus_y,
            }
            for c in comps:
                # coefficient grid padded to full MCUs (interleaved DC
                # scans address padding blocks too)
                coefs[c["id"]] = np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
                )
                comp_qt[c["id"]] = c["tq"]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("not a progressive JPEG frame")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for ci in range(ns):
                cs, tt = body[1 + 2 * ci : 3 + 2 * ci]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0x0F})
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_progressive_scan(
                payload, pos + 2 + seg_len, frame, scan, ss, se, ah, al,
                huff, coefs, restart_interval,
            )
            continue
        pos += 2 + seg_len
    if frame is None:
        raise ValueError("JPEG payload missing SOF2/SOS")
    del saw_eoi  # tolerated either way, like the baseline path

    # dequantize + IDCT + assemble (same tail as the baseline decoder)
    dct_m = _jpeg_dct_matrix()
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    max_h, max_v = frame["max_h"], frame["max_v"]
    planes = {}
    for c in comps:
        qt = qtables.get(comp_qt[c["id"]])
        if qt is None:
            raise UnsupportedImageError("JPEG component references missing quant table")
        grid = coefs[c["id"]]
        by, bx = grid.shape[:2]
        plane = np.zeros((by * 8, bx * 8), dtype=np.float64)
        for yb in range(by):
            for xb in range(bx):
                nat = np.zeros(64, dtype=np.int64)
                nat[_JPEG_ZIGZAG] = grid[yb, xb]
                block = nat.reshape(8, 8) * qt
                plane[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] = (
                    dct_m.T @ block.astype(np.float64) @ dct_m + 128.0
                )
        planes[c["id"]] = plane
    return _jpeg_planes_to_image(comps, planes, h, w, max_h, max_v)


def _decode_progressive_scan(
    payload: bytes,
    pos: int,
    frame: dict,
    scan: list[dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff: dict,
    coefs: dict,
    restart_interval: int,
) -> int:
    """Decode one progressive scan's entropy data starting at ``pos``;
    returns the byte offset just past it (at the next marker)."""
    by_id = {c["id"]: c for c in frame["comps"]}
    reader = _JpegBitReader(payload, pos)
    if ss == 0:
        if se != 0:
            raise UnsupportedImageError("progressive scan mixes DC and AC bands")
        _decode_dc_scan(reader, frame, scan, by_id, ah, al, huff, coefs, restart_interval)
    else:
        if len(scan) != 1:
            raise UnsupportedImageError("progressive AC scan must be non-interleaved")
        _decode_ac_scan(reader, frame, scan[0], by_id, ss, se, ah, al, huff, coefs,
                        restart_interval)
    # skip to the next marker (reader stops mid-byte; entropy data never
    # contains a bare 0xFF followed by a non-stuffing, non-RST byte)
    p = reader._pos
    while p + 1 < len(payload):
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            if 0xD0 <= payload[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(payload)


def _decode_dc_scan(reader, frame, scan, by_id, ah, al, huff, coefs, restart_interval):
    preds = {sc["cs"]: 0 for sc in scan}
    n_mcus_total = frame["mcus_x"] * frame["mcus_y"]
    interleaved = len(scan) > 1
    n_units = 0
    if interleaved:
        units = n_mcus_total
    else:
        c = by_id[scan[0]["cs"]]
        units = _comp_blocks(frame, c)[0] * _comp_blocks(frame, c)[1]
    for u in range(units):
        if restart_interval and n_units and n_units % restart_interval == 0:
            reader.sync_restart()
            preds = {sc["cs"]: 0 for sc in scan}
        for sc in scan:
            comp = by_id[sc["cs"]]
            if interleaved:
                mx, my = u % frame["mcus_x"], u // frame["mcus_x"]
                blocks = [
                    (my * comp["v"] + byy, mx * comp["h"] + bxx)
                    for byy in range(comp["v"])
                    for bxx in range(comp["h"])
                ]
            else:
                bw = _comp_blocks(frame, comp)[1]
                blocks = [(u // bw, u % bw)]
            for yb, xb in blocks:
                cell = coefs[sc["cs"]][yb, xb]
                if ah == 0:
                    tbl = huff.get((0, sc["td"]))
                    if tbl is None:
                        raise UnsupportedImageError("JPEG scan references missing table")
                    size = _jpeg_huff_decode(reader, tbl)
                    diff = _jpeg_extend(reader.read_bits(size), size)
                    preds[sc["cs"]] += diff
                    cell[0] = preds[sc["cs"]] << al
                else:
                    if reader.read_bit():
                        cell[0] = int(cell[0]) | (1 << al)
        n_units += 1


def _comp_blocks(frame, comp) -> tuple[int, int]:
    """(blocks_y, blocks_x) of the NON-interleaved data-unit grid for a
    component (ceil of the scaled dimensions, T.81 A.2.2)."""
    cw = -(-(frame["w"] * comp["h"]) // frame["max_h"])
    ch = -(-(frame["h"] * comp["v"]) // frame["max_v"])
    return -(-ch // 8), -(-cw // 8)


def _decode_ac_scan(reader, frame, sc, by_id, ss, se, ah, al, huff, coefs,
                    restart_interval):
    comp = by_id[sc["cs"]]
    tbl = huff.get((1, sc["ta"]))
    if tbl is None:
        raise UnsupportedImageError("JPEG scan references missing table")
    bh, bw = _comp_blocks(frame, comp)
    grid = coefs[sc["cs"]]
    eobrun = 0
    n_units = 0
    for u in range(bh * bw):
        if restart_interval and n_units and n_units % restart_interval == 0:
            reader.sync_restart()
            eobrun = 0
        yb, xb = u // bw, u % bw
        cell = grid[yb, xb]
        if ah == 0:
            eobrun = _ac_first_block(reader, tbl, cell, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_block(reader, tbl, cell, ss, se, al, eobrun)
        n_units += 1


def _ac_first_block(reader, tbl, cell, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _jpeg_huff_decode(reader, tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise UnsupportedImageError("JPEG AC coefficient index overflow")
        cell[k] = _jpeg_extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, tbl, cell, ss, se, al, eobrun) -> int:
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_huff_decode(reader, tbl)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise UnsupportedImageError("invalid JPEG refinement magnitude")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                v = int(cell[k])
                if v != 0:
                    if reader.read_bit() and (v & p1) == 0:
                        cell[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                cell[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(cell[k])
            if v != 0 and reader.read_bit() and (v & p1) == 0:
                cell[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------- encode


def _jpeg_flush_restart(out: bytearray, writer: "_JpegBitWriter", rst: int):
    """Byte-align the entropy stream, append it plus RSTn, and hand back
    a fresh writer and the next modulo-8 restart index — the one RSTn
    emission protocol shared by every encoder scan type."""
    writer.flush()
    out += writer.out
    out += bytes([0xFF, 0xD0 + rst])
    return _JpegBitWriter(), (rst + 1) % 8


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 85, al_levels: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) or (H, W, 3) uint8 -> progressive (SOF2) JFIF bytes.

    Scan script (exercises every Annex G decode mode): interleaved DC
    first at Al=``al_levels`` + DC refinements down to Al=0, then per
    component AC first (Ss=1..63) at Al=``al_levels`` + AC refinements
    down to Al=0. ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs/blocks in EVERY scan (predictors and EOB
    state reset at each marker, per spec). Coefficients are identical
    to the baseline encoder at the same quality, so
    decode(progressive) == decode(baseline)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    if not gray and arr.shape[2] != 3:
        raise ValueError("JPEG encoder takes grayscale or RGB pixels")
    if not 0 <= al_levels <= 3:
        raise ValueError("al_levels must be in 0..3")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    dct_m = _jpeg_dct_matrix()
    q_lum = _jpeg_scale_qtable(_JPEG_Q_LUM, quality)
    q_chrom = _jpeg_scale_qtable(_JPEG_Q_CHROM, quality)

    planes = _jpeg_rgb_to_ycbcr_planes(arr, gray)
    ncomp = len(planes)
    qtables = [q_lum] + [q_chrom] * (ncomp - 1)
    mcus_x, mcus_y = -(-w // 8), -(-h // 8)  # 4:4:4 only: 1 block/comp/MCU

    # quantized zigzag coefficients per component: (by, bx, 64)
    comps_zz = []
    for plane, qt in zip(planes, qtables):
        padded = np.pad(
            plane, ((0, mcus_y * 8 - h), (0, mcus_x * 8 - w)), mode="edge"
        ) - 128.0
        zz = np.zeros((mcus_y, mcus_x, 64), dtype=np.int64)
        for yb in range(mcus_y):
            for xb in range(mcus_x):
                block = padded[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                coef = dct_m @ block @ dct_m.T
                zz[yb, xb] = np.round(coef / qt).astype(np.int64).flatten()[_JPEG_ZIGZAG]
        comps_zz.append(zz)

    dc_specs = [_JPEG_DC_LUM] + [_JPEG_DC_CHROM] * (ncomp > 1)
    ac_specs = [_JPEG_AC_LUM] + [_JPEG_AC_CHROM] * (ncomp > 1)
    dc_codes = [_jpeg_build_codes(*s) for s in dc_specs]
    ac_codes = [_jpeg_build_codes(*s) for s in ac_specs]
    comp_dc = [0] + [1] * (ncomp - 1)
    comp_ac = [0] + [1] * (ncomp - 1)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos_header(comp_ids: list[int], tds: list[int], tas: list[int],
                   ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytearray([len(comp_ids)])
        for cid, td, ta in zip(comp_ids, tds, tas):
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(body))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(q_lum.flatten()[_JPEG_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, b"\x01" + bytes(q_chrom.flatten()[_JPEG_ZIGZAG].astype(np.uint8)))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, bytes(sof))
    out += _jpeg_dht_segment(0, 0, _JPEG_DC_LUM)
    out += _jpeg_dht_segment(1, 0, _JPEG_AC_LUM)
    if not gray:
        out += _jpeg_dht_segment(0, 1, _JPEG_DC_CHROM)
        out += _jpeg_dht_segment(1, 1, _JPEG_AC_CHROM)
    ri = int(restart_interval)
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))

    # scan 1: interleaved DC first, Al=al_levels
    out += sos_header(
        list(range(1, ncomp + 1)), comp_dc, [0] * ncomp, 0, 0, 0, al_levels
    )
    writer = _JpegBitWriter()
    preds = [0] * ncomp
    rst = 0
    for u in range(mcus_x * mcus_y):
        if ri and u and u % ri == 0:
            writer, rst = _jpeg_flush_restart(out, writer, rst)
            preds = [0] * ncomp
        yb, xb = u // mcus_x, u % mcus_x
        for ci in range(ncomp):
            dc = int(comps_zz[ci][yb, xb, 0]) >> al_levels
            size, bits = _jpeg_magnitude(dc - preds[ci])
            code, length = dc_codes[comp_dc[ci]][size]
            writer.write(code, length)
            if size:
                writer.write(bits, size)
            preds[ci] = dc
    writer.flush()
    out += writer.out

    # DC refinements down to Al=0
    for al in range(al_levels - 1, -1, -1):
        out += sos_header(
            list(range(1, ncomp + 1)), comp_dc, [0] * ncomp, 0, 0, al + 1, al
        )
        writer = _JpegBitWriter()
        rst = 0
        for u in range(mcus_x * mcus_y):
            if ri and u and u % ri == 0:
                writer, rst = _jpeg_flush_restart(out, writer, rst)
            yb, xb = u // mcus_x, u % mcus_x
            for ci in range(ncomp):
                writer.write((int(comps_zz[ci][yb, xb, 0]) >> al) & 1, 1)
        writer.flush()
        out += writer.out

    # AC scans per component: first at Al=al_levels, then refinements
    for ci in range(ncomp):
        out += sos_header([ci + 1], [0], [comp_ac[ci]], 1, 63, 0, al_levels)
        out += _encode_ac_first(comps_zz[ci], ac_codes[comp_ac[ci]], al_levels, ri)
        for al in range(al_levels - 1, -1, -1):
            out += sos_header([ci + 1], [0], [comp_ac[ci]], 1, 63, al + 1, al)
            out += _encode_ac_refine(comps_zz[ci], ac_codes[comp_ac[ci]], al, ri)

    out += b"\xff\xd9"
    return bytes(out)


def _encode_ac_first(
    zz: np.ndarray, ac: dict, al: int, restart_interval: int = 0
) -> bytes:
    """AC first scan (Ss=1..63, Ah=0): per-block EOB0 (no cross-block
    EOB runs — valid, slightly less compressed). ``restart_interval``
    emits an RSTn every that many blocks (per-block EOBs mean no EOB
    run ever spans a restart, as the spec requires)."""
    out = bytearray()
    writer = _JpegBitWriter()
    rst = 0
    by, bx = zz.shape[:2]
    for u in range(by * bx):
        if restart_interval and u and u % restart_interval == 0:
            writer, rst = _jpeg_flush_restart(out, writer, rst)
        cell = zz[u // bx, u % bx]
        run = 0
        emitted_any = False
        last_nz = 0
        vals = [int(v) >> al if int(v) >= 0 else -((-int(v)) >> al) for v in cell]
        for k in range(1, 64):
            if vals[k]:
                last_nz = k
        for k in range(1, 64):
            v = vals[k]
            if k > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac[0xF0]
                writer.write(code, length)
                run -= 16
            size, bits = _jpeg_magnitude(v)
            code, length = ac[(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
            emitted_any = True
        if last_nz < 63 or not emitted_any:
            code, length = ac[0x00]  # EOB0
            writer.write(code, length)
    writer.flush()
    out += writer.out
    return bytes(out)


def _encode_ac_refine(
    zz: np.ndarray, ac: dict, al: int, restart_interval: int = 0
) -> bytes:
    """AC refinement scan (Ah=Al+1): newly-significant coefficients as
    (run, 1) + sign, correction bits for already-significant ones
    buffered and flushed after the owning code word; per-block EOB0.
    ``restart_interval`` emits an RSTn every that many blocks."""
    out = bytearray()
    writer = _JpegBitWriter()
    rst = 0
    by, bx = zz.shape[:2]
    for u in range(by * bx):
        if restart_interval and u and u % restart_interval == 0:
            writer, rst = _jpeg_flush_restart(out, writer, rst)
        cell = zz[u // bx, u % bx]
        absv = [abs(int(v)) >> al for v in cell]
        # last newly-significant index (== 1 at this precision)
        eob = 0
        for k in range(1, 64):
            if absv[k] == 1:
                eob = k
        run = 0
        buffered: list[int] = []
        for k in range(1, 64):
            if k > eob:
                break
            a = absv[k]
            if a == 0:
                run += 1
                continue
            # emit pending ZRLs at ANY nonzero magnitude (not just the
            # newly-significant ones): this keeps run <= 15 whenever a
            # correction bit is buffered, so every buffered bit belongs
            # to the immediately-following code word — the positional
            # invariant the decoder's interleaved read depends on
            while run > 15:
                code, length = ac[0xF0]
                writer.write(code, length)
                for bit in buffered:
                    writer.write(bit, 1)
                buffered = []
                run -= 16
            if a > 1:
                # already significant: buffer its correction bit
                buffered.append((abs(int(cell[k])) >> al) & 1)
                continue
            code, length = ac[(run << 4) | 1]
            writer.write(code, length)
            writer.write(1 if int(cell[k]) > 0 else 0, 1)
            for bit in buffered:
                writer.write(bit, 1)
            buffered = []
            run = 0
        # end of block: EOB0 + correction bits for the remaining
        # already-significant coefficients — but ONLY when positions
        # remain past the last newly-significant one. When that one sat
        # at k=63 the decoder's band loop has already ended; a spurious
        # EOB here would be consumed as the NEXT block's first code.
        if eob < 63:
            tail_bits = [
                (abs(int(cell[k])) >> al) & 1
                for k in range(max(eob + 1, 1), 64)
                if absv[k] > 1
            ]
            code, length = ac[0x00]
            writer.write(code, length)
            for bit in buffered + tail_bits:
                writer.write(bit, 1)
    writer.flush()
    out += writer.out
    return bytes(out)


def _jpeg_has_further_sos(payload: bytes, pos: int) -> bool:
    """True iff a real SOS marker occurs between ``pos`` (inside/after
    the decoded scan's entropy data) and this image's EOI. Walks the
    stream by MARKER STRUCTURE: entropy bytes (stuffed FF00, fill FFs,
    RSTn) are stepped over, and every length-bearing segment body is
    skipped wholesale — so literal FF D9/FF DA bytes inside a COM/APPn/
    DHT body can neither end the walk early nor fake a second scan."""
    p = pos
    n = len(payload)
    while p + 1 < n:
        if payload[p] != 0xFF:
            p += 1  # residual entropy byte
            continue
        m = payload[p + 1]
        if m == 0x00 or m == 0xFF:  # stuffing / fill
            p += 2 if m == 0x00 else 1
            continue
        if 0xD0 <= m <= 0xD7:  # RSTn: bare marker
            p += 2
            continue
        if m == 0xD9:  # true EOI for this image
            return False
        if m == 0xDA:  # a second scan header
            return True
        if p + 4 > n:
            return False  # truncated tail: nothing decodable follows
        (seg_len,) = struct.unpack(">H", payload[p + 2 : p + 4])
        p += 2 + seg_len  # skip the whole segment body
    return False


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes -> (H, W, C) uint8 (C=1 gray, C=3 RGB): baseline
    sequential decoded inline; progressive (SOF2) dispatched to the
    Annex G coefficient-accumulation path. Quant/Huffman tables come
    from the payload's own DQT/DHT segments; sampling factors 1-2 per
    axis (4:4:4, 4:2:2, 4:2:0) with replicated-sample upsampling;
    DRI/RSTn honored. Arithmetic-coded streams raise
    UnsupportedImageError."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (tc, th) -> (length, code)->sym
    frame = None
    restart_interval = 0
    pos = 2
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (may hold several tables)
            _jpeg_parse_dqt(body, qtables)
        elif marker == 0xC4:  # DHT (may hold several tables)
            _jpeg_parse_dht(body, huff)
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise UnsupportedImageError(f"JPEG precision {prec} (only 8-bit)")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF segment")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC2:  # progressive: Annex G coefficient-accumulation path
            return _decode_jpeg_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(f"JPEG SOF marker 0x{marker:02x} not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for ci in range(ns):
                cs, tt = body[1 + 2 * ci : 3 + 2 * ci]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0x0F})
            pos = pos + 2 + seg_len  # entropy data starts here
            break
        pos += 2 + seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG payload missing SOF/SOS")
    if len(scan) != len(frame["comps"]):
        # a scan covering fewer components than the frame means a
        # non-interleaved multi-scan file: decoding only the first scan
        # would leave the other planes zero and misread the MCU layout.
        # Refuse honestly (same policy as progressive/arithmetic) —
        # never fake pixels.
        raise UnsupportedImageError(
            "non-interleaved JPEG (scan covers "
            f"{len(scan)}/{len(frame['comps'])} frame components)"
        )

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    h, w = frame["h"], frame["w"]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise UnsupportedImageError("JPEG sampling factors beyond 2 not supported")
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)
    dct_m = _jpeg_dct_matrix()
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    preds = {c["id"]: 0 for c in comps}
    reader = _JpegBitReader(payload, pos)
    n_mcus = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcus and n_mcus % restart_interval == 0:
                reader.sync_restart()
                preds = {c["id"]: 0 for c in comps}
            for sc in scan:
                comp = by_id[sc["cs"]]
                qt = qtables.get(comp["tq"])
                dc_tbl = huff.get((0, sc["td"]))
                ac_tbl = huff.get((1, sc["ta"]))
                if qt is None or dc_tbl is None or ac_tbl is None:
                    raise UnsupportedImageError("JPEG scan references missing table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz, preds[comp["id"]] = _jpeg_decode_block(
                            reader, dc_tbl, ac_tbl, preds[comp["id"]]
                        )
                        nat = np.zeros(64, dtype=np.int64)
                        nat[_JPEG_ZIGZAG] = zz
                        block = nat.reshape(8, 8) * qt
                        px = dct_m.T @ block.astype(np.float64) @ dct_m + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            n_mcus += 1
    # belt and braces for the same hazard: any FURTHER SOS after the
    # decoded scan but BEFORE this image's EOI means a multi-scan stream
    # (spec-valid sequential JPEG permits it; this decoder only handles
    # one interleaved scan). A PROPER MARKER WALK is required — not a
    # raw byte search: segment bodies (COM/APPn/DHT between scans) may
    # contain literal FF D9 / FF DA bytes, and bytes past the true EOI
    # (concatenated JPEGs, motion-photo appendices, trailers) are not
    # part of this image and must not trigger a refusal.
    if _jpeg_has_further_sos(payload, reader._pos):
        raise UnsupportedImageError("multi-scan sequential JPEG not supported")

    return _jpeg_planes_to_image(comps, planes, h, w, max_h, max_v)


def gif_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the GIF logical screen descriptor."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", payload[6:10])
    return w, h, 3


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF-variant LZW (GIF89a spec appendix F): variable code width
    starting at min_code_size+1, clear/end codes, dictionary capped at
    12-bit codes. Returns the color-index stream as a bytearray (GIF
    color indices are < 256 by construction: min_code_size <= 8).

    r21 (guide §1.2 step 2 — per-task work): the table holds ``bytes``
    entries in a dense list indexed by code (positions ``clear``/``end``
    are unreachable placeholders — those codes are intercepted above),
    replacing the previous dict of int-tuples; entry concatenation and
    output append then run at C speed. Same index stream bit-for-bit;
    the per-GIF decode drops ~4x (the single hottest Python section of
    the multimodal rows)."""
    if min_code_size > 8:
        # a color table never exceeds 256 entries, so root codes are
        # always < 256; a larger claimed code size is a corrupt header
        # (previously surfaced later as an out-of-table index)
        raise UnsupportedImageError(
            f"corrupt GIF LZW stream (min code size {min_code_size})"
        )
    clear = 1 << min_code_size
    end = clear + 1
    # dense code -> entry list; the two placeholders keep list position
    # aligned with code value (len(table) == next free code)
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    wmask = (1 << width) - 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits  # LSB-first packing
        nbits += 8
        while nbits >= width:
            code = acc & wmask
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                wmask = (1 << width) - 1
                prev = None
                continue
            if code == end:
                return out
            n = len(table)
            if prev is None:
                entry = table[code]
            elif code < n:
                entry = table[code]
            elif code == n:  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise UnsupportedImageError("corrupt GIF LZW stream")
            out += entry
            if prev is not None and n < 4096:
                table.append(prev + entry[:1])
                if n + 1 == wmask + 1 and width < 12:
                    width += 1
                    wmask = (wmask << 1) | 1
            prev = entry
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 3) uint8 via a from-spec LZW decode of the
    FIRST image frame composed onto the logical screen (background
    color fill). Interlaced frames are de-interlaced (4-pass order);
    animation beyond frame one and transparency compositing are out of
    scope for corpus feature-extraction (the first frame is the
    thumbnail/statistics frame)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed, bg_index = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise UnsupportedImageError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        ipacked = payload[pos + 9]
        pos += 10
        ct = gct
        if ipacked & 0x80:  # local color table
            n = 2 ** ((ipacked & 0x07) + 1)
            ct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise UnsupportedImageError("GIF frame has no color table")
        min_code_size = payload[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            size = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1  # block terminator
        indices = _gif_lzw_decode(bytes(lzw), min_code_size)
        if len(indices) < w * h:
            raise UnsupportedImageError("GIF LZW stream shorter than frame")
        idx = (
            np.frombuffer(indices, dtype=np.uint8, count=w * h)
            .astype(np.int64)
            .reshape(h, w)
        )
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            deint = np.zeros_like(idx)
            deint[order] = idx
            idx = deint
        if np.any(idx >= len(ct)):
            raise UnsupportedImageError("GIF index outside color table")
        frame = ct[idx]
        # compose onto the logical screen (background fill)
        if (left, top, w, h) == (0, 0, sw, sh):
            return np.ascontiguousarray(frame)
        screen = np.zeros((sh, sw, 3), dtype=np.uint8)
        if gct is not None and bg_index < len(gct):
            screen[:, :] = gct[bg_index]
        screen[top : top + h, left : left + w] = frame[: sh - top, : sw - left]
        return screen
    raise ValueError("GIF payload has no image frame")


def encode_gif(pixels: np.ndarray) -> bytes:
    """(H, W) palette-index or (H, W, 3) uint8 array -> single-frame
    GIF89a. RGB input is quantized to its distinct colors (<=256
    required — fixture/write-back use, not general photography; use
    JPEG/PNG for continuous-tone images). Emits clear codes per the
    spec whenever the dictionary fills."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF encoder needs <=256 distinct colors, got {len(colors)}")
    ct_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    ct_size = 1 << ct_bits
    table = np.zeros((ct_size, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    indices = inverse.astype(np.int64)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (ct_bits - 1), 0, 0])  # GCT flag+size, bg, aspect
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    # one LZW implementation for both encoders (the animation encoder
    # shares this helper): min_code_size + 255-byte sub-blocks + term
    out += _gif_lzw_encode_blocks(indices, ct_bits)
    out += b"\x3b"
    return bytes(out)


def _gif_deinterlace(idx: "np.ndarray", h: int) -> "np.ndarray":
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    deint = np.zeros_like(idx)
    deint[order] = idx
    return deint


def decode_gif_frames(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """Animated GIF bytes -> [(delay_centiseconds, (H, W, 3) uint8), ...]
    — FULL animation decode per the GIF89a spec: each frame is composed
    onto the evolving logical screen honoring the Graphic Control
    Extension (frame delay, transparency index — transparent pixels
    leave the screen unchanged) and disposal methods 0/1 (leave),
    2 (restore background) and 3 (restore previous). The returned
    arrays are what a viewer displays after each frame."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed, bg_index = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    bg = (
        gct[bg_index]
        if gct is not None and bg_index < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    screen[:, :] = bg
    frames: list[tuple[int, np.ndarray]] = []
    # pending graphic control state (applies to the NEXT image block)
    delay, transparent, disposal = 0, None, 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control extension
                size = payload[pos]
                gfields = payload[pos + 1 : pos + 1 + size]
                flags = gfields[0]
                disposal = (flags >> 2) & 0x07
                (delay,) = struct.unpack("<H", gfields[1:3])
                transparent = gfields[3] if flags & 0x01 else None
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise UnsupportedImageError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        ipacked = payload[pos + 9]
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 ** ((ipacked & 0x07) + 1)
            ct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise UnsupportedImageError("GIF frame has no color table")
        min_code_size = payload[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            size = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1  # block terminator
        indices = _gif_lzw_decode(bytes(lzw), min_code_size)
        if len(indices) < w * h:
            raise UnsupportedImageError("GIF LZW stream shorter than frame")
        idx = (
            np.frombuffer(indices, dtype=np.uint8, count=w * h)
            .astype(np.int64)
            .reshape(h, w)
        )
        if ipacked & 0x40:
            idx = _gif_deinterlace(idx, h)
        if np.any(idx >= len(ct)):
            raise UnsupportedImageError("GIF index outside color table")
        # clip the frame rect to the logical screen; a malformed
        # descriptor whose left/top lies beyond the screen would make
        # these negative and turn the slices below into asymmetric
        # views (np.where then dies with a broadcast ValueError) — that
        # layout violates GIF89a, so refuse per the codec contract
        ch_, cw_ = min(h, sh - top), min(w, sw - left)
        if ch_ < 0 or cw_ < 0:
            raise UnsupportedImageError(
                f"GIF frame rect ({left},{top} {w}x{h}) outside "
                f"logical screen {sw}x{sh}"
            )
        region = screen[top : top + ch_, left : left + cw_]
        saved = region.copy() if disposal == 3 else None
        vis = idx[:ch_, :cw_]
        px = ct[vis]
        if transparent is not None:
            mask = vis != transparent
            composed = np.where(mask[:, :, None], px, region)
        else:
            composed = px
        screen[top : top + ch_, left : left + cw_] = composed
        frames.append((int(delay), screen.copy()))
        if disposal == 2:  # restore region to background
            screen[top : top + ch_, left : left + cw_] = bg
        elif disposal == 3 and saved is not None:  # restore previous
            screen[top : top + ch_, left : left + cw_] = saved
        delay, transparent, disposal = 0, None, 0
    if not frames:
        raise ValueError("GIF payload has no image frame")
    return frames


def encode_gif_animation(
    frames: list[np.ndarray], delays_cs: list[int] | None = None
) -> bytes:
    """List of (H, W, 3)/(H, W) uint8 full-screen frames -> animated
    GIF89a (global color table from the union of frame colors, <=256;
    one Graphic Control Extension per frame carrying its delay,
    disposal method 1 = leave in place). Fixture/round-trip use, like
    the single-frame encoder."""
    if not frames:
        raise ValueError("need at least one frame")
    arrs = []
    for f in frames:
        a = np.asarray(f, dtype=np.uint8)
        if a.ndim == 2:
            a = np.stack([a] * 3, axis=2)
        arrs.append(a)
    h, w, _ = arrs[0].shape
    if any(a.shape != (h, w, 3) for a in arrs):
        raise ValueError("all frames must share the logical screen size")
    delays = list(delays_cs or [0] * len(arrs))
    if len(delays) != len(arrs):
        raise ValueError("delays_cs length must match frames")
    flat = np.concatenate([a.reshape(-1, 3) for a in arrs])
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF encoder needs <=256 distinct colors, got {len(colors)}")
    ct_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    ct_size = 1 << ct_bits
    table = np.zeros((ct_size, 3), dtype=np.uint8)
    table[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (ct_bits - 1), 0, 0])
    out += table.tobytes()
    n_px = h * w
    for fi, delay in enumerate(delays):
        idx = inverse[fi * n_px : (fi + 1) * n_px].astype(np.int64)
        # GCE: disposal=1 (leave), no transparency
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack("<H", int(delay)) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += _gif_lzw_encode_blocks(idx, ct_bits)
    out += b"\x3b"
    return bytes(out)


def _gif_lzw_encode_blocks(indices: np.ndarray, ct_bits: int) -> bytes:
    """LZW-encode one frame's index stream and wrap it as
    min_code_size + 255-byte sub-blocks + terminator (shared by the
    single-frame and animation encoders)."""
    min_code_size = max(2, ct_bits)
    clear = 1 << min_code_size
    end = clear + 1
    codes: list[tuple[int, int]] = [(clear, min_code_size + 1)]
    dictionary: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    prev: tuple[int, ...] = ()
    for sym in indices:
        cur = prev + (int(sym),)
        if cur in dictionary:
            prev = cur
            continue
        codes.append((dictionary[prev], width))
        dictionary[cur] = next_code
        next_code += 1
        # decoder dictionary lags by one entry; see encode_gif
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            codes.append((clear, width))
            dictionary = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = (int(sym),)
    if prev:
        codes.append((dictionary[prev], width))
    codes.append((end, width))

    acc = 0
    nbits = 0
    stream = bytearray()
    for code, cw in codes:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    out = bytearray([min_code_size])
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)



# ------------------------------------------------------- WAV (audio)


def wav_header(payload: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, n_frames) from a RIFF
    WAVE header — chunk walk, PCM (format 1) only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = channels = bits = None
    n_data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt ":
            fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
            if fmt != 1:
                raise UnsupportedImageError(f"WAV format {fmt} (only PCM=1 supported)")
        elif cid == b"data":
            n_data = size
        pos += 8 + size + (size & 1)  # chunks pad to even
    if rate is None or n_data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    n_frames = n_data // (channels * (bits // 8))
    return rate, channels, bits, n_frames


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> ((n_frames, channels) int32 samples, rate).
    8-bit (unsigned, re-centered), 16-bit and 32-bit PCM."""
    rate, channels, bits, n_frames = wav_header(payload)
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"data":
            raw = payload[pos + 8 : pos + 8 + size]
            if bits == 16:
                arr = np.frombuffer(raw, dtype="<i2").astype(np.int32)
            elif bits == 8:
                arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
            elif bits == 32:
                arr = np.frombuffer(raw, dtype="<i4").astype(np.int32)
            else:
                raise UnsupportedImageError(f"WAV bit depth {bits} not supported")
            return arr[: n_frames * channels].reshape(n_frames, channels), rate
        pos += 8 + size + (size & 1)
    raise ValueError("WAV payload missing data chunk")


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) int16 samples -> PCM WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    data = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        out += b"\x00"  # chunks pad to even
    return b"RIFF" + struct.pack("<I", len(out)) + out


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
    PNG, BMP, baseline JPEG and GIF (first frame, LZW) decode here
    without any library; progressive JPEG requires a codec library
    (PIL path) and otherwise raises ``UnsupportedImageError`` — never
    fake pixels."""
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
    if fmt == "jpeg":
        return decode_jpeg(payload)
    if fmt == "gif":
        return decode_gif(payload)
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
