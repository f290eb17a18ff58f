"""REAL image/audio codecs with zero external dependencies.

Closes the r3 "real decode kernels" gap without new packages: PNG's
compression is zlib — which is in the Python standard library — and WAV is
plain RIFF framing around raw PCM. So a standards-correct decoder for both
is implementable with stdlib ``zlib``/``struct`` + numpy, and the
multimodal kernels (operators/multimodal.py) can decode REAL codec
payloads, not just the self-describing raw formats.

Scope (stated, not hidden):

* PNG — 8-bit-depth, color types 2 (RGB) and 6 (RGBA), non-interlaced.
  All five scanline filters (None/Sub/Up/Average/Paeth) are implemented,
  so PNGs produced by other encoders decode correctly; palette/16-bit/
  interlaced images raise ``NotImplementedError`` (the honest gate).
  ``encode_png`` emits filter-0 scanlines — valid output every PNG reader
  accepts.
* WAV — RIFF/WAVE, PCM (format 1), 16-bit samples, any channel count /
  rate. Float/ADPCM/extensible raise ``NotImplementedError``.

Everything is deterministic byte arithmetic: decode(encode(x)) == x
exactly, and the kernels stay oracle-checkable.

Reference behavior being reproduced: the reference pipeline treats media
as opaque payloads + metadata (SURVEY.md §2's multimodal plumbing); these
codecs make the decode stage real for the two formats whose specs are
implementable from first principles in-container.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------
def encode_png(arr) -> bytes:
    """(h, w, 3|4) uint8 numpy array → a standards-valid PNG (8-bit,
    color type 2/6, filter 0 scanlines, one IDAT)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError("encode_png expects (h, w, 3|4) uint8")
    h, w, ch = a.shape
    color_type = 2 if ch == 3 else 6

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) prepended to each scanline
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes):
    """PNG bytes → (h, w, channels) uint8 numpy array.

    Real decode: chunk walk, zlib inflate, and full scanline un-filtering
    (all five PNG filter types). Raises ``NotImplementedError`` for the
    out-of-scope shapes (palette, 16-bit, interlaced) and ``ValueError``
    for malformed streams."""
    import numpy as np

    if payload is None or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, w = 8, None
    idat = bytearray()
    h = bit_depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + body + crc
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"PNG shape out of scope (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace}) — "
            "only 8-bit RGB/RGBA non-interlaced is implemented"
        )
    ch = 3 if color_type == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-ch]
            # per-lane cumulative sum mod 256 — vectorized along the row
            lanes = line.reshape(-1, ch)
            out[y] = (np.cumsum(lanes, axis=0) % 256).reshape(-1)
        elif ftype == 2:  # Up
            out[y] = (line + prev) % 256
        elif ftype == 3:  # Average
            row = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                row[x] = (line[x] + (left + prev[x]) // 2) % 256
            out[y] = row
        elif ftype == 4:  # Paeth
            row = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                row[x] = (line[x] + _paeth(int(left), int(prev[x]), int(ul))) % 256
            out[y] = row
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out.astype(np.uint8).reshape(h, w, ch)


def is_png(payload: bytes) -> bool:
    return payload is not None and bytes(payload[:8]) == _PNG_SIG


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16)
# ---------------------------------------------------------------------------
def encode_wav(samples, rate: int, channels: int = 1) -> bytes:
    """int16 numpy array (n,) or (n, channels) + rate → RIFF/WAVE PCM16."""
    import numpy as np

    a = np.ascontiguousarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a.reshape(-1, channels)
    n_frames, ch = a.shape
    data = a.tobytes()
    byte_rate = rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """WAV bytes → (rate, channels, int16 numpy array shaped (n, channels)).

    Real decode: RIFF chunk walk; PCM (format 1) 16-bit only — float,
    ADPCM, and WAVE_FORMAT_EXTENSIBLE raise ``NotImplementedError``."""
    import numpy as np

    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    rate = channels = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_format, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_format != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format out of scope (format={audio_format}, "
                    f"bits={bits}) — only PCM16 is implemented"
                )
        elif tag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    a = np.frombuffer(data, dtype="<i2").reshape(-1, channels)
    return rate, channels, a


def is_wav(payload: bytes) -> bool:
    return (
        payload is not None
        and bytes(payload[:4]) == b"RIFF"
        and bytes(payload[8:12]) == b"WAVE"
    )
