"""AIFF/AIFF-C and Sun AU audio codecs with zero external dependencies.

Extends the WAV family (operators/codecs.py) with the other two classic
PCM containers a crawl yields: AIFF is the big-endian IFF sibling of
RIFF (FORM/COMM/SSND chunks, sample rate as an 80-bit IEEE extended
float), and AU/SND is a flat big-endian header over PCM or G.711
payloads (the companding tables already live in codecs.py).

Scope (stated, not hidden):

* ``decode_aiff`` — FORM/AIFF and FORM/AIFC: signed big-endian PCM at
  8/16/24/32 bits (AIFC compression 'NONE'; 'sowt' = little-endian
  16-bit also decodes), multi-channel interleaved frames, the 80-bit
  extended sample rate parsed exactly. Compressed AIFC ('ima4', ulaw
  variants, …) raises ``NotImplementedError``.
* ``decode_au`` — '.snd' magic: encodings 1 (G.711 mu-law), 2-5
  (signed BE PCM 8/16/24/32), 27 (G.711 A-law). Floats (6/7) and
  ADPCM encodings raise ``NotImplementedError``.
* ``encode_aiff`` / ``encode_au`` — 16-bit output for roundtrip
  verification and fixture construction.

Samples convert to the int16 domain with the same deterministic rules
as decode_wav (arithmetic shift for wider, << 8 for narrower), so every
downstream stat is bit-stable across containers: the same PCM payload
wrapped as WAV, AIFF, or AU yields IDENTICAL pcm_stats rows — asserted
in tests/test_aiff_au.py.
"""

from __future__ import annotations

import struct


def is_aiff(payload: bytes) -> bool:
    return (
        isinstance(payload, (bytes, bytearray))
        and len(payload) >= 12
        and bytes(payload[:4]) == b"FORM"
        and bytes(payload[8:12]) in (b"AIFF", b"AIFC")
    )


def is_au(payload: bytes) -> bool:
    return (
        isinstance(payload, (bytes, bytearray))
        and len(payload) >= 24
        and bytes(payload[:4]) == b".snd"
    )


def _read_extended(b: bytes) -> int:
    """80-bit IEEE extended (big-endian) → nearest int sample rate."""
    if len(b) != 10:
        raise ValueError("AIFF: bad extended float")
    (se,) = struct.unpack(">H", b[:2])
    sign = -1 if se & 0x8000 else 1
    exp = se & 0x7FFF
    (mant,) = struct.unpack(">Q", b[2:])
    if exp == 0 and mant == 0:
        return 0
    # explicit integer bit: value = mant * 2^(exp - 16383 - 63)
    shift = exp - 16383 - 63
    if shift >= 0:
        return sign * (mant << shift)
    # round to nearest on the fractional shift (rates are integral in practice)
    return sign * ((mant + (1 << (-shift - 1))) >> -shift)


def _write_extended(value: int) -> bytes:
    if value <= 0:
        raise ValueError("AIFF: rate must be positive")
    exp = value.bit_length() - 1
    mant = value << (63 - exp)
    return struct.pack(">HQ", 16383 + exp, mant)


def _be_to_int16(data: bytes, bits: int, little: bool = False):
    import numpy as np

    order = "<" if little else ">"
    if bits == 8:  # AIFF 8-bit is SIGNED (unlike WAV)
        a = np.frombuffer(data, dtype=np.int8).astype(np.int16)
        return a << 8
    if bits == 16:
        return np.frombuffer(data, dtype=order + "i2").astype(np.int16)
    if bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        if little:
            vals = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
        else:
            vals = (
                (raw[:, 0].astype(np.int32) << 16)
                | (raw[:, 1].astype(np.int32) << 8)
                | raw[:, 2].astype(np.int32)
            )
        vals = (vals ^ 0x800000) - 0x800000  # sign-extend
        return (vals >> 8).astype(np.int16)
    if bits == 32:
        a = np.frombuffer(data, dtype=order + "i4").astype(np.int64)
        return (a >> 16).astype(np.int16)
    raise NotImplementedError(f"{bits}-bit PCM unsupported")


def decode_aiff(payload: bytes):
    """→ (rate, channels, int16 array shaped (n, channels)) — the
    decode_wav contract."""
    import numpy as np

    if not is_aiff(payload):
        raise ValueError("not an AIFF/AIFC stream")
    buf = bytes(payload)
    is_aifc = buf[8:12] == b"AIFC"
    pos = 12
    rate = channels = bits = None
    n_frames = 0
    comp = b"NONE"
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (length,) = struct.unpack_from(">I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"COMM":
            if len(body) < 18:
                raise ValueError("AIFF COMM chunk truncated")
            channels, n_frames, bits = struct.unpack_from(">hIh", body, 0)
            rate = _read_extended(body[8:18])
            if is_aifc and len(body) >= 22:
                comp = body[18:22]
        elif tag == b"SSND":
            if len(body) < 8:
                raise ValueError("AIFF SSND chunk truncated")
            off, _blk = struct.unpack_from(">II", body, 0)
            data = body[8 + off :]
    if rate is None or data is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    if comp not in (b"NONE", b"sowt"):
        raise NotImplementedError(
            f"AIFC compression {comp!r} has no in-container decoder"
        )
    little = comp == b"sowt"
    if little and bits != 16:
        raise NotImplementedError("AIFC 'sowt' is 16-bit by definition")
    frame_bytes = channels * (bits // 8)
    data = data[: n_frames * frame_bytes]
    samples = _be_to_int16(data, bits, little=little)
    return rate, channels, samples.reshape(-1, channels)


def encode_aiff(samples, rate: int, channels: int = 1) -> bytes:
    """int16 samples (flat, interleaved) → FORM/AIFF, 16-bit BE PCM."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int16).reshape(-1)
    n_frames = len(a) // channels
    pcm = a.astype(">i2").tobytes()
    comm = b"COMM" + struct.pack(">IhIh", 18, channels, n_frames, 16) + _write_extended(rate)
    ssnd = b"SSND" + struct.pack(">III", 8 + len(pcm), 0, 0) + pcm
    if len(pcm) % 2:
        ssnd += b"\x00"
    body = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body


_AU_BITS = {2: 8, 3: 16, 4: 24, 5: 32}


def decode_au(payload: bytes):
    """→ (rate, channels, int16 array shaped (n, channels))."""
    import numpy as np

    if not is_au(payload):
        raise ValueError("not a Sun AU stream")
    buf = bytes(payload)
    _magic, off, dsize, enc, rate, channels = struct.unpack_from(">IIIIII", buf, 0)
    if off < 24 or channels < 1:
        raise ValueError("AU: bad header")
    end = len(buf) if dsize in (0, 0xFFFFFFFF) else min(len(buf), off + dsize)
    data = buf[off:end]
    if enc in (1, 27):  # G.711 mu-law / A-law
        from .codecs import _ALAW_TABLE, _MULAW_TABLE

        table = _MULAW_TABLE if enc == 1 else _ALAW_TABLE
        samples = np.asarray(table, dtype=np.int16)[
            np.frombuffer(data, dtype=np.uint8)
        ]
    elif enc in _AU_BITS:
        bits = _AU_BITS[enc]
        usable = len(data) - len(data) % (channels * bits // 8)
        samples = _be_to_int16(data[:usable], bits)
    else:
        raise NotImplementedError(f"AU encoding {enc} has no in-container decoder")
    n = len(samples) // channels
    return rate, channels, samples[: n * channels].reshape(-1, channels)


def encode_au(samples, rate: int, channels: int = 1, mulaw: bool = False) -> bytes:
    """int16 samples → AU: encoding 3 (16-bit BE PCM) or 1 (mu-law, via
    the inverse companding search — test/fixture use)."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int16).reshape(-1)
    if mulaw:
        from .codecs import _MULAW_TABLE

        table = np.asarray(_MULAW_TABLE, dtype=np.int32)
        # nearest-table-entry inverse (exact for values produced by the
        # forward expansion — the roundtrip identity tests rely on this)
        idx = np.abs(table[None, :] - a.astype(np.int32)[:, None]).argmin(axis=1)
        data = idx.astype(np.uint8).tobytes()
        enc = 1
    else:
        data = a.astype(">i2").tobytes()
        enc = 3
    return struct.pack(">IIIIII", 0x2E736E64, 24, len(data), enc, rate, channels) + data
