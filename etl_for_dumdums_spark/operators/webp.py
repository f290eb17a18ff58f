"""WebP container probe — metadata without decode, plus the documented
decode gate.

A crawl pipeline needs WebP *identification and dimensions* long before
it needs pixels (dimension/aspect filters, canvas-size dedup keys, and
routing decisions all run on metadata only). This module implements the
RIFF/WEBP container layer from the public spec: ``is_webp`` magic
detection and ``probe_webp`` header parsing for all three stream kinds —

* ``VP8X`` extended header: 24-bit canvas width/height (stored minus
  one), feature flags (alpha, animation, ICC, EXIF, XMP), ANMF frame
  counting for animations;
* ``VP8 `` lossy bitstream header: the 3-byte frame tag (keyframe bit,
  version, show_frame, partition size), the 0x9D012A start code, and
  14-bit width/height;
* ``VP8L`` lossless bitstream header: the 0x2F signature byte followed
  by 14-bit width-1 / height-1, the alpha-is-used bit and version.

Pixel DECODE stays behind ``NotImplementedError`` — the honest gate
(ROUND6_NOTES.md arithmetic-JPEG principle): a from-scratch VP8 decoder
needs the full boolean-arithmetic-coded intra codec and a VP8L decoder
needs its Huffman/LZ77/transform stack, and this container ships NO
lossless (VP8L) stream at all to verify one against — the only real
.webp present is a single lossy VP8X+ALPH+VP8 file (the CPython test
asset). A decoder whose only evidence is its own self-roundtrip would be
self-consistent-but-unverifiable, which is worse than a loud gate. The
probe, by contrast, IS verified against that real third-party file
(tests/test_webp.py): the VP8X canvas dims must agree with the embedded
VP8 frame header dims parsed independently — cross-chunk consistency on
a foreign stream.

Reference behavior being reproduced: the reference treats media as
opaque payload + typed metadata (SURVEY.md §2 multimodal plumbing).
"""

from __future__ import annotations

import struct


def is_webp(payload: bytes) -> bool:
    return (
        isinstance(payload, (bytes, bytearray))
        and len(payload) >= 16
        and bytes(payload[:4]) == b"RIFF"
        and bytes(payload[8:12]) == b"WEBP"
    )


def _vp8_dims(body: bytes):
    """Lossy VP8 frame header → (width, height). Spec: 3-byte frame tag
    (keyframe when bit0 == 0), then the 0x9D012A start code, then 14-bit
    width/height (upper 2 bits are rescale hints)."""
    if len(body) < 10:
        raise ValueError("VP8 chunk truncated")
    tag = body[0] | (body[1] << 8) | (body[2] << 16)
    if tag & 0x1:
        raise ValueError("VP8 chunk is not a keyframe")
    if body[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8 start code missing")
    (w_raw,) = struct.unpack_from("<H", body, 6)
    (h_raw,) = struct.unpack_from("<H", body, 8)
    return w_raw & 0x3FFF, h_raw & 0x3FFF


def _vp8l_dims(body: bytes):
    """Lossless VP8L header → (width, height, alpha). Spec: signature
    0x2F, then a little-endian bitstream: 14-bit width-1, 14-bit
    height-1, 1 alpha bit, 3 version bits (must be 0)."""
    if len(body) < 5:
        raise ValueError("VP8L chunk truncated")
    if body[0] != 0x2F:
        raise ValueError("VP8L signature missing")
    bits = int.from_bytes(body[1:5], "little")
    w = (bits & 0x3FFF) + 1
    h = ((bits >> 14) & 0x3FFF) + 1
    alpha = bool((bits >> 28) & 0x1)
    version = (bits >> 29) & 0x7
    if version != 0:
        raise ValueError(f"VP8L version {version} unknown")
    return w, h, alpha


def probe_webp(payload: bytes) -> dict:
    """→ {"format", "width", "height", "has_alpha", "is_animated",
    "lossless", "n_frames"} from headers only — payload pixels are never
    touched. Malformed containers raise ValueError (the stats-kernel
    NULL-row contract); a well-formed container whose pixels would need
    the ungated VP8/VP8L decoder still probes fine."""
    if not is_webp(payload):
        raise ValueError("not a WebP payload")
    buf = bytes(payload)
    out = {
        "format": None,
        "width": None,
        "height": None,
        "has_alpha": False,
        "is_animated": False,
        "lossless": False,
        "n_frames": 0,
    }
    pos = 12
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError(f"WebP {tag!r} chunk truncated")
        pos += 8 + ln + (ln & 1)
        if tag == b"VP8X":
            if ln < 10:
                raise ValueError("VP8X chunk truncated")
            flags = body[0]
            out["format"] = "vp8x"
            out["has_alpha"] = bool(flags & 0x10)
            out["is_animated"] = bool(flags & 0x02)
            out["width"] = (int.from_bytes(body[4:7], "little") & 0xFFFFFF) + 1
            out["height"] = (int.from_bytes(body[7:10], "little") & 0xFFFFFF) + 1
        elif tag == b"VP8 ":
            w, h = _vp8_dims(body)
            out["frame_width"], out["frame_height"] = w, h
            if out["format"] is None:
                out["format"], out["width"], out["height"] = "vp8", w, h
            out["n_frames"] += 1
        elif tag == b"VP8L":
            w, h, alpha = _vp8l_dims(body)
            out["frame_width"], out["frame_height"] = w, h
            out["lossless"] = True
            out["has_alpha"] = out["has_alpha"] or alpha
            if out["format"] is None:
                out["format"], out["width"], out["height"] = "vp8l", w, h
            out["n_frames"] += 1
        elif tag == b"ALPH":
            out["has_alpha"] = True
        elif tag == b"ANMF":
            out["is_animated"] = True
            out["n_frames"] += 1
    if out["format"] is None:
        raise ValueError("WebP contains no image chunk")
    return out


def decode_webp(payload: bytes):
    """The honest gate — see the module docstring for why decode is not
    implemented in-container (no VP8L stream exists here to verify a
    from-scratch decoder against; VP8 lossy needs the full
    boolean-arithmetic intra codec)."""
    if not is_webp(payload):
        raise ValueError("not a WebP payload")
    probe = probe_webp(payload)
    raise NotImplementedError(
        f"WebP {probe['format']} pixel decode has no in-container "
        "implementation (metadata probe available via probe_webp)"
    )
