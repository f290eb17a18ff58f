"""AVI (RIFF) video container with MJPEG and raw-DIB frame codecs —
zero external dependencies.

Closes the last "video" item in the multimodal scope note with the same
first-principles approach as operators/codecs.py (PNG/WAV) and
operators/jpeg.py: AVI is RIFF framing (the WAV container's sibling —
same chunk grammar, already implemented here for audio), MJPEG frames are
baseline JPEG streams (operators/jpeg.py decodes them), and BI_RGB frames
are raw bottom-up BGR rows. So a standards-correct encoder/decoder for
the two classic AVI video codecs is implementable with stdlib ``struct``
+ numpy + the in-repo JPEG codec.

Scope (stated, not hidden):

* ``encode_avi`` — RIFF 'AVI ' with hdrl (avih + one vids strl), movi
  ('00dc' MJPG chunks or '00db' BI_RGB DIB chunks) and an idx1 index;
  constant frame rate via dwScale/dwRate. Output is a standards-valid
  interchange stream any AVI demuxer accepts.
* ``probe_avi`` — header-only metadata (width/height/fps/frame count/
  codec) without touching frame bytes: the cheap-scan path a catalog
  uses before deciding what to decode.
* ``decode_avi`` — full or INDEX-SEEKED frame extraction: with
  ``indices`` given, only the requested frames are located (via idx1
  when present, a linear chunk scan otherwise) and only those are
  JPEG-decoded — frame sampling never pays for unsampled frames'
  entropy decode. Handles both idx1 offset conventions (offsets
  relative to the 'movi' fourcc and absolute file offsets).
* Codecs beyond MJPG/BI_RGB (DV, Cinepak, h264-in-AVI, …) raise
  ``NotImplementedError`` — the honest gate, same policy as
  codecs.py/jpeg.py. Malformed containers raise ``ValueError``.

Determinism: BI_RGB roundtrips are byte-exact; MJPEG frames inherit
jpeg.py's guarantees (flat 8×8 blocks at quality 95 reconstruct exactly
— the analysis in catalog/advanced.py's mm_codec_roundtrip), so the
oracled catalog query mm_video_frame_stats can state every decoded sum
in closed form.

Reference behavior being reproduced: the reference treats media as opaque
payload + typed metadata (SURVEY.md §2 multimodal plumbing); this module
makes the video decode / frame-sample stage real for the one container
whose spec is implementable in-container, replacing the previous
NotImplementedError-only video gate.

Scale design (100 TB): everything here is per-payload executor-side work
invoked from mapInPandas kernels (video_stats below); payload bytes never
reach the driver, sampled-frame stats reduce each clip to a few integers
inside the Arrow batch, and the index-seek path bounds per-clip decode
work to the sampled frames regardless of clip length.
"""

from __future__ import annotations

import struct

_AVIIF_KEYFRAME = 0x10


def is_avi(payload: bytes) -> bool:
    return (
        isinstance(payload, (bytes, bytearray))
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------
def _dib_frame(arr) -> bytes:
    """(h, w, 3) RGB → BI_RGB DIB bytes: bottom-up rows, BGR, each row
    zero-padded to a 4-byte boundary (the bitmap spec's stride rule)."""
    import numpy as np

    h, w, _ = arr.shape
    bgr = arr[::-1, :, ::-1]  # bottom-up, RGB→BGR
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def _chunk(ckid: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return ckid + struct.pack("<I", len(data)) + data + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def encode_avi(frames, fps: int = 30, codec: str = "MJPG", quality: int = 90) -> bytes:
    """frames: sequence of (h, w, 3) uint8 RGB arrays (equal shapes) →
    a standards-valid AVI. codec: 'MJPG' (each frame a baseline JPEG) or
    'DIB ' (BI_RGB raw — byte-exact roundtrip)."""
    import numpy as np

    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, ch = frames[0].shape
    if ch != 3 or any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("encode_avi expects equal-shape (h, w, 3) frames")
    if codec == "MJPG":
        from .jpeg import encode_jpeg

        ckid, compression = b"00dc", struct.unpack("<I", b"MJPG")[0]
        blobs = [encode_jpeg(f, quality=quality) for f in frames]
    elif codec == "DIB ":
        ckid, compression = b"00db", 0  # BI_RGB
        blobs = [_dib_frame(f) for f in frames]
    else:
        raise NotImplementedError(f"encode_avi: unsupported codec {codec!r}")

    max_blob = max(len(b) for b in blobs)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # dwMicroSecPerFrame
            max_blob * fps,  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0x10,  # dwFlags: AVIF_HASINDEX
            len(frames),
            0,  # dwInitialFrames
            1,  # dwStreams
            max_blob,  # dwSuggestedBufferSize
            w,
            h,
            0,
            0,
            0,
            0,
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + (b"MJPG" if codec == "MJPG" else b"DIB ")
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0,
            0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            len(frames),  # dwLength
            max_blob,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: one chunk per frame)
            0,
            0,
            w,
            h,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression, len(blobs[0]), 0, 0, 0, 0),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_chunks, offsets = [], []
    off = 4  # offsets are relative to the 'movi' fourcc position
    for b in blobs:
        offsets.append(off)
        c = _chunk(ckid, b)
        movi_chunks.append(c)
        off += len(c)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(
        b"idx1",
        b"".join(
            ckid + struct.pack("<III", _AVIIF_KEYFRAME, o, len(b))
            for o, b in zip(offsets, blobs)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# parse / decode
# ---------------------------------------------------------------------------
def _iter_chunks(buf: bytes, start: int, end: int):
    """Yield (ckid, data_start, size) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        ckid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield ckid, pos + 8, size
        pos += 8 + size + (size & 1)


def _parse(payload: bytes):
    """→ (meta dict, movi_fourcc_pos, movi_end, idx1 list[(ckid, off, size)])."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    meta: dict = {}
    movi_pos = movi_end = None
    idx1 = []
    for ckid, dstart, size in _iter_chunks(payload, 12, len(payload)):
        if ckid == b"LIST":
            four = payload[dstart : dstart + 4]
            if four == b"hdrl":
                _parse_hdrl(payload, dstart + 4, dstart + size, meta)
            elif four == b"movi":
                movi_pos, movi_end = dstart, dstart + size
        elif ckid == b"idx1":
            for i in range(dstart, dstart + size - 15, 16):
                eid = payload[i : i + 4]
                _flags, off, ln = struct.unpack_from("<III", payload, i + 4)
                idx1.append((eid, off, ln))
    if "width" not in meta:
        raise ValueError("AVI missing avih header")
    if movi_pos is None:
        raise ValueError("AVI missing movi list")
    return meta, movi_pos, movi_end, idx1


def _parse_hdrl(buf: bytes, start: int, end: int, meta: dict) -> None:
    for ckid, dstart, size in _iter_chunks(buf, start, end):
        if ckid == b"avih":
            vals = struct.unpack_from("<14I", buf, dstart)
            meta["us_per_frame"] = vals[0]
            meta["n_frames"] = vals[4]
            meta["width"], meta["height"] = vals[8], vals[9]
        elif ckid == b"LIST" and buf[dstart : dstart + 4] == b"strl":
            for sid, sstart, ssize in _iter_chunks(buf, dstart + 4, dstart + size):
                if sid == b"strh" and buf[sstart : sstart + 4] == b"vids":
                    meta["handler"] = buf[sstart + 4 : sstart + 8]
                    scale, rate = struct.unpack_from("<II", buf, sstart + 20)
                    if scale:
                        meta["fps"] = rate // scale
                elif sid == b"strf" and "compression" not in meta:
                    (meta["compression"],) = struct.unpack_from("<I", buf, sstart + 16)
                    (meta["bit_count"],) = struct.unpack_from("<H", buf, sstart + 14)


def probe_avi(payload: bytes) -> dict:
    """Header-only metadata: width/height/fps/n_frames/codec. Never touches
    frame bytes — the cheap metadata scan."""
    meta, _pos, _end, _idx = _parse(payload)
    comp = meta.get("compression", 0)
    codec = "DIB " if comp == 0 else struct.pack("<I", comp).decode("latin1")
    return {
        "width": meta["width"],
        "height": meta["height"],
        "fps": meta.get("fps", 1_000_000 // meta["us_per_frame"] if meta.get("us_per_frame") else 0),
        "n_frames": meta["n_frames"],
        "codec": codec,
    }


def _frame_locations(payload, meta, movi_pos, movi_end, idx1):
    """→ list of (data_start, size) per frame, in stream order. Prefers the
    idx1 index (both offset conventions); falls back to a chunk scan."""
    vids = (b"00dc", b"00db")
    if idx1:
        locs = []
        # stream 0 only — a second video stream's 01dc chunks must not
        # interleave into the stream-0 frame sequence the metadata describes
        entries = [e for e in idx1 if e[0] in vids]
        if entries:
            # convention probe: relative-to-movi offsets point AT a chunk id
            base = movi_pos
            eid, off, _ln = entries[0]
            if payload[base + off : base + off + 4] != eid:
                base = 0  # absolute-offset convention
            for eid, off, ln in entries:
                if payload[base + off : base + off + 4] != eid:
                    raise ValueError("AVI idx1 entry does not point at its chunk")
                locs.append((base + off + 8, ln))
            return locs
    return [
        (dstart, size)
        for ckid, dstart, size in _iter_chunks(payload, movi_pos + 4, movi_end)
        if ckid in vids
    ]


def _decode_frame(payload: bytes, loc, meta):
    import numpy as np

    dstart, size = loc
    data = payload[dstart : dstart + size]
    comp = meta.get("compression", 0)
    if comp == struct.unpack("<I", b"MJPG")[0]:
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    if comp == 0:  # BI_RGB
        if meta.get("bit_count", 24) != 24:
            raise NotImplementedError("decode_avi: only 24-bit BI_RGB DIB frames")
        h, w = meta["height"], meta["width"]
        stride = (w * 3 + 3) & ~3
        if len(data) < stride * h:
            raise ValueError("AVI DIB frame truncated")
        rows = np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride)
        return rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()
    fourcc = struct.pack("<I", comp).decode("latin1", "replace")
    raise NotImplementedError(f"decode_avi: no in-container decoder for codec {fourcc!r}")


def decode_avi(payload: bytes, indices=None):
    """→ (fps, [frames as (h, w, 3) uint8 RGB]). With ``indices`` (sorted
    or not), only those frames are located and decoded — the index-seek
    path never entropy-decodes unsampled frames."""
    meta, movi_pos, movi_end, idx1 = _parse(payload)
    locs = _frame_locations(payload, meta, movi_pos, movi_end, idx1)
    if indices is None:
        picks = list(range(len(locs)))
    else:
        picks = list(indices)
        bad = [i for i in picks if i < 0 or i >= len(locs)]
        if bad:
            raise ValueError(f"decode_avi: frame indices out of range: {bad}")
    fps = meta.get("fps") or (1_000_000 // meta["us_per_frame"] if meta.get("us_per_frame") else 0)
    return fps, [_decode_frame(payload, locs[i], meta) for i in picks]


# ---------------------------------------------------------------------------
# DataFrame kernel
# ---------------------------------------------------------------------------
VIDEO_STATS_SCHEMA = (
    "media_id long, n_frames long, width long, height long, fps long, "
    "n_sampled long, sampled_px_sum long, sampled_px_max long"
)


def video_stats(media, every_k: int = 3):
    """Per-video stats over every ``every_k``-th frame (index-seeked):
    mapInPandas kernel over (media_id, payload). Payloads that are not
    AVI / have no in-container codec / are malformed pass through with
    NULLs — the honest gate, matching rgb_stats/pcm_stats."""
    import pandas as pd

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "n_frames", "width", "height", "fps",
                "n_sampled", "sampled_px_sum", "sampled_px_max",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    info = probe_avi(bytes(payload))
                    picks = list(range(0, info["n_frames"], every_k))
                    _fps, frames = decode_avi(bytes(payload), indices=picks)
                    sums = [int(f.astype(np.int64).sum()) for f in frames]
                    out["n_frames"].append(info["n_frames"])
                    out["width"].append(info["width"])
                    out["height"].append(info["height"])
                    out["fps"].append(info["fps"])
                    out["n_sampled"].append(len(frames))
                    out["sampled_px_sum"].append(sum(sums))
                    out["sampled_px_max"].append(max(sums) if sums else None)
                except (NotImplementedError, ValueError, struct.error):
                    # no in-container decoder for this codec, or a malformed
                    # container — NULL row instead of a failed task
                    for k in list(out)[1:]:
                        out[k].append(None)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(kernel, schema=VIDEO_STATS_SCHEMA)


FRAME_ROWS_SCHEMA = (
    "media_id long, frame_idx long, width long, height long, "
    "px_sum long, px_min long, px_max long, frame_rgb binary"
)


def extract_frames(media, every_k: int = 3, emit_pixels: bool = False):
    """Explode videos into one row PER SAMPLED FRAME — the training-data
    shape (a frame dataset from a video corpus). Index-seeked like
    video_stats: unsampled frames are never entropy-decoded. With
    ``emit_pixels`` the raw RGB8 bytes ride along (decode-once, train
    downstream); default off so the exploded table stays narrow.

    Scale notes: output cardinality is n_videos * ceil(n_frames/every_k)
    — budget partitions for the EXPLODED size when emit_pixels is on
    (payload bytes multiply). Undecodable/NULL payloads contribute zero
    rows here (a frame DATASET wants no NULL frames; use video_stats for
    the per-asset audit including failures)."""
    import pandas as pd

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "width", "height",
                "px_sum", "px_min", "px_max", "frame_rgb",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    info = probe_avi(bytes(payload))
                    picks = list(range(0, info["n_frames"], every_k))
                    _fps, frames = decode_avi(bytes(payload), indices=picks)
                except (NotImplementedError, ValueError, struct.error):
                    continue
                for idx, f in zip(picks, frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["height"].append(f.shape[0])
                    out["width"].append(f.shape[1])
                    out["px_sum"].append(int(f.astype(np.int64).sum()))
                    out["px_min"].append(int(f.min()))
                    out["px_max"].append(int(f.max()))
                    out["frame_rgb"].append(f.tobytes() if emit_pixels else None)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(kernel, schema=FRAME_ROWS_SCHEMA)
