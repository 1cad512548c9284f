"""ISO-BMFF (MP4) box walker — header-only video metadata, pure
stdlib. The asset table's mime column carries ``video/mp4``
(``multimodal.MIMES``); full mp4 DECODE genuinely needs a native
codec stack (h264/h265/av1), so the vendored scope here is the
metadata layer every pipeline needs before it ever decodes: duration,
timescale, track count, per-track handler + codec fourcc, and video
track dimensions — all stable public ISO 14496-12 header fields, the
same trade ``parse_image_dims`` makes for stills.

Error contract matches the other vendored codecs: anything out of
spec raises ValueError and the multimodal tier falls back to its
deterministic stand-in.
"""

from __future__ import annotations

import struct

_BOX_HEADER = struct.Struct(">I4s")


def _boxes(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        size, btype = _BOX_HEADER.unpack_from(data, pos)
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, body)
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, body, pos + size
        pos += size


def parse_mp4_meta(data: bytes) -> dict:
    """{duration_s, timescale, n_tracks, tracks: [{handler, codec,
    width, height}]} from the moov tree; ValueError if the payload is
    not ISO-BMFF or the moov/mvhd boxes are absent/corrupt."""
    try:
        return _parse_strict(data)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt MP4: {exc!r}") from exc


def _parse_strict(data: bytes) -> dict:
    if len(data) < 12 or data[4:8] not in (b"ftyp", b"moov", b"styp"):
        raise ValueError("not ISO-BMFF (no leading ftyp/moov box)")
    moov = None
    for btype, body, box_end in _boxes(data, 0, len(data)):
        if btype == b"moov":
            moov = (body, box_end)
            break
    if moov is None:
        raise ValueError("no moov box")
    duration = timescale = None
    tracks: list[dict] = []
    for btype, body, box_end in _boxes(data, *moov):
        if btype == b"mvhd":
            version = data[body]
            if version == 1:
                timescale, duration = struct.unpack_from(">IQ", data, body + 20)
            else:
                timescale, duration = struct.unpack_from(">II", data, body + 12)
        elif btype == b"trak":
            tracks.append(_parse_trak(data, body, box_end))
    if timescale in (None, 0):
        raise ValueError("missing or zero-timescale mvhd")
    return {
        "duration_s": round(duration / timescale, 6),
        "timescale": timescale,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


def _parse_trak(data: bytes, pos: int, end: int) -> dict:
    info = {"handler": None, "codec": None, "width": None, "height": None}
    for btype, body, box_end in _boxes(data, pos, end):
        if btype == b"tkhd":
            version = data[body]
            # ISO 14496-12 tkhd BODY layout (post size+type header):
            # verflags 4 + times/id/reserved/duration (20 v0 / 32 v1)
            # + reserved 8 + layer/alt/volume/reserved 8 + matrix 36
            # = 76 (v0) / 88 (v1), then width/height as 16.16 fixed
            off = body + (88 if version == 1 else 76)
            if off + 8 <= box_end:
                w16, h16 = struct.unpack_from(">II", data, off)
                info["width"], info["height"] = w16 >> 16, h16 >> 16
        elif btype == b"mdia":
            for mtype, mbody, mend in _boxes(data, body, box_end):
                if mtype == b"hdlr":
                    info["handler"] = data[mbody + 8 : mbody + 12].decode(
                        "ascii", "replace"
                    )
                elif mtype == b"minf":
                    info["codec"] = _first_sample_codec(data, mbody, mend)
    return info


def _first_sample_codec(
    data: bytes, pos: int, end: int, depth: int = 8
) -> str | None:
    if depth <= 0:
        # crafted deep nesting must exhaust the walk, not the Python
        # stack — RecursionError would escape the ValueError batch
        # contract and kill the whole Arrow batch
        return None
    for btype, body, box_end in _boxes(data, pos, end):
        if btype == b"stbl":
            for stype, sbody, send in _boxes(data, body, box_end):
                if stype == b"stsd" and sbody + 16 <= send:
                    return data[sbody + 12 : sbody + 16].decode("ascii", "replace")
        elif btype in (b"vmhd", b"smhd", b"dinf"):
            continue
        else:  # stbl may be nested under unknown wrappers; descend
            try:
                found = _first_sample_codec(data, body, box_end, depth - 1)
            except ValueError:
                found = None
            if found:
                return found
    return None


def synth_mp4_meta(
    duration_s: float,
    timescale: int = 1_000,
    tracks: tuple[tuple[str, str, int, int], ...] = (("vide", "avc1", 640, 360),),
) -> bytes:
    """Minimal valid ISO-BMFF bytes (ftyp + moov/mvhd + one trak per
    spec entry) for tests and fixtures — the encoder half of the
    parse contract, like ``encode_wav``/``encode_avi_dib``."""
    dur = int(round(duration_s * timescale))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + b"\x00" * 80,
    )
    traks = b""
    for handler, codec, w, h in tracks:
        tkhd = _box(
            b"tkhd",
            b"\x00\x00\x00\x07"  # version 0 + flags
            # ctime, mtime, track_id, reserved, duration (20 bytes)
            + struct.pack(">IIIII", 0, 0, 1, 0, dur)
            # reserved 8 + layer/alternate/volume/reserved 8 + matrix 36
            + b"\x00" * 52
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = _box(
            b"hdlr",
            b"\x00" * 8 + handler.encode("ascii") + b"\x00" * 12 + b"\x00",
        )
        stsd = _box(
            b"stsd",
            b"\x00" * 4
            + struct.pack(">I", 1)
            + _box(codec.encode("ascii"), b"\x00" * 70),
        )
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdhd = _box(
            b"mdhd",
            b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, timescale, dur) + b"\x00" * 4,
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body
