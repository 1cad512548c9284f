"""Vendored AVI container codec (parse + frame extraction + encode),
pure stdlib + numpy — the video leg of the multimodal tier.

The asset table's mime column has always carried a video mime
(``multimodal.MIMES``) with frame extraction stubbed to metadata-only
index planning (``multimodal.sample_frame_indices``); this module
makes the fetch real, the same way the vendored image codecs did for
stills: a dependency-free RIFF-AVI walk that returns the actual pixel
frames at the requested indices, so the sample-then-decode path runs
in CI with no media library.

Scope: RIFF ``AVI `` containers with one video stream —
- ``00db`` uncompressed DIB frames (BI_RGB 24-bit BGR, bottom-up rows
  word-padded to 4 bytes — the same pixel layout ``bmp_codec``
  handles, minus the BMP file header), decoded to RGB top-down;
- ``00dc`` MJPEG frames, each a complete baseline JPEG handed to the
  vendored ``jpeg_codec`` (motion-JPEG is literally a JPEG per frame —
  the one video codec a pure-python stack can decode for real).
Audio streams and other compression fourccs raise ValueError — the
standard vendored-codec error contract (fall back to the
deterministic stand-in, never kill the Arrow batch).

Frame indexing walks the ``movi`` list in stream order (AVI's
canonical frame order; the optional ``idx1`` index is a seek
accelerator, not a semantic requirement) and materializes ONLY the
requested indices — sampling k frames from an N-frame payload does
decode work proportional to k, though the container walk itself is a
linear header scan (chunk sizes let it skip frame bodies without
reading them).

Scale note: like the image codecs, per-payload work is bounded and
batch-local (mapInPandas over binary columns, zero shuffle); frame
sampling at 100 TB parallelizes over assets, never within one.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 64_000_000  # per frame, same fuse as the image codecs
_MAX_FRAMES = 1_000_000


def encode_avi_dib(
    frames: list[np.ndarray], fps: int = 10
) -> bytes:
    """Encode RGB uint8 frames (each (H, W, 3)) as an uncompressed
    BI_RGB AVI: '00db' DIB chunks, BGR bottom-up word-padded rows —
    the layout every AVI tool writes for raw video. Byte-deterministic
    (fixed header layout, no idx1), so CI can hash payloads."""
    if not frames:
        raise ValueError("no frames")
    h, w, ch = frames[0].shape
    if ch != 3:
        raise ValueError(f"RGB frames only (got {ch} channels)")
    if fps <= 0:
        raise ValueError(f"bad fps {fps}")
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    bodies = []
    for fr in frames:
        if fr.shape != (h, w, 3):
            raise ValueError("frames must share one shape")
        bgr = np.ascontiguousarray(fr[::-1, :, ::-1], dtype=np.uint8)  # flip+swap
        if pad:
            rows = bgr.reshape(h, w * 3)
            rows = np.hstack([rows, np.zeros((h, pad), dtype=np.uint8)])
            bodies.append(rows.tobytes())
        else:
            bodies.append(bgr.tobytes())
    frame_len = row_bytes * h
    n = len(frames)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        frame_len * fps,  # max bytes per second
        0,  # padding granularity
        0,  # flags: no AVIF_HASINDEX — this encoder writes no idx1
        n,  # total frames
        0,  # initial frames
        1,  # streams
        frame_len,  # suggested buffer size
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,  # scale, rate -> fps
        0, n, frame_len, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(  # BITMAPINFOHEADER, BI_RGB
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_len, 0, 0, 0, 0
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi = _list(b"movi", b"".join(_chunk(b"00db", b) for b in bodies))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + b"\x00" * (len(body) & 1)


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def parse_avi_meta(data: bytes) -> tuple[int, int, int, int, str]:
    """Header-only (width, height, n_frames, fps, fourcc) — the video
    analog of ``parse_image_dims``; no frame bytes are touched."""
    try:
        w, h, n, fps, fourcc, _movi, _stream = _walk_headers(data)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt AVI: {exc!r}") from exc
    return w, h, n, fps, fourcc


def _walk_headers(data: bytes) -> tuple[int, int, int, int, str, int, int]:
    """RIFF header walk → (w, h, n_frames, fps, fourcc, movi_body_pos,
    video_stream_index). LIST nesting uses an explicit (end, resume)
    stack so SIBLING lists are all visited — an AVI whose audio strl
    precedes the video strl must still find the video stream, and the
    returned stream index maps frame chunks (``01db`` when video is
    stream 1, not ``00db``) for the decoder."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF signature)")
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    pos = 12
    stack: list[tuple[int, int]] = []  # (parent end, resume pos)
    w = h = n_frames = None
    us_per_frame = 0
    fourcc = None
    in_vids = False
    n_streams = 0
    vid_stream = None
    movi_at = None
    while True:
        if pos + 8 > end:
            if not stack:
                break
            end, pos = stack.pop()  # list exhausted: resume the parent
            continue
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if tag == b"LIST":
            kind = data[body : body + 4]
            if kind == b"movi":
                movi_at = body + 4
                break  # headers precede movi in every legal AVI
            # descend into hdrl/strl; remember where the parent resumes
            stack.append((end, body + size + (size & 1)))
            end = min(end, body + size)
            pos = body + 4
            continue
        if tag == b"avih":
            (us_per_frame,) = struct.unpack_from("<I", data, body)
            n_frames = struct.unpack_from("<I", data, body + 16)[0]
            w, h = struct.unpack_from("<II", data, body + 32)
        elif tag == b"strh":
            stype, handler = struct.unpack_from("<4s4s", data, body)
            in_vids = stype == b"vids" and vid_stream is None
            if in_vids:
                vid_stream = n_streams
                # provisional: real writers often leave fccHandler as
                # NULs for raw video; strf's biCompression (below) is
                # the authoritative codec field and overrides this
                fourcc = handler.decode("ascii", "replace").strip("\x00 ").upper()
            n_streams += 1
        elif tag == b"strf" and in_vids and size >= 20:
            # BITMAPINFOHEADER.biCompression at body+16: 0 = BI_RGB
            # (uncompressed DIB), else the codec fourcc bytes (MJPG...)
            (compression,) = struct.unpack_from("<I", data, body + 16)
            if compression == 0:
                fourcc = "DIB"
            else:
                fourcc = (
                    compression.to_bytes(4, "little")
                    .decode("ascii", "replace")
                    .strip("\x00 ")
                    .upper()
                )
        pos = body + size + (size & 1)
    if w is None or n_frames is None or movi_at is None:
        raise ValueError("missing avih header or movi list")
    if fourcc is None or vid_stream is None:
        raise ValueError("no video stream (vids strh) found")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"bad frame dimensions {w}x{h}")
    if n_frames <= 0 or n_frames > _MAX_FRAMES:
        raise ValueError(f"bad frame count {n_frames}")
    fps = 1_000_000 // us_per_frame if us_per_frame else 0
    return w, h, n_frames, fps, fourcc, movi_at, vid_stream


def decode_avi_frames(
    data: bytes, indices: list[int] | None = None
) -> tuple[tuple[int, int, int, int, str], list[np.ndarray]]:
    """((width, height, n_frames, fps, fourcc), [RGB uint8 (H, W, 3)
    arrays at ``indices``]) — indices default to every frame. Raises
    ValueError for non-DIB/non-MJPEG streams or corrupt payloads."""
    try:
        return _decode_strict(data, indices)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt AVI: {exc!r}") from exc


def _decode_strict(
    data: bytes, indices: list[int] | None
) -> tuple[tuple[int, int, int, int, str], list[np.ndarray]]:
    w, h, n_frames, fps, fourcc, movi_at, vid_stream = _walk_headers(data)
    if fourcc not in ("DIB", "MJPG"):
        raise ValueError(f"unsupported video fourcc {fourcc!r} (DIB/MJPG only)")
    want = sorted(set(range(n_frames) if indices is None else indices))
    if want and (want[0] < 0 or want[-1] >= n_frames):
        raise ValueError(f"frame index out of range 0..{n_frames - 1}: {want}")
    row_bytes = (w * 3 + 3) & ~3
    out: dict[int, np.ndarray] = {}
    pos = movi_at
    end = len(data)
    frame_no = 0
    wanted = set(want)
    last = want[-1] if want else -1
    # frame chunk ids carry the STREAM index: '01db' when the video
    # stream follows an audio stream, not unconditionally '00db'
    vtags = (b"%02ddb" % vid_stream, b"%02ddc" % vid_stream)
    while pos + 8 <= end and frame_no <= last:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if tag in vtags:
            if frame_no in wanted:
                raw = data[body : body + size]
                if tag.endswith(b"db"):
                    if len(raw) < row_bytes * h:
                        raise ValueError(f"truncated DIB frame {frame_no}")
                    rows = np.frombuffer(raw[: row_bytes * h], dtype=np.uint8)
                    rows = rows.reshape(h, row_bytes)[:, : w * 3]
                    bgr = rows.reshape(h, w, 3)
                    out[frame_no] = bgr[::-1, :, ::-1].copy()  # -> RGB top-down
                else:  # MJPEG: a complete baseline JPEG per frame
                    from ad_data_lake_spark.llm import jpeg_codec, jpeg_ffi

                    # native libjpeg shim when present (see jpeg_ffi;
                    # bit-identical on DC-only blocks), vendored else
                    decode = (
                        jpeg_ffi.decode_jpeg
                        if jpeg_ffi.available()
                        else jpeg_codec.decode_jpeg
                    )
                    jw, jh, ch, px = decode(bytes(raw))
                    arr = np.frombuffer(px, dtype=np.uint8).reshape(jh, jw, ch)
                    if ch == 1:
                        arr = np.repeat(arr, 3, axis=2)
                    out[frame_no] = arr
            frame_no += 1
        pos = body + size + (size & 1)
    missing = wanted - out.keys()
    if missing:
        raise ValueError(f"frames {sorted(missing)} absent from movi stream")
    return (w, h, n_frames, fps, fourcc), [out[i] for i in want]
