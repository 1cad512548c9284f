"""Vendored RIFF/WAVE codec (decode + encode + resample), pure
stdlib + numpy — the audio leg of the multimodal tier.

The reference uploader's media surface is images
(``/root/reference/pages/2_Creative_Uploader.py:25``), but the asset
table's mime column has always carried ``audio/wav``
(``multimodal.MIMES``) with decode gated behind soundfile — this
module removes that gate the same way the vendored image codecs did
for PNG/JPEG/GIF/BMP/WebP: a dependency-free decoder so the REAL
decode branch runs in CI, with the deterministic stand-in only for
formats that genuinely need a native library (mp3/aac/opus).

Scope: canonical RIFF little-endian WAVE containers —
- fmt 1 (integer PCM) at 8-bit unsigned and 16-bit signed,
- fmt 3 (IEEE float32),
- fmt 0xFFFE (WAVE_FORMAT_EXTENSIBLE) wrapping either of the above,
mono or interleaved multi-channel, with unknown chunks (LIST, fact,
cue) skipped per the RIFF walk rules (word-aligned chunk sizes).
Everything else (ADPCM, mp3-in-wav, 24-bit packing) raises ValueError,
and the multimodal tier falls back to its deterministic stand-in —
the same error contract as the image codecs (a corrupt or exotic
payload never kills an Arrow batch).

Decoded samples are always int16 (PCM8 is widened exactly,
``(v - 128) * 256``; float32 is clipped to [-1, 1] and scaled by
32767 with round-half-even), shape ``(n_frames, channels)`` — one
fixed type downstream feature kernels can vectorize over.

Scale note: per-payload work is bounded by the payload (one numpy
frombuffer + reshape — no per-sample Python loop), and the codec runs
inside Arrow batches exactly like the image codecs; a 100 TB audio
corpus decodes embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# Declared-length fuse, same role as the image codecs' pixel caps: a
# tiny forged header must not make us allocate gigabytes. 64 M frames
# x 2 ch x 2 B = 256 MB ceiling per payload.
_MAX_FRAMES = 64_000_000


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000, channels: int | None = None
) -> bytes:
    """Encode int16 samples as a canonical PCM16 RIFF/WAVE payload.

    ``samples`` is ``(n_frames,)`` mono or ``(n_frames, channels)``
    interleaved; the output is byte-deterministic (fixed 44-byte
    header, no padding chunks), which is what lets CI hash it."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {arr.shape}")
    n_frames, n_ch = arr.shape
    if channels is not None and channels != n_ch:
        raise ValueError(f"channels={channels} but samples carry {n_ch}")
    if sample_rate <= 0:
        raise ValueError(f"bad sample rate {sample_rate}")
    data = arr.astype("<i2").tobytes()
    block_align = n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(tag: bytes, body: bytes) -> bytes:
    out = tag + struct.pack("<I", len(body)) + body
    return out + b"\x00" * (len(body) & 1)  # RIFF word alignment


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, channels, int16 samples shaped (n_frames,
    channels)) for a PCM8/PCM16/float32 WAVE payload; ValueError for
    anything else (ADPCM, truncation, forged headers)."""
    try:
        return _decode_wav_strict(data)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt WAV: {exc!r}") from exc


def parse_wav_meta(data: bytes) -> tuple[int, int, int, int]:
    """Header-only (sample_rate, channels, bits_per_sample, n_frames)
    — the hot-path metadata read (the audio analog of
    ``parse_image_dims``): no sample bytes are touched."""
    sr, n_ch, bits, _fmt, data_len = _walk(data)
    return sr, n_ch, bits, data_len // (n_ch * (bits // 8))


def _walk(data: bytes) -> tuple[int, int, int, int, int]:
    """RIFF chunk walk → (sample_rate, channels, bits, format_tag,
    data_chunk_length); raises ValueError on anything out of spec."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAVE (bad RIFF signature)")
    pos, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    fmt_tag = n_ch = sr = bits = None
    data_len = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"short fmt chunk ({size} bytes)")
            fmt_tag, n_ch, sr, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if fmt_tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag in GUID
                if size < 40:
                    raise ValueError("extensible fmt chunk too short")
                fmt_tag = struct.unpack_from("<H", data, body + 24)[0]
        elif tag == b"data":
            data_len = min(size, len(data) - body)
            if data_len < size:
                raise ValueError(
                    f"truncated data chunk ({size} declared, {data_len} present)"
                )
            break  # canonical layout: data is last; nothing else needed
        pos = body + size + (size & 1)
    if fmt_tag is None or data_len is None:
        raise ValueError("missing fmt or data chunk")
    if fmt_tag not in (1, 3):
        raise ValueError(f"unsupported WAVE format tag {fmt_tag} (PCM/float only)")
    if n_ch < 1 or n_ch > 64:
        raise ValueError(f"bad channel count {n_ch}")
    if sr <= 0:
        raise ValueError(f"bad sample rate {sr}")
    if fmt_tag == 1 and bits not in (8, 16):
        raise ValueError(f"unsupported PCM depth {bits} (8/16 only)")
    if fmt_tag == 3 and bits != 32:
        raise ValueError(f"unsupported float depth {bits} (32 only)")
    n_frames = data_len // (n_ch * (bits // 8))
    if n_frames > _MAX_FRAMES:
        raise ValueError(f"declared {n_frames} frames exceeds cap {_MAX_FRAMES}")
    return sr, n_ch, bits, fmt_tag, data_len


def _decode_wav_strict(data: bytes) -> tuple[int, int, np.ndarray]:
    sr, n_ch, bits, fmt_tag, data_len = _walk(data)
    # find the data chunk body again (cheap: headers are tiny)
    pos = 12
    while data[pos : pos + 4] != b"data":
        (size,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8 + size + (size & 1)
    body = pos + 8
    width = bits // 8
    usable = (data_len // (n_ch * width)) * n_ch * width
    raw = data[body : body + usable]
    if fmt_tag == 3:
        f = np.frombuffer(raw, dtype="<f4").astype(np.float64)
        # round-half-even (np.rint): deterministic, matches the IEEE
        # default rounding a native converter applies
        arr = np.rint(np.clip(f, -1.0, 1.0) * 32767.0).astype(np.int16)
    elif bits == 8:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) * 256
    else:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    return sr, n_ch, arr.reshape(-1, n_ch)


def resample_linear(
    samples: np.ndarray, sr_in: int, sr_out: int
) -> np.ndarray:
    """Deterministic linear-interpolation resample (the classic
    polyphase-free form): output frame t maps to source position
    ``t * sr_in / sr_out``; endpoints clamp. int16 in, int16 out
    (round-half-even), shape-preserving on the channel axis. All
    arithmetic is float64 numpy — bit-reproducible across hosts, which
    is what lets tests pin exact values."""
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError(f"bad rates {sr_in}->{sr_out}")
    arr = np.asarray(samples, dtype=np.int16)
    mono = arr.ndim == 1
    if mono:
        arr = arr[:, None]
    n_in = arr.shape[0]
    if n_in == 0 or sr_in == sr_out:
        # fresh int16 copy, never an alias of the caller's buffer —
        # the identity path must honor the same contract as the rest
        out = arr[:, 0] if mono else arr
        return out.copy()
    n_out = max(1, (n_in * sr_out) // sr_in)
    pos = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    i0 = np.minimum(pos.astype(np.int64), n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    frac = (pos - i0)[:, None]
    out = arr[i0].astype(np.float64) * (1.0 - frac) + arr[i1].astype(np.float64) * frac
    out16 = np.rint(out).astype(np.int16)
    return out16[:, 0] if mono else out16
