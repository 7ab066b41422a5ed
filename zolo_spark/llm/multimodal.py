"""Multimodal columns: opaque binary media + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so media bytes never round-trip
through Python row-by-row.

Codecs: PNG (grayscale 8-bit) is implemented for real in pure
Python/stdlib — :func:`png_encode` / :func:`png_decode` speak the
actual PNG container (signature, CRC-checked chunks, zlib-inflated
IDAT, all five scanline filters), so ``mode='real'`` genuinely
decodes pixels. Other formats (JPEG/audio/video) still stub at the
same seam: ``mode='fake'`` produces deterministic md5-derived pseudo
features (schema/batching/partitioning fully exercised) and the
ffmpeg-class codecs raise ``NotImplementedError`` where they'd plug
in.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes int, sha string, "
    "feat array<float>"
)
N_FEATURES = 8


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media table: content is a GENUINE grayscale PNG
    (seeded pixels) so both the fake feature path and the real decode
    path run against it."""
    rows = []
    for i in range(n):
        w, h = 32 + i % 8, 32 + i % 4
        j = np.arange(w * h, dtype=np.int64)
        px = ((i * 11 + j * 5) % 256).astype(np.uint8).reshape(h, w)
        rows.append((
            i, bytearray(png_encode(px)), ("image/png", w, h, None),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(content: bytes) -> np.ndarray:
    """Deterministic pseudo-decode: md5-chain over the bytes →
    N_FEATURES floats in [0,1). Stands in for a real pixel decode."""
    h = hashlib.md5(content).digest()
    vals = []
    for i in range(N_FEATURES):
        h = hashlib.md5(h + bytes([i])).digest()
        vals.append(int.from_bytes(h[:4], "big") / 2**32)
    return np.array(vals, dtype=np.float32)


def extract_features(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    The per-batch kernel is where a real implementation calls
    PIL/torchvision/ffmpeg; batch shape, schema, and null handling
    are identical for the real path.
    """
    if mode not in ("fake", "real"):
        raise ValueError(mode)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                b = bytes(content) if content is not None else b""
                sizes.append(len(b))
                if mode == "fake":
                    shas.append(hashlib.sha1(b).hexdigest())
                    feats.append(_fake_decode(b).tolist())
                    continue
                # real path: PNG decodes for real (pure stdlib);
                # ffmpeg-class formats still stub at this seam
                mime = meta["mime"] if meta is not None else None
                if mime != "image/png":
                    raise NotImplementedError(
                        f"codec for {mime!r} unavailable in this "
                        "environment; plug PIL/ffmpeg decode here"
                    )
                img = png_decode(b)
                p = img["pixels"].reshape(-1).astype(np.int64)
                shas.append(hashlib.sha1(p.tobytes()).hexdigest())
                feats.append(np.array([
                    img["width"], img["height"], img["bit_depth"],
                    p.size, p.mean(), p.min(), p.max(),
                    int((np.arange(p.size) * p).sum()) % 9973,
                ], dtype=np.float32).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["meta"].map(
                    lambda m: m["mime"] if m is not None else None
                ),
                "n_bytes": pd.Series(sizes, dtype="int32"),
                "sha": shas,
                "feat": feats,
            })

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)


# ------------------------------------------------------------ PNG codec
#
# Pure-stdlib grayscale 8-bit PNG (RFC 2083). The encoder cycles
# through all five scanline filter types so round-trip tests exercise
# every defilter path; the decoder is a strict real decoder: signature
# + per-chunk CRC32 verification, IHDR parse, multi-IDAT zlib inflate,
# full None/Sub/Up/Average/Paeth reconstruction.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 array as a grayscale 8-bit PNG.

    Scanline ``r`` uses filter type ``r % 5`` — deliberately cycling
    None/Sub/Up/Average/Paeth so any consumer must implement the whole
    filter spec (and our round-trip tests prove the decoder does)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("png_encode expects an (H, W) grayscale array")
    h, w = px.shape
    raw = bytearray()
    prior = np.zeros(w, dtype=np.int32)
    for r in range(h):
        row = px[r].astype(np.int32)
        left = np.concatenate(([0], row[:-1]))
        ul = np.concatenate(([0], prior[:-1]))
        ftype = r % 5
        if ftype == 0:
            f = row
        elif ftype == 1:
            f = row - left
        elif ftype == 2:
            f = row - prior
        elif ftype == 3:
            f = row - (left + prior) // 2
        else:
            f = row - _paeth(left, prior, ul)
        raw.append(ftype)
        raw.extend((f % 256).astype(np.uint8).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_decode(data: bytes) -> dict:
    """Decode a grayscale 8-bit PNG produced by any conformant encoder.

    Returns ``{"width", "height", "bit_depth", "color_type",
    "pixels"}`` with pixels an (H, W) uint8 array. Raises ``ValueError``
    on bad signature, CRC mismatch, truncation, or an unsupported
    pixel format (only what :func:`png_encode` emits is in scope)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        body = data[pos + 8: pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk body")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length: pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, bit_depth, color_type, comp, filt, interlace = ihdr
    if (bit_depth, color_type, comp, filt, interlace) != (8, 0, 0, 0, 0):
        raise ValueError(
            f"unsupported PNG format: depth={bit_depth} color={color_type} "
            f"interlace={interlace}"
        )
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.empty((h, w), dtype=np.int32)
    prior = np.zeros(w, dtype=np.int32)
    for r in range(h):
        line = raw[r * (w + 1): (r + 1) * (w + 1)]
        ftype, f = line[0], np.frombuffer(line[1:], np.uint8).astype(np.int32)
        if ftype == 0:
            row = f
        elif ftype == 2:
            row = (f + prior) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters are a sequential recurrence
            row = np.empty(w, dtype=np.int32)
            left = 0
            for x in range(w):
                if ftype == 1:
                    row[x] = (f[x] + left) % 256
                elif ftype == 3:
                    row[x] = (f[x] + (left + prior[x]) // 2) % 256
                else:
                    ul = prior[x - 1] if x else 0
                    row[x] = (f[x] + int(_paeth(
                        np.array([left]), prior[x: x + 1], np.array([ul])
                    )[0])) % 256
                left = row[x]
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[r] = row
        prior = row
    return {
        "width": w, "height": h, "bit_depth": bit_depth,
        "color_type": color_type, "pixels": out.astype(np.uint8),
    }


def documents_png(documents: DataFrame) -> DataFrame:
    """Derive a REAL image column from the ``documents`` table: each
    doc gets a grayscale PNG whose dimensions and pixels are a fixed
    integer function of ``doc_id`` (w = 8 + id%9, h = 8 + id%5,
    p_j = (id*7 + j*13) % 256). Deterministic and closed-form, so the
    decoded statistics carry an exact DuckDB oracle while the bytes
    travel through a genuine PNG encode."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 8 + i % 9, 8 + i % 5
                j = np.arange(w * h, dtype=np.int64)
                px = ((i * 7 + j * 13) % 256).astype(np.uint8).reshape(h, w)
                contents.append(png_encode(px))
                metas.append(
                    {"mime": "image/png", "width": w, "height": h,
                     "duration_ms": None}
                )
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "content": contents,
                "meta": metas,
            })

    return documents.select("doc_id").mapInPandas(kernel, schema=MEDIA_SCHEMA)


IMAGE_STATS_SCHEMA = (
    "media_id long, width long, height long, n_pixels long, "
    "sum_px long, mean_px double, min_px long, max_px long, checksum long"
)


def image_stats(media: DataFrame) -> DataFrame:
    """REAL decode path: parse each PNG (CRC-verified, inflated,
    defiltered) and emit exact integer/double pixel statistics.
    ``checksum`` is the order-sensitive Σ j·p_j mod 9973, so a decoder
    that permutes or mis-reconstructs even one pixel fails the value
    hash. All sums are exact int64 arithmetic → bit-stable doubles."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                img = png_decode(bytes(content))
                p = img["pixels"].reshape(-1).astype(np.int64)
                n = int(p.size)
                total = int(p.sum())
                rows.append({
                    "media_id": int(media_id),
                    "width": img["width"],
                    "height": img["height"],
                    "n_pixels": n,
                    "sum_px": total,
                    "mean_px": total / n,
                    "min_px": int(p.min()),
                    "max_px": int(p.max()),
                    "checksum": int((np.arange(n) * p).sum()) % 9973,
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=IMAGE_STATS_SCHEMA)


# ------------------------------------------------------------ WAV codec
#
# Pure-stdlib PCM16 mono WAV (RIFF). Same pattern as the PNG path:
# the container is real (RIFF/fmt/data chunk structure, validated on
# decode), the media derives deterministically from the documents
# table, and the decoded statistics are exact integer math — so the
# audio modality carries a full value oracle too.


def wav_encode(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode an int16 sample vector as a mono PCM16 WAV."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def wav_decode(data: bytes) -> dict:
    """Decode a mono PCM16 WAV. Returns ``{"rate", "n_samples",
    "samples"}``; raises ``ValueError`` on a malformed container or an
    unsupported format (only what :func:`wav_encode` emits is in
    scope)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF body")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos: pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4: pos + 8])
        body = data[pos + 8: pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, depth = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if (audio_fmt, channels, depth) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV format: fmt={audio_fmt} "
                    f"channels={channels} depth={depth}"
                )
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return {"rate": rate, "n_samples": int(samples.size), "samples": samples}


def documents_wav(documents: DataFrame, rate: int = 8000) -> DataFrame:
    """Derive a REAL audio column from ``documents``: doc_id seeds a
    deterministic int16 sample vector (s_j = ((id*31 + j*17) % 2048)
    - 1024, n = 400 + (id%5)*100) carried through a genuine WAV
    encode, so decoded statistics have a closed-form oracle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = 400 + (i % 5) * 100
                j = np.arange(n, dtype=np.int64)
                s = ((i * 31 + j * 17) % 2048) - 1024
                contents.append(wav_encode(s.astype(np.int16), rate))
                metas.append({
                    "mime": "audio/wav", "width": None, "height": None,
                    "duration_ms": n * 1000 // rate,
                })
            yield pd.DataFrame({
                "media_id": pdf["doc_id"], "content": contents, "meta": metas,
            })

    return documents.select("doc_id").mapInPandas(kernel, schema=MEDIA_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "media_id long, sample_rate long, n_samples long, duration_ms double, "
    "rms double, peak long, zero_crossings long"
)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode path: parse each WAV and emit exact
    statistics — RMS (integer square sum → bit-stable double), peak
    |amplitude|, and the zero-crossing count (sign-product test, the
    classic cheap pitch/voicedness signal)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                wav = wav_decode(bytes(content))
                s = wav["samples"].astype(np.int64)
                n = wav["n_samples"]
                rows.append({
                    "media_id": int(media_id),
                    "sample_rate": wav["rate"],
                    "n_samples": n,
                    "duration_ms": n * 1000 / wav["rate"],
                    "rms": float(np.sqrt(int((s * s).sum()) / n)),
                    "peak": int(np.abs(s).max()),
                    "zero_crossings": int((s[:-1] * s[1:] < 0).sum()),
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=AUDIO_STATS_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (real decoder stubbed the same way). Media with
    no duration (images) yield a single frame at t=0."""
    frames = F.when(
        F.col("meta.duration_ms").isNotNull(),
        F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)),
    ).otherwise(F.array(F.lit(0).cast("long")))
    return media.select(
        "media_id", F.explode(frames).alias("frame_ms"), "meta.mime"
    )
