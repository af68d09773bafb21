"""Multimodal columns: opaque binary media + typed metadata, decoded by
``mapInPandas`` batch UDFs.

The image/audio libraries are not available in this container, so the
DECODE step is stubbed: ``decode_media_batch`` computes deterministic
fake metadata from the payload bytes, and the real decoder hook raises
``NotImplementedError``. Everything Spark-side is real and tested: the
binary column schema, the batch iterator shape, partition sizing, and
the explode of per-frame samples.

At 100 TB media payloads dominate I/O: the media column lives in its own
parquet column chunk (columnar pruning skips it unless selected), and
``spark.sql.files.maxPartitionBytes`` should be raised so tasks amortize
decode setup per batch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministic binary payload per doc (stand-in for image/audio bytes).

    payload = utf-8 of md5(doc_id) repeated (doc_id % 7 + 1) times;
    media_type cycles image/audio/video by doc_id % 3. Pure column ops —
    replicable in SQL for oracle checks.
    """
    return docs.select(
        "doc_id",
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode(
            F.repeat(F.md5(F.col("doc_id").cast("string")), (F.col("doc_id") % 7 + 1).cast("int")),
            "UTF-8",
        ).alias("media"),
    )


def real_decode(media: bytes, media_type: str):  # pragma: no cover - by design
    """Hook for a real PIXEL decoder (PIL / torchaudio / pyav). Not
    available in this environment; header-level decoding (container
    format, width/height) IS real — see :func:`parse_image_header`."""
    raise NotImplementedError("media decoding libraries are not installed in this container")


# ---------------------------------------------------------- real headers
#
# PNG (IHDR chunk) and JPEG (SOFn segment) dimensions are pure-stdlib
# parses — no image library needed — so the decode path is REAL for the
# header level: byte synthesis below emits valid container bytes, and
# parse_image_header reads dimensions back out of the actual bytes
# (IHDR CRC verified; JPEG marker stream walked to the first SOFn).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def build_png(width: int, height: int) -> bytes:
    """Minimal VALID RGB8 PNG (signature + IHDR + IDAT of zero pixels +
    IEND, all CRCs correct) — pure stdlib, deterministic."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * (3 * width)) * height  # filter-0 scanlines
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b"")
    )


def build_jpeg(width: int, height: int) -> bytes:
    """JFIF header + baseline SOF0 carrying real dimensions (no scan
    data — header-complete, which is the decoded surface here)."""
    import struct

    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def parse_image_header(data: bytes) -> tuple[str, int, int]:
    """(fmt, width, height) from real container bytes; raises ValueError
    on anything malformed. PNG: IHDR with CRC check. JPEG: marker walk to
    the first SOFn (C0-CF except C4/C8/CC), big-endian height, width."""
    import struct
    import zlib

    if data[:8] == _PNG_SIG:
        if len(data) < 33 or data[12:16] != b"IHDR":
            raise ValueError("PNG: missing IHDR")
        (length,) = struct.unpack(">I", data[8:12])
        if length != 13:
            raise ValueError("PNG: bad IHDR length")
        (crc,) = struct.unpack(">I", data[29:33])
        if zlib.crc32(data[12:29]) & 0xFFFFFFFF != crc:
            raise ValueError("PNG: IHDR CRC mismatch")
        w, h = struct.unpack(">II", data[16:24])
        return ("png", w, h)
    if data[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                raise ValueError("JPEG: bad marker stream")
            marker = data[i + 1]
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2
                continue
            (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(data):
                    raise ValueError("JPEG: truncated SOF")
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seglen
        raise ValueError("JPEG: no SOF marker")
    raise ValueError("unsupported format")


def build_wav(sample_rate: int, n_samples: int, channels: int = 1, bits: int = 16) -> bytes:
    """Minimal VALID PCM WAV: RIFF header + 'fmt ' chunk + 'data' chunk
    of zero samples — real container bytes, stdlib-only."""
    import struct

    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(data: bytes) -> tuple[int, int, int, int]:
    """(channels, sample_rate, bits, n_samples) parsed strictly from
    RIFF/WAVE bytes: chunk walk to 'fmt ' (PCM only) and 'data'; raises
    ValueError on anything malformed — the audio twin of
    :func:`parse_image_header`."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("WAV: missing RIFF/WAVE magic")
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16 or len(body) < 16:
                raise ValueError("WAV: short fmt chunk")
            audio_fmt, channels, rate, _br, block, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError("WAV: non-PCM format")
            if block == 0:
                raise ValueError("WAV: zero block align")
            fmt = (channels, rate, bits, block)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV: data before fmt")
            if len(body) != clen:
                raise ValueError("WAV: truncated data chunk")
            channels, rate, bits, block = fmt
            return channels, rate, bits, clen // block
        pos += 8 + clen + (clen % 2)  # RIFF chunks are word-aligned
    raise ValueError("WAV: no data chunk")


def build_mp4(timescale: int, duration: int) -> bytes:
    """Minimal VALID ISO-BMFF MP4: ftyp + moov(mvhd v0) carrying real
    timescale/duration — the third modality's real container bytes."""
    import struct

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    # mvhd version 0: ver/flags, ctime, mtime, timescale, duration,
    # rate, volume+reserved, matrix (identity), predefines, next track
    mvhd_body = (
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)
        + b"\x01\x00" + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2)
    )
    return ftyp + box(b"moov", box(b"mvhd", mvhd_body))


def parse_mp4_header(data: bytes) -> tuple[int, int]:
    """(timescale, duration) from the moov/mvhd box — a strict
    top-level + moov-children box walk (v0 and v1 mvhd); raises
    ValueError on anything malformed. The video twin of
    :func:`parse_image_header` / :func:`parse_wav_header`."""
    import struct

    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("MP4: missing ftyp")

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            typ = buf[pos + 4 : pos + 8]
            if size < 8 or pos + size > end:
                raise ValueError("MP4: bad box size")
            yield typ, pos + 8, pos + size
            pos += size

    for typ, b0, b1 in walk(data, 0, len(data)):
        if typ != b"moov":
            continue
        for ityp, i0, i1 in walk(data, b0, b1):
            if ityp != b"mvhd":
                continue
            ver = data[i0]
            if ver == 0:
                if i1 - i0 < 20:
                    raise ValueError("MP4: short mvhd")
                ts, dur = struct.unpack(">II", data[i0 + 12 : i0 + 20])
            elif ver == 1:
                if i1 - i0 < 32:
                    raise ValueError("MP4: short mvhd")
                (ts,) = struct.unpack(">I", data[i0 + 20 : i0 + 24])
                (dur,) = struct.unpack(">Q", data[i0 + 24 : i0 + 32])
            else:
                raise ValueError("MP4: unknown mvhd version")
            if ts == 0:
                raise ValueError("MP4: zero timescale")
            return ts, dur
        raise ValueError("MP4: moov without mvhd")
    raise ValueError("MP4: no moov box")


def attach_real_media(docs: DataFrame) -> DataFrame:
    """Plant REAL container bytes per doc: image docs (doc_id % 3 == 0)
    get a valid PNG (even doc_id) or JPEG (odd) with deterministic dims
    width = 16 + (doc_id·7) % 97, height = 16 + (doc_id·5) % 61; every
    51st image is truncated to 10 bytes (corrupt-header plant). Audio
    docs (doc_id % 3 == 1) get a valid PCM WAV with channels =
    1 + doc_id % 2, sample_rate = 8000·(1 + (doc_id % 5) % 3),
    n_samples = 100 + (doc_id·13) % 997; doc_id % 53 == 0 audio is
    truncated to 8 bytes (corrupt plant — 53·k ≡ 1 mod 3 does occur,
    unlike multiples of 51). Video docs (doc_id % 3 == 2) get a valid
    MP4 ftyp+moov/mvhd with timescale = 1000·(1 + (doc_id % 7) % 3),
    duration = 500 + (doc_id·17) % 9001; doc_id % 59 == 0 video is
    truncated to 10 bytes (corrupt plant: ftyp magic survives). All formulas are doc_id-pure
    so a SQL oracle can state the expected decode output without the
    bytes."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("media", T.BinaryType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        types = ["image", "audio", "video"]
        for b in batches:
            rows = []
            for doc_id in b["doc_id"]:
                d = int(doc_id)
                mtype = types[d % 3]
                if mtype == "image":
                    w, h = 16 + (d * 7) % 97, 16 + (d * 5) % 61
                    blob = build_png(w, h) if d % 2 == 0 else build_jpeg(w, h)
                    if d % 51 == 0:
                        blob = blob[:10]
                elif mtype == "audio":
                    blob = build_wav(
                        8000 * (1 + (d % 5) % 3),
                        100 + (d * 13) % 997,
                        channels=1 + d % 2,
                    )
                    if d % 53 == 0:
                        blob = blob[:8]
                else:
                    blob = build_mp4(
                        1000 * (1 + (d % 7) % 3), 500 + (d * 17) % 9001
                    )
                    if d % 59 == 0:
                        blob = blob[:10]
                rows.append({"doc_id": d, "media_type": mtype, "media": blob})
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "media"])

    return docs.select("doc_id").mapInPandas(gen, schema)


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def decode_image_headers(media_df: DataFrame) -> DataFrame:
    """(doc_id, media_type, media) → real header metadata. Decode
    failures land in a quarantine ``error`` column ('corrupt' when an
    image magic was present but the container is malformed,
    'unsupported' when no known magic) rather than failing the task —
    at 10^12 docs a decode crash must never kill a partition."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, mtype, blob in zip(b["doc_id"], b["media_type"], b["media"]):
                data = bytes(blob)
                fmt = width = height = error = None
                try:
                    fmt, width, height = parse_image_header(data)
                except ValueError:
                    has_magic = data[:8] == _PNG_SIG or data[:2] == b"\xff\xd8"
                    error = "corrupt" if has_magic else "unsupported"
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": mtype,
                        "fmt": fmt,
                        "width": width,
                        "height": height,
                        "error": error,
                    }
                )
            out = pd.DataFrame(
                rows, columns=["doc_id", "media_type", "fmt", "width", "height", "error"]
            )
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return media_df.mapInPandas(decode, IMAGE_META_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def decode_audio_headers(media_df: DataFrame) -> DataFrame:
    """(doc_id, media_type, media) → real WAV header metadata, the audio
    twin of :func:`decode_image_headers`: channels/sample_rate/n_samples
    parsed from actual RIFF bytes; malformed RIFF quarantines as
    'corrupt', anything without the magic as 'unsupported' — a decode
    failure must never kill a partition."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, mtype, blob in zip(b["doc_id"], b["media_type"], b["media"]):
                data = bytes(blob)
                fmt = channels = rate = n = error = None
                try:
                    channels, rate, _bits, n = parse_wav_header(data)
                    fmt = "wav"
                except ValueError:
                    error = "corrupt" if data[:4] == b"RIFF" else "unsupported"
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": mtype,
                        "fmt": fmt,
                        "channels": channels,
                        "sample_rate": rate,
                        "n_samples": n,
                        "error": error,
                    }
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "fmt", "channels",
                    "sample_rate", "n_samples", "error",
                ],
            )
            for c in ("channels", "sample_rate", "n_samples"):
                out[c] = out[c].astype("Int32")
            yield out

    return media_df.mapInPandas(decode, AUDIO_META_SCHEMA)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("timescale", T.IntegerType(), True),
        T.StructField("duration", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def decode_video_headers(media_df: DataFrame) -> DataFrame:
    """(doc_id, media_type, media) → real MP4 moov/mvhd metadata — the
    video leg, completing real header decode across all three
    modalities. Malformed ISO-BMFF quarantines as 'corrupt' (ftyp magic
    present), anything else as 'unsupported'."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, mtype, blob in zip(b["doc_id"], b["media_type"], b["media"]):
                data = bytes(blob)
                fmt = ts = dur = error = None
                try:
                    ts, dur = parse_mp4_header(data)
                    fmt = "mp4"
                except ValueError:
                    error = "corrupt" if data[4:8] == b"ftyp" else "unsupported"
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": mtype,
                        "fmt": fmt,
                        "timescale": ts,
                        "duration": dur,
                        "error": error,
                    }
                )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "fmt", "timescale", "duration", "error"],
            )
            for c in ("timescale", "duration"):
                out[c] = out[c].astype("Int32")
            yield out

    return media_df.mapInPandas(decode, VIDEO_META_SCHEMA)


def decode_media(media_df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """(doc_id, media_type, media binary) → typed metadata via mapInPandas.

    Stub semantics (deterministic, tested): width = 64 + (n_bytes mod 192),
    height = 64 + (n_bytes mod 128), n_frames = 1 for image else
    1 + (n_bytes mod 24).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if use_real_decoder:
                b.apply(lambda r: real_decode(r["media"], r["media_type"]), axis=1)
            n_bytes = b["media"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "media_type": b["media_type"],
                    "n_bytes": n_bytes,
                    "width": (64 + n_bytes % 192).astype("int32"),
                    "height": (64 + n_bytes % 128).astype("int32"),
                    "n_frames": (
                        (b["media_type"] == "image").map({True: 0, False: 1})
                        * (1 + n_bytes % 24)
                        + (b["media_type"] == "image").astype(int)
                    ).astype("int32"),
                }
            )

    return media_df.mapInPandas(decode, MEDIA_META_SCHEMA)


def resize_plan(meta_df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Aspect-preserving resize plumbing: target dims + scale as pure
    column math (JVM-side, SQL-mirrorable). The actual pixel resample
    belongs inside the same ``mapInPandas`` batch as the decode and is
    stubbed for the same reason (``real_decode``): no image libs here —
    the SHAPE of the computation (scale policy, rounding, min-1 clamp)
    is the contract this pins.
    """
    scale = F.least(
        F.lit(float(target_w)) / F.col("width"), F.lit(float(target_h)) / F.col("height")
    )
    return meta_df.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("out_h"),
        F.round(scale, 6).alias("scale"),
    )


FEATURE_DIM = 8


def extract_features(media_df: DataFrame) -> DataFrame:
    """(doc_id, media_type, media) → (doc_id, features array<float>) via
    ``mapInPandas`` — the feature-extraction plumbing (batch iterator,
    Arrow schema, vectorized numpy) is real; the embedding itself is a
    deterministic stub of the payload size (a real model hook would sit
    exactly where the numpy expression is, cf. ``real_decode``)."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = b["media"].map(len).to_numpy(dtype=np.int64)
            M = ((n[:, None] * (np.arange(FEATURE_DIM)[None, :] + 1)) % 97) / 97.0
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "features": [row.astype(np.float32).tolist() for row in M],
                }
            )

    return media_df.mapInPandas(feats, schema)


def frame_sample(meta_df: DataFrame, every: int = 4) -> DataFrame:
    """Explode per-frame sample rows (frame_no 0, every, 2·every …) —
    the plumbing a video feature-extractor would fan out over."""
    return meta_df.select(
        "doc_id",
        "media_type",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every))
        ).alias("frame_no"),
    )
