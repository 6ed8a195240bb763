"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas`` (beyond-reference
surface).

The container has no image/audio libraries, so the actual decode is a
clearly-marked stub (``decode_media`` raises NotImplementedError; the
metadata pass uses deterministic byte-level features instead). What IS
real and tested end-to-end:

- the schema contract (binary content + struct-free typed metadata
  columns — parquet-friendly, no nested mutation),
- the ``mapInPandas`` plumbing: Arrow batch in → pandas transform →
  Arrow batch out, with an explicit output schema,
- the partitioning story: media rows are heavy (MBs at production
  scale), so the operator repartitions by media_id before the batch
  stage — at 100 TB you size ``spark.sql.files.maxPartitionBytes`` /
  use per-file row groups so one batch fits executor memory.

``extract_media_metadata`` is oracle-checked: every derived feature
(byte length, sha256, fake dimensions from hash bytes) is recomputable
in SQL, proving the Python batch path agrees with the declarative one.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ["image", "audio", "video"]

METADATA_SCHEMA = (
    "media_id long, media_type string, n_bytes long, content_sha256 string, "
    "fake_width long, fake_height long"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: utf-8 bytes of the document text as
    the opaque payload, media_type round-robin by doc_id."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )


def decode_media(content: bytes, media_type: str):
    """Decode a media payload's container header.

    REAL for stdlib-parseable containers: BMP (``parse_bmp_header``)
    and WAV (``parse_wav_header``) are decoded with pure ``struct``
    parsing — no external libs. Everything else (JPEG/PNG via PIL,
    mp3/flac via librosa, video via pyav) remains a clearly-marked
    stub: those libs are unavailable in this container; the Spark-side
    plumbing (schema, batching, partitioning) is identical either way
    and is oracle-checked through ``decode_media_headers``.
    """
    if content[:2] == b"BM":
        return ("bmp",) + parse_bmp_header(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return ("wav",) + parse_wav_header(content)
    raise NotImplementedError(
        "only BMP/WAV containers decode in this environment; "
        "JPEG/PNG/mp3/video need image/audio libs not present here"
    )


# ------------------------- real container codecs (stdlib struct only)

BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
WAV_HEADER_BYTES = 44  # RIFF + fmt chunk + data chunk header


def make_bmp(width: int, height: int) -> bytes:
    """Minimal valid 24-bit BMP: standard 54-byte header + zeroed,
    4-byte-row-aligned pixel data."""
    row_bytes = ((width * 3 + 3) // 4) * 4
    pixel_bytes = row_bytes * height
    file_header = b"BM" + struct.pack(
        "<IHHI", BMP_HEADER_BYTES + pixel_bytes, 0, 0, BMP_HEADER_BYTES
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes,
        2835, 2835, 0, 0,
    )
    return file_header + info_header + bytes(pixel_bytes)


def parse_bmp_header(b: bytes) -> tuple[int, int, int]:
    """(width, height, bit_depth) from a BITMAPINFOHEADER BMP."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", b, 18)
    bit_depth = struct.unpack_from("<H", b, 28)[0]
    return width, abs(height), bit_depth


def make_wav(sample_rate: int, n_samples: int) -> bytes:
    """Minimal valid 16-bit mono PCM WAV with zeroed samples."""
    data = bytes(2 * n_samples)
    fmt = struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_wav_header(b: bytes) -> tuple[int, int, int, int]:
    """(channels, sample_rate, bit_depth, n_samples) from a canonical
    44-byte-header PCM WAV."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    channels, sample_rate = struct.unpack_from("<HI", b, 22)
    bit_depth = struct.unpack_from("<H", b, 34)[0]
    data_len = struct.unpack_from("<I", b, 40)[0]
    n_samples = data_len // (channels * (bit_depth // 8))
    return channels, sample_rate, bit_depth, n_samples


def _metadata_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        content = pdf["content"]
        digests = content.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
        # fake dimensions derived from the first hash bytes — a
        # deterministic stand-in for decoded width/height
        width = digests.map(lambda h: 1 + int(h[:4], 16) % 1024)
        height = digests.map(lambda h: 1 + int(h[4:8], 16) % 1024)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": content.map(len).astype("int64"),
                "content_sha256": digests,
                "fake_width": width.astype("int64"),
                "fake_height": height.astype("int64"),
            }
        )


def extract_media_metadata(media: DataFrame, batch_partitions: int | None = None) -> DataFrame:
    """Arrow-batched metadata extraction over binary content.

    ``batch_partitions`` caps rows-per-task memory for heavy payloads
    (repartition before the Python stage; at real media sizes this is
    what keeps one Arrow batch within executor memory).
    """
    if batch_partitions:
        media = media.repartition(batch_partitions, "media_id")
    return media.mapInPandas(_metadata_batches, schema=METADATA_SCHEMA)


MEDIA_METADATA_SQL = """(
    SELECT doc_id AS media_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
            AS media_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        sha256(text) AS content_sha256,
        CAST(1 + CAST('0x' || substr(sha256(text), 1, 4) AS BIGINT) % 1024 AS BIGINT)
            AS fake_width,
        CAST(1 + CAST('0x' || substr(sha256(text), 5, 4) AS BIGINT) % 1024 AS BIGINT)
            AS fake_height
    FROM documents
) s"""


FRAME_COUNT = 4
FRAME_BYTES = 16

FRAME_SCHEMA = (
    "media_id long, frame_idx long, frame_len long, frame_sha256 string"
)


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {
            "media_id": [], "frame_idx": [], "frame_len": [], "frame_sha256": []
        }
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            data = bytes(content)
            step = len(data) // FRAME_COUNT
            for i in range(FRAME_COUNT):
                frame = data[i * step : i * step + FRAME_BYTES]
                out["media_id"].append(mid)
                out["frame_idx"].append(i)
                out["frame_len"].append(len(frame))
                out["frame_sha256"].append(hashlib.sha256(frame).hexdigest())
        yield pd.DataFrame(out)


def sample_video_frames(media: DataFrame) -> DataFrame:
    """Frame sampling for video payloads: N evenly-spaced fixed-size
    "frames" per video (deterministic byte slices standing in for real
    keyframe extraction — see decode_media stub note). Row-EXPANDING
    mapInPandas: one input row → FRAME_COUNT output rows, the batch
    shape real video pipelines need (pyav keyframe iteration yields the
    same one→many contract). Payloads ≥ 64 bytes only, so every frame
    offset is in range."""
    vids = media.filter(
        (F.col("media_type") == "video") & (F.length("content") >= 64)
    ).select("media_id", "content")
    return vids.mapInPandas(_frame_batches, schema=FRAME_SCHEMA)


# ASCII payloads ⇒ byte slices == char slices, so the oracle recomputes
# the frames on VARCHAR (DuckDB lacks BLOB substring/sha256).
FRAME_SAMPLE_SQL = f"""(
    SELECT doc_id AS media_id, i AS frame_idx,
        CAST(length(substring(text, 1 + i * (length(text) // {FRAME_COUNT}),
                              {FRAME_BYTES})) AS BIGINT) AS frame_len,
        sha256(substring(text, 1 + i * (length(text) // {FRAME_COUNT}),
                         {FRAME_BYTES})) AS frame_sha256
    FROM documents
    CROSS JOIN (SELECT UNNEST(range({FRAME_COUNT})) AS i) frames
    WHERE doc_id % 3 = 2 AND length(text) >= 64
) s"""


THUMB_BYTES = 256

RESIZE_SCHEMA = (
    "media_id long, orig_bytes long, resized_len long, resized_sha256 string"
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        content = pdf["content"]
        thumbs = content.map(lambda b: bytes(b)[:THUMB_BYTES])
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "orig_bytes": content.map(len).astype("int64"),
                "resized_len": thumbs.map(len).astype("int64"),
                "resized_sha256": thumbs.map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
            }
        )


def resize_images(media: DataFrame) -> DataFrame:
    """Thumbnail pass for image payloads: bounded-size derived payload
    per image (here the first THUMB_BYTES bytes — the real PIL
    resize+re-encode sits behind the decode_media stub). The contract
    under test: a second mapInPandas stage consuming the first one's
    output schema, payload size bounded regardless of input size (what
    makes the shuffle after a resize stage safe at 100 TB)."""
    imgs = media.filter(F.col("media_type") == "image").select(
        "media_id", "content"
    )
    return imgs.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


RESIZE_SQL = f"""(
    SELECT doc_id AS media_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
        CAST(length(substring(text, 1, {THUMB_BYTES})) AS BIGINT) AS resized_len,
        sha256(substring(text, 1, {THUMB_BYTES})) AS resized_sha256
    FROM documents
    WHERE doc_id % 3 = 0
) s"""


# ------------------- real BMP/WAV round trip (construct → serialize → parse)

DECODE_SCHEMA = (
    "media_id long, container string, width long, height long, "
    "bit_depth long, channels long, sample_rate long, n_samples long, "
    "payload_bytes long"
)


def _build_media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = pdf["doc_id"]
        payloads = []
        for did in ids:
            did = int(did)
            if did % 2 == 0:
                payloads.append(make_bmp(1 + did % 64, 1 + did % 48))
            else:
                payloads.append(make_wav(8000 + (did % 8) * 1000, 16 + did % 32))
        yield pd.DataFrame({"media_id": ids.astype("int64"), "content": payloads})


def synthesize_binary_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-container fixture: even doc_ids become 24-bit
    BMPs (width 1+id%64, height 1+id%48), odd doc_ids become 16-bit mono
    PCM WAVs (rate 8000+1000·(id%8), samples 16+id%32) — actual valid
    files any external viewer could open, built distributed in an Arrow
    batch stage."""
    return docs.select("doc_id").mapInPandas(
        _build_media_batches, schema="media_id long, content binary"
    )


def _decode_header_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "media_id", "container", "width", "height", "bit_depth",
            "channels", "sample_rate", "n_samples", "payload_bytes",
        )}
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            data = bytes(content)
            decoded = decode_media(data, "")
            out["media_id"].append(int(mid))
            out["container"].append(decoded[0])
            out["payload_bytes"].append(len(data))
            if decoded[0] == "bmp":
                _, w, h, depth = decoded
                out["width"].append(w)
                out["height"].append(h)
                out["bit_depth"].append(depth)
                out["channels"].append(None)
                out["sample_rate"].append(None)
                out["n_samples"].append(None)
            else:
                _, ch, rate, depth, n = decoded
                out["width"].append(None)
                out["height"].append(None)
                out["bit_depth"].append(depth)
                out["channels"].append(ch)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
        yield pd.DataFrame(out)


def decode_media_headers(media: DataFrame) -> DataFrame:
    """REAL header decode over binary payloads via ``decode_media``
    (stdlib struct parsing — no stub on this path). The oracle
    recomputes every decoded field from the fixture's doc_id arithmetic,
    so a single wrong byte offset in either the writer or the parser
    (or in the Arrow binary round trip) hash-mismatches."""
    return media.mapInPandas(_decode_header_batches, schema=DECODE_SCHEMA)


# BMP file size = 54-byte header + 4-byte-aligned rows; WAV = 44-byte
# header + 2 bytes/sample — the oracle pins the full serialized size too.
DECODE_HEADERS_SQL = """(
    SELECT doc_id AS media_id,
        CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS container,
        CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 64 END AS width,
        CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 48 END AS height,
        CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 16 END AS bit_depth,
        CASE WHEN doc_id % 2 = 1 THEN 1 END AS channels,
        CASE WHEN doc_id % 2 = 1 THEN 8000 + (doc_id % 8) * 1000 END AS sample_rate,
        CASE WHEN doc_id % 2 = 1 THEN 16 + doc_id % 32 END AS n_samples,
        CASE WHEN doc_id % 2 = 0
             THEN 54 + (((1 + doc_id % 64) * 3 + 3) // 4) * 4 * (1 + doc_id % 48)
             ELSE 44 + 2 * (16 + doc_id % 32)
        END AS payload_bytes
    FROM documents
) s"""
