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


def decode_media(content: bytes, media_type: str):  # pragma: no cover - stub
    """STUB: real decode (PIL/librosa/pyav) is unavailable in this
    container. The Spark-side plumbing around it (schema, batching,
    partitioning) is real and tested via extract_media_metadata."""
    raise NotImplementedError(
        "media decoding requires image/audio libs not present in this "
        "environment; see extract_media_metadata for the wired batch path"
    )


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
