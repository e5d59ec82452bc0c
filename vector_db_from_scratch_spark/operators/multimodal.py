"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed through Arrow-batched
``mapInPandas`` pipelines.

The real codecs (PIL/ffmpeg/torchaudio) are not in this container, so the
DECODE step is stubbed: ``decode_media`` raises ``NotImplementedError`` for
real formats and ships a deterministic fake decoder used by tests. What IS
real -- and what this module demonstrates for a 100 TB pipeline -- is the
Spark side: the schema contract, Arrow batch iteration, one-to-many frame
explosion, and partition-parallel feature extraction with no shuffle until
the final aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

MEDIA_SCHEMA = "media_id long, kind string, payload binary, n_bytes long"
FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, byte_mean double, hist array<long>"
FRAME_SCHEMA = "media_id long, frame_idx long, frame_byte long"

KINDS = ("image", "audio", "video")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media: documents' utf-8 bytes as the payload,
    kind assigned round-robin -- the plumbing stand-in for a parquet table
    of real blobs (which would be laid out identically: payload column +
    typed metadata, partitioned by kind/date at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """STUB: a real deployment decodes the codec here. Only the
    deterministic fake (raw bytes as uint8) is implemented; real formats
    raise so nobody mistakes this for a working codec."""
    if kind not in KINDS:
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(spark: SparkSession, sf_dir: str, bins: int = 16) -> DataFrame:
    """Partition-parallel feature extraction: byte histogram + mean per
    payload via mapInPandas (one Arrow transfer per batch, no shuffle)."""
    media = media_table(spark, sf_dir)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, kind, payload, n_bytes in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["n_bytes"]
            ):
                arr = decode_media(payload, kind)
                hist = np.bincount(arr // (256 // bins), minlength=bins)[:bins]
                rows.append(
                    (media_id, kind, n_bytes, float(arr.mean()) if len(arr) else 0.0,
                     hist.astype("int64").tolist())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "byte_mean", "hist"]
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(spark: SparkSession, sf_dir: str, stride: int = 64) -> DataFrame:
    """One-to-many frame sampling (the video path): every stride-th byte
    becomes a 'frame' row -- the mapInPandas shape for real frame extraction."""
    media = media_table(spark, sf_dir).filter(F.col("kind") == "video")

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_idx, out_byte = [], [], []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                arr = decode_media(payload, kind)[::stride]
                out_id.extend([media_id] * len(arr))
                out_idx.extend(range(len(arr)))
                out_byte.extend(int(b) for b in arr)
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_byte": out_byte}
            )

    return media.mapInPandas(frames, FRAME_SCHEMA)


RESIZE_TARGET = 16


def resize_media(spark: SparkSession, sf_dir: str, target: int = RESIZE_TARGET) -> DataFrame:
    """Resize (nearest-neighbor resample to a fixed length) -- the 1-D
    stand-in for image resize, run as the REAL Arrow/NumPy kernel a decode
    stage would use: idx = (arange(target) * n) // n_target gather per
    payload, no shuffle. Unlike the stubbed decoders this kernel is fully
    deterministic on the fake payloads, so it is oracle-GATED: the oracle
    recomputes the same gather with SQL integer arithmetic over the text
    bytes, pinning the Pandas-UDF batch path byte-for-byte."""
    media = media_table(spark, sf_dir)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, kinds, out_len, rsum = [], [], [], []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                arr = decode_media(payload, kind)
                n = len(arr)
                # the oracle equates payload byte i with text char i, which
                # requires ASCII payloads and at least one byte -- fail
                # loudly on violations instead of hash-mismatching
                if n == 0:
                    raise ValueError(f"media {media_id}: empty payload cannot be resampled")
                if int(arr.max()) > 127:
                    raise ValueError(
                        f"media {media_id}: non-ASCII payload breaks the "
                        "byte-i == char-i oracle equivalence"
                    )
                idx = (np.arange(target, dtype=np.int64) * n) // target
                resampled = arr[idx]
                ids.append(media_id)
                kinds.append(kind)
                out_len.append(len(resampled))
                rsum.append(int(resampled.astype(np.int64).sum()))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "out_len": out_len, "resample_sum": rsum}
            )

    return media.mapInPandas(
        batches, "media_id long, kind string, out_len long, resample_sum long"
    ).orderBy("media_id")


def resize_media_oracle(target: int = RESIZE_TARGET) -> str:
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    # payload = utf-8 of ascii-only text, so byte i == ascii(char i)
    return f"""
SELECT doc_id AS media_id,
       ([{kinds}])[(doc_id % 3 + 1)::INT] AS kind,
       {target}::BIGINT AS out_len,
       list_sum(list_transform(range(0, {target}),
                i -> ascii(substr(text, ((i * length(text)) // {target}) + 1, 1))))::BIGINT
         AS resample_sum
FROM documents
ORDER BY media_id
""".strip()


# --------------------------------------------------------------------------
# Oracle-checked binary-column query (the SQL-expressible slice)
# --------------------------------------------------------------------------

def binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload statistics per kind -- pure SQL over the binary
    column (octet lengths, first-byte ascii), oracle-checkable."""
    media = media_table(spark, sf_dir)
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("kind")
    )


def binary_stats_oracle() -> str:
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    return f"""
SELECT kind, count(*) AS n_media, sum(octet_length(encode(text)))::BIGINT AS total_bytes,
       min(octet_length(encode(text)))::BIGINT AS min_bytes,
       max(octet_length(encode(text)))::BIGINT AS max_bytes
FROM (SELECT ([{kinds}])[(doc_id % 3 + 1)::INT] AS kind, text FROM documents)
GROUP BY kind ORDER BY kind
""".strip()

def blob_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of binary payloads by md5 digest -- the media twin of
    dedup.exact_dedup (same shuffle discipline: 32-byte digests move, the
    blobs never do; at 100 TB this is the only affordable way to group by
    content). Oracle-checkable because md5 over the same bytes is the same
    hex in both engines."""
    media = media_table(spark, sf_dir)
    return (
        media.groupBy("kind", F.md5(F.col("payload")).alias("digest"))
        .agg(F.min("media_id").alias("rep_media_id"), F.count(F.lit(1)).alias("n_copies"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_blobs"),
            F.sum("n_copies").alias("n_blobs"),
            F.min("rep_media_id").alias("first_rep"),
        )
        .orderBy("kind")
    )


def blob_dedup_oracle() -> str:
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    # DuckDB 1.0's md5() takes VARCHAR only; md5(text) hashes the same
    # UTF-8 bytes as Spark's md5(encode(text, 'UTF-8')) payload digest
    return f"""
WITH media AS (SELECT doc_id AS media_id, ([{kinds}])[(doc_id % 3 + 1)::INT] AS kind,
                      text
               FROM documents),
grouped AS (SELECT kind, md5(text) AS digest, min(media_id) AS rep_media_id,
                   count(*) AS n_copies
            FROM media GROUP BY kind, digest)
SELECT kind, count(*) AS n_distinct_blobs, sum(n_copies)::BIGINT AS n_blobs,
       min(rep_media_id) AS first_rep
FROM grouped
GROUP BY kind
ORDER BY kind
""".strip()
