"""Driver-checkable multimodal queries.

The harness testdata carries no media tables, so these queries derive
deterministic BINARY content from the ``documents`` table (UTF-8 bytes of
the text) and run it through the engine's REAL multimodal plumbing — an
Arrow-batched ``mapInPandas`` stage over a ``BinaryType`` column that
consumes content inside the stage and emits feature-sized rows
(``operators.multimodal`` design).  The DuckDB oracle recomputes the same
features relationally, which upgrades the multimodal path from pytest-only
to driver-hash-checked (VERDICT r1 listed it as the one pytest-only
family).

Feature policy: byte counts are BIGINT, content digests are md5 hex (the
engines' shared hash domain), byte sums are exact BIGINT — no floats.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..sources.tables import load_table

BINARY_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_sum", LongType(), False),
        StructField("content_md5", StringType(), False),
    ]
)


def binary_content_features(content_df: DataFrame) -> DataFrame:
    """(id, content: binary) → per-blob features via Arrow-batched
    mapInPandas.  Content never leaves the stage — output rows are
    feature-sized, so downstream shuffles move bytes-of-features, not
    bytes-of-media (the multimodal scale contract)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b or b"") for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in blobs],
                    "byte_sum": [sum(b) for b in blobs],
                    "content_md5": [hashlib.md5(b).hexdigest() for b in blobs],
                }
            )

    return content_df.mapInPandas(feats, BINARY_FEATURE_SCHEMA)


def media_binary_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("content")
    )
    return binary_content_features(docs)


# DuckDB mirror: md5(varchar) digests the string's UTF-8 bytes = md5 of
# encode(text); the byte sum walks the blob's hex dump nibble-pairwise
# (the engines' shared strpos-on-hex idiom, also used by the LSH oracle).
MEDIA_FEATURES_SQL = """
WITH b AS (SELECT doc_id, encode(text) AS blob, md5(text) AS content_md5 FROM documents),
hx AS (SELECT doc_id, lower(hex(blob)) AS h, octet_length(blob) AS n, content_md5 FROM b),
s AS (
  SELECT doc_id,
         SUM((strpos('0123456789abcdef', substr(h, 2*i+1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(h, 2*i+2, 1)) - 1)) AS bs
  FROM hx, unnest(range(n)) AS t(i)
  GROUP BY doc_id
)
SELECT hx.doc_id, CAST(n AS BIGINT) AS n_bytes,
       CAST(COALESCE(bs, 0) AS BIGINT) AS byte_sum, content_md5
FROM hx LEFT JOIN s USING (doc_id)
"""

def media_near_dup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary near-dup candidates: same-length blobs paired by a bucket
    equi-join on ``n_bytes`` (the scale-safe shape — pair count ∝ length
    collisions, never blobs²), ranked by content-sum distance with an
    exact-dup flag from the md5 digest.  Features come from the REAL
    Arrow-batched multimodal stage; only feature-sized rows are joined —
    content bytes never shuffle (the perceptual-hash pattern with a
    deterministic, oracle-checkable signature)."""
    # no cache(): a lazily-returned registry query can never unpersist, so
    # caching here would pin one CacheManager frame per invocation (the
    # leak class fixed across the minhash family in round 8) — the two
    # consumers pay a second Arrow feature pass instead
    feats = media_binary_features_query(spark, sf_dir)
    a = feats.select(
        F.col("doc_id").alias("id_a"), "n_bytes",
        F.col("byte_sum").alias("sum_a"), F.col("content_md5").alias("md5_a"),
    )
    b = feats.select(
        F.col("doc_id").alias("id_b"), "n_bytes",
        F.col("byte_sum").alias("sum_b"), F.col("content_md5").alias("md5_b"),
    )
    return (
        a.join(b, "n_bytes")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "n_bytes",
            F.abs(F.col("sum_a") - F.col("sum_b")).alias("sum_delta"),
            (F.col("md5_a") == F.col("md5_b")).alias("is_exact_dup"),
        )
    )


MEDIA_NEAR_DUP_SQL = f"""
WITH feats AS ({MEDIA_FEATURES_SQL})
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_bytes,
       CAST(abs(a.byte_sum - b.byte_sum) AS BIGINT) AS sum_delta,
       a.content_md5 = b.content_md5 AS is_exact_dup
FROM feats a JOIN feats b ON a.n_bytes = b.n_bytes AND a.doc_id < b.doc_id
"""


QUERIES = {
    "media_binary_features": (media_binary_features_query, MEDIA_FEATURES_SQL),
    "media_near_dup_pairs": (media_near_dup_query, MEDIA_NEAR_DUP_SQL),
}


# ---------------------------------------------------------------------------
# Video frame sampling (round 5) — the frames stage, driver-hash-checked
# ---------------------------------------------------------------------------

FRAME_W, FRAME_H = 8, 4  # rawvideo frame = 8*4*1 = 32 bytes
FRAME_BYTES = FRAME_W * FRAME_H
FRAME_EVERY_N = 2


def media_frame_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the REAL ``operators.multimodal.sample_frames``
    stage: documents' UTF-8 bytes play a ``rawvideo`` payload (32-byte
    frames), every 2nd frame is kept, and each kept frame emits
    (media_id, frame_index, n_frame_bytes, frame_md5).  The md5 is taken
    over the frame's lowercase hex dump — the engines' shared byte-exact
    hash idiom (DuckDB cannot digest BLOBs directly) — so the oracle pins
    the exact sampled byte ranges, upgrading the frames stage from
    pytest-only to driver-hash-checked.  Fanout happens inside the Arrow
    batch; only kept frames leave the stage."""
    from pyspark.sql.types import IntegerType

    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.struct(
            F.lit("rawvideo").alias("codec"),
            F.lit(FRAME_W).alias("width"),
            F.lit(FRAME_H).alias("height"),
            F.lit(1).alias("channels"),
            F.lit(None).cast(IntegerType()).alias("n_frames"),
        ).alias("metadata"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    frames = sample_frames(docs, every_n=FRAME_EVERY_N)
    return frames.select(
        "media_id",
        F.col("frame_index").cast("long").alias("frame_index"),
        F.length(F.col("frame")).cast("long").alias("n_frame_bytes"),
        F.md5(F.lower(F.hex(F.col("frame")))).alias("frame_md5"),
    )


MEDIA_FRAMES_SQL = f"""
WITH b AS (
  SELECT doc_id AS media_id, lower(hex(encode(text))) AS h,
         octet_length(encode(text)) // {FRAME_BYTES} AS n_frames
  FROM documents
), f AS (
  SELECT media_id, CAST(i AS BIGINT) AS frame_index,
         substr(h, {2 * FRAME_BYTES} * i + 1, {2 * FRAME_BYTES}) AS fh
  FROM b, unnest(range(n_frames)) AS t(i)
  WHERE i % {FRAME_EVERY_N} = 0
)
SELECT media_id, frame_index, CAST({FRAME_BYTES} AS BIGINT) AS n_frame_bytes, md5(fh) AS frame_md5
FROM f
"""

QUERIES["media_frame_stats"] = (media_frame_stats_query, MEDIA_FRAMES_SQL)
