"""Multimodal-column queries (engine extension).

The ``documents`` table stands in for a media lake: each row gets an opaque
``binary`` payload plus typed metadata (see ``operators/multimodal.py``), and
decode/feature-extract runs as an Arrow-batched ``mapInPandas`` — the real
100 TB plumbing (BinaryType schema, per-partition Python batches, no per-row
UDF overhead). The codec itself is stubbed deterministically, which is what
makes the pipeline oracle-checkable: DuckDB reproduces the stub's arithmetic
from the byte length, so the whole mapInPandas round-trip is hash-verified,
not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.multimodal import attach_media_columns, decode_media
from ..sources.tpch import load_table
from .registry import register

# DuckDB twin of operators.multimodal._stub_decode on utf-8 text payloads.
_MEDIA_TYPE_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)
_BYTES_SQL = "strlen(text)"  # DuckDB strlen = byte length of the utf-8 string


@register(
    "multimodal_decode",
    "S4-analog,P2-analog",
    "Media decode pipeline: synthesize opaque binary payloads + typed "
    "metadata from documents, then Arrow-batched mapInPandas feature "
    "extraction (stub codec — deterministic features from byte length; a "
    "real libjpeg/ffmpeg drop-in changes decode_fn only). The oracle "
    "replays the stub arithmetic in SQL, verifying the full binary-column "
    "and mapInPandas plumbing by hash.",
    oracle=f"""
        SELECT doc_id AS media_id,
               {_MEDIA_TYPE_SQL} AS media_type,
               CAST({_BYTES_SQL} AS BIGINT) AS byte_length,
               CAST(CASE {_MEDIA_TYPE_SQL}
                    WHEN 'image' THEN {_BYTES_SQL} % 640 + 1
                    WHEN 'audio' THEN 0
                    ELSE {_BYTES_SQL} % 320 + 1 END AS BIGINT) AS width,
               CAST(CASE {_MEDIA_TYPE_SQL}
                    WHEN 'image' THEN {_BYTES_SQL} % 480 + 1
                    WHEN 'audio' THEN 0
                    ELSE {_BYTES_SQL} % 240 + 1 END AS BIGINT) AS height,
               CAST(CASE {_MEDIA_TYPE_SQL}
                    WHEN 'image' THEN 1
                    WHEN 'audio' THEN {_BYTES_SQL} % 1000 + 1
                    ELSE {_BYTES_SQL} % 100 + 1 END AS BIGINT) AS n_frames
        FROM documents
        ORDER BY media_id
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(docs, "doc_id", "text")
    return decode_media(media).orderBy("media_id")


@register(
    "multimodal_stats",
    "A3,A7",
    "Per-media-type corpus stats over decoded features: counts, total bytes, "
    "max dimensions. The groupBy runs on the 3-value media_type key after the "
    "decode stage — partial aggregation makes the shuffle negligible.",
    oracle=f"""
        SELECT {_MEDIA_TYPE_SQL} AS media_type,
               count(*) AS n_media,
               CAST(SUM({_BYTES_SQL}) AS BIGINT) AS total_bytes,
               CAST(MAX(CASE {_MEDIA_TYPE_SQL}
                    WHEN 'image' THEN {_BYTES_SQL} % 640 + 1
                    WHEN 'audio' THEN 0
                    ELSE {_BYTES_SQL} % 320 + 1 END) AS BIGINT) AS max_width,
               CAST(MAX(CASE {_MEDIA_TYPE_SQL}
                    WHEN 'image' THEN 1
                    WHEN 'audio' THEN {_BYTES_SQL} % 1000 + 1
                    ELSE {_BYTES_SQL} % 100 + 1 END) AS BIGINT) AS max_frames
        FROM documents
        GROUP BY 1
        ORDER BY media_type
    """,
)
def multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(attach_media_columns(docs, "doc_id", "text"))
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("byte_length").alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.max("n_frames").alias("max_frames"),
        )
        .orderBy("media_type")
    )
