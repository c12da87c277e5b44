"""Multimodal-column queries: binary ingest + hashing (oracle-checked) and
the mapInPandas decode/feature plumbing (rows-only; decoder stubbed —
see operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from component_iceberg_spark.io.tables import load_table
from component_iceberg_spark.operators import multimodal as M
from component_iceberg_spark.plans.registry import register


def _binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.ingest_binary(d, "doc_id", F.encode(F.col("text"), "UTF-8"), "text/plain")


@register(
    "mm_ingest_hash",
    oracle="""
    SELECT doc_id,
           sha256(text) AS content_hash,
           strlen(text) AS n_bytes,
           'text/plain' AS mime
    FROM documents
    """,
    tags=("ext", "multimodal"),
)
def mm_ingest_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column ingest: payload + metadata struct + sha256 content
    address. The hash is computed on the binary payload Spark-side; DuckDB
    hashes the identical utf-8 bytes — same address, proving the binary
    path carries bytes faithfully."""
    b = _binary_docs(spark, sf_dir)
    return b.select(
        "doc_id",
        "content_hash",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
    )


@register("mm_feature_extract", oracle=None, tags=("ext", "multimodal"))
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature extraction (mapInPandas). Decoder is a
    deterministic sha256-derived stub in this container (no PIL);
    schema/batching/partitioning are the real contract."""
    return M.extract_features(_binary_docs(spark, sf_dir))


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           sha256(text) AS content_hash,
           f AS frame_no,
           CAST(floor(f * strlen(text) / 4) AS INTEGER) AS offset,
           CAST(floor(strlen(text) / 4) AS INTEGER) AS span
    FROM documents, (SELECT unnest([0, 1, 2, 3]) AS f)
    """,
    tags=("ext", "multimodal"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/segment sampling: 4 evenly-spaced (offset, span) windows per
    blob — the video chunking shape, fanned out row-per-frame so per-frame
    work distributes across tasks."""
    return M.sample_frames(_binary_docs(spark, sf_dir), 4)


@register(
    "mm_dedup_content",
    oracle="""
    SELECT sha256(text) AS content_hash,
           min(doc_id) AS rep_doc_id,
           count(*) AS n_copies,
           min(strlen(text)) AS n_bytes
    FROM documents
    GROUP BY 1
    """,
    tags=("ext", "multimodal", "dedup"),
)
def mm_dedup_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed dedup over the binary payload: group by sha256 —
    the modality-agnostic exact-dedup that works identically for text,
    image, audio and video bytes (hash computed on the binary column)."""
    b = _binary_docs(spark, sf_dir)
    return b.groupBy("content_hash").agg(
        F.min("doc_id").alias("rep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.col("meta.n_bytes")).alias("n_bytes"),
    )
