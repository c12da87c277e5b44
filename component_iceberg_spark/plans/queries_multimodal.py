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


# SQL for byte j (0-based) of a lowercase hex digest column named h
# (same replay pattern as the mm probes in queries_extended.py).
def _hx(j: int) -> str:
    d1 = f"(strpos('0123456789abcdef', substr(h, {2 * j + 1}, 1)) - 1)"
    d2 = f"(strpos('0123456789abcdef', substr(h, {2 * j + 2}, 1)) - 1)"
    return f"({d1} * 16 + {d2})"


@register(
    "mm_feature_extract",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, sha256(text) AS h, strlen(text) AS nb FROM documents
    )
    SELECT doc_id,
           CAST(nb AS INT) AS n_bytes,
           CAST(64 + {_hx(0)} AS INT) AS width,
           CAST(64 + {_hx(1)} AS INT) AS height,
           round({_hx(2)} / 255.0, 6) AS f0,
           round({_hx(3)} / 255.0, 6) AS f1,
           round({_hx(4)} / 255.0, 6) AS f2,
           round({_hx(5)} / 255.0, 6) AS f3,
           'stub-sha256' AS decoder
    FROM d
    """,
    tags=("ext", "multimodal"),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature extraction (mapInPandas). Decoder is a
    deterministic sha256-derived stub in this container (no PIL), which
    lets DuckDB replay the derivation from the hex digest and certify the
    whole Arrow round-trip. The feature vector is projected element-wise
    (f0..f3) because the gate canonicalizer hashes scalar cells — arrays
    crash it; the typed array API stays on the operator
    (operators/multimodal.py extract_features). mean_byte is excluded from
    the gate projection: its round(sum/len, 6) is decimal-rounding of an
    inexact double, the one spot where engines legitimately disagree on
    ties; it remains covered by the rows-only local test."""
    out = M.extract_features(_binary_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        F.col("features")[0].alias("f0"),
        F.col("features")[1].alias("f1"),
        F.col("features")[2].alias("f2"),
        F.col("features")[3].alias("f3"),
        "decoder",
    )


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


@register(
    "mm_train_record",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
        FROM embeddings
    )
    SELECT d.doc_id,
           sha256(d.text) AS content_hash,
           strlen(d.text) AS n_bytes,
           'text/plain' AS mime,
           d.lang,
           d.source,
           round(sqrt(list_sum(list_transform(v.dv, x -> x * x))), 4)
               AS vec_norm
    FROM documents d JOIN v ON v.vec_id = d.doc_id
    """,
    tags=("ext", "multimodal"),
)
def mm_train_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-record assembly — the last step before sharding a
    multimodal corpus: join the binary-ingested media (payload sha256
    content address + typed metadata) with the embedding table on the
    document key and emit one flat record per example (id, content
    address, byte size, mime, lang/source provenance, embedding L2
    norm). One equi-join shuffle on the id; the norm folds left-to-right
    in both engines (the similarity family's arithmetic contract), so
    the record — including the float column — is exactly
    oracle-checked. Feeds ext_shard_shuffle for the serving order."""
    from component_iceberg_spark.operators.similarity import norm

    b = _binary_docs(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.round(norm(F.col("embedding")), 4).alias("vec_norm")
    )
    return (
        b.select(
            "doc_id", "content_hash",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.mime").alias("mime"),
        )
        .join(d, "doc_id")
        .join(e, F.col("doc_id") == F.col("vec_id"))
        .select(
            "doc_id", "content_hash", "n_bytes", "mime",
            "lang", "source", "vec_norm",
        )
    )
