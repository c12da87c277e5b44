"""Multimodal (binary) column operators.

Pattern for image/audio/video at 100 TB: content as an opaque ``binary``
column + a typed metadata struct, scanned with normal Parquet pushdown
(metadata predicates prune without touching bytes), processed by
Arrow-batched ``mapInPandas`` so Python sees columnar batches, never rows.

The decode step itself (PIL/librosa/ffmpeg) is STUBBED in this container —
the libraries are absent — behind :func:`decode_available`; everything
Spark-side (schema, batch shape, partitioning, UDF signature) is real and
tested with a deterministic fake derived from the content hash.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4

FEATURES_SCHEMA = (
    "doc_id long, n_bytes int, mean_byte double, "
    "width int, height int, features array<double>, decoder string"
)


def decode_available() -> bool:
    """True when a real image decoder is importable (not in this image)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def ingest_binary(df: DataFrame, id_col: str, content_col, mime: str) -> DataFrame:
    """Wrap raw content as the engine's multimodal shape: binary payload,
    metadata struct, sha256 content address (dedup/caching key)."""
    return df.select(
        F.col(id_col),
        content_col.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(content_col).cast("long").alias("n_bytes"),
        ).alias("meta"),
        F.sha2(content_col, 256).alias("content_hash"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for the real decoder: pseudo width/height and
    a FEATURE_DIM embedding derived from sha256 bytes. Replace with
    PIL/torchvision when available — the Spark plumbing is identical."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feats = [round(b / 255.0, 6) for b in h[2 : 2 + FEATURE_DIM]]
    return width, height, feats


def _pil_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decoder path (used when :func:`decode_available`): PIL decode
    → grayscale → 2x2 thumbnail whose pixels are the FEATURE_DIM feature
    vector. Same signature as :func:`_fake_decode`, so the mapInPandas
    stage is byte-for-byte identical either way — only the per-element
    derivation swaps."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L")
    width, height = img.size
    thumb = img.resize((2, 2))
    feats = [round(p / 255.0, 6) for p in thumb.getdata()][:FEATURE_DIM]
    return width, height, feats


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: one Python worker per partition, pandas batches in and
    out — the per-element work is embarrassingly parallel, so throughput
    scales linearly with executors. Real decoders slot into
    ``_fake_decode`` unchanged (see :func:`decode_available`).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # import probe runs on the WORKER (where the decode executes), not
        # the driver — the two can differ on a real cluster
        real = decode_available()  # pragma: no cover - lib absent here
        decoder = "pil" if real else "stub-sha256"
        decode = _pil_decode if real else _fake_decode
        for pdf in batches:
            payloads = pdf["content"]
            rows = {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "mean_byte": payloads.map(
                    lambda b: round(sum(b) / len(b), 6) if len(b) else 0.0
                ),
            }
            decoded = payloads.map(decode)
            rows["width"] = decoded.map(lambda t: t[0]).astype("int32")
            rows["height"] = decoded.map(lambda t: t[1]).astype("int32")
            rows["features"] = decoded.map(lambda t: t[2])
            rows["decoder"] = decoder
            yield pd.DataFrame(rows)

    return df.select("doc_id", "content").mapInPandas(op, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int) -> DataFrame:
    """Frame/segment sampling plumbing: emit n evenly-spaced (offset, span)
    windows per blob — the video/audio chunking shape. Pure expressions;
    the per-frame decode would be a second ``mapInPandas`` over the
    exploded rows (so frames of one blob fan out across tasks)."""
    n_bytes = F.col("meta.n_bytes")
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    # floor() pinned on both engine and oracle: DuckDB CAST(double AS INT)
    # rounds while Spark truncates — floor removes the ambiguity.
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("frame_no"),
            F.floor(i * n_bytes / n_frames).cast("int").alias("offset"),
            F.floor(n_bytes / n_frames).cast("int").alias("span"),
        ),
    )
    return df.select(
        "doc_id", "content_hash", F.explode(frames).alias("frame")
    ).select(
        "doc_id",
        "content_hash",
        F.col("frame.frame_no").alias("frame_no"),
        F.col("frame.offset").alias("offset"),
        F.col("frame.span").alias("span"),
    )


# ---------------------------------------------------------------------------
# Typed media metadata (audio/video) + per-frame second stage
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = (
    "doc_id long, sample_rate int, channels int, duration_ms bigint, "
    "codec string"
)

VIDEO_META_SCHEMA = (
    "doc_id long, fps int, width int, height int, duration_ms bigint, "
    "codec string"
)


def _hex_byte(hexdigest: str, j: int) -> int:
    """Byte j of a hex digest — the deterministic seed the stub probes
    derive typed metadata from (replayable in ANSI SQL from the same
    digest, so the probe stage has an exact oracle)."""
    return int(hexdigest[2 * j : 2 * j + 2], 16)


def probe_audio(df: DataFrame) -> DataFrame:
    """Audio probe stage: binary payload → typed audio metadata struct
    (sample_rate/channels/duration/codec) via Arrow-batched mapInPandas —
    the ffprobe/soundfile slot. STUBBED here (no audio libs in this
    container): fields derive deterministically from the payload's sha256,
    so the whole Arrow round-trip is exact-oracle-checkable; a real prober
    replaces the derivation only."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["content"].map(
                lambda b: hashlib.sha256(b).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": digests.map(
                        lambda h: 8000 * (1 + _hex_byte(h, 0) % 5)
                    ).astype("int32"),
                    "channels": digests.map(
                        lambda h: 1 + _hex_byte(h, 1) % 2
                    ).astype("int32"),
                    "duration_ms": (pdf["content"].map(len) * 20).astype(
                        "int64"
                    ),
                    "codec": "stub-pcm",
                }
            )

    return df.select("doc_id", "content").mapInPandas(op, AUDIO_META_SCHEMA)


def probe_video(df: DataFrame) -> DataFrame:
    """Video probe stage (ffprobe slot) — same stub contract as
    :func:`probe_audio`."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["content"].map(
                lambda b: hashlib.sha256(b).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fps": digests.map(
                        lambda h: 12 + 6 * (_hex_byte(h, 0) % 3)
                    ).astype("int32"),
                    "width": digests.map(
                        lambda h: 320 + 16 * (_hex_byte(h, 1) % 8)
                    ).astype("int32"),
                    "height": digests.map(
                        lambda h: 240 + 16 * (_hex_byte(h, 2) % 8)
                    ).astype("int32"),
                    "duration_ms": (pdf["content"].map(len) * 40).astype(
                        "int64"
                    ),
                    "codec": "stub-raw",
                }
            )

    return df.select("doc_id", "content").mapInPandas(op, VIDEO_META_SCHEMA)


def slice_frames(media: DataFrame, n_frames: int) -> DataFrame:
    """Materialize the sampled frame windows as actual byte slices:
    (doc_id, frame_no, frame_bytes, frame_hash). Pure expressions —
    ``substring`` on a binary column slices bytes JVM-side, and the hash
    gives each frame a content address. The per-blob fan-out means frame
    rows of one video distribute across tasks before any Python stage."""
    fr = sample_frames(media, n_frames)
    joined = fr.join(media.select("doc_id", "content"), "doc_id")
    frame_bytes = F.expr("substring(content, offset + 1, span)")
    return joined.select(
        "doc_id",
        "frame_no",
        "offset",
        "span",
        frame_bytes.alias("frame_content"),
        F.sha2(frame_bytes, 256).alias("frame_hash"),
    )


def segment_windows(probed: DataFrame, segment_ms: int) -> DataFrame:
    """Time-based audio segmentation: each stream's probed duration is
    split into fixed-length windows ``[t0_ms, t1_ms)`` with the sample
    count each window covers — the unit of work for downstream transcribe/
    spectrogram stages (which would be a mapInPandas over these rows, the
    same fan-out discipline as :func:`frame_features`).

    Unlike :func:`sample_frames` (byte offsets, count fixed per blob),
    segmentation is over TIME: window count varies with duration, the
    tail window is short, and sample counts derive from the probed
    sample_rate. All integer expressions — cost ∝ emitted segments, and
    the explode distributes one stream's segments across tasks."""
    n_seg = F.expr(f"(duration_ms + {segment_ms - 1}) div {segment_ms}")
    seg = F.explode(F.sequence(F.lit(0).cast("long"), n_seg - 1)).alias("s")
    t0 = F.col("s") * segment_ms
    t1 = F.least(t0 + segment_ms, F.col("duration_ms"))
    return (
        probed.filter(F.col("duration_ms") > 0)
        .select("doc_id", "sample_rate", "duration_ms", seg)
        .select(
            "doc_id",
            F.col("s").cast("int").alias("seg_no"),
            t0.cast("long").alias("t0_ms"),
            t1.cast("long").alias("t1_ms"),
            F.floor((t1 - t0) * F.col("sample_rate") / 1000)
            .cast("long")
            .alias("n_samples"),
        )
    )


FRAME_FEATURES_SCHEMA = (
    "doc_id long, frame_no int, features array<double>, decoder string"
)


def frame_features(sliced: DataFrame) -> DataFrame:
    """Second mapInPandas stage over the EXPLODED frame rows — per-frame
    decode/featurize (the thumbnail/spectrogram slot). Because the
    explode happened upstream, frames of one blob are independent rows:
    the stage parallelizes per frame, not per blob. Stub features derive
    from each frame's sha256 (exact-oracle-checkable); a real decoder
    swaps into the per-row derivation only."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["frame_content"].map(
                lambda b: hashlib.sha256(b).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_no": pdf["frame_no"].astype("int32"),
                    "features": digests.map(
                        lambda h: [
                            round(_hex_byte(h, j) / 255.0, 6)
                            for j in range(FEATURE_DIM)
                        ]
                    ),
                    "decoder": "stub-sha256",
                }
            )

    return sliced.select("doc_id", "frame_no", "frame_content").mapInPandas(
        op, FRAME_FEATURES_SCHEMA
    )
