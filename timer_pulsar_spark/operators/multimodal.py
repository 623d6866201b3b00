"""Multimodal columns: image/audio/video as opaque `binary` payloads
with typed metadata, plus the Spark-side plumbing (schema, partitioning,
Arrow batch shape) for decode / feature-extract kernels.

The container has no image/audio codecs, so the real decoders are
STUBBED behind `decode_image` (raises NotImplementedError unless PIL is
importable); everything around them — the binary column, the metadata
struct, the mapInPandas batch pipeline, the deterministic fallback
featurizer — is real and tested.

Design for 100 TB of media:
- payloads stay opaque `binary` columns: Spark never interprets them,
  so scans prune them away unless a kernel projects them (check
  ReadSchema — metadata-only queries must not read payload bytes).
- kernels run via mapInPandas (Arrow batches of bytes -> numpy),
  partition-parallel; `spark.sql.files.maxPartitionBytes` bounds the
  per-task byte volume, and `maxRecordsPerBatch` bounds kernel memory.
- metadata (dims, codec, duration) lives in a typed struct column so
  filters like `meta.width >= 64` push down without touching payloads.

The testdata ships no media table, so the payload column is derived
deterministically from `documents.text` (UTF-8 bytes) — byte-identical
in Spark and DuckDB, which makes even the binary path oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..streaming.state import replay_workdir

N_FEATURES = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the multimodal frame: opaque binary payload + typed
    metadata struct. With a real media lake this is `spark.read.format(
    'binaryFile')` or a parquet table with the same schema."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("utf-8").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real image decode — STUB. The container ships no codec libs;
    a deployment with Pillow installed gets the real path for free."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires Pillow; this environment intentionally "
            "stubs the codec — use byte_histogram_features for the "
            "deterministic fallback kernel"
        ) from exc


def byte_histogram_features(payload: bytes, n: int = N_FEATURES) -> list[float]:
    """Deterministic fallback featurizer: n-bin byte histogram,
    normalized — the stand-in for an image-embedding kernel, with the
    same shape contract (fixed-length float vector per row)."""
    if payload is None:
        return [0.0] * n
    counts = [0] * n
    for byte in payload:
        counts[byte % n] += 1
    total = len(payload) or 1
    return [c / total for c in counts]


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Image resize — STUB (no codec libs in this container); the
    Spark-side call site is `kernel` inside extract_features/
    sample_frames, which is codec-agnostic."""
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).resize((width, height))
        out = io.BytesIO()
        img.save(out, format="PNG")
        return out.getvalue()
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image resize requires Pillow; plumbing (binary in/out, "
            "typed metadata) is exercised via the frame-sample kernel"
        ) from exc


FRAME_BYTES = 256

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)


def sample_frames(mdf: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Frame sampling: the 1->N kernel shape (one media payload -> many
    frame rows) as mapInPandas. The deterministic stand-in 'decodes' a
    frame every `frame_bytes` bytes and emits its digest; a real video
    path swaps the chunker for a codec keyframe iterator with the same
    output schema. Output rows explode inside the Arrow batch — no
    driver involvement, no shuffle."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(0, len(payload), frame_bytes):
                    ids.append(doc_id)
                    idxs.append(i // frame_bytes)
                    digests.append(hashlib.md5(payload[i : i + frame_bytes]).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": digests})

    return mdf.select("doc_id", "payload").mapInPandas(kernel, schema=FRAME_SCHEMA)


def extract_features(mdf: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction pipeline: Arrow batches of
    (doc_id, payload) -> fixed-width feature vectors. The kernel sees
    pandas Series of raw bytes — exactly the batch shape a numpy/codec
    kernel needs; swap `byte_histogram_features` for a real decoder
    without touching the plan."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["payload"].map(byte_histogram_features),
                }
            )

    return mdf.select("doc_id", "payload").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-sample kernel over the multimodal frame: one row per
    256-byte 'frame' with its digest. Oracle-able because the fake
    payload is ASCII text (char positions == byte positions)."""
    return sample_frames(media_frame(spark, sf_dir))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over the multimodal frame: byte size + payload
    md5. Catalyst prunes to exactly the needed columns; at scale this
    query never deserializes media bytes beyond the digest column."""
    m = media_frame(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        "media_type",
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched kernel path: byte-histogram features per doc.
    First histogram bin is exposed as a scalar so the driver's
    value-hash covers kernel output, not just shape."""
    feats = extract_features(media_frame(spark, sf_dir))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.col("features")[0], 6).alias("f0"),
        F.round(F.col("features")[1], 6).alias("f1"),
    )


def q_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-FILE ingestion via Spark's binaryFile source — the real
    path raw images/audio enter the lake as binary columns (path,
    modificationTime, length, content) before any kernel touches
    bytes. Files are staged deterministically from documents.text, so
    the full round-trip (bytes → files on disk → binaryFile scan →
    digest) is oracle-checkable: the oracle recomputes length + md5
    from the source table, and any serialization loss flips the hash.

    Scale notes: binaryFile assigns files to tasks by size
    (spark.sql.files.maxPartitionBytes bounds per-task byte volume);
    content is a lazily-read column, so a metadata-only projection
    (path/length) never reads file bytes — pytest asserts ReadSchema
    excludes `content` for that shape. The 16-file staging collect is
    fixture plumbing, not the operator."""
    import os

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 16)
    rows = d.select("doc_id", "text").collect()  # bounded: 16 staged files
    work = replay_workdir("binfiles")
    for r in rows:
        with open(os.path.join(work, f"doc_{r.doc_id}.bin"), "wb") as f:
            f.write(r.text.encode("utf-8"))
    files = spark.read.format("binaryFile").load(work)
    return files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    ).orderBy("doc_id")


ORACLES: dict[str, str] = {
    "q_binaryfile_ingest": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS content_md5
        FROM documents WHERE doc_id < 16 ORDER BY doc_id
    """,
    "q_multimodal_frames": """
        SELECT doc_id,
               CAST(f AS INTEGER) AS frame_idx,
               md5(substr(text, f * 256 + 1, 256)) AS frame_md5
        FROM documents, generate_series(0, 100) s(f)
        WHERE f * 256 < length(text)
    """,
    "q_multimodal_meta": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5,  -- md5(VARCHAR) hashes UTF-8 bytes,
                                          -- identical to Spark md5(binary)
               'text/plain' AS media_type
        FROM documents
    """,
    # q_multimodal_features: the histogram kernel is trivially SQL-able
    # for text bytes, and DuckDB can index into blobs — but the point of
    # the query is exercising the mapInPandas kernel contract, so keep
    # the oracle anyway (ascii text: byte = ascii(char)).
    "q_multimodal_features": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               round(len(list_filter(range(1, length(text) + 1),
                         i -> ascii(text[i]) % 8 = 0)) * 1.0 / length(text), 6) AS f0,
               round(len(list_filter(range(1, length(text) + 1),
                         i -> ascii(text[i]) % 8 = 1)) * 1.0 / length(text), 6) AS f1
        FROM documents
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q_")
}
