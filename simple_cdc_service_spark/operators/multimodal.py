"""Multimodal columns [EXT E7]: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio libraries, so the *decode* step is
stubbed: ``decode_media(..., fake=False)`` raises NotImplementedError
unless PIL/soundfile are importable, and ``fake=True`` substitutes a
deterministic byte-derived decode. Everything around the stub — schema,
partitioning, UDF signatures, Arrow batch shapes, feature extraction — is
real and tested.

Scale notes:
  * Binary payloads ride in parquet as BYTE_ARRAY; column pruning means a
    metadata-only query never reads the blobs. Keep payloads in their own
    column (never inside a struct with hot metadata) for exactly this
    reason.
  * mapInPandas streams Arrow record batches — peak executor memory is
    O(batch), not O(partition). For 100 MB+ media rows, cap
    spark.sql.execution.arrow.maxRecordsPerBatch accordingly.
  * Feature extraction is embarrassingly parallel; the only shuffle in a
    typical media pipeline is the final group-by-asset rollup.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata for opaque media payloads.
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("histogram", T.ArrayType(T.LongType()), False),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from `documents`: payload =
    4× md5(doc_id) = 64 opaque bytes, mime cycled by doc_id. Pure JVM
    expressions — reproducible in any engine, no Python in the loop."""
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    payload = F.unhex(F.repeat(F.md5(F.col("doc_id").cast("string")), 4))
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.lit(8).cast("int").alias("width"),
            F.lit(8).cast("int").alias("height"),
            F.when(mime == "video/mp4", F.lit(4)).otherwise(F.lit(1)).cast("int").alias("n_frames"),
            F.when(mime == "audio/wav", F.lit(16000)).otherwise(F.lit(None).cast("int")).alias("sample_rate"),
        ).alias("meta"),
    )


def _byte_features(doc_ids: np.ndarray, payloads: list[bytes]) -> pd.DataFrame:
    rows = []
    for did, p in zip(doc_ids, payloads):
        arr = np.frombuffer(p, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=16, range=(0, 256))
        probs = hist[hist > 0] / arr.size
        entropy = float(-(probs * np.log2(probs)).sum())
        rows.append(
            {
                "doc_id": int(did),
                "n_bytes": int(arr.size),
                "byte_mean": float(arr.mean()),
                "byte_entropy": round(entropy, 6),
                "histogram": hist.astype("int64").tolist(),
            }
        )
    return pd.DataFrame(rows)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload (byte
    histogram, mean, entropy). mapInPandas: one pass, batch-at-a-time
    memory, output schema declared up front."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _byte_features(pdf["doc_id"].to_numpy(), list(pdf["payload"]))

    return media.select("doc_id", "payload").mapInPandas(gen, FEATURE_SCHEMA)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("pixels", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode step. Real decode needs PIL/soundfile — absent in this
    container, so it raises NotImplementedError unless ``fake=True``, which
    substitutes a deterministic stand-in (payload bytes scaled to [0,1])
    while keeping the exact production plumbing: mapInPandas, declared
    schema, per-batch decode loop."""
    if not fake:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real media decode requires PIL/soundfile (not installed); "
                "pass fake=True for the deterministic stand-in"
            ) from e

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(p, dtype=np.uint8).astype(np.float64) / 255.0
                out.append({"doc_id": int(did), "pixels": arr.tolist()})
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(gen, DECODE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 16, every: int = 2) -> DataFrame:
    """Frame sampling for 'video' payloads: split the payload into
    fixed-size frames, keep every Nth — one row per kept frame (the
    explode-shaped output a downstream per-frame model expects)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                frames = [p[i : i + frame_bytes] for i in range(0, len(p), frame_bytes)]
                for idx in range(0, len(frames), every):
                    rows.append({"doc_id": int(did), "frame_idx": idx, "frame": frames[idx]})
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(gen, FRAME_SCHEMA)


def extract_features_arrow(media) -> "DataFrame":
    """extract_features via mapInArrow: consumes pyarrow RecordBatches
    directly, skipping the Arrow→pandas→Arrow conversion that mapInPandas
    pays per batch. Same output schema and values as extract_features
    (asserted in tests); bench-compared — the conversion tax matters once
    payloads are large.
    """
    import pyarrow as pa

    # Arrow output must match the declared Spark schema EXACTLY (pandas
    # would widen n_bytes to int64 and the JVM reader then calls the wrong
    # vector accessor).
    target = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_bytes", pa.int32()),
            ("byte_mean", pa.float64()),
            ("byte_entropy", pa.float64()),
            ("histogram", pa.list_(pa.int64())),
        ]
    )

    def gen(batches):
        for batch in batches:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            payloads = batch.column("payload").to_pylist()
            pdf = _byte_features(ids, payloads)
            yield from pa.Table.from_pandas(pdf, schema=target, preserve_index=False).to_batches()

    return media.select("doc_id", "payload").mapInArrow(gen, FEATURE_SCHEMA)
