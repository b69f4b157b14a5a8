"""Multimodal (binary) column plumbing (SURVEY §2.12 / north star).

Image/audio/video payloads are opaque ``BinaryType`` columns with typed
metadata. The Spark-side machinery — schema, Arrow batching, ``mapInPandas``
UDF signature, partitioning — is real and oracle-tested; the actual media
*decode* is stubbed (:func:`decode_image`) because codec libraries are not
in this container. Swapping the stub for PIL/ffmpeg changes one function,
not the plan.

Scale notes: binary payloads ride Arrow batches into Python once
(``mapInPandas``), are hashed/measured vectorized, and never shuffle —
the only shuffle in a typical multimodal pipeline is on the (tiny)
metadata output. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
per-batch memory for large blobs (session.py).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load_table

#: schema of the metadata rows produced by the binary feature extractor
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("magic_u32", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload into an ndarray.

    STUB — media codecs are not available in this environment. The Spark
    plumbing around it (binary column → Arrow batch → per-batch Python)
    is real; plug PIL/imageio here for production.
    """
    raise NotImplementedError(
        "media decode is stubbed in this environment; "
        "binary plumbing is exercised via extract_binary_features"
    )


def _extract_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-Arrow-batch binary feature extraction (runs on executors):
    byte length, sha256 digest, and the leading 4 bytes as a big-endian
    u32 ("magic number" sniffing — the deterministic stand-in for a real
    decode)."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int64"),
                "digest": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                "magic_u32": payloads.map(
                    lambda b: struct.unpack(">I", b[:4])[0] if len(b) >= 4 else -1
                ).astype("int64"),
            }
        )


def extract_binary_features(binary_df: DataFrame) -> DataFrame:
    """Run the Arrow-batched feature extractor over a
    ``(doc_id long, payload binary)`` DataFrame."""
    return binary_df.mapInPandas(_extract_features, FEATURE_SCHEMA)


def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked end-to-end: documents' text encoded as a binary
    payload column, featurized via ``mapInPandas``. The oracle recomputes
    length/sha256/magic bytes in SQL — pinning that the Python batch path
    and the JVM path see identical bytes."""
    docs = load_table(spark, sf_dir, "documents")
    binary_df = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return extract_binary_features(binary_df)


MULTIMODAL_SQL = """
SELECT
  doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
  sha256(text) AS digest,
  CAST(
    ascii(substr(text, 1, 1)) * 16777216 + ascii(substr(text, 2, 1)) * 65536
    + ascii(substr(text, 3, 1)) * 256 + ascii(substr(text, 4, 1))
  AS BIGINT) AS magic_u32
FROM documents
"""


QUERIES = {
    "multimodal_binary_features": multimodal_binary_features,
}

ORACLES = {
    "multimodal_binary_features": MULTIMODAL_SQL,
}


def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` (SURVEY §2.11 — the per-group
    vectorized transform mode, reference analog: per-stack numpy kernels
    threaded through dask): z-score event values within each user.

    The oracle re-derives the same statistics with SQL window functions —
    pinning that the Arrow group transform and the JVM window agree.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["value"].mean()
        s = pdf["value"].std()  # ddof=1 == stddev_samp
        z = (pdf["value"] - m) / s if s and s == s else pdf["value"] * 0.0
        return pd.DataFrame({"event_id": pdf["event_id"], "zscore_raw": z})

    out = ev.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        zscore, "event_id long, zscore_raw double"
    )
    return out.select(
        "event_id",
        F.round(F.col("zscore_raw").cast("decimal(30,10)"), 4)
        .cast("double")
        .alias("zscore"),
    )


GROUPED_ZSCORE_SQL = """
SELECT
  event_id,
  CAST(round(CAST(((value - avg(value) OVER w) / stddev_samp(value) OVER w) AS DECIMAL(30,10)), 4) AS DOUBLE) AS zscore
FROM events
WINDOW w AS (PARTITION BY user_id)
"""

QUERIES["grouped_zscore"] = grouped_zscore
ORACLES["grouped_zscore"] = GROUPED_ZSCORE_SQL
