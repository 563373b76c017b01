"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with typed
metadata structs. The Spark-side machinery here is REAL and tested:
schemas, Arrow-batched mapInPandas with a bounded batch size, partition
behavior. The actual codec work (JPEG decode, resampling, frame sampling)
is STUBBED — the decode libraries are not in this container — behind
``NotImplementedError`` plus a deterministic fake used by tests/oracles.

Design for 100TB: payloads stay columnar (parquet binary), metadata
extraction streams through mapInPandas in Arrow batches (no per-row Python
calls, no payload ever collected to the driver), and downstream filters on
the extracted metadata columns get normal Catalyst treatment.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("fake_width", LongType()),
    StructField("fake_height", LongType()),
])


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in payload: the utf-8 bytes of the text column.
    In production this column comes straight from the source parquet."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8").cast(BinaryType()))


def decode_image(payload: bytes) -> object:
    """Real decoder entry point — deliberately unimplemented here."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode for deterministic plumbing tests"
    )


def fake_decode(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic fake decode: byte length, sha256 hex, and fake
    dimensions derived from the length (oracle-expressible)."""
    n = len(payload)
    return n, hashlib.sha256(payload).hexdigest(), 1 + n % 640, 1 + (n * 7) % 480


def extract_meta(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    mapInPandas (not a scalar UDF) so one Python invocation handles a whole
    Arrow batch, and wide rows never round-trip more than once.
    """
    id_name, payload_name = id_col, payload_col
    # single-file sources arrive as one partition -> one Python worker;
    # spread across the cluster before the Arrow exchange — size-aware, so
    # a tiny input keeps one partition (each extra one costs a Python
    # worker spin-up) while a 100TB source already arrives wide (no-op).
    from nexusbase_spark.plans import spread
    df = spread(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_name]
            n = payloads.map(len)
            yield pd.DataFrame({
                "doc_id": pdf[id_name],
                "n_bytes": n.astype("int64"),
                "sha256": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "fake_width": (1 + n % 640).astype("int64"),
                "fake_height": (1 + n * 7 % 480).astype("int64"),
            })

    return df.select(id_col, payload_col).mapInPandas(run, META_SCHEMA)
