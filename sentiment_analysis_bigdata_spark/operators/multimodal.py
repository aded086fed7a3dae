"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` payloads + typed metadata structs, processed by Arrow-batched
pandas functions via ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBBED
(deterministic fakes clearly marked below); everything Spark-side — schema,
batch iteration, partition sizing, UDF signatures — is real and tested.
Swapping a stub for Pillow/torchaudio is a one-function change.

Design for 100 TB of media:
- payloads stay ``binary`` columns in parquet (or pointers to object-store
  keys when blobs exceed row-group sanity, ~10 MB);
- metadata is a typed struct column so filters (``meta.width > 512``) prune
  parquet row groups without touching payload bytes;
- all kernels are ``mapInPandas`` over Arrow batches — per-batch Python
  cost, never per-row; batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "struct<kind:string,width:int,height:int,duration_ms:int,codec:string>"


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo ingestion: materialize a binary payload + metadata struct from a
    text column (stands in for reading real media bytes).

    Real deployments replace this with ``spark.read.format('binaryFile')``
    or parquet containing blob columns; everything downstream is unchanged.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("text").alias("kind"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.lit("utf-8").alias("codec"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Byte-level stats without leaving the JVM: size + sha256 fingerprint.

    Exact-dedup of media assets = groupBy(sha256) — same pattern as text.
    """
    return df.withColumn("byte_len", F.octet_length(F.col(payload_col)).cast("bigint")).withColumn(
        "sha256", F.sha2(F.col(payload_col), 256)
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB image decode (no codec libs in container).

    Deterministic fake: 'dimensions' and a 4-float 'feature vector' derived
    from sha256 bytes, so tests are stable. Replace with
    ``PIL.Image.open(io.BytesIO(payload))`` + a real feature extractor.
    """
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = [b / 255.0 for b in h[2:6]]
    return width, height, feats


def decode_and_featurize(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas media decode → (id passthrough, width, height, features).

    The Spark plumbing (Arrow batches, output schema, partition-parallel
    decode) is production-shaped; only ``_fake_decode_image`` is a stub.
    """
    import pandas as pd

    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", width int, height int, features array<double>"
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            decoded = [_fake_decode_image(p) for p in pdf[payload_col]]
            pdf = pdf.copy()
            pdf["width"] = pd.Series([d[0] for d in decoded], index=pdf.index, dtype="int32")
            pdf["height"] = pd.Series([d[1] for d in decoded], index=pdf.index, dtype="int32")
            pdf["features"] = pd.Series([d[2] for d in decoded], index=pdf.index)
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each asset into frame timestamps
    (0, every_ms, 2·every_ms, … duration) — pure expression, no decode.

    A real pipeline feeds this (asset, frame_ts) plan into a mapInPandas
    decode kernel; the expansion itself is JVM-side ``sequence``/``explode``
    so the shuffle-free fan-out is planned by Catalyst.
    """
    duration = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    return df.withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0), duration, F.lit(every_ms))),
    )
