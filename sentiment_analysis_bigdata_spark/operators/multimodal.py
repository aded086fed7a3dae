"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` payloads + typed metadata structs, processed by Arrow-batched
pandas functions via ``mapInPandas``.

The decode kernels are REAL dependency-free codec parsers for the two
container formats whose structure is fully specified by public byte
layouts: PNG (signature + IHDR big-endian dims + zlib-deflated IDAT
scanlines, RFC 2083) and RIFF/WAV (fmt/data little-endian chunks, 16-bit
PCM). Payload synthesis builds genuinely structured bytes (correct chunk
sizes, CRCs, filter bytes, PCM samples), so decode → dims AND decode →
pixel/sample statistics are end-to-end binary round trips, not fakes: a
parser bug (endianness, chunk offset, filter-byte handling, inflate
length) breaks the DuckDB oracle, which recomputes the planted values in
closed form from the source columns. Content decode uses only zlib +
numpy (both in the base container); codecs that would need real media
libs (JPEG, H.264, MP3) fall back to kind='unknown' with a clearly-marked
deterministic sha-derived feature stub.

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


def synthesize_png_bytes(
    width: int, height: int, pixel_byte: int | None = None
) -> bytes:
    """Spec-valid 8-bit RGB PNG: signature + IHDR (correct CRC) + optional
    IDAT + IEND. With ``pixel_byte`` set, a REAL zlib-deflated IDAT is
    included: each scanline is a 0 (None) filter byte followed by w RGB
    pixels — the FIRST pixel of row y carries value y in all channels (a
    per-row sentinel that content decode must find at the right offsets;
    requires height ≤ 256) and the remaining w-1 pixels carry
    ``pixel_byte``. Without it, the stream is headers-only (legacy
    fixture shape; content stats decode to null)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunks = PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
    if pixel_byte is not None:
        raw = b"".join(
            b"\x00" + bytes([y % 256] * 3) + bytes([pixel_byte] * 3) * (width - 1)
            for y in range(height)
        )
        chunks += _png_chunk(b"IDAT", zlib.compress(raw))
    return chunks + _png_chunk(b"IEND", b"")


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


def decode_png_content(payload: bytes) -> tuple[int, int] | None:
    """Pixel-level stats from the IDAT stream: walk the chunk list,
    concatenate IDAT bodies, zlib-inflate, validate the exact
    h·(1 + 3w) scanline length, strip each row's leading filter byte
    (only filter 0 is produced by our synthesizer; anything else is
    rejected), and return (px_count, px_sum) over the channel bytes.
    None when the stream has no IDAT (headers-only fixture)."""
    import numpy as np

    width, height = decode_png_header(payload)
    pos, idat = 8, []
    while pos + 8 <= len(payload):
        length, tag = struct.unpack(">I4s", payload[pos : pos + 8])
        if tag == b"IDAT":
            idat.append(payload[pos + 8 : pos + 8 + length])
        pos += 12 + length  # length + tag + body + crc
    if not idat:
        return None
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + 3 * width
    if len(raw) != height * stride:
        raise ValueError("PNG IDAT: unexpected scanline length")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
    if rows[:, 0].any():
        raise ValueError("PNG IDAT: unsupported filter type")
    px = rows[:, 1:]
    return int(px.size), int(px.sum(dtype=np.int64))


def synthesize_wav_bytes(
    n_samples: int,
    rate: int = WAV_RATE,
    channels: int = WAV_CHANNELS,
    bits: int = WAV_BITS,
    sample_value: int = 0,
) -> bytes:
    """Structurally complete RIFF/WAVE: fmt chunk (PCM) + a data chunk of
    ``n_samples`` little-endian 16-bit samples all holding
    ``sample_value`` (negative values exercise two's-complement byte
    order) — all sizes and sample bytes real, so duration AND sample
    statistics are honestly recomputable from the bytes alone."""
    data = struct.pack("<h", sample_value) * (n_samples * channels)
    if bits != 16:  # non-16-bit fixtures keep the legacy zero fill
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


def decode_wav_content(payload: bytes) -> tuple[int, int, int] | None:
    """Sample-level stats from the data chunk: locate it by walking the
    RIFF chunk list, reinterpret as little-endian int16 PCM, and return
    (n_samples, pcm_sum, pcm_abs_max). None for non-16-bit streams."""
    import numpy as np

    _dur, _rate, channels, bits = decode_wav_header(payload)
    if bits != 16:
        return None
    pos = 12
    while pos + 8 <= len(payload):
        tag, size = struct.unpack("<4sI", payload[pos : pos + 8])
        if tag == b"data":
            samples = np.frombuffer(
                payload[pos + 8 : pos + 8 + size], dtype="<i2"
            )
            return (
                len(samples) // channels,
                int(samples.sum(dtype=np.int64)),
                int(np.abs(samples.astype(np.int64)).max(initial=0)),
            )
        pos += 8 + size + (size & 1)
    raise ValueError("not a WAV: missing data chunk")


JPEG_SOI = b"\xff\xd8"
# standalone markers carry no length field (TEM, RST0-7; EOI/SOI handled
# separately in the walk)
_JPEG_STANDALONE = {0x01} | set(range(0xD0, 0xD8))
# SOF markers: C0-CF minus DHT (C4), JPG (C8), DAC (CC)
_JPEG_SOF = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
# progressive-DCT SOFs (huffman + arithmetic variants)
_JPEG_SOF_PROGRESSIVE = {0xC2, 0xC6, 0xCA, 0xCE}


def synthesize_jpeg_bytes(
    width: int,
    height: int,
    progressive: bool = False,
    with_exif: bool = False,
) -> bytes:
    """Structurally valid JPEG for the marker walk: SOI + JFIF APP0 +
    (optional) EXIF APP1 with a minimal little-endian TIFF body + DQT +
    SOF0/SOF2 (8-bit precision, 3 components, big-endian dims) + SOS
    header + a little entropy filler + EOI. Every segment length field
    is correct, so a decoder bug (length arithmetic, marker class,
    endianness) surfaces as a wrong or failed parse — not a silently
    passing fake."""
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = JPEG_SOI + seg(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    if with_exif:
        tiff = b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 0) + struct.pack("<I", 0)
        out += seg(0xE1, b"Exif\x00\x00" + tiff)
    out += seg(0xDB, b"\x00" + bytes(64))  # DQT: table 0, flat
    sof_marker = 0xC2 if progressive else 0xC0
    comps = b"".join(bytes([cid, 0x11, 0]) for cid in (1, 2, 3))
    out += seg(sof_marker, struct.pack(">BHHB", 8, height, width, 3) + comps)
    out += seg(0xDA, b"\x03" + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00")
    return out + b"\xa5\x5a\xa5\x5a" + b"\xff\xd9"  # entropy filler + EOI


def decode_jpeg_header(payload: bytes) -> tuple[int, int, int, bool, bool]:
    """(width, height, n_components, progressive, has_exif) by walking
    the marker list up to SOS/EOI — the metadata a crawl pipeline needs
    without entropy decode (dims for filtering/resize planning, the
    progressive flag because baseline-only decoders must transcode,
    EXIF presence for privacy scrubbing). Raises ValueError on malformed
    input: no SOI, a truncated segment, or no SOF before SOS/EOI."""
    if len(payload) < 4 or payload[:2] != JPEG_SOI:
        raise ValueError("not a JPEG: bad SOI")
    pos, sof, has_exif = 2, None, False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("not a JPEG: expected marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in _JPEG_STANDALONE:
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("not a JPEG: truncated segment header")
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if seg_len < 2 or pos + 2 + seg_len > len(payload):
            raise ValueError("not a JPEG: truncated segment body")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            has_exif = True
        elif marker in _JPEG_SOF:
            if len(body) < 6:
                raise ValueError("not a JPEG: short SOF")
            _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            sof = (w, h, ncomp, marker in _JPEG_SOF_PROGRESSIVE)
        elif marker == 0xDA:  # SOS: entropy data follows, stop walking
            break
        pos += 2 + seg_len
    if sof is None:
        raise ValueError("not a JPEG: no SOF marker before SOS/EOI")
    w, h, ncomp, prog = sof
    return w, h, ncomp, prog, has_exif


def _sha_features(payload: bytes) -> list[float]:
    """Placeholder feature extractor (sha-derived, deterministic) — the
    honest stand-in until a real embedding model runs next to the data."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[2:6]]


def decode_media(payload: bytes):
    """Dispatch on magic bytes → (kind, width, height, duration_ms,
    sample_rate, px_count, px_sum, pcm_n_samples, pcm_sum, pcm_abs_max,
    features). Content stats are None where the modality doesn't define
    them (or, for PNG, when the stream is headers-only). Unknown/corrupt
    payloads come back as kind 'unknown' with null fields — a poisoned
    row must not kill a 100 TB job; callers filter or quarantine on
    kind."""
    none5 = (None, None, None, None, None)
    try:
        if payload[:8] == PNG_SIGNATURE:
            w, h = decode_png_header(payload)
            px = decode_png_content(payload)
            px_count, px_sum = px if px is not None else (None, None)
            return (
                ("png", w, h, None, None)
                + (px_count, px_sum, None, None, None)
                + (_sha_features(payload),)
            )
        if payload[:2] == JPEG_SOI:
            w, h, _ncomp, prog, _exif = decode_jpeg_header(payload)
            return (
                ("jpeg_progressive" if prog else "jpeg", w, h, None, None)
                + none5
                + (_sha_features(payload),)
            )
        if payload[:4] == b"RIFF":
            dur, rate, _, _ = decode_wav_header(payload)
            pcm = decode_wav_content(payload)
            n, s, mx = pcm if pcm is not None else (None, None, None)
            return (
                ("wav", None, None, dur, rate)
                + (None, None, n, s, mx)
                + (_sha_features(payload),)
            )
    except (ValueError, zlib.error, struct.error):
        # corrupt payload in a recognized container (bad CRC-side data,
        # truncated chunk, undecodable deflate stream) — degrade to
        # 'unknown' like an unrecognized magic; a poisoned row must not
        # kill the batch
        pass
    return ("unknown", None, None, None, None) + none5 + (_sha_features(payload),)


# --- Spark-side kernels -----------------------------------------------------------

def attach_png_payloads(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fixture ingestion: real content-complete PNG bytes per row, with
    every planted parameter derived from source columns so an oracle can
    recompute in closed form what decode must read back out of the bytes:
    width = 64 + id mod 192, height = 64 + text length mod 192 (≤ 255,
    satisfying the row-sentinel bound), fill pixel = (7·id + text length)
    mod 256. Planted pixel sums: row y holds sentinel y (3 channels) +
    (w-1) fill pixels, so px_sum = 3·h(h-1)/2 + 3·h·(w-1)·fill."""
    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                synthesize_png_bytes(
                    64 + int(i) % 192,
                    64 + len(t or "") % 192,
                    pixel_byte=(7 * int(i) + len(t or "")) % 256,
                )
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
    """Fixture ingestion: real RIFF/WAVE bytes per row, planted from the
    text length: (len mod 100 + 1)·80 samples @ 8 kHz (duration
    (len mod 100 + 1)·10 ms), every 16-bit sample holding
    (len mod 17) − 8 — negatives exercise two's-complement byte order in
    content decode (pcm_sum = n·value, pcm_abs_max = |value|)."""
    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                synthesize_wav_bytes(
                    (len(t or "") % 100 + 1) * 80,
                    sample_value=(len(t or "") % 17) - 8,
                )
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, payload binary"
    )


def attach_jpeg_payloads(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fixture ingestion for the JPEG lane, every parameter planted from
    source columns so an oracle recomputes in closed form what the
    marker walk must read back: width = 32 + id mod 1000, height =
    32 + text-length mod 1000, progressive when id ≡ 0 (mod 3), EXIF
    present when text-length is even. Rows with id ≡ 0 (mod 23) are
    TRUNCATED after the APP0 segment (SOI intact, no SOF) — a corrupt
    crawl asset that must degrade to kind='unknown', not fail the
    batch."""
    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                n = len(t or "")
                b = synthesize_jpeg_bytes(
                    32 + int(i) % 1000,
                    32 + n % 1000,
                    progressive=int(i) % 3 == 0,
                    with_exif=n % 2 == 0,
                )
                payloads.append(b[:24] if int(i) % 23 == 0 else b)
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, payload binary"
    )


def decode_jpeg_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas JPEG marker walk → input columns (minus payload) +
    (kind, width, height, n_components, progressive, has_exif). Corrupt
    or non-JPEG payloads degrade to kind='unknown' with null fields —
    the same quarantine-don't-crash policy as :func:`decode_media`."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for p in pdf[payload_col]:
                try:
                    w, h, ncomp, prog, exif = decode_jpeg_header(bytes(p))
                    rows.append(("jpeg", w, h, ncomp, prog, exif))
                except (ValueError, struct.error):
                    rows.append(("unknown", None, None, None, None, None))
            out = pdf.drop(columns=[payload_col])
            out["kind"] = [r[0] for r in rows]
            for j, name in enumerate(
                ["width", "height", "n_components"], start=1
            ):
                out[name] = pd.Series(
                    [r[j] for r in rows], index=out.index, dtype="Int32"
                )
            for j, name in enumerate(["progressive", "has_exif"], start=4):
                out[name] = pd.Series(
                    [r[j] for r in rows], index=out.index, dtype="boolean"
                )
            yield out

    in_cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != payload_col
    )
    return df.mapInPandas(
        kernel,
        schema=f"{in_cols}, kind string, width int, height int, "
        "n_components int, progressive boolean, has_exif boolean",
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
        + " sample_rate int, px_count bigint, px_sum bigint,"
        + " pcm_n_samples bigint, pcm_sum bigint, pcm_abs_max bigint,"
        + " features array<double>"
    )
    int_cols = {
        "width": "Int32",
        "height": "Int32",
        "duration_ms": "Int32",
        "sample_rate": "Int32",
        "px_count": "Int64",
        "px_sum": "Int64",
        "pcm_n_samples": "Int64",
        "pcm_sum": "Int64",
        "pcm_abs_max": "Int64",
    }

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            decoded = [decode_media(p) for p in pdf[payload_col]]
            pdf = pdf.copy()
            for i, name in enumerate(
                [
                    "kind",
                    "width",
                    "height",
                    "duration_ms",
                    "sample_rate",
                    "px_count",
                    "px_sum",
                    "pcm_n_samples",
                    "pcm_sum",
                    "pcm_abs_max",
                ]
            ):
                pdf[name] = pd.Series(
                    [d[i] for d in decoded],
                    index=pdf.index,
                    dtype=int_cols.get(name, "object"),
                )
            pdf["features"] = pd.Series([d[10] for d in decoded], index=pdf.index)
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


def resize_stats(
    df: DataFrame, payload_col: str = "payload", factor: int = 2
) -> DataFrame:
    """Nearest-neighbor downsample by ``factor`` over REAL decoded PNG
    pixels (the standard thumbnail/preprocess step of an image-curation
    pipeline), reporting the downsampled grid's dims and pixel stats.

    Decode path is :func:`decode_png_content`'s (chunk walk, IDAT
    inflate, filter-byte strip); sampling keeps every ``factor``-th row
    and column starting at (0, 0) — the deterministic nearest-neighbor
    policy an oracle can recompute in closed form on planted fixtures.
    Arrow batches in/out via ``mapInPandas``; per-batch Python cost only,
    same scale shape as :func:`decode_and_featurize`. Malformed-input
    policy (uniform — a curation pipeline quarantines, it doesn't
    crash): headers-only payloads (no IDAT), non-PNG bytes, truncated or
    undecodable IDAT streams, and non-zero filter bytes ALL yield null
    stats for that row; the rest of the batch proceeds.
    """
    import numpy as np

    def one(b: bytes):
        width, height = decode_png_header(b)
        pos, idat = 8, []
        while pos + 8 <= len(b):
            length, tag = struct.unpack(">I4s", b[pos : pos + 8])
            if tag == b"IDAT":
                idat.append(b[pos + 8 : pos + 8 + length])
            pos += 12 + length
        if not idat:
            return None
        raw = zlib.decompress(b"".join(idat))
        stride = 1 + 3 * width
        if len(raw) != height * stride:
            raise ValueError("PNG IDAT: unexpected scanline length")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
        if rows[:, 0].any():
            raise ValueError("PNG IDAT: unsupported filter type")
        px = rows[:, 1:].reshape(height, width, 3)
        ds = px[0::factor, 0::factor, :]
        return ds.shape[1], ds.shape[0], int(ds.size), int(ds.sum(dtype=np.int64))

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "out_width": [], "out_height": [], "ds_px_count": [],
                "ds_px_sum": [],
            }
            keep = {c: pdf[c] for c in pdf.columns if c != payload_col}
            for payload in pdf[payload_col]:
                try:
                    r = one(bytes(payload))
                except (ValueError, zlib.error, struct.error):
                    r = None
                for k, v in zip(out, r or (None, None, None, None)):
                    out[k].append(v)
            yield pd.DataFrame({**keep, **out})

    in_cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != payload_col
    )
    return df.mapInPandas(
        kernel,
        schema=f"{in_cols}, out_width int, out_height int, "
        "ds_px_count bigint, ds_px_sum bigint",
    )


def synthesize_png_gradient(width: int, height: int, ax: int, by: int) -> bytes:
    """Spec-valid 8-bit RGB PNG whose pixel (x, y) carries
    v = (ax·x + by·y) mod 256 in all three channels — a deterministic
    non-uniform image (unlike :func:`synthesize_png_bytes`'s flat fill)
    so perceptual-hash fixtures produce NON-degenerate bit patterns an
    oracle can recompute pixel-exactly from (width, height, ax, by)."""
    raw = b"".join(
        b"\x00"
        + bytes(
            b
            for x in range(width)
            for b in ((ax * x + by * y) % 256,) * 3
        )
        for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def attach_gradient_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Fixture ingestion for the perceptual-hash lane: per row a REAL
    gradient PNG with every parameter planted from the id —
    w = 64 + (id mod 4)·16, h = 64 + (id mod 3)·32, ax = 1 + id mod 3,
    by = 2 + id mod 5 — so ids congruent mod lcm(4,3,3,5)=60 produce
    byte-identical images (planted duplicate clusters for the dedup
    report) and the oracle recomputes every pixel in closed form."""
    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                synthesize_png_gradient(
                    64 + int(i) % 4 * 16,
                    64 + int(i) % 3 * 32,
                    1 + int(i) % 3,
                    2 + int(i) % 5,
                )
                for i in pdf[id_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, payload binary"
    )


def ahash_64(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """64-bit average hash (aHash) — the standard web-scale image
    near-dup primitive: decode the PNG, take the single-channel plane
    (the fixtures carry r=g=b), split the top-left 8·(w//8) × 8·(h//8)
    region into an 8×8 block grid, and set bit (bx + 8·by) iff the
    block's mean exceeds the region's mean. Every comparison is an
    INTEGER cross-multiply (block_sum·region_count > region_sum·
    block_count) — no float ever decides a bit, so any engine that can
    sum pixels replays the hash exactly. Emitted as two 32-bit halves
    (``ahash_hi``/``ahash_lo``) because a bit-63 BIGINT literal
    overflows ANSI engines.

    Malformed payloads (no IDAT, bad filter, truncated) yield null
    halves — the same quarantine policy as :func:`resize_stats`. Arrow
    batches via ``mapInPandas``; per-batch Python only, embarrassingly
    parallel, no shuffle."""
    import numpy as np

    def one(b: bytes):
        width, height = decode_png_header(b)
        pos, idat = 8, []
        while pos + 8 <= len(b):
            length, tag = struct.unpack(">I4s", b[pos : pos + 8])
            if tag == b"IDAT":
                idat.append(b[pos + 8 : pos + 8 + length])
            pos += 12 + length
        if not idat:
            return None
        raw = zlib.decompress(b"".join(idat))
        stride = 1 + 3 * width
        if len(raw) != height * stride:
            raise ValueError("PNG IDAT: unexpected scanline length")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
        if rows[:, 0].any():
            raise ValueError("PNG IDAT: unsupported filter type")
        plane = rows[:, 1:].reshape(height, width, 3)[:, :, 0].astype(np.int64)
        bw, bh = width // 8, height // 8
        if bw == 0 or bh == 0:
            return None
        region = plane[: 8 * bh, : 8 * bw]
        bsum = region.reshape(8, bh, 8, bw).sum(axis=(1, 3))  # [by, bx]
        rsum = int(region.sum())
        rcnt = 8 * bh * 8 * bw
        bcnt = bh * bw
        hi = lo = 0
        for by in range(8):
            for bx in range(8):
                if int(bsum[by, bx]) * rcnt > rsum * bcnt:
                    j = bx + 8 * by
                    if j < 32:
                        lo |= 1 << j
                    else:
                        hi |= 1 << (j - 32)
        return hi, lo

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            keep = {c: pdf[c] for c in pdf.columns if c != payload_col}
            his, los = [], []
            for payload in pdf[payload_col]:
                try:
                    r = one(bytes(payload))
                except (ValueError, zlib.error, struct.error):
                    r = None
                his.append(None if r is None else r[0])
                los.append(None if r is None else r[1])
            yield pd.DataFrame({**keep, "ahash_hi": his, "ahash_lo": los})

    in_cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != payload_col
    )
    return df.mapInPandas(
        kernel, schema=f"{in_cols}, ahash_hi bigint, ahash_lo bigint"
    )


TONE_N_SAMPLES = 512
TONE_AMPLITUDE = 8000


def synthesize_tone_wav(bin_k: int, n_samples: int = TONE_N_SAMPLES,
                        rate: int = WAV_RATE) -> bytes:
    """RIFF/WAVE carrying a pure sine at DFT bin ``bin_k``: sample t =
    round(A·sin(2π·k·t/N)). Because the tone frequency sits EXACTLY on
    the length-N DFT grid, the spectrum's argmax bin equals k in closed
    form — the property that lets an oracle verify a frequency analysis
    without running one."""
    import numpy as np

    t = np.arange(n_samples, dtype=np.float64)
    samples = np.round(
        TONE_AMPLITUDE * np.sin(2.0 * np.pi * bin_k * t / n_samples)
    ).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
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


def attach_tone_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Fixture ingestion for the frequency lane: a 512-sample 8 kHz pure
    tone per row at DFT bin k = 1 + id mod 200 (always under Nyquist),
    so the planted peak bin is a closed-form function of the id. Only
    200 distinct tones exist, so synthesis is memoized per bin."""
    def kernel(batches):
        import pandas as pd

        cache: dict = {}

        def tone(k: int) -> bytes:
            if k not in cache:
                cache[k] = synthesize_tone_wav(k)
            return cache[k]

        for pdf in batches:
            payloads = [tone(1 + int(i) % 200) for i in pdf[id_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, payload binary"
    )


def audio_peak_bin(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Dominant-frequency detection over real PCM bytes: walk the RIFF
    chunks, reinterpret the data chunk as int16, take the length-N rFFT
    magnitude argmax over bins 1..N/2 (DC excluded) — the feature-
    extraction step of an audio-curation pipeline (tone/DTMF/hum
    detection, silence screening). Arrow-batched numpy per batch, never
    per row; undecodable payloads degrade to null bins (quarantine-
    don't-crash, same policy as the image lanes)."""
    import numpy as np

    def one(b: bytes):
        duration_ms, rate, channels, bits = decode_wav_header(bytes(b))
        pos = 12
        data = None
        while pos + 8 <= len(b):
            tag, length = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
            if tag == b"data":
                data = b[pos + 8 : pos + 8 + length]
                break
            pos += 8 + length + (length & 1)
        if data is None or bits != 16:
            return None
        pcm = np.frombuffer(data, dtype="<i2").astype(np.float64)
        if len(pcm) < 4:
            return None
        spec = np.abs(np.fft.rfft(pcm))
        k = int(np.argmax(spec[1:])) + 1
        return k, len(pcm), rate

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            keep = {c: pdf[c] for c in pdf.columns if c != payload_col}
            out = {"peak_bin": [], "n_samples": [], "sample_rate": []}
            for payload in pdf[payload_col]:
                try:
                    r = one(payload)
                except (ValueError, struct.error):
                    r = None
                for key, v in zip(out, r or (None, None, None)):
                    out[key].append(v)
            yield pd.DataFrame({**keep, **out})

    in_cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != payload_col
    )
    return df.mapInPandas(
        kernel,
        schema=f"{in_cols}, peak_bin int, n_samples int, sample_rate int",
    )
