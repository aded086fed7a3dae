"""Multimodal plumbing tests: binary payload columns, Arrow-batched decode
kernel shape, deterministic stub behavior."""

from __future__ import annotations

import hashlib

import pytest

from sentiment_analysis_bigdata_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "héllo ünïcode"), (3, "")], "doc_id long, text string"
    )
    return MM.attach_payload(df)


def test_payload_is_binary_with_meta(media):
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<")
    row = media.filter("doc_id = 1").first()
    assert bytes(row["payload"]) == b"hello world"
    assert row["meta"]["kind"] == "text" and row["meta"]["codec"] == "utf-8"


def test_payload_stats_match_hashlib(media):
    rows = {r["doc_id"]: r for r in MM.payload_stats(media).collect()}
    assert rows[1]["byte_len"] == 11
    assert rows[2]["byte_len"] == len("héllo ünïcode".encode())  # utf-8 multibyte
    assert rows[1]["sha256"] == hashlib.sha256(b"hello world").hexdigest()


def test_decode_kernel_unknown_codec_degrades(media):
    # raw text bytes are no known container: kind 'unknown', null dims,
    # deterministic sha-derived placeholder features — never a job failure
    out = MM.decode_and_featurize(media.select("doc_id", "payload"))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    r = rows[1]
    assert r["kind"] == "unknown"
    assert r["width"] is None and r["duration_ms"] is None
    assert len(r["features"]) == 4 and all(0 <= f <= 1 for f in r["features"])
    again = {x["doc_id"]: x for x in MM.decode_and_featurize(media.select("doc_id", "payload")).collect()}
    assert again[1]["features"] == r["features"]


def test_png_roundtrip_parses_real_bytes():
    raw = MM.synthesize_png_bytes(321, 87)
    # the bytes are REAL PNG structure: signature, IHDR length/tag, CRC
    assert raw[:8] == MM.PNG_SIGNATURE
    import struct as st
    import zlib as zl

    length, tag = st.unpack(">I4s", raw[8:16])
    assert (length, tag) == (13, b"IHDR")
    crc = st.unpack(">I", raw[16 + 13 : 16 + 17])[0]
    assert crc == zl.crc32(raw[12 : 16 + 13]) & 0xFFFFFFFF
    assert MM.decode_png_header(raw) == (321, 87)
    with pytest.raises(ValueError):
        MM.decode_png_header(b"\x89PNG\r\n\x1a\nXXXX")
    with pytest.raises(ValueError):
        MM.decode_png_header(b"not a png at all")


def test_wav_roundtrip_parses_real_bytes():
    raw = MM.synthesize_wav_bytes(8000)  # exactly 1 s @ 8 kHz
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    dur, rate, channels, bits = MM.decode_wav_header(raw)
    assert (dur, rate, channels, bits) == (1000, 8000, 1, 16)
    # RIFF size field covers everything after the 8-byte header
    import struct as st

    assert st.unpack("<I", raw[4:8])[0] == len(raw) - 8
    with pytest.raises(ValueError):
        MM.decode_wav_header(b"RIFFxxxxNOPE")


def test_png_content_decode_roundtrip():
    # 4x3 RGB, fill=200: row y = sentinel y (3 ch) + 3 fill pixels
    raw = MM.synthesize_png_bytes(4, 3, pixel_byte=200)
    assert MM.decode_png_header(raw) == (4, 3)
    px_count, px_sum = MM.decode_png_content(raw)
    assert px_count == 4 * 3 * 3
    assert px_sum == 3 * (0 + 1 + 2) + 3 * 3 * 3 * 200
    # headers-only stream → no content stats
    assert MM.decode_png_content(MM.synthesize_png_bytes(4, 3)) is None
    # truncated IDAT must be rejected, not misread
    import struct as st
    import zlib as zl

    bad_idat = zl.compress(b"\x00" * 5)  # wrong scanline length for 4x3
    bad = (
        MM.PNG_SIGNATURE
        + raw[8 : 8 + 25]  # IHDR chunk (len+tag+13+crc)
        + st.pack(">I", len(bad_idat))
        + b"IDAT"
        + bad_idat
        + st.pack(">I", zl.crc32(b"IDAT" + bad_idat) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        MM.decode_png_content(bad)


def test_wav_content_decode_roundtrip():
    raw = MM.synthesize_wav_bytes(160, sample_value=-7)
    n, total, mx = MM.decode_wav_content(raw)
    assert (n, total, mx) == (160, 160 * -7, 7)
    # zero fill still decodes
    assert MM.decode_wav_content(MM.synthesize_wav_bytes(80)) == (80, 0, 0)


def test_decode_kernel_png_wav_end_to_end(spark):
    df = spark.createDataFrame(
        [(10, "abcdef"), (11, "x" * 30)], "doc_id long, text string"
    )
    png = MM.decode_and_featurize(MM.attach_png_payloads(df))
    rows = {r["doc_id"]: r for r in png.collect()}
    assert rows[10]["kind"] == "png"
    assert rows[10]["width"] == 64 + 10 % 192
    assert rows[10]["height"] == 64 + 6 % 192
    assert rows[11]["height"] == 64 + 30 % 192
    wav = MM.decode_and_featurize(MM.attach_wav_payloads(df))
    wrows = {r["doc_id"]: r for r in wav.collect()}
    assert wrows[10]["kind"] == "wav"
    assert wrows[10]["duration_ms"] == (6 % 100 + 1) * 10
    assert wrows[10]["sample_rate"] == 8000
    assert wrows[11]["duration_ms"] == (30 % 100 + 1) * 10


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, "v")], "doc_id long, text string")
    with_meta = MM.attach_payload(df).withColumn(
        "meta",
        MM.F.struct(
            MM.F.lit("video").alias("kind"),
            MM.F.lit(None).cast("int").alias("width"),
            MM.F.lit(None).cast("int").alias("height"),
            MM.F.lit(3500).alias("duration_ms"),
            MM.F.lit("h264").alias("codec"),
        ),
    )
    frames = MM.frame_sample_plan(with_meta, every_ms=1000)
    assert [r["frame_ts_ms"] for r in frames.collect()] == [0, 1000, 2000, 3000]


def test_binaryfile_source_feeds_decode(spark, tmp_path):
    # the documented production path: spark.read.format('binaryFile') over
    # a directory of media files -> payload column -> same decode kernel
    for name, dims in [("a.png", (100, 50)), ("b.png", (300, 200))]:
        (tmp_path / name).write_bytes(MM.synthesize_png_bytes(*dims))
    df = (
        spark.read.format("binaryFile")
        .load(str(tmp_path))
        .select("path", MM.F.col("content").alias("payload"))
    )
    out = {r["path"].rsplit("/", 1)[-1]: r for r in MM.decode_and_featurize(df).collect()}
    assert out["a.png"]["kind"] == "png"
    assert (out["a.png"]["width"], out["a.png"]["height"]) == (100, 50)
    assert (out["b.png"]["width"], out["b.png"]["height"]) == (300, 200)


class TestResizeStats:
    def test_hand_computed_downsample(self, spark):
        from sentiment_analysis_bigdata_spark.operators import multimodal as MM

        # 4x4 image, fill 10, row sentinels 0..3: downsampled grid is
        # rows {0,2} x cols {0,2}; sampled pixels per row: sentinel(y), fill
        payload = MM.synthesize_png_bytes(4, 4, pixel_byte=10)
        df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
        r = MM.resize_stats(df).first()
        assert (r["out_width"], r["out_height"]) == (2, 2)
        assert r["ds_px_count"] == 12  # 2*2 pixels * 3 channels
        # pixels: (0,0)=0, (0,2)=10, (2,0)=2, (2,2)=10 -> sum*3 = 66
        assert r["ds_px_sum"] == 3 * (0 + 10 + 2 + 10)

    def test_headers_only_yields_null(self, spark):
        from sentiment_analysis_bigdata_spark.operators import multimodal as MM

        payload = MM.synthesize_png_bytes(8, 8)  # no IDAT
        df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
        r = MM.resize_stats(df).first()
        assert r["ds_px_count"] is None and r["ds_px_sum"] is None


class TestJpeg:
    def test_marker_walk_roundtrip(self):
        for w, h, prog, exif in [
            (640, 480, False, False),
            (1, 1, True, False),
            (65500, 2, False, True),
            (320, 240, True, True),
        ]:
            b = MM.synthesize_jpeg_bytes(w, h, progressive=prog, with_exif=exif)
            assert MM.decode_jpeg_header(b) == (w, h, 3, prog, exif)

    def test_malformed_raises(self):
        good = MM.synthesize_jpeg_bytes(64, 64)
        with pytest.raises(ValueError):
            MM.decode_jpeg_header(b"\x00\x00\x00\x00")  # no SOI
        with pytest.raises(ValueError):
            MM.decode_jpeg_header(good[:24])  # truncated: no SOF
        with pytest.raises(ValueError):
            # corrupt a segment length field so the walk runs off the end
            bad = bytearray(good)
            bad[4:6] = b"\xff\xff"
            MM.decode_jpeg_header(bytes(bad))

    def test_decode_media_dispatch(self):
        b = MM.synthesize_jpeg_bytes(200, 100, progressive=True)
        d = MM.decode_media(b)
        assert d[0] == "jpeg_progressive" and (d[1], d[2]) == (200, 100)
        d = MM.decode_media(MM.synthesize_jpeg_bytes(20, 10))
        assert d[0] == "jpeg" and (d[1], d[2]) == (20, 10)
        assert MM.decode_media(MM.synthesize_jpeg_bytes(9, 9)[:10])[0] == "unknown"

    def test_jpeg_meta_kernel_with_corrupt_rows(self, spark):
        rows = [
            (1, bytearray(MM.synthesize_jpeg_bytes(64, 32, with_exif=True))),
            (2, bytearray(MM.synthesize_jpeg_bytes(16, 16, progressive=True))),
            (3, bytearray(b"\xff\xd8garbage")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in MM.decode_jpeg_meta(df).collect()}
        assert out[1]["kind"] == "jpeg" and out[1]["has_exif"] is True
        assert (out[1]["width"], out[1]["height"], out[1]["n_components"]) == (64, 32, 3)
        assert out[2]["progressive"] is True and out[2]["has_exif"] is False
        assert out[3]["kind"] == "unknown" and out[3]["width"] is None


class TestResizeMalformedPolicy:
    def test_corrupt_rows_yield_null_not_crash(self, spark):
        # one good row, one non-PNG, one with a nonzero filter byte, one
        # with a truncated IDAT: all three bad rows -> nulls, batch survives
        good = MM.synthesize_png_bytes(4, 4, pixel_byte=10)
        bad_filter = bytearray(MM.synthesize_png_bytes(2, 1, pixel_byte=5))
        # locate the IDAT body and set the filter byte to 1 (re-deflate)
        import struct as st
        import zlib as zl

        raw = bytearray(b"\x00" + bytes([0] * 3) + bytes([5] * 3))
        raw[0] = 1
        idat = zl.compress(bytes(raw))
        bad_filter = (
            MM.PNG_SIGNATURE
            + MM._png_chunk(b"IHDR", st.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
            + MM._png_chunk(b"IDAT", idat)
            + MM._png_chunk(b"IEND", b"")
        )
        trunc = MM.synthesize_png_bytes(4, 4, pixel_byte=1)
        trunc = trunc[: len(trunc) - 20]  # cut into the IDAT/IEND tail
        rows = [
            (1, bytearray(good)),
            (2, bytearray(b"not a png at all")),
            (3, bytearray(bad_filter)),
            (4, bytearray(trunc)),
        ]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {r["id"]: r for r in MM.resize_stats(df).collect()}
        assert out[1]["ds_px_count"] == 12
        for i in (2, 3, 4):
            assert out[i]["ds_px_count"] is None and out[i]["ds_px_sum"] is None


class TestAverageHash:
    def test_planted_duplicates_share_hash(self, spark):
        from sentiment_analysis_bigdata_spark.operators import multimodal as MM

        # ids 60 apart plant byte-identical gradient images
        df = spark.createDataFrame(
            [(1,), (61,), (2,)], "doc_id long"
        )
        hashed = {
            r.doc_id: (r.ahash_hi, r.ahash_lo)
            for r in MM.ahash_64(MM.attach_gradient_payloads(df)).collect()
        }
        assert hashed[1] == hashed[61]
        assert hashed[1] != hashed[2]

    def test_flat_image_hashes_to_zero(self, spark):
        from sentiment_analysis_bigdata_spark.operators import multimodal as MM

        # a uniform image (zero gradient): no block mean can EXCEED the
        # region mean, so every bit is 0 (strict inequality)
        payload = MM.synthesize_png_gradient(64, 64, 0, 0)
        df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
        row = MM.ahash_64(df).first()
        assert (row.ahash_hi, row.ahash_lo) == (0, 0)

    def test_malformed_payload_yields_nulls(self, spark):
        from sentiment_analysis_bigdata_spark.operators import multimodal as MM

        df = spark.createDataFrame(
            [(1, bytearray(b"not a png at all, definitely"))],
            "doc_id long, payload binary",
        )
        row = MM.ahash_64(df).first()
        assert row.ahash_hi is None and row.ahash_lo is None
