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


def test_decode_kernel_schema_and_determinism(media):
    out = MM.decode_and_featurize(media.select("doc_id", "payload"))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    r = rows[1]
    assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
    assert len(r["features"]) == 4 and all(0 <= f <= 1 for f in r["features"])
    # deterministic stub: same payload → same fake decode
    again = {x["doc_id"]: x for x in MM.decode_and_featurize(media.select("doc_id", "payload")).collect()}
    assert again[1]["width"] == r["width"] and again[1]["features"] == r["features"]


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
