"""Source/sink round trips and scale-posture plan assertions.

SURVEY §2.1: parquet is the scale default; CSV exists for reference parity;
JSON/ORC widen the interchange surface. The partition-pruning test asserts
the *plan* (pruned partition count), not just the result — at 100 TB a scan
that lists every date partition for a one-day filter is a correctness-
adjacent bug.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sentiment_analysis_bigdata_spark import sources as S


@pytest.fixture()
def small_df(spark):
    return spark.createDataFrame(
        [(i, f"cat{i % 3}", float(i) * 1.5) for i in range(90)],
        "id long, category string, value double",
    )


class TestRoundTrips:
    def test_json_round_trip(self, spark, small_df, tmp_path):
        path = str(tmp_path / "j")
        S.write_json(small_df, path, num_files=2)
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("category", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        back = S.read_json(spark, path, schema)
        assert sorted(back.collect()) == sorted(small_df.collect())

    def test_json_corrupt_record_quarantine(self, spark, tmp_path):
        # malformed lines must be captured, not silently nulled or fatal
        path = str(tmp_path / "mixed.json")
        with open(path, "w") as f:
            f.write('{"id": 1, "category": "a", "value": 2.5}\n')
            f.write("{BROKEN json line\n")
            f.write('{"id": 2, "category": "b", "value": 3.5}\n')
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("category", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        df = S.read_json(spark, path, schema, keep_corrupt=True)
        good = df.filter("_corrupt_record IS NULL")
        bad = df.filter("_corrupt_record IS NOT NULL")
        assert sorted(r["id"] for r in good.collect()) == [1, 2]
        assert [r["_corrupt_record"] for r in bad.collect()] == ["{BROKEN json line"]
        # default path keeps the plain schema
        assert "_corrupt_record" not in S.read_json(spark, path, schema).columns

    def test_orc_round_trip(self, spark, small_df, tmp_path):
        path = str(tmp_path / "o")
        S.write_orc(small_df, path)
        back = S.read_orc(spark, path)
        assert sorted(back.collect()) == sorted(small_df.collect())
        assert back.schema == small_df.schema

    def test_csv_round_trip_explicit_schema(self, spark, small_df, tmp_path):
        path = str(tmp_path / "c")
        S.write_csv(small_df, path, num_files=1)
        back = S.read_csv(spark, path, small_df.schema, header=True)
        assert sorted(back.collect()) == sorted(small_df.collect())


class TestParquetSink:
    def test_max_records_per_file_rolls_files(self, spark, small_df, tmp_path):
        path = str(tmp_path / "p")
        S.write_parquet(small_df, path, num_files=1, max_records_per_file=25)
        files = glob.glob(os.path.join(path, "*.parquet"))
        # 90 rows in one task / 25-record cap → 4 files
        assert len(files) == 4
        assert spark.read.parquet(path).count() == 90

    def test_partitioned_write_layout(self, spark, small_df, tmp_path):
        path = str(tmp_path / "pp")
        S.write_parquet(small_df, path, partition_by=["category"])
        subdirs = {
            os.path.basename(d)
            for d in glob.glob(os.path.join(path, "category=*"))
        }
        assert subdirs == {"category=cat0", "category=cat1", "category=cat2"}

    def test_partition_pruning_in_plan(self, spark, small_df, tmp_path):
        """A filter on the partition column must prune directories at plan
        time: the scan's physical plan reports 1 of 3 partitions read and
        the partition filter is listed (no full listing, no post-filter)."""
        path = str(tmp_path / "prune")
        S.write_parquet(small_df, path, partition_by=["category"])
        scan = spark.read.parquet(path).filter(F.col("category") == "cat1")
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(category" in plan
        # the pruned filter never appears as a post-scan Filter node —
        # pruning happened at listing time, not per-row
        assert "Filter (" not in plan
        assert scan.count() == 30


def test_text_source_sink_round_trip(spark, tmp_path):
    from sentiment_analysis_bigdata_spark.sources import catalog

    df = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], "line string")
    out = str(tmp_path / "txt")
    catalog.write_text(df, out, num_files=1)
    back = catalog.read_text(spark, out)
    assert sorted(r.value for r in back.collect()) == ["alpha", "beta", "gamma"]
    # whole=True: one row per FILE, newlines preserved (NOTE: needs the
    # text() wholetext kwarg — .option("wholetext", ...) silently no-ops)
    whole = catalog.read_text(spark, out, whole=True).collect()
    assert len(whole) == 1
    assert sorted(whole[0].value.strip().split("\n")) == ["alpha", "beta", "gamma"]


def test_text_sink_rejects_multi_column(spark):
    import pytest as _pytest

    from sentiment_analysis_bigdata_spark.sources import catalog

    df = spark.createDataFrame([("a", "b")], "x string, y string")
    with _pytest.raises(ValueError):
        catalog.write_text(df, "/tmp/never-written")
