#!/usr/bin/env python
"""Skew stress at bench scale (VERDICT r8 #7): salted vs unsalted, measured.

Builds a deterministic synthetic hot-key distribution (50% of rows on ONE
key, the rest over 200k keys — harsher than the zipf events fixture) at
bench row count and measures wall time for the three skew patterns the
engine ships remedies for:

- count-distinct: groupBy().count_distinct() vs operators.skew.
  salted_count_distinct. This is the pattern where map-side partial
  aggregation does NOT protect the hot key (every distinct (key, value)
  pair ships to one reducer).
- decomposable agg: groupBy().agg(count, sum) vs operators.skew.
  salted_agg. Expectation recorded honestly: partial aggregation already
  collapses hot keys map-side, so salting should be ~neutral here — the
  number exists to show when salting is NOT needed.
- skewed inner join: plain join vs operators.skew.salted_join_left_skewed,
  with AQE skew-split ON and OFF (runtime-settable), broadcast disabled so
  the join actually shuffles both sides like a big-big cluster join.

Every salted lane is checksum-verified against its unsalted twin (full
result XOR-style hash aggregated in Spark — no driver-side collect of the
200k-key result). Prints per-lane JSON and one combined line for
SCALING.md.

Usage: python tools/skew_stress_bench.py [--rows 16000000] [--warm 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def checksum(df, cols):
    from pyspark.sql import functions as F

    # decimal(38,0) sum: ~10^7 rows x |xxhash64| <= 9.2e18 stays well under
    # 10^38, where a bigint sum overflows ANSI arithmetic.
    return df.select(
        F.sum(
            F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")
        ).alias("cs")
    ).collect()[0]["cs"]


def timed(fn, warm):
    samples = []
    for _ in range(warm):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    return round(min(samples), 3), round(sorted(samples)[len(samples) // 2], 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--warm", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sentiment_analysis_bigdata_spark import get_spark
    from sentiment_analysis_bigdata_spark.operators.skew import (
        salted_agg,
        salted_count_distinct,
        salted_join_left_skewed,
    )

    spark = get_spark("skew-stress-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # 50% of rows on key 'HOT', rest uniform over 200k cold keys; values
    # high-cardinality (5M distinct) so count-distinct partials can't
    # collapse. xxhash64(id) keeps it deterministic — no rand() lineage.
    left = (
        spark.range(args.rows)
        .select(
            F.when(F.pmod(F.xxhash64("id"), F.lit(100)) < 50, F.lit("HOT"))
            .otherwise(
                F.concat(F.lit("k"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(200_000)))
            )
            .alias("key"),
            F.concat(
                F.lit("v"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5_000_000))
            ).alias("val"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000))).alias("x"),
        )
        .localCheckpoint()  # freeze the input so lanes time the OPERATOR
    )
    right = (
        spark.range(200_001)
        .select(
            F.when(F.col("id") == 200_000, F.lit("HOT"))
            .otherwise(F.concat(F.lit("k"), F.col("id")))
            .alias("key"),
            (F.col("id") % 7).alias("w"),
        )
        .localCheckpoint()
    )

    results: dict[str, dict] = {}

    def lane(name, build, verify_against=None, conf=None):
        prev = {}
        for k, v in (conf or {}).items():
            prev[k] = spark.conf.get(k)
            spark.conf.set(k, v)
        try:
            df = build()
            mn, med = timed(lambda: df.count(), args.warm)
            rec = {"warm_min": mn, "warm_median": med}
            if verify_against:
                rec["checksum_match"] = checksum(df, df.columns) == results[
                    verify_against
                ]["cs"]
            else:
                rec["cs"] = checksum(df, df.columns)
            results[name] = rec
            show = {k: v for k, v in rec.items() if k != "cs"}
            print(json.dumps({"lane": name, **show}))
        finally:
            for k, v in prev.items():
                spark.conf.set(k, v)

    lane(
        "count_distinct_unsalted",
        lambda: left.groupBy("key").agg(F.count_distinct("val").alias("n_distinct")),
    )
    lane(
        "count_distinct_salted",
        lambda: salted_count_distinct(left, ["key"], "val", salt=32),
        verify_against="count_distinct_unsalted",
    )
    lane(
        "agg_unsalted",
        lambda: left.groupBy("key").agg(
            F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
        ),
    )
    lane(
        "agg_salted",
        lambda: salted_agg(
            left, ["key"], {"n": ("x", "count"), "sx": ("x", "sum")}, salt=32
        ),
        verify_against="agg_unsalted",
    )
    no_broadcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    join_cols = ["key", "val", "x", "w"]
    lane(
        "join_unsalted_aqe_skew_on",
        lambda: left.join(right, "key").select(*join_cols),
        conf={**no_broadcast, "spark.sql.adaptive.skewJoin.enabled": "true"},
    )
    lane(
        "join_unsalted_aqe_skew_off",
        lambda: left.join(right, "key").select(*join_cols),
        verify_against="join_unsalted_aqe_skew_on",
        conf={**no_broadcast, "spark.sql.adaptive.skewJoin.enabled": "false"},
    )
    lane(
        "join_salted",
        lambda: salted_join_left_skewed(left, right, "key", salt=16).select(
            *join_cols
        ),
        verify_against="join_unsalted_aqe_skew_on",
        conf={**no_broadcast, "spark.sql.adaptive.skewJoin.enabled": "false"},
    )

    all_match = all(
        r.get("checksum_match", True) for r in results.values()
    )
    print(
        json.dumps(
            {
                "rows": args.rows,
                "warm_runs": args.warm,
                "checksums_all_match": all_match,
                "load_1min": round(os.getloadavg()[0], 2),
                "lanes": {
                    n: {k: v for k, v in r.items() if k != "cs"}
                    for n, r in results.items()
                },
            }
        )
    )
    spark.stop()
    return 0 if all_match else 1


if __name__ == "__main__":
    raise SystemExit(main())
