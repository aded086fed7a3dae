#!/usr/bin/env python
"""Banded-ordinal scaling probe: measures the round-12 claim instead of
arguing it.

``operators/ordering.banded_global_ordinal`` replaced the vocab-global
``row_number()`` windows (ppjoin_pairs, token_gini) and
``banded_grouped_ordinal`` replaced the enum-partitioned ranking window
(percent_rank_cume) because a window partition cannot be split: the
global shape compiles to a SINGLE-partition sort and the 3-value-enum
shape serializes a third of the corpus through one task. This tool
measures both operators on 4x-increasing synthetic frames (skewed
exponential values + a deliberate 10% tie plateau to exercise
tie-stability) and, at every size, verifies EXACTNESS distributively:

- permutation: count == n, min(pos) == 1, max(pos) == n,
  sum(pos) == n(n+1)/2 (per group for the grouped variant);
- total order: a self-join on pos == pos+1 asserts every CONSECUTIVE
  pair respects (value ASC, tiebreak ASC) — consecutive correctness
  implies the full total order, with zero driver-side sorting;
- at the smallest size only, value-identity vs the naive window shape
  (the shape the operators replaced).

The naive window is also TIMED at each size it can stomach, so the
artifact shows the two curves diverging — the banded shape ~linear, the
single-task sort's wall growing superlinearly with one hot task.

Output: one JSON line per (op, size) + a combined ORDS_COMBINED line for
SCALING.md / bench_results.

Usage: python tools/ordinal_scale.py [--rows 1000000 4000000 16000000 64000000]
                                     [--window-max-rows 16000000]

The 64M point needs SPARK_GRAFT_DRIVER_MEM=48g: the probe's exactness
self-joins shuffle 2n rows on top of three persisted n-row frames, which
exceeds the default 8g local-mode heap (the OPERATORS themselves are fine
under 8g — the verification is what's heavy).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rows",
        type=int,
        nargs="+",
        default=[1_000_000, 4_000_000, 16_000_000, 64_000_000],
    )
    ap.add_argument(
        "--window-max-rows",
        type=int,
        default=16_000_000,
        help="largest size at which the naive window shape is also timed",
    )
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sentiment_analysis_bigdata_spark import get_spark
    from sentiment_analysis_bigdata_spark.functions.hashing import md5_hash64
    from sentiment_analysis_bigdata_spark.operators.ordering import (
        banded_global_ordinal,
        banded_grouped_ordinal,
    )
    from sentiment_analysis_bigdata_spark.plans.barrier import barrier_eager

    spark = get_spark("ordinal-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def build(n_rows: int):
        """Deterministic skewed frame: u = md5-uniform, value =
        -log(u) (exponential tail), except a 10% plateau pinned to
        exactly 0.25 — corpus-content-style ties the tiebreak column
        must break deterministically. A 3-value enum column drives the
        grouped variant. Barriered so every timed pass reads a
        materialized frame, not a re-derivation (the operators'
        documented calling convention for expensive lineages)."""
        u = (
            F.pmod(md5_hash64(F.col("id").cast("string")), F.lit(1_000_000))
            / 1_000_000.0
        )
        df = spark.range(n_rows).select(
            F.col("id").alias("tid"),
            F.when(F.pmod(F.col("id"), F.lit(10)) == 0, F.lit(0.25))
            .otherwise(-F.log(u + 1e-9))
            .alias("v"),
            F.element_at(
                F.array(F.lit("O"), F.lit("F"), F.lit("P")),
                (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
            ).alias("grp"),
        )
        return barrier_eager(df)

    def check_global(pos_df, n_rows: int) -> dict:
        stats = pos_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("mn"),
            F.max("pos").alias("mx"),
            F.sum("pos").alias("s"),
        ).collect()[0]
        perm_ok = (
            stats["n"] == n_rows
            and stats["mn"] == 1
            and stats["mx"] == n_rows
            and stats["s"] == n_rows * (n_rows + 1) // 2
        )
        nxt = pos_df.select(
            (F.col("pos") - 1).alias("pos"),
            F.col("v").alias("v2"),
            F.col("tid").alias("tid2"),
        )
        bad = (
            pos_df.join(nxt, "pos")
            .filter(
                ~(
                    (F.col("v") < F.col("v2"))
                    | ((F.col("v") == F.col("v2")) & (F.col("tid") < F.col("tid2")))
                )
            )
            .count()
        )
        return {"perm_ok": bool(perm_ok), "order_violations": int(bad)}

    def check_grouped(pos_df, n_rows: int) -> dict:
        g = pos_df.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("mn"),
            F.max("pos").alias("mx"),
            F.sum("pos").alias("s"),
            F.max("n_in_group").alias("ng_max"),
            F.min("n_in_group").alias("ng_min"),
        )
        bad_perm = g.filter(
            ~(
                (F.col("mn") == 1)
                & (F.col("mx") == F.col("n"))
                & (F.col("s") == F.col("n") * (F.col("n") + 1) / 2)
                & (F.col("ng_max") == F.col("n"))
                & (F.col("ng_min") == F.col("n"))
            )
        ).count()
        total = pos_df.count()
        nxt = pos_df.select(
            "grp",
            (F.col("pos") - 1).alias("pos"),
            F.col("v").alias("v2"),
            F.col("tid").alias("tid2"),
        )
        bad = (
            pos_df.join(nxt, ["grp", "pos"])
            .filter(
                ~(
                    (F.col("v") < F.col("v2"))
                    | ((F.col("v") == F.col("v2")) & (F.col("tid") < F.col("tid2")))
                )
            )
            .count()
        )
        return {
            "perm_ok": bool(bad_perm == 0 and total == n_rows),
            "order_violations": int(bad),
        }

    results = []
    smallest = min(args.rows)
    for n_rows in args.rows:
        base = build(n_rows)

        t0 = time.time()
        gpos = banded_global_ordinal(base, "v", "tid")
        gpos = barrier_eager(gpos)
        banded_wall = round(time.time() - t0, 2)
        gchk = check_global(gpos, n_rows)

        t0 = time.time()
        grp_pos = banded_grouped_ordinal(base, ["grp"], "v", "tid")
        grp_pos = barrier_eager(grp_pos)
        grouped_wall = round(time.time() - t0, 2)
        grp_chk = check_grouped(grp_pos, n_rows)

        rec = {
            "rows": n_rows,
            "banded_global_wall_sec": banded_wall,
            "banded_grouped_wall_sec": grouped_wall,
            "global": gchk,
            "grouped": grp_chk,
        }

        if n_rows <= args.window_max_rows:
            w = Window.orderBy(F.col("v").asc(), F.col("tid").asc())
            t0 = time.time()
            wdf = base.withColumn(
                "wpos", F.row_number().over(w).cast("bigint")
            )
            wdf.agg(F.sum("wpos")).collect()
            rec["window_global_wall_sec"] = round(time.time() - t0, 2)
            wg = Window.partitionBy("grp").orderBy(
                F.col("v").asc(), F.col("tid").asc()
            )
            t0 = time.time()
            base.withColumn("wpos", F.row_number().over(wg).cast("bigint")).agg(
                F.sum("wpos")
            ).collect()
            rec["window_grouped_wall_sec"] = round(time.time() - t0, 2)
            if n_rows == smallest:
                mism = (
                    gpos.select("tid", "pos")
                    .join(wdf.select("tid", "wpos"), "tid")
                    .filter(F.col("pos") != F.col("wpos"))
                    .count()
                )
                rec["vs_window_mismatches"] = int(mism)

        rec["ok"] = (
            rec["global"]["perm_ok"]
            and rec["global"]["order_violations"] == 0
            and rec["grouped"]["perm_ok"]
            and rec["grouped"]["order_violations"] == 0
            and rec.get("vs_window_mismatches", 0) == 0
        )
        print(json.dumps(rec))
        sys.stdout.flush()
        results.append(rec)
        spark.catalog.clearCache()

    ok = all(r["ok"] for r in results)
    combined = {
        "ok": ok,
        "load_1min": round(os.getloadavg()[0], 2),
        "points": [
            {
                "rows": r["rows"],
                "banded_global": r["banded_global_wall_sec"],
                "banded_grouped": r["banded_grouped_wall_sec"],
                "window_global": r.get("window_global_wall_sec"),
                "window_grouped": r.get("window_grouped_wall_sec"),
            }
            for r in results
        ],
    }
    if len(results) >= 2:
        combined["banded_global_growth_per_step"] = [
            round(
                b["banded_global_wall_sec"]
                / max(a["banded_global_wall_sec"], 1e-9),
                2,
            )
            for a, b in zip(results, results[1:])
        ]
    print("ORDS_COMBINED " + json.dumps(combined))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
