"""Capture ``explain("formatted")`` for a list of registry queries.

Writes ``<outdir>/<query>_<tag>.txt`` for each query — the round-12
optimization deliverable (plans/r12/<query>_before.txt / _after.txt).
Run from any checkout; the "before" files come from a git worktree of the
prior round's verdict commit, the "after" files from HEAD.

Usage:
    python tools/capture_plans.py <tag> <outdir> <query> [<query> ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — plan SHAPE is
SF-independent; the small SF keeps eager barriers cheap).
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag, outdir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"capture-plans-{tag}")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qmap = entry.queries()
    for name in names:
        df = qmap[name](spark, sf)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} ({tag}) — explain('formatted') at {sf} ==\n\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
