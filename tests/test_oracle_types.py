"""Oracle output-type lint: no DuckDB oracle may emit a HUGEINT column.

The external driver hashes each engine's *rendered* values, and DuckDB types
``sum(BIGINT)`` as HUGEINT (INT128) — whose driver-side representation hashes
differently from Spark's BIGINT even when every value is identical. That cost
us the round-6 ``zorder_keys`` red row (values proven equal at every SF; the
hash mismatch was purely the column type). The repo convention is
``CAST(sum(...) AS BIGINT)`` at every such site; this test enforces it for
every registered oracle so the class of bug can't recur. Value-level harnesses
(tools/check_correctness.py) cannot catch this — only a type sweep can.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from sentiment_analysis_bigdata_spark.workloads import all_oracles

_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Types whose driver-side rendering is known to diverge from any Spark type.
# HUGEINT / UHUGEINT are INT128; DECIMAL(38,0) is what a HUGEINT becomes when
# round-tripped through arithmetic — neither exists in Spark.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL(38,0)")


def test_no_oracle_emits_hugeint(sf_dir: str) -> None:
    con = duckdb.connect()
    for t in _TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    offenders: list[tuple[str, str, str]] = []
    failures: list[tuple[str, str]] = []
    for name, sql in all_oracles().items():
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as exc:  # noqa: BLE001 — collect, report all at once
            failures.append((name, str(exc).splitlines()[0][:120]))
            continue
        for col, typ, *_ in desc:
            if any(f in typ.upper() for f in _FORBIDDEN):
                offenders.append((name, col, typ))

    assert not failures, f"oracles failed to DESCRIBE: {failures}"
    assert not offenders, (
        "oracle output columns typed HUGEINT/DECIMAL(38,0) — wrap in "
        f"CAST(... AS BIGINT): {offenders}"
    )
