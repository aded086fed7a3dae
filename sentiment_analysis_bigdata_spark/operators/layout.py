"""Data-layout operators: Z-order (Morton) clustering for multi-column
file pruning.

Sorting a table by one column gives perfect min/max pruning on that column
and none on any other. Interleaving the bits of two (bucketized) columns
into a Morton key and range-partitioning + sorting by it gives *both*
columns locality: every written file covers a small rectangle in (x, y)
space, so parquet row-group min/max stats prune selective predicates on
either column. This is the standard Z-ORDER technique from lakehouse
engines, built here from plain expressions — no custom layout code runs at
read time, the benefit lands entirely in file statistics.

Scale notes: the key computation is a narrow projection (fixed 16-term
bit-arithmetic expression, whole-stage codegen'd); the clustering write is
``repartitionByRange(morton)`` (one range shuffle with sampled bounds —
the same cost as any global sort-write) + ``sortWithinPartitions``.
Everything is order-independent arithmetic — cross-engine exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits kept per dimension (16 → 32-bit Morton key)
DEFAULT_BITS = 16


def morton_key(x: Column | str, y: Column | str, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    cx = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    cy = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = key + F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key + F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return key


def morton_key_sql(x: str, y: str, bits: int = DEFAULT_BITS) -> str:
    """The identical interleave as an ANSI-SQL expression string (DuckDB
    oracle twin — generated deterministically, same 16 terms)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_keys(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    bits: int = DEFAULT_BITS,
    file_bits: int = 8,
) -> DataFrame:
    """Project the Morton key and its target file id (``morton >> (2*bits
    - file_bits)``: the top ``file_bits`` bits ⇒ 2^file_bits contiguous
    Z-rectangles)."""
    key = morton_key(x, y, bits)
    return df.withColumn("morton", key).withColumn(
        "zfile", F.shiftright(F.col("morton"), 2 * bits - file_bits)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = DEFAULT_BITS,
    num_files: int = 32,
) -> None:
    """Cluster-write: range-partition on the Morton key (sampled bounds →
    balanced files even under skew), sort within partitions so row groups
    within a file are also Z-contiguous, drop the helper column, write."""
    keyed = df.withColumn("__z", morton_key(x, y, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
