"""As-of (nearest-key / most-recent-prior) join — SURVEY §2.5's one custom
operator Spark SQL lacks natively.

Semantics: for each left row, attach the single right row with the largest
right.ts ≤ left.ts within the same key (optionally bounded by a tolerance).

Implementation is the union+window trick — one shuffle on (key), one sort
within partitions, no range-explosion:

1. Tag left rows (side=1) and right rows (side=0), union by name.
2. Window over (key) ordered by (ts, side): ``last(right_payload,
   ignorenulls=True)`` up to the current row gives each left row the most
   recent right payload.
3. Keep left rows; optionally null out matches older than ``tolerance``.

This beats the naive range join (which Catalyst plans as BNLJ) and scales
like any window aggregate. A 100 TB deployment would pre-bucket both sides
by key to make the shuffle a local sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_seconds: float | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Most-recent-prior join. Right payload columns are appended with
    ``suffix``; rows with no prior match get nulls.

    Ties (right.ts == left.ts) match — the right row sorts first via the
    side flag, mirroring pandas ``merge_asof(direction='backward')``.
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        F.col(right_ts).alias("__rts"),
    ).select(*lcols, "__side", "__ts", *[f"__p_{c}" for c in payload_cols], "__rts")

    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        "__ts",
        F.last("__rts", ignorenulls=True).over(w).alias("__match_ts"),
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    ).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        in_tol = (
            F.col("__ts").cast("double") - F.col("__match_ts").cast("double")
        ) <= F.lit(tolerance_seconds)
        filled = filled.select(
            *lcols,
            F.when(in_tol, F.col("__match_ts")).otherwise(F.lit(None)).alias(f"ts{suffix}"),
            *[
                F.when(in_tol, F.col(f"{c}{suffix}")).otherwise(F.lit(None)).alias(f"{c}{suffix}")
                for c in payload_cols
            ],
        )
    else:
        filled = filled.select(
            *lcols,
            F.col("__match_ts").alias(f"ts{suffix}"),
            *[F.col(f"{c}{suffix}") for c in payload_cols],
        )
    return filled


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_seconds: float | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Nearest-SUBSEQUENT join — pandas ``merge_asof(direction=
    'forward')``: for each left row, the single right row with the
    SMALLEST right.ts ≥ left.ts within the key (ties match, mirroring
    the backward variant). Same union+window shape as :func:`asof_join`
    — one key shuffle, one sort — but the window runs from the current
    row FORWARD (``first(payload, ignorenulls=True)`` over
    currentRow..unboundedFollowing) and the side flag sorts the right
    row first on ties so an equal-timestamp right row is visible to the
    left row. The "what happens next" face of the operator: next
    purchase after a click, next error after a deploy, next state
    change after a probe."""
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.lit(2).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        F.col(right_ts).alias("__rts"),
    ).select(*lcols, "__side", "__ts", *[f"__p_{c}" for c in payload_cols], "__rts")

    unioned = l.unionByName(r)
    # right rows (side=2) sort AFTER the left row at equal ts, and the
    # forward window starts at the current row — so an equal-ts right row
    # is inside the left row's window (ties match), mirroring backward.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        "__ts",
        F.first("__rts", ignorenulls=True).over(w).alias("__match_ts"),
        *[
            F.first(f"__p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    ).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        in_tol = (
            F.col("__match_ts").cast("double") - F.col("__ts").cast("double")
        ) <= F.lit(tolerance_seconds)
        filled = filled.select(
            *lcols,
            F.when(in_tol, F.col("__match_ts")).otherwise(F.lit(None)).alias(f"ts{suffix}"),
            *[
                F.when(in_tol, F.col(f"{c}{suffix}")).otherwise(F.lit(None)).alias(f"{c}{suffix}")
                for c in payload_cols
            ],
        )
    else:
        filled = filled.select(
            *lcols,
            F.col("__match_ts").alias(f"ts{suffix}"),
            *[F.col(f"{c}{suffix}") for c in payload_cols],
        )
    return filled
