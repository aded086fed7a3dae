"""Group-wise model fitting: per-group closed-form linear regression.

The "train one small model per group" pattern (per-domain quality
calibration, per-source scaling laws, per-segment trend fits) has two
distributed forms, both provided:

- ``groupwise_ols_expr`` — simple linear regression via the built-in
  ``regr_slope/regr_intercept/regr_r2`` aggregates: pure JVM partial+final
  aggregation, ONE shuffle of constant-width state per group, no Python.
  This is the 100 TB path for the 1-feature case.
- ``groupwise_ols_pandas`` — the same fit via ``applyInPandas`` with a
  numpy normal-equation solve. One shuffle of the raw group rows; each
  group must fit in one Arrow batch (fine for per-domain fits where groups
  are bounded; NOT for unbounded groups). This is the template that
  generalizes to multi-feature / regularized / non-linear per-group fits
  where no SQL aggregate exists.

Both produce identical statistics (closed-form OLS is exact); the unit
test asserts expr ≡ pandas, and the DuckDB oracle checks the expr path via
its own ``regr_*`` aggregates.

Reference parity: the reference trains global MLlib models only (SURVEY
§2.6 M9-M11); per-group fitting is a north-star extension.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def groupwise_ols_expr(
    df: DataFrame,
    group_cols: Sequence[str],
    x: str,
    y: str,
    decimals: int = 4,
) -> DataFrame:
    """Per-group OLS of y on x with built-in regression aggregates.

    regr_* are algebraic aggregates (sums of x, y, xy, x², y²) — partial
    aggregation runs map-side, the shuffle carries one constant-width
    state row per (partition, group). Rounded for cross-engine float
    stability."""
    return df.groupBy(*group_cols).agg(
        F.round(F.regr_slope(F.col(y), F.col(x)), decimals).alias("slope"),
        F.round(F.regr_intercept(F.col(y), F.col(x)), decimals).alias("intercept"),
        F.round(F.regr_r2(F.col(y), F.col(x)), decimals).alias("r2"),
        F.regr_count(F.col(y), F.col(x)).alias("n"),
    )


def groupwise_ols_pandas(
    df: DataFrame,
    group_cols: Sequence[str],
    x: str,
    y: str,
    decimals: int = 4,
) -> DataFrame:
    """Per-group OLS via applyInPandas (Arrow-batched numpy closed form).

    The generalizable template: swap the body for any per-group estimator
    (ridge, logistic, isotonic) that has no SQL-aggregate form. Uses
    numerically-stable centered sums (like regr_*), not raw normal
    equations."""
    import numpy as np

    keys = list(group_cols)
    schema = (
        ", ".join(f"{k} {t}" for k, t in df.select(*keys).dtypes)
        + ", slope double, intercept double, r2 double, n bigint"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = pdf[[x, y]].dropna()
        xv = sub[x].to_numpy(dtype="float64")
        yv = sub[y].to_numpy(dtype="float64")
        n = len(xv)
        head = {k: [pdf[k].iloc[0]] for k in keys}
        if n < 2 or np.var(xv) == 0.0:
            return pd.DataFrame(
                {**head, "slope": [None], "intercept": [None], "r2": [None], "n": [n]}
            )
        xc = xv - xv.mean()
        yc = yv - yv.mean()
        sxx = float(xc @ xc)
        sxy = float(xc @ yc)
        syy = float(yc @ yc)
        slope = sxy / sxx
        intercept = float(yv.mean() - slope * xv.mean())
        r2 = 0.0 if syy == 0.0 else (sxy * sxy) / (sxx * syy)
        return pd.DataFrame(
            {
                **head,
                "slope": [round(slope, decimals)],
                "intercept": [round(intercept, decimals)],
                "r2": [round(r2, decimals)],
                "n": [n],
            }
        )

    return df.select(*keys, x, y).groupBy(*keys).applyInPandas(fit, schema=schema)


def _tie_avg_ranks(df: DataFrame, col: str, out: str) -> DataFrame:
    """Tie-averaged (fractional) ranks of ``col`` via the distinct-value
    pre-aggregation: per distinct value, rank = cum_count − (count−1)/2.
    The window runs over DISTINCT values (support-sized, the roc_auc
    shape — never a corpus-sized global sort); rows get their rank back
    through a value-keyed equi join."""
    from pyspark.sql import Window

    by_val = df.groupBy(F.col(col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    ranks = by_val.select(
        "__v",
        (
            F.sum("__n").over(w).cast("double")
            - (F.col("__n") - 1) / 2.0
        ).alias(out),
    )
    return df.join(ranks, df[col] == ranks["__v"]).drop("__v")


def rank_correlation(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_cols: int | None = None,
) -> DataFrame:
    """Spearman's ρ between two numeric columns (+ Pearson's r for
    contrast), exact under ties via tie-averaged fractional ranks.

    ρ = Pearson correlation of the rank variables, assembled from one
    final aggregation of rank sums/products — no corpus-sized sort: each
    column's ranks come from a support-sized distinct-value window
    (:func:`_tie_avg_ranks`). ``round_cols`` pre-rounds both columns,
    bounding the support at any corpus size (the KS-drift knob) at the
    cost of coarser ties. Output: 1 row (n, pearson_r, spearman_rho).
    """
    a, b = F.col(col_a), F.col(col_b)
    base = df.select(
        (F.round(a, round_cols) if round_cols is not None else a)
        .cast("double")
        .alias("__a"),
        (F.round(b, round_cols) if round_cols is not None else b)
        .cast("double")
        .alias("__b"),
    ).filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    ranked = _tie_avg_ranks(
        _tie_avg_ranks(base, "__a", "__ra"), "__b", "__rb"
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("__ra").alias("sa"),
        F.sum("__rb").alias("sb"),
        F.sum(F.col("__ra") * F.col("__ra")).alias("saa"),
        F.sum(F.col("__rb") * F.col("__rb")).alias("sbb"),
        F.sum(F.col("__ra") * F.col("__rb")).alias("sab"),
        F.sum("__a").alias("xa"),
        F.sum("__b").alias("xb"),
        F.sum(F.col("__a") * F.col("__a")).alias("xaa"),
        F.sum(F.col("__b") * F.col("__b")).alias("xbb"),
        F.sum(F.col("__a") * F.col("__b")).alias("xab"),
    )

    # guarded Pearson from explicit sums (F.corr raises DIVIDE_BY_ZERO
    # under ANSI on zero-variance input; the n-1 factors cancel anyway)
    def _r(sxy, sx, sy, sxx, syy):
        cov = F.col(sxy) - F.col(sx) * F.col(sy) / F.col("n")
        vx = F.col(sxx) - F.col(sx) * F.col(sx) / F.col("n")
        vy = F.col(syy) - F.col(sy) * F.col(sy) / F.col("n")
        return F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))

    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(_r("xab", "xa", "xb", "xaa", "xbb"), 6).alias("pearson_r"),
        F.round(_r("sab", "sa", "sb", "saa", "sbb"), 6).alias("spearman_rho"),
    )
