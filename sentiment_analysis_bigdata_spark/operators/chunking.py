"""Document chunking: split token streams into fixed-size overlapping
windows — the standard prep step that turns variable-length documents into
model-ready training sequences (complementing ``packing.pack_sequences``,
which solves the inverse problem of batching short sequences).

Pure Catalyst expressions: tokens → ``sequence`` of chunk starts →
``transform``/``slice`` → ``posexplode``. No Python in the path, no
shuffle at all — chunking is embarrassingly parallel per document, so the
plan is a single narrow projection stage regardless of corpus size. At
100 TB the only knob that matters is output file sizing
(``maxRecordsPerFile`` on the write, see ``sources/catalog.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    df: DataFrame,
    tokens_col: str | Column,
    size: int,
    stride: int,
    out_prefix: str = "chunk",
) -> DataFrame:
    """Explode each row's token array into overlapping windows.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + size)``; starts are
    ``0, stride, 2*stride, ...`` while they fall inside the array, so the
    tail chunk may be shorter than ``size`` (truncation policy is the
    caller's — filter on ``{out_prefix}_len`` to drop short tails). An
    empty array yields one empty chunk (chunk_id 0), keeping every input
    row represented.

    Adds ``{out_prefix}_id`` (0-based ordinal within the document),
    ``{out_prefix}_tokens`` (the window) and ``{out_prefix}_len``.
    """
    if size < 1 or stride < 1:
        raise ValueError(f"size and stride must be >= 1, got {size}/{stride}")
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    # one start per stride step; greatest(n,1) keeps empty docs represented
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks), F.lit(1)) - 1,
        F.lit(stride),
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, size))
    exploded = df.select(
        "*", F.posexplode(chunks).alias(f"{out_prefix}_id", f"{out_prefix}_tokens")
    )
    return exploded.withColumn(
        f"{out_prefix}_len", F.size(F.col(f"{out_prefix}_tokens"))
    )
