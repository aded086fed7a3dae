"""Structured Streaming operators over the ``events`` stream shape
(SURVEY §2.5 streaming row; the reference has no streaming at all).

Each transformation is written against a generic DataFrame so the SAME
function body serves both the streaming plan (``readStream`` source) and
its batch twin (parquet scan) — that's how the batch oracle checks the
streaming semantics: event-time tumbling/sliding windows and sessionization
produce identical results on a bounded input whether executed
incrementally or as one batch.

Watermarks bound state: late rows beyond the watermark are dropped, state
for closed windows is evicted — the knob that keeps a 100 TB/day stream's
state finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark import schemas
from sentiment_analysis_bigdata_spark.plans.barrier import barrier_eager


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over an events parquet directory.

    Spark's file stream source requires a *directory*; when given a single
    parquet file (the testdata layout) we stage a symlink into a temp dir.
    Timestamp columns are read as raw longs (the streaming schema reader
    rejects non-micro timestamp units) and converted back to
    TimestampType using the unit recorded in the parquet footer — the
    testdata has shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    encodings across regenerations, so the unit must be detected, never
    assumed.
    """
    import glob
    import os
    import tempfile

    from pyspark.sql import types as T

    from sentiment_analysis_bigdata_spark.sources.catalog import _ensure_session_confs

    _ensure_session_confs(spark)
    if os.path.isfile(path):
        # deterministic staging dir (keyed by the source path): the
        # checkpoint records the source directory, so a restarted query must
        # resolve to the SAME staged path or offset recovery fails
        import hashlib

        digest = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
        staged = os.path.join(tempfile.gettempdir(), f"events_stream_{digest}")
        os.makedirs(staged, exist_ok=True)
        link = os.path.join(staged, os.path.basename(path))
        if not os.path.exists(link):
            os.symlink(path, link)
        path = staged

    schema = T.StructType(
        [
            T.StructField(f.name, T.LongType() if isinstance(f.dataType, T.TimestampType) else f.dataType)
            for f in schemas.EVENTS.fields
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )

    # footer-declared unit → factor converting the raw long to micros
    import pyarrow.parquet as pq

    sample = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
    arrow_schema = pq.ParquetFile(sample).schema_arrow
    to_micros = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}

    out = raw
    for f in schemas.EVENTS.fields:
        if isinstance(f.dataType, T.TimestampType):
            unit = arrow_schema.field(f.name).type.unit
            factor = to_micros[unit]
            micros = (
                (F.col(f.name) / 1000).cast("long")
                if factor is None  # ns: divide (avoid bigint overflow)
                else F.col(f.name) * F.lit(factor)
            )
            out = out.withColumn(f.name, F.timestamp_micros(micros))
    return out


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    return events.withWatermark("ts", delay)


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Event-time tumbling window: per (window, event_type) count + value sum."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding event-time window (each event lands in width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "avg_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session window per user: sessions close after ``gap`` of inactivity.

    Streaming-native via ``session_window``; the batch twin (identical
    results on bounded data) is ``sessionize_batch`` below.
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization twin: lag + cumulative session counter.

    session boundary = gap since previous event of the same user >
    ``gap_minutes``. Returns per-session (user_id, session_id,
    session_start, n_events). One shuffle on user_id.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = gap_minutes * 60
    return (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | ((F.col("ts").cast("double") - F.col("prev_ts").cast("double")) > gap_s)
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def dedup_within_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Streaming dedup on event_id with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps only watermark-window state —
    the streaming analogue of exact dedup. Batch twin: dropDuplicates.
    """
    deduped = events.withWatermark("ts", delay)
    if events.isStreaming:
        return deduped.dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def interval_join_clicks_purchases(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval self-join: every purchase matched to the same
    user's click(s) in the preceding ``within`` window (click-attribution).

    On streaming input both sides carry watermarks and the join condition
    time-bounds the match, so each side's buffered state is evictable once
    the watermark passes — the requirement that keeps a stream-stream join's
    state finite at scale. Inner-join matches emit as soon as both rows have
    arrived (the watermark governs state cleanup, not emission), so a
    bounded availableNow run produces the complete result set. Batch twin:
    the same body is a plain range join.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (clicks.user_id == purchases.p_user_id)
        & (purchases.purchase_ts >= clicks.click_ts)
        & (purchases.purchase_ts <= clicks.click_ts + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond).select(
        "click_id", "purchase_id", "user_id", "click_ts", "purchase_ts", "value"
    )


def interval_join_left_outer(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits — with
    its attributing click(s) when one exists in the preceding ``within``
    window, else ONCE with nulls after the watermark proves no late click
    can still match (the attribution-with-misses shape; the inner variant
    above silently drops unattributed purchases).

    Outer-join emission semantics are the part worth being precise about
    at scale: a matched row emits on arrival, but an UNMATCHED purchase
    can only emit when ``watermark`` has passed its event time — so rows
    in the final watermark horizon of a bounded (availableNow) run are
    still held in state when the stream ends and are NOT in the output.
    That is correct streaming behavior, not data loss; consumers (and the
    value-checked query in workloads/temporal_q.py) must bound their read
    to ``purchase_ts ≤ max_ts − (watermark + within)``. Both sides carry
    watermarks and the condition time-bounds the match, so buffered state
    stays finite.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (purchases.user_id == clicks.c_user_id)
        & (purchases.purchase_ts >= clicks.click_ts)
        & (purchases.purchase_ts <= clicks.click_ts + F.expr(f"INTERVAL {within}"))
    )
    return purchases.join(clicks, cond, "leftOuter").select(
        "purchase_id", "user_id", "purchase_ts", "value", "click_id", "click_ts"
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    broadcast_dim: bool = False,
) -> DataFrame:
    """Stream-static join: each micro-batch probes the static dimension
    frame (re-resolved per batch, so a dim backed by a live table picks up
    updates). Stateless: nothing buffers across batches, no watermark
    needed. ``broadcast_dim`` is opt-in, for callers who KNOW the dim is
    bounded: a per-entity dim grows with the data, and a forced broadcast
    of it OOMs at scale where the unhinted per-batch plan would degrade to
    a shuffle join (SCALING.md "broadcast policy")."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, key, "left")


def run_stream_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_s: float = 120.0,
) -> None:
    """Durable streaming sink: append-mode parquet via ``foreachBatch`` with
    idempotent per-batch directories.

    Each micro-batch writes to ``{out_dir}/batch_id={id}`` with
    mode=overwrite, so a batch replayed after failure overwrites its own
    directory instead of duplicating rows — the standard exactly-once-ish
    recipe when the sink is a plain file system (the checkpoint tracks which
    source offsets map to which batch id; replay ⇒ same id ⇒ same
    directory). Downstream batch readers just scan ``out_dir`` and get the
    batch_id as a partition column for free.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s)


def run_stream_upsert_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    timeout_s: float = 120.0,
) -> None:
    """Keyed-upsert streaming sink: each micro-batch MERGEs into a
    parquet-backed table, keeping the latest row per key (descending
    ``order_cols``; make the LAST one unique — e.g. an event id — so the
    pick is a total order) — the dependency-free equivalent of
    ``MERGE INTO`` against a table format.

    Exactly-once recipe on a plain filesystem: every batch materializes
    the fully-merged table into a NEW versioned directory (normally
    ``{out_dir}/_v{batch_id}``) and then atomically repoints a _LATEST
    marker file. Replay safety: if a batch crashed AFTER the repoint but
    BEFORE the streaming checkpoint committed, the replayed batch would
    read its prev table from ``_v{batch_id}`` and must not overwrite the
    directory it is reading (Spark refuses to overwrite a path being read
    from) — so whenever the marker already points at this batch's own
    directory, the re-merged table is written to ``_v{batch_id}_retry``
    instead (and a replay of the retry flips back to ``_v{batch_id}``),
    keeping read and write paths always distinct. Retention: after each
    successful repoint, all version directories except the new one and its
    immediate predecessor (kept for in-flight readers of the old marker)
    are deleted, so storage holds at most two table versions. Readers
    resolve the marker via :func:`read_upsert_table`. At 100 TB the same
    shape is what Delta/Iceberg do with metadata instead of a marker file;
    the merge itself is one shuffle on the key (window argmax),
    proportional to table size — so this sink suits dimension-scale state,
    while fact-scale streams should use the append sink above.
    """
    upsert = upsert_fold(out_dir, key_cols, order_cols)

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s)


def upsert_fold(
    out_dir: str, key_cols: list[str], order_cols: list[str]
):
    """The production keyed-upsert foreachBatch fold as a standalone
    callable — used by :func:`run_stream_upsert_to_parquet` and by the
    latency probe (tools/streaming_audit.py), which needs the EXACT
    production merge under its own trigger/source wiring."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        merged = batch_df
        current = _read_marker(out_dir)
        if current is not None:
            prev = spark.read.parquet(f"{out_dir}/{current}")
            merged = prev.unionByName(batch_df)
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        _commit_version(latest, out_dir, batch_id, current)

    return upsert


def _commit_version(df: DataFrame, out_dir: str, batch_id: int, current: str | None) -> None:
    """Versioned-table commit shared by the foreachBatch table sinks:
    write ``df`` to a NEW version directory, atomically repoint the
    _LATEST marker, then apply retention (keep the new version + its
    immediate predecessor). Never writes the directory currently being
    read (replay after a repoint-then-crash alternates to a ``_retry``
    sibling) — see run_stream_upsert_to_parquet's docstring for the
    exactly-once argument."""
    import os
    import shutil

    target = f"_v{batch_id}" if current != f"_v{batch_id}" else f"_v{batch_id}_retry"
    df.write.mode("overwrite").parquet(f"{out_dir}/{target}")
    tmp = f"{out_dir}/_LATEST.tmp"
    os.makedirs(out_dir, exist_ok=True)
    with open(tmp, "w") as f:
        f.write(target)
    os.replace(tmp, f"{out_dir}/_LATEST")  # atomic repoint
    keep = {target, current}
    for name in os.listdir(out_dir):
        if name.startswith("_v") and name not in keep:
            shutil.rmtree(f"{out_dir}/{name}", ignore_errors=True)


def cms_fold(out_dir: str, col: str, depth: int, width: int, seed: int):
    """foreachBatch fold maintaining a RUNNING count-min sketch: per
    micro-batch, build the batch's CMS (operators/sketches.py
    ``cms_build`` — ≤ depth×width cells) and cell-sum it into the
    persisted sketch, committing through the same versioned-directory +
    atomic _LATEST repoint machinery as the upsert sink (replay of a
    batch overwrites its own version, so counts are never double-added).

    This is the streaming face of the sketch-mergeability story: state
    is FIXED-SIZE regardless of stream length or key cardinality — the
    incremental analogue of per-day sketch rollups, and the pattern that
    replaces an unbounded streaming groupBy(key).count() at 100 TB."""
    from sentiment_analysis_bigdata_spark.operators import sketches

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        current = _read_marker(out_dir)
        # Replay guard — CRITICAL for a non-idempotent merge: upsert's
        # argmax can re-merge a replayed batch harmlessly, but cell-sums
        # would DOUBLE-COUNT it. If the marker already points at this
        # batch's own commit (crash between repoint and checkpoint), the
        # batch's counts are already in `current`; re-commit the sketch
        # UNCHANGED (idempotent repoint) instead of merging again.
        if current in (f"_v{batch_id}", f"_v{batch_id}_retry"):
            merged = spark.read.parquet(f"{out_dir}/{current}")
        else:
            batch_sketch = sketches.cms_build(
                batch_df, col, depth=depth, width=width, seed=seed
            )
            merged = batch_sketch
            if current is not None:
                prev = spark.read.parquet(f"{out_dir}/{current}")
                merged = sketches.cms_merge(prev, batch_sketch)
        _commit_version(merged, out_dir, batch_id, current)

    return fold


def run_stream_cms_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
    timeout_s: float = 120.0,
) -> None:
    """Run :func:`cms_fold` over a stream until available data drains.
    The final sketch (read via :func:`read_upsert_table`) must be
    indistinguishable from a single batch-built CMS over the same rows —
    the stream ≡ batch contract the oracle twin checks end to end."""
    q = (
        stream_df.writeStream.foreachBatch(
            cms_fold(out_dir, col, depth, width, seed)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s)


def bloom_fold(out_dir: str, col: str, m: int, k: int, seed: int):
    """foreachBatch fold maintaining a RUNNING Bloom filter
    (operators/sketches.py ``bloom_build``/``bloom_merge``): per batch,
    union the batch's occupied positions into the persisted ≤ m-row set
    through the versioned-commit machinery. Unlike :func:`cms_fold`,
    NO replay guard is needed: position-set union is IDEMPOTENT (a
    replayed batch re-unions positions that are already set and the
    distinct collapses them), so the sink is exactly-once by algebra —
    the practical difference between maintaining a membership filter and
    a counter sketch under at-least-once delivery."""
    from sentiment_analysis_bigdata_spark.operators import sketches

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_sketch = sketches.bloom_build(
            batch_df, col, m=m, k=k, seed=seed
        )
        current = _read_marker(out_dir)
        merged = batch_sketch
        if current is not None:
            prev = spark.read.parquet(f"{out_dir}/{current}")
            merged = sketches.bloom_merge(prev, batch_sketch)
        _commit_version(merged, out_dir, batch_id, current)

    return fold


def run_stream_bloom_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    col: str,
    m: int = 8192,
    k: int = 3,
    seed: int = 0,
    timeout_s: float = 120.0,
) -> None:
    """Run :func:`bloom_fold` until available data drains; the final
    filter must be position-identical to a single batch build."""
    q = (
        stream_df.writeStream.foreachBatch(bloom_fold(out_dir, col, m, k, seed))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s)


def hll_fold(out_dir: str, key_col: str, item_col: str):
    """foreachBatch fold maintaining RUNNING per-key HLL distinct-count
    sketches (Spark's built-in DataSketches ``hll_sketch_agg`` /
    ``hll_union_agg``): per micro-batch, sketch the batch's items per
    key and register-max it into the persisted state through the same
    versioned-commit machinery as the other sketch sinks. Like
    :func:`bloom_fold` — and unlike :func:`cms_fold` — NO replay guard
    is needed: register-max union is IDEMPOTENT, so a replayed batch
    re-unions registers that are already absorbed and the state is
    exactly-once by algebra. State is keys × sketch-size regardless of
    stream length — the incremental face of the per-day HLL rollup
    (``hll_user_rollup``), and the pattern that replaces an unbounded
    streaming ``groupBy(key).approx_count_distinct`` at 100 TB."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_sk = batch_df.groupBy(key_col).agg(
            F.hll_sketch_agg(item_col).alias("sk")
        )
        current = _read_marker(out_dir)
        merged = batch_sk
        if current is not None:
            prev = spark.read.parquet(f"{out_dir}/{current}")
            merged = (
                prev.unionByName(batch_sk)
                .groupBy(key_col)
                .agg(F.hll_union_agg("sk").alias("sk"))
            )
        _commit_version(merged, out_dir, batch_id, current)

    return fold


def run_stream_hll_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str,
    item_col: str,
    timeout_s: float = 120.0,
) -> None:
    """Run :func:`hll_fold` until available data drains; the final
    sketches must estimate the same distincts as one batch build."""
    q = (
        stream_df.writeStream.foreachBatch(hll_fold(out_dir, key_col, item_col))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s)


def run_stream_topk_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    order_cols: list[str],
    k: int,
    timeout_s: float = 120.0,
    tiebreak_col: str | None = None,
) -> None:
    """Bounded-state top-k streaming sink: each micro-batch merges into a
    k-row parquet-backed leaderboard — union the previous top-k with the
    batch, keep the k largest by descending ``order_cols`` then
    descending ``tiebreak_col``.

    Top-k is a monoid — ``topk(topk(A) ∪ B) = topk(A ∪ B)`` — ONLY under
    a TOTAL order: with ties at the k boundary, which rows survive an
    early batch's cut depends on batch arrival, and a later batch cannot
    recover a row the cut dropped. So the unique tie-break column is an
    explicit, separate parameter: every micro-batch asserts its
    uniqueness over the merged frame (k + |batch| rows — a trivial agg)
    and the fold raises on the first violation instead of silently
    committing a nondeterministic leaderboard. Passing
    ``tiebreak_col=None`` skips the guarantee and warns.

    State is k rows REGARDLESS of stream length (the bounded-state
    complement to the keyed upsert sink, whose state grows with #keys),
    and each merge sorts only ``k + |batch|`` rows. Versioned-commit/
    replay semantics are shared with the upsert sink
    (:func:`_commit_version`).
    """
    fold = topk_fold(out_dir, order_cols, k, tiebreak_col)

    q = (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s)


def topk_fold(
    out_dir: str,
    order_cols: list[str],
    k: int,
    tiebreak_col: str | None = None,
):
    """The production top-k foreachBatch fold as a standalone callable —
    used by :func:`run_stream_topk_to_parquet` and by the latency probe
    (tools/streaming_audit.py)."""
    if tiebreak_col is None:
        import warnings

        warnings.warn(
            "streaming top-k without tiebreak_col: ties at the "
            "k boundary make the per-batch cut order-dependent; name a "
            "unique column to keep the fold exact",
            stacklevel=2,
        )
    cut_cols = order_cols + ([tiebreak_col] if tiebreak_col else [])

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        current = _read_marker(out_dir)
        if tiebreak_col is not None:
            # the fold runs two actions over the batch (uniqueness agg +
            # merge); persist so the micro-batch source is scanned once
            # (the probe's numInputRows showed 2× without it)
            batch_df = batch_df.persist()
            # in-batch duplicates can't come from replay (replay repeats
            # the WHOLE batch) — they mean the caller's tie-break column
            # genuinely isn't unique, so fail loudly before committing a
            # nondeterministic cut
            try:
                n, nd = batch_df.agg(
                    F.count(F.lit(1)), F.count_distinct(F.col(tiebreak_col))
                ).first()
                if n != nd:
                    raise ValueError(
                        f"tiebreak_col {tiebreak_col!r} is not unique in "
                        f"batch {batch_id} ({n} rows, {nd} distinct "
                        f"non-null) — the top-{k} cut would be "
                        "nondeterministic"
                    )
            except Exception:
                batch_df.unpersist()
                raise
        merged = batch_df
        if current is not None:
            merged = spark.read.parquet(f"{out_dir}/{current}").unionByName(
                batch_df
            )
            if tiebreak_col is not None:
                # replay idempotence: a replayed batch re-unions rows the
                # committed leaderboard already folded in — but a replayed
                # row is IDENTICAL in every column, so exact-duplicate
                # removal is all replay needs. A tie-break key then still
                # duplicated is two DIFFERENT events sharing the id — a
                # genuine uniqueness violation the per-batch check can't
                # see (cross-batch), and silently keeping one would commit
                # an arrival-order-dependent leaderboard: raise instead.
                merged = merged.distinct().transform(barrier_eager)
                n, nd = merged.agg(
                    F.count(F.lit(1)), F.count_distinct(F.col(tiebreak_col))
                ).first()
                if n != nd:
                    raise ValueError(
                        f"tiebreak_col {tiebreak_col!r} collides across "
                        f"batches at batch {batch_id} ({n} rows, {nd} "
                        f"distinct non-null) — two different events share "
                        "a tie-break key; the leaderboard would be "
                        "arrival-order-dependent"
                    )
        top = merged.orderBy(*[F.col(c).desc() for c in cut_cols]).limit(k)
        try:
            _commit_version(top, out_dir, batch_id, current)
        finally:
            if tiebreak_col is not None:
                batch_df.unpersist()

    return fold


def read_file_tail_stream(
    spark: SparkSession,
    tail_dir: str,
    schema,
    files_per_trigger: int = 1,
) -> DataFrame:
    """Tail a directory that upstream producers are STILL writing to —
    the production file-landing pattern (log shipper / CDC export drops
    a file per interval; Spark's file source polls the directory each
    trigger and picks up arrivals exactly once via the checkpoint's
    seen-files log). ``files_per_trigger`` is the ingest governor
    (``maxFilesPerTrigger``): it caps how much backlog a single
    micro-batch swallows, which bounds per-batch memory and keeps commit
    latency flat during catch-up instead of one giant recovery batch.

    The directory may start empty (triggers idle until the first file
    lands). Pass an explicit ``schema`` — a tailed directory can't be
    schema-inferred before the first file exists.
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(tail_dir)
    )


def feed_files_at_rate(
    src_files: list[str],
    tail_dir: str,
    interval_s: float,
    drops: list | None = None,
):
    """Rate-limited feeder simulating the producer side of a file tail:
    a daemon thread links (or copies) one source file into ``tail_dir``
    every ``interval_s`` seconds. Appends ``(dest_path, wall_time)`` to
    ``drops`` at the moment each file becomes visible, so a probe can
    measure arrival→queryable latency. Returns the started thread; join
    it to wait for the feed to finish."""
    import os
    import shutil
    import threading
    import time

    def run() -> None:
        os.makedirs(tail_dir, exist_ok=True)
        for i, src in enumerate(src_files):
            if i:
                time.sleep(interval_s)
            base = f"{i:05d}_{os.path.basename(src)}"
            dest = os.path.join(tail_dir, base)
            # dot-prefixed staging name: Spark's file listing ignores
            # hidden files, so a slow copy can never be seen half-written
            tmp = os.path.join(tail_dir, "." + base)
            try:
                os.link(src, tmp)
            except OSError:
                shutil.copyfile(src, tmp)
            os.rename(tmp, dest)  # atomic: the tail never sees partials
            if drops is not None:
                drops.append((dest, time.time()))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def _read_marker(out_dir: str) -> str | None:
    import os

    marker = f"{out_dir}/_LATEST"
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return f.read().strip()


def _read_latest_version(spark, out_dir: str):
    version = _read_marker(out_dir)
    if version is None:
        return None
    return spark.read.parquet(f"{out_dir}/{version}")


def read_upsert_table(spark, out_dir: str) -> DataFrame:
    """Resolve the _LATEST marker written by the upsert sink."""
    df = _read_latest_version(spark, out_dir)
    if df is None:
        raise FileNotFoundError(f"no _LATEST marker under {out_dir}")
    return df


def _await_or_raise(q, timeout_s: float) -> None:
    """awaitTermination returns False on timeout with the query STILL
    RUNNING — callers would read a partially-written sink. Stop and raise."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not finish within "
            f"{timeout_s}s; stopped before the sink completed"
        )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    timeout_s: float = 60.0,
    output_mode: str = "complete",
) -> None:
    """Execute a streaming plan to completion against a bounded file source
    (availableNow trigger) into an in-memory sink — the test harness path.
    Aggregations use ``complete``; stream-stream joins require ``append``.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s)
