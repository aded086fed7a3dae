"""Streaming state-store audit (VERDICT r3 ask #4): verify each streaming
query's documented state-footprint claim from the ``stateOperators``
metrics of an ACTUAL incremental run, not code review.

Method: the sf0.01 events table is staged into 4 time-range-partitioned
parquet files and streamed with ``maxFilesPerTrigger=1`` + availableNow,
so every job runs as 4 real micro-batches — watermarks advance between
batches and eviction actually happens, which a single-file availableNow
run can never show. For every job the audit then reads the final
``StreamingQueryProgress`` and asserts the claim class:

- ``output-bounded`` (complete-mode aggs: tumbling/sliding/sessions) —
  state rows ≤ the batch-twin OUTPUT cardinality (#windows/#sessions),
  never the input-event count;
- ``watermark-evicting`` (append-mode dedup / stream-stream interval
  join) — a state operator exists, the final watermark advanced past
  epoch, rows were actually REMOVED by eviction, and final state is
  strictly smaller than the input;
- ``key-bounded`` (applyInPandasWithState EWMA) — state rows equal the
  distinct key count exactly;
- ``stateless`` (stream-static enrich, foreachBatch upsert sink) — no
  state operator holds any rows;
- ``sink-bounded`` (the CMS/Bloom/HLL sketch folds) — zero state-store
  rows (state lives in the versioned parquet sink) AND the final
  committed table respects the sketch's CLOSED-FORM size bound:
  CMS ≤ depth×width cells, Bloom ≤ m occupied positions, HLL exactly
  one sketch row per distinct key — fixed-size state regardless of
  stream length, the 100 TB replacement for an unbounded streaming
  ``groupBy(key)`` aggregate.

A stateful operator that fails its bound — or a watermark claim whose
watermark never moved (state would grow forever on an unbounded source)
— fails the audit. Run standalone (prints a table, exit 1 on violation)
or via tools/plan_audit.py, which appends the section to PLANS.md.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
EPOCH = "1970-01-01T00:00:00.000Z"
N_FILES = 4


def _staged_events_stream(spark, stage_dir: str):
    from pyspark.sql import functions as F

    from sentiment_analysis_bigdata_spark.sources import load_table

    if not os.path.isdir(os.path.join(stage_dir, "events")):
        (
            load_table(spark, SF, "events")
            .repartitionByRange(N_FILES, F.col("ts"))
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, "events"))
        )
    schema = spark.read.parquet(os.path.join(stage_dir, "events")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage_dir, "events"))
    )


def _run(df, name: str, mode: str, sink=None):
    """Run to completion (availableNow), return the query handle with its
    progress history intact. ``sink`` overrides the memory sink (upsert)."""
    if sink is not None:
        writer = df.writeStream.foreachBatch(sink)
    else:
        writer = df.writeStream.format("memory").queryName(name).outputMode(mode)
    q = writer.trigger(availableNow=True).start()
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(f"streaming audit job {name} did not finish")
    return q


def _metrics(q):
    """(state_ops_final, rows_removed_total, final_watermark, input_rows)."""
    progresses = list(q.recentProgress)
    input_rows = sum(p["numInputRows"] for p in progresses)
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in progresses
        for op in p.get("stateOperators") or []
    )
    final_ops, watermark = [], EPOCH
    for p in progresses:
        if p.get("stateOperators"):
            final_ops = p["stateOperators"]
        et = p.get("eventTime") or {}
        watermark = et.get("watermark", watermark)
    return final_ops, removed, watermark, input_rows


def audit(spark) -> tuple[str, list[tuple[str, list[str]]]]:
    from pyspark.sql import functions as F

    from sentiment_analysis_bigdata_spark.sources import load_table
    from sentiment_analysis_bigdata_spark.streaming import jobs as SJ
    from sentiment_analysis_bigdata_spark.streaming import stateful as ST

    stage = os.path.join(tempfile.gettempdir(), "streaming_audit_stage")
    events_batch = load_table(spark, SF, "events")
    bounds = {
        "tumbling": SJ.tumbling_counts(events_batch).count(),
        "sliding": SJ.sliding_counts(events_batch).count(),
        "sessions": SJ.sessionize_batch(events_batch).count(),
        "events": events_batch.count(),
        "users": events_batch.select("user_id").distinct().count(),
    }

    def stream():
        return _staged_events_stream(spark, stage)

    dim = (
        events_batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.when(F.col("n") >= 70, "heavy").otherwise("light").alias("tier"),
        )
    )
    upsert_out = tempfile.mkdtemp(prefix="audit_upsert_")

    def upsert_sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            f"{upsert_out}/batch_id={batch_id}"
        )

    topk_out = tempfile.mkdtemp(prefix="audit_topk_")

    def topk_sink(batch_df, batch_id):
        # the real monoid fold + versioned commit, across micro-batches
        spark_ = batch_df.sparkSession
        current = SJ._read_marker(topk_out)
        merged = (
            batch_df
            if current is None
            else spark_.read.parquet(f"{topk_out}/{current}").unionByName(batch_df)
        )
        top = merged.orderBy(
            F.col("value").desc(), F.col("event_id").desc()
        ).limit(20)
        SJ._commit_version(top, topk_out, batch_id, current)

    # Sketch-fold sinks (VERDICT r12 evidence extension): state lives in
    # the versioned parquet sink, not the state store, and is bounded by
    # the SKETCH SIZE in closed form — CMS ≤ depth×width cells, Bloom
    # ≤ m occupied positions, HLL = one sketch row per distinct key.
    # The audit runs the production folds over the same staged
    # micro-batches and asserts the final committed table against those
    # bounds (claim "sink-bounded": zero state-store rows AND sink rows
    # ≤ bound).
    cms_out = tempfile.mkdtemp(prefix="audit_cms_")
    bloom_out = tempfile.mkdtemp(prefix="audit_bloom_")
    hll_out = tempfile.mkdtemp(prefix="audit_hll_")
    CMS_DEPTH, CMS_WIDTH, BLOOM_M = 4, 1024, 8192
    SINK_TABLES = {
        "streaming_cms(sink)": (cms_out, CMS_DEPTH * CMS_WIDTH),
        "streaming_bloom(sink)": (bloom_out, BLOOM_M),
        "streaming_hll(sink)": (hll_out, bounds["users"]),
    }

    # name -> (claim, build_fn -> (df, mode, sink), bound description, bound)
    JOBS = {
        "streaming_tumbling": (
            "output-bounded",
            lambda: (SJ.tumbling_counts(SJ.with_watermark(stream(), "1 hour")), "complete", None),
            "#(window,event_type) groups",
            bounds["tumbling"],
        ),
        "sliding_events": (
            "output-bounded",
            lambda: (SJ.sliding_counts(SJ.with_watermark(stream(), "1 hour")), "complete", None),
            "#(window,event_type) groups",
            bounds["sliding"],
        ),
        "streaming_sessions": (
            "output-bounded",
            lambda: (SJ.session_counts(SJ.with_watermark(stream(), "1 hour")), "complete", None),
            "#sessions",
            bounds["sessions"],
        ),
        "streaming_dedup": (
            "watermark-evicting",
            lambda: (
                SJ.dedup_within_watermark(stream(), "1 hour").select("event_id", "event_type"),
                "append",
                None,
            ),
            "< input events (evicted)",
            bounds["events"],
        ),
        "streaming_interval_join": (
            "watermark-evicting",
            lambda: (SJ.interval_join_clicks_purchases(stream(), within="1 hour"), "append", None),
            "< 2 x input events (evicted)",
            2 * bounds["events"],
        ),
        "streaming_interval_join_outer": (
            "watermark-evicting",
            lambda: (SJ.interval_join_left_outer(stream(), within="1 hour"), "append", None),
            "< 2 x input events (evicted; unmatched rows inside the final "
            "horizon remain until watermark passes)",
            2 * bounds["events"],
        ),
        "streaming_static_join(enrich)": (
            "stateless",
            lambda: (SJ.enrich_with_dim(stream(), dim, "user_id"), "append", None),
            "no state operator",
            0,
        ),
        "streaming_upsert(sink)": (
            "stateless",
            lambda: (stream(), None, upsert_sink),
            "no state operator (state lives in the versioned sink table)",
            0,
        ),
        "streaming_topk(sink)": (
            "stateless",
            lambda: (stream(), None, topk_sink),
            "no state operator (k-row leaderboard lives in the versioned sink table)",
            0,
        ),
        "streaming_cms(sink)": (
            "sink-bounded",
            lambda: (stream(), None,
                     SJ.cms_fold(cms_out, "user_id", CMS_DEPTH, CMS_WIDTH, 0)),
            f"<= depth x width = {CMS_DEPTH * CMS_WIDTH} cells",
            CMS_DEPTH * CMS_WIDTH,
        ),
        "streaming_bloom(sink)": (
            "sink-bounded",
            lambda: (stream(), None,
                     SJ.bloom_fold(bloom_out, "user_id", BLOOM_M, 3, 0)),
            f"<= m = {BLOOM_M} occupied positions",
            BLOOM_M,
        ),
        "streaming_hll(sink)": (
            "sink-bounded",
            lambda: (stream(), None,
                     SJ.hll_fold(hll_out, "user_id", "event_id")),
            "= distinct user_ids (one sketch row per key)",
            bounds["users"],
        ),
        "stateful_ewma": (
            "key-bounded",
            lambda: (ST.ewma_stateful(stream()), "update", None),
            "= distinct user_ids",
            bounds["users"],
        ),
    }

    rows, failures = [], []
    for name, (claim, build, bound_desc, bound) in JOBS.items():
        df, mode, sink = build()
        q = _run(df, f"audit_{name.split('(')[0]}", mode, sink=sink)
        ops, removed, watermark, input_rows = _metrics(q)
        state_rows = sum(op["numRowsTotal"] for op in ops)
        op_names = ",".join(op.get("operatorName", "?") for op in ops) or "-"
        problems = []
        if claim == "stateless":
            if state_rows > 0:
                problems.append(f"claimed stateless but holds {state_rows} state rows")
        elif claim == "output-bounded":
            if not ops:
                problems.append("no state operator found")
            if state_rows > bound:
                problems.append(f"state rows {state_rows} > output bound {bound}")
        elif claim == "watermark-evicting":
            if not ops:
                problems.append("no state operator found")
            if watermark == EPOCH:
                problems.append("watermark never advanced — state is unbounded")
            if removed == 0:
                problems.append("no rows ever evicted — state is unbounded")
            if state_rows >= bound:
                problems.append(f"final state rows {state_rows} not below bound {bound}")
        elif claim == "key-bounded":
            if state_rows != bound:
                problems.append(f"state rows {state_rows} != distinct keys {bound}")
        elif claim == "sink-bounded":
            if state_rows > 0:
                problems.append(
                    f"sketch fold holds {state_rows} state-store rows "
                    "(state must live in the versioned sink)"
                )
            out_dir, sink_bound = SINK_TABLES[name]
            sink_rows = SJ.read_upsert_table(spark, out_dir).count()
            state_rows = sink_rows  # reported in the state-rows column
            if sink_rows > sink_bound:
                problems.append(
                    f"final sink rows {sink_rows} > sketch bound {sink_bound}"
                )
            if sink_rows == 0:
                problems.append("final sink empty — fold never committed")
        if problems:
            failures.append((name, problems))
        rows.append(
            (name, claim, op_names, input_rows, state_rows, removed,
             bound_desc, "FAIL: " + "; ".join(problems) if problems else "OK")
        )

    all_ok = all(r[-1] == "OK" for r in rows)
    md = [
        # [OK] marker mirrors the per-query section convention so an
        # all-sections-marked grep over PLANS.md stays exact.
        f"\n## Streaming state-store audit{' [OK]' if all_ok else ''}\n",
        f"\nEach job ran as {N_FILES} real micro-batches (time-ranged files, "
        "maxFilesPerTrigger=1, availableNow) over sf0.01 events; metrics are "
        "read from the run's own StreamingQueryProgress.stateOperators. "
        "Generated by `python tools/streaming_audit.py`.\n",
        "\n| query | claim | state operator | input rows | state rows | evicted | bound | status |",
        "\n|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        md.append("\n| " + " | ".join(f"`{r[0]}`" if i == 0 else str(v) for i, v in enumerate(r)) + " |")
    md.append("\n")
    probe_md, probe_failures = latency_probe(spark, stage)
    md.append(probe_md)
    failures.extend(probe_failures)
    return "".join(md), failures


def latency_probe(spark, stage: str) -> tuple[str, list[tuple[str, list[str]]]]:
    """End-to-end sink latency under a RATE-LIMITED FILE TAIL (VERDICT r4
    ask #8): the staged time-sliced event files are dropped into an
    initially-empty tail directory one per second by
    ``feed_files_at_rate`` while the PRODUCTION upsert/top-k folds run
    against ``read_file_tail_stream`` under a short processing-time
    trigger. Reports per-batch trigger latency (triggerExecution /
    addBatch from StreamingQueryProgress) and, as the headline number,
    last-file ARRIVAL → RESULT-VISIBLE latency: wall time from the final
    slice landing to the _LATEST-marker table satisfying the batch-twin
    predicate (max ts folded in for upsert; leaderboard == batch top-k
    for top-k). Fails if a sink never reaches the batch answer."""
    import time

    from pyspark.sql import functions as F

    from sentiment_analysis_bigdata_spark.sources import load_table
    from sentiment_analysis_bigdata_spark.streaming import jobs as SJ

    events_dir = os.path.join(stage, "events")
    slice_files = sorted(
        os.path.join(events_dir, n)
        for n in os.listdir(events_dir)
        if n.endswith(".parquet") and not n.startswith((".", "_"))
    )
    batch = load_table(spark, SF, "events")
    schema = spark.read.parquet(events_dir).schema
    max_ts = batch.agg(F.max("ts")).first()[0]
    want_topk = sorted(
        (r["event_id"] for r in batch.orderBy(
            F.col("value").desc(), F.col("event_id").desc()
        ).limit(20).collect())
    )

    def upsert_visible(out_dir: str) -> bool:
        try:
            t = SJ._read_latest_version(spark, out_dir)
            return t is not None and t.agg(F.max("ts")).first()[0] == max_ts
        except Exception:
            return False  # marker mid-repoint / version being replaced

    def topk_visible(out_dir: str) -> bool:
        try:
            t = SJ._read_latest_version(spark, out_dir)
            if t is None:
                return False
            got = sorted(r["event_id"] for r in t.collect())
            return got == want_topk
        except Exception:
            return False

    SINKS = {
        "upsert": (
            lambda out: SJ.upsert_fold(
                out, key_cols=["user_id"], order_cols=["ts", "event_id"]
            ),
            upsert_visible,
        ),
        "topk": (
            lambda out: SJ.topk_fold(
                out, order_cols=["value"], k=20, tiebreak_col="event_id"
            ),
            topk_visible,
        ),
    }

    rows, failures = [], []
    headline = {}
    for name, (fold_builder, visible) in SINKS.items():
        tail = tempfile.mkdtemp(prefix=f"probe_tail_{name}_")
        out = tempfile.mkdtemp(prefix=f"probe_out_{name}_")
        ckpt = tempfile.mkdtemp(prefix=f"probe_ckpt_{name}_")
        stream = SJ.read_file_tail_stream(
            spark, tail, schema, files_per_trigger=1
        )
        q = (
            stream.writeStream.foreachBatch(fold_builder(out))
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        drops: list = []
        feeder = SJ.feed_files_at_rate(slice_files, tail, 1.0, drops=drops)
        feeder.join(timeout=120)
        if len(drops) < len(slice_files):
            # feed never finished (empty staging / pathological copy
            # stall) — record a probe failure instead of crashing the
            # whole audit on drops[-1], and don't mis-measure a
            # non-final file as "last arrival"
            q.stop()
            failures.append(
                (f"latency_probe_{name}",
                 [f"feeder dropped {len(drops)}/{len(slice_files)} files "
                  "within the timeout"])
            )
            continue
        t_last_drop = drops[-1][1]
        deadline, t_visible = time.time() + 120, None
        while time.time() < deadline:
            if visible(out):
                t_visible = time.time()
                break
            time.sleep(0.05)
        q.stop()
        if t_visible is None:
            failures.append(
                (f"latency_probe_{name}",
                 ["sink never reached the batch-twin answer"])
            )
            continue
        headline[name] = (t_visible - t_last_drop) * 1000
        for p in q.recentProgress:
            if p["numInputRows"] == 0:
                continue
            dur = p.get("durationMs") or {}
            rows.append(
                (name, p["batchId"], p["numInputRows"],
                 dur.get("triggerExecution", -1), dur.get("addBatch", -1))
            )

    md = [
        "\n### Sink latency probe (rate-limited file tail)\n",
        f"\nThe {len(slice_files)} staged slice files land in an "
        "initially-empty tail directory at 1 file/s "
        "(`feed_files_at_rate`) while the PRODUCTION fold runs over "
        "`read_file_tail_stream` (maxFilesPerTrigger=1, 250 ms "
        "processing-time trigger). Arrival→visible = last file landing "
        "→ _LATEST table equals the batch twin.\n",
    ]
    for name in SINKS:
        if name in headline:
            md.append(
                f"\n- `{name}`: arrival→visible "
                f"**{headline[name]:.0f} ms** (last slice)"
            )
    md.append(
        "\n\n| sink | batch | input rows | triggerExecution ms | addBatch ms |"
        "\n|---|---|---|---|---|"
    )
    for r in rows:
        md.append("\n| " + " | ".join(str(v) for v in r) + " |")
    md.append("\n")
    return "".join(md), failures


def main() -> None:
    from sentiment_analysis_bigdata_spark import get_spark

    spark = get_spark("streaming-audit")
    spark.sparkContext.setLogLevel("ERROR")
    section, failures = audit(spark)
    print(section)
    if failures:
        print(f"STREAMING AUDIT FAILURES: {failures}", file=sys.stderr)
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
