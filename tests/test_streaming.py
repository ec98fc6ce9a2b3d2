"""True Structured Streaming tests: drive streaming queries over the
finite events fixture to completion (memory sink +
processAllAvailable) and check against batch equivalents."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from mcp_iceberg_duckdb_spark.operators._util import dec_round
from mcp_iceberg_duckdb_spark.sources.tables import load
from mcp_iceberg_duckdb_spark.streaming.events import (
    read_event_stream,
    run_stream_to_memory,
    stream_dedup_within_watermark,
    stream_tumbling_counts,
    stream_user_running_totals,
)


@pytest.fixture(scope="module", params=["native", "ns"])
def events_path(request, sf_dir, tmp_path_factory):
    """Run every streaming test against BOTH timestamp units the
    driver has shipped: the fixture as-is (µs this round) and a
    locally-rewritten TIMESTAMP(NANOS) variant — the round-3 bug was
    exactly a unit-assumption in read_event_stream that only one
    variant could catch."""
    src = os.path.join(sf_dir, "events.parquet")
    if request.param == "native":
        return src
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(src)
    idx = tbl.schema.get_field_index("ts")
    ns_col = tbl.column("ts").cast(pa.timestamp("ns"))
    tbl = tbl.set_column(idx, pa.field("ts", pa.timestamp("ns")), ns_col)
    out = str(tmp_path_factory.mktemp("events_ns") / "events.parquet")
    # parquet format >= 2.6 stores TIMESTAMP(NANOS) natively
    pq.write_table(tbl, out, version="2.6", coerce_timestamps=None)
    assert pq.read_schema(out).field("ts").type == pa.timestamp("ns")
    return out


def test_stream_tumbling_matches_batch(spark, sf_dir, events_path):
    """Append-mode watermarked windows over the full (finite) stream
    must equal the batch windowed aggregation."""
    streamed = run_stream_to_memory(
        spark,
        stream_tumbling_counts(read_event_stream(spark, events_path)),
        "t_tumbling",
    )
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            dec_round(
                F.sum(F.col("value").cast("decimal(28,12)")),
                4,
                widen="decimal(30,12)",
            ).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    s_rows = sorted(map(tuple, streamed.collect()))
    b_rows = sorted(map(tuple, batch.collect()))
    # append mode may withhold the final (never-closed-by-watermark)
    # windows; everything emitted must match batch exactly
    b_set = set(b_rows)
    assert s_rows, "stream emitted nothing"
    missing = [r for r in s_rows if tuple(r) not in b_set]
    assert not missing, f"stream rows not in batch result: {missing[:3]}"
    assert len(s_rows) >= 0.5 * len(b_rows), "stream emitted too few windows"


def test_stream_dedup_within_watermark(spark, events_path):
    out = run_stream_to_memory(
        spark,
        stream_dedup_within_watermark(read_event_stream(spark, events_path)),
        "t_dedup",
    )
    n = out.count()
    distinct_ids = out.select("event_id").distinct().count()
    assert n == distinct_ids, "dedup emitted duplicate event_ids"
    assert n > 0


def test_stream_foreach_batch_parquet_sink(spark, sf_dir, events_path, tmp_path):
    """foreachBatch exactly-once sink: all input rows land exactly
    once across epoch directories."""
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_to_parquet_foreach_batch,
    )

    out = str(tmp_path / "sink")
    q = stream_to_parquet_foreach_batch(
        read_event_stream(spark, events_path), out
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.parquet(out)
    n_src = load(spark, sf_dir, "events").count()
    assert written.count() == n_src
    assert written.select("event_id").distinct().count() == n_src


def test_stream_sliding_window_subset_of_batch(spark, sf_dir, events_path):
    """Sliding-window streaming aggregation (1h window, 30m slide):
    emitted windows must match the batch twin."""
    sliding = (
        read_event_stream(spark, events_path)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )
    streamed = run_stream_to_memory(spark, sliding, "t_sliding")
    batch = {
        (r.window_start, r.n)
        for r in load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
        .collect()
    }
    s_rows = [tuple(r) for r in streamed.collect()]
    assert s_rows, "no windows emitted"
    missing = [r for r in s_rows if r not in batch]
    assert not missing, f"stream windows disagree with batch: {missing[:3]}"


def test_stream_stateful_running_totals(spark, sf_dir, events_path):
    """applyInPandasWithState: the LAST emission per user must equal
    the batch per-user totals (state accumulated across batches)."""
    out = run_stream_to_memory(
        spark,
        stream_user_running_totals(read_event_stream(spark, events_path)),
        "t_state",
        mode="update",
    )
    pdf = out.toPandas()
    assert len(pdf) > 0
    # per user take the max n_events (monotone across emissions)
    last = pdf.groupby("user_id")["n_events"].max()
    batch = {
        r.user_id: r.n
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert dict(last) == batch


def test_stream_stream_join_matches_batch(spark, sf_dir, events_path):
    """Watermarked stream-stream interval join over the finite replay:
    every emitted (signup, purchase) pair must appear in the batch
    interval self-join; the finite replay should surface most of it."""
    from mcp_iceberg_duckdb_spark import registry
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_stream_purchases_after_signup,
    )

    registry.load_all()
    streamed = run_stream_to_memory(
        spark,
        stream_stream_purchases_after_signup(
            read_event_stream(spark, events_path)
        ),
        "t_ss_join",
    )
    batch = registry.QUERIES["s_stream_stream_join"].builder(spark, sf_dir)
    s_rows = sorted(map(tuple, streamed.collect()))
    b_rows = sorted(map(tuple, batch.collect()))
    b_set = set(b_rows)
    assert s_rows, "stream-stream join emitted nothing"
    missing = [r for r in s_rows if r not in b_set]
    assert not missing, f"stream rows not in batch: {missing[:3]}"
    assert len(s_rows) >= 0.5 * len(b_rows), (
        f"stream emitted too few pairs: {len(s_rows)}/{len(b_rows)}"
    )


def test_stream_funnel_first_purchase_matches_batch(spark, sf_dir, events_path):
    """s_funnel_latency's streaming twin — chained stateful operators
    (watermarked stream-stream interval join → append-mode
    min-per-signup). Append mode only emits a (user, signup) group
    after the watermark closes it, so every emitted first_purchase_ts
    must be the FINAL min — each emitted row is checked for exact
    equality against the batch funnel (a partially-aggregated early
    emission would be a wrong value, not just an incomplete set)."""
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_funnel_first_purchase,
    )

    streamed = run_stream_to_memory(
        spark,
        stream_funnel_first_purchase(read_event_stream(spark, events_path)),
        "t_funnel_min",
    )
    e = load(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    batch = (
        s.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("signup_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("signup_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("purchase_ts").alias("first_purchase_ts"))
    )
    s_rows = sorted(map(tuple, streamed.collect()))
    b_rows = sorted(map(tuple, batch.collect()))
    b_set = set(b_rows)
    assert s_rows, "funnel stream emitted nothing"
    wrong = [r for r in s_rows if r not in b_set]
    assert not wrong, f"stream rows diverge from batch funnel: {wrong[:3]}"
    assert len(s_rows) >= 0.5 * len(b_rows), (
        f"stream emitted too few signups: {len(s_rows)}/{len(b_rows)}"
    )


def test_stream_session_window_subset_of_batch(spark, sf_dir, events_path):
    """Watermarked session windows (30-minute gap) in append mode:
    every emitted session must match the batch sessionization exactly
    (the last, never-watermark-closed session per user may be
    withheld)."""
    sessions = (
        read_event_stream(spark, events_path)
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
    streamed = run_stream_to_memory(spark, sessions, "t_session")
    batch = {
        tuple(r)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
        .collect()
    }
    s_rows = [tuple(r) for r in streamed.collect()]
    assert s_rows, "no sessions emitted"
    missing = [r for r in s_rows if r not in batch]
    assert not missing, f"stream sessions disagree with batch: {missing[:3]}"
    assert len(s_rows) >= 0.5 * len(batch), "stream emitted too few sessions"


def test_checkpoint_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Checkpointed recovery: a streaming query stopped after
    consuming the first file and RESTARTED from the same checkpoint
    over a grown input directory must process each input row exactly
    once — the committed-offsets contract every production pipeline
    leans on, which the memory-sink tests never exercise."""
    import pyarrow.parquet as pq

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), str(src_dir / "part1.parquet"))

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == half
    # grow the input AFTER the first run committed its offsets
    pq.write_table(tbl.slice(half), str(src_dir / "part2.parquet"))
    run_once()
    result = spark.read.parquet(out)
    assert result.count() == tbl.num_rows, "restart duplicated or dropped rows"
    assert (
        result.select("event_id").distinct().count() == tbl.num_rows
    ), "event_ids duplicated across restart"


def test_stream_anomalies_match_batch(spark, sf_dir, events_path):
    """The stateful trailing-deque anomaly scorer, replayed in order
    over the finite stream, must emit exactly the batch twin's rows
    (same int-exact sums, same IEEE expression tree)."""
    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import stream_user_anomalies

    out = run_stream_to_memory(
        spark,
        stream_user_anomalies(read_event_stream(spark, events_path)),
        "t_anom",
        mode="append",
    )
    streamed = sorted(tuple(r) for r in out.collect())
    batch = sorted(
        tuple(r)
        for r in QUERIES["s_anomaly_zscore"].builder(spark, sf_dir).collect()
    )
    assert len(batch) > 0
    assert streamed == batch


def test_stream_counter_increase_match_batch(spark, sf_dir, events_path):
    """The stateful counter-increase twin, replayed over the finite
    stream, must end at exactly the batch aggregate per user (pure
    int64 arithmetic on both paths — bit-for-bit, last emission per
    user wins)."""
    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_counter_increase,
    )

    out = run_stream_to_memory(
        spark,
        stream_counter_increase(read_event_stream(spark, events_path)),
        "t_ctr",
        mode="append",
    )
    # append mode emits one totals row per (user, micro-batch); the
    # final state is each user's LAST emission — n_samples is
    # monotone, so max-by works without batch ids
    latest = {}
    for r in out.collect():
        cur = latest.get(r.user_id)
        if cur is None or r.n_samples > cur[0]:
            latest[r.user_id] = (r.n_samples, r.increase_micro, r.n_resets)
    batch = {
        r.user_id: (r.n_samples, r.increase_micro, r.n_resets)
        for r in QUERIES["s_counter_increase"].builder(spark, sf_dir).collect()
    }
    assert batch
    assert latest == batch


def test_stream_time_weighted_avg_match_batch(spark, sf_dir, events_path):
    """The stateful TWA twin, replayed over the finite stream, must
    end at exactly the batch aggregate per user (int64 durations,
    arbitrary-precision weighted sums — bit-for-bit; last emission
    per user wins, n_intervals is monotone)."""
    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_time_weighted_avg,
    )

    out = run_stream_to_memory(
        spark,
        stream_time_weighted_avg(read_event_stream(spark, events_path)),
        "t_twa",
        mode="append",
    )
    latest = {}
    for r in out.collect():
        cur = latest.get(r.user_id)
        if cur is None or r.n_intervals > cur[0]:
            latest[r.user_id] = (r.n_intervals, r.total_dur_us, r.twa)
    batch = {
        r.user_id: (r.n_intervals, r.total_dur_us, r.twa)
        for r in QUERIES["s_time_weighted_avg"].builder(spark, sf_dir).collect()
    }
    assert batch
    assert latest == batch


def test_stream_session_window_subset_of_batch(spark, sf_dir, events_path):
    """Native streaming session windows (30-min gap, watermarked,
    append mode): every emitted CLOSED session must agree exactly
    with the batch twin's session for that (user, start) — the
    watermark only withholds sessions near the stream's end, it
    never changes a closed session's contents."""
    from mcp_iceberg_duckdb_spark.sources.tables import load

    sess = (
        read_event_stream(spark, events_path)
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
    streamed = run_stream_to_memory(spark, sess, "t_sess", mode="append")
    batch = {
        (r.user_id, r.session_start): r.n_events
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
        .collect()
    }
    s_rows = streamed.collect()
    assert s_rows, "no closed sessions emitted"
    for r in s_rows:
        assert batch.get((r.user_id, r.session_start)) == r.n_events, (
            f"closed session {(r.user_id, r.session_start)} disagrees"
        )
    # the stream must close the overwhelming majority of sessions
    assert len(s_rows) >= 0.8 * len(batch)


def test_stream_trending_decay_match_batch(spark, sf_dir, events_path):
    """The trending-decay twin: replay the finite stream through the
    day-bucketed count-ring state, re-anchor the final per-user rings
    to the global max day (trending_from_state — the leaderboard
    read), and the result must equal the batch operator bit-for-bit
    (pure integer weights on both paths; last emission per user wins,
    n_events is monotone)."""
    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_trending_decay,
        trending_from_state,
    )

    out = run_stream_to_memory(
        spark,
        stream_trending_decay(read_event_stream(spark, events_path)),
        "t_trend",
        mode="append",
    )
    latest = {}
    for r in out.collect():
        cur = latest.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            latest[r.user_id] = (r.n_events, r.anchor_day, r.counts)
    states = spark.createDataFrame(
        [
            (u, anchor, n, list(cs))
            for u, (n, anchor, cs) in latest.items()
        ],
        schema="user_id long, anchor_day long, n_events long, counts array<long>",
    )
    streamed = [tuple(r) for r in trending_from_state(states).collect()]
    batch = [
        tuple(r)
        for r in QUERIES["s_trending_decay"].builder(spark, sf_dir).collect()
    ]
    assert batch
    assert streamed == batch


def test_stream_mix_drift_match_batch(spark, sf_dir, events_path):
    """The mix-drift twin: the streamed watermarked (day, type)
    counters, finalized at read time against the batch baseline mix
    via the SHARED mix_drift_finalize, must reproduce the batch
    operator's drift rows bit-for-bit (complete mode — the counter
    table IS the state)."""
    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        mix_drift_finalize,
        stream_mix_drift_daily_counts,
    )

    counts = run_stream_to_memory(
        spark,
        stream_mix_drift_daily_counts(read_event_stream(spark, events_path)),
        "t_drift",
        mode="complete",
    )
    # detach from the memory-sink view: finalize self-joins the counts
    # (day totals), and Spark cannot dedup conflicting attribute refs
    # over a MemoryPlan (INTERNAL_ERROR) — a quirk of the test sink,
    # not of the operator (parquet/Kafka-backed counts dedup fine)
    counts = spark.createDataFrame(counts.collect(), schema=counts.schema)
    e = load(spark, sf_dir, "events")
    glob = e.groupBy("event_type").agg(F.count("*").alias("g"))
    glob_tot = e.agg(F.count("*").cast("bigint").alias("gn"))
    streamed = sorted(
        tuple(r)
        for r in mix_drift_finalize(counts, glob, glob_tot).collect()
    )
    batch = sorted(
        tuple(r)
        for r in QUERIES["s_mix_drift"].builder(spark, sf_dir).collect()
    )
    assert batch
    assert streamed == batch


def test_stream_hll_registers_match_batch(spark, sf_dir, events_path):
    """Rolling-HLL twin: registers maintained by the streaming max
    aggregation, finalized by the SAME read-time merge as the batch
    operator, must reproduce the batch rolled output bit-for-bit
    (max is associative + idempotent, so micro-batch order and
    re-delivery cannot move a register)."""
    from mcp_iceberg_duckdb_spark.operators.textops import (
        hll_rolling_from_registers,
    )
    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_hll_day_registers,
    )

    regs = run_stream_to_memory(
        spark,
        stream_hll_day_registers(read_event_stream(spark, events_path)),
        "t_hll",
        mode="complete",
    )
    regs = spark.createDataFrame(regs.collect(), schema=regs.schema)
    du = (
        load(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), F.col("user_id").alias("k"))
        .distinct()
    )
    streamed = sorted(
        tuple(r)
        for r in hll_rolling_from_registers(spark, regs, du).collect()
    )
    batch = sorted(
        tuple(r)
        for r in QUERIES["x_sketch_hll_rolling"].builder(spark, sf_dir).collect()
    )
    assert batch
    assert streamed == batch


def test_stream_cdc_apply_match_batch(spark, sf_dir, events_path):
    """CDC twin: the streamed latest-change state (3-int64 CAS per
    key), applied against the batch base snapshot via the SHARED
    cdc_apply, must reproduce the batch MERGE result bit-for-bit
    (latest-wins is the total (ts, event_id) order on both paths)."""
    from pyspark.sql import Window

    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        _CDC_CUT,
        cdc_apply,
        stream_cdc_latest_state,
    )

    out = run_stream_to_memory(
        spark,
        stream_cdc_latest_state(read_event_stream(spark, events_path)),
        "t_cdc",
        mode="append",
    )
    latest = {}
    for r in out.collect():
        cur = latest.get(r.user_id)
        if cur is None or (r.ts_us, r.event_id) > cur[:2]:
            latest[r.user_id] = (r.ts_us, r.event_id, r.vq)
    chg = spark.createDataFrame(
        [(u, vq) for u, (_, _, vq) in latest.items()],
        schema="c_user long, c_vq long",
    )
    e = load(spark, sf_dir, "events")
    q = e.where(
        (F.col("event_type") == "purchase")
        & (F.col("ts") < F.expr(_CDC_CUT))
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("vq"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        q.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("user_id").alias("b_user"), F.col("vq").alias("b_vq"))
    )
    streamed = sorted(tuple(r) for r in cdc_apply(base, chg).collect())
    batch = sorted(
        tuple(r)
        for r in QUERIES["s_cdc_upsert_apply"].builder(spark, sf_dir).collect()
    )
    assert batch
    assert streamed == batch


def test_stream_watermark_lateness_match_batch(spark, sf_dir, events_path):
    """Lateness-profiler twin: the per-user hwm state machine, replayed
    over the finite stream in the planted md5 arrival disorder, must
    reproduce (a) per user, the batch window's lateness stats, and
    (b) merged, the batch op's decomposable global fields — both
    bit-for-bit (pure int64 lateness arithmetic on both paths). The
    non-mergeable p99 stays batch-only by design."""
    from pyspark.sql import Window

    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_watermark_lateness,
    )

    out = run_stream_to_memory(
        spark,
        stream_watermark_lateness(read_event_stream(spark, events_path)),
        "t_wml",
        mode="append",
    )
    latest = {}
    for r in out.collect():
        cur = latest.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            latest[r.user_id] = (
                r.n_events,
                r.n_late,
                r.max_late_us,
                r.n_beyond_10min_watermark,
            )
    # batch per-user recomputation: the SAME planted-arrival window as
    # the registered op, grouped by user instead of globally
    e = load(spark, sf_dir, "events")
    arr_key = F.md5(F.concat(F.lit("arr:"), F.col("event_id").cast("string")))
    w = (
        Window.partitionBy("user_id")
        .orderBy(arr_key, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lat = e.select(
        "user_id",
        F.greatest(
            F.unix_micros(F.max("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("late_us"),
    )
    batch = {
        r.user_id: (r.n, r.n_late, r.max_late, r.n_beyond)
        for r in lat.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.count_if(F.col("late_us") > 0).alias("n_late"),
            F.max("late_us").cast("bigint").alias("max_late"),
            F.count_if(F.col("late_us") > 600_000_000).alias("n_beyond"),
        )
        .collect()
    }
    assert batch
    assert latest == batch
    # merged emissions == the registered op's decomposable fields
    g = QUERIES["s_watermark_lateness"].builder(spark, sf_dir).collect()[0]
    assert sum(v[0] for v in latest.values()) == g.n_events
    assert sum(v[1] for v in latest.values()) == g.n_late
    assert max(v[2] for v in latest.values()) == g.max_late_us
    assert (
        sum(v[3] for v in latest.values()) == g.n_beyond_10min_watermark
    )


def test_stateful_twin_on_rocksdb_state_store(spark, sf_dir, events_path):
    """The 100 TB state story: HDFS-backed in-memory state store keeps
    every key's state on the JVM heap; RocksDBStateStoreProvider
    (bundled rocksdbjni) spills state to local SSD, so streaming state
    can exceed executor memory. The counter twin must produce the SAME
    bit-exact batch-matching totals under both providers — state-store
    choice is an ops knob, never a semantics change."""
    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_counter_increase,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = run_stream_to_memory(
            spark,
            stream_counter_increase(read_event_stream(spark, events_path)),
            "t_ctr_rocks",
            mode="append",
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    latest = {}
    for r in out.collect():
        cur = latest.get(r.user_id)
        if cur is None or r.n_samples > cur[0]:
            latest[r.user_id] = (r.n_samples, r.increase_micro, r.n_resets)
    batch = {
        r.user_id: (r.n_samples, r.increase_micro, r.n_resets)
        for r in QUERIES["s_counter_increase"].builder(spark, sf_dir).collect()
    }
    assert batch
    assert latest == batch


def test_transform_with_state_matches_v1_and_batch(spark, sf_dir, events_path):
    """Spark 4 StatefulProcessor (transformWithStateInPandas, RocksDB
    state store mandatory) must reproduce the applyInPandasWithState
    counter twin's totals AND the batch aggregate bit-for-bit — the
    two stateful API generations are semantically interchangeable for
    this operator family.

    Env-gated like test_iceberg_live: the API's state-server protocol
    runs over protobuf, which this container lacks (and installs are
    off-limits) — the operator itself is a pure pyspark surface, so
    the skip documents readiness, not a stub."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol needs protobuf",
    )
    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_counter_increase_tws,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = run_stream_to_memory(
            spark,
            stream_counter_increase_tws(read_event_stream(spark, events_path)),
            "t_ctr_tws",
            mode="append",
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    latest = {}
    for r in out.collect():
        cur = latest.get(r.user_id)
        if cur is None or r.n_samples > cur[0]:
            latest[r.user_id] = (r.n_samples, r.increase_micro, r.n_resets)
    batch = {
        r.user_id: (r.n_samples, r.increase_micro, r.n_resets)
        for r in QUERIES["s_counter_increase"].builder(spark, sf_dir).collect()
    }
    assert batch
    assert latest == batch


def test_stream_minhash_sigs_match_batch(spark, sf_dir, tmp_path):
    """MinHash-signature twin: per-source signatures maintained by the
    streaming min aggregation over THREE micro-batches (corpus staged
    as 3 files, maxFilesPerTrigger=1) must equal the batch signatures
    bit-for-bit — including that the stream side runs with NO
    distinct() (min over the multiset == min over the set), the
    property that lets 100 TB signature maintenance carry no dedup
    state."""
    from mcp_iceberg_duckdb_spark.operators.textops import minhash_part_sigs
    from mcp_iceberg_duckdb_spark.streaming.events import (
        run_stream_to_memory,
        stream_minhash_source_sigs,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    stage = tmp_path / "docs_stream"
    docs.withColumn("chunk", F.col("doc_id") % 3).repartition(
        "chunk"
    ).write.partitionBy("chunk").parquet(str(stage))
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(stage))
    )
    streamed = run_stream_to_memory(
        spark, stream_minhash_source_sigs(stream), "t_mh", mode="complete"
    )
    got = sorted(tuple(r) for r in streamed.collect())
    from mcp_iceberg_duckdb_spark.functions.textfns import word_shingles

    sh = docs.select(
        "source", F.explode(word_shingles("text", 3)).alias("sh")
    ).distinct()
    want = sorted(tuple(r) for r in minhash_part_sigs(sh, "source").collect())
    assert want
    assert got == want


def test_stream_session_pattern_match_batch(spark, sf_dir, events_path):
    """The CEP state-machine twin, replayed over the finite stream,
    must roll up to exactly the batch s_session_pattern_match
    answer: same total session count, same per-pattern matched
    count (last emission per user wins; n_events is monotone)."""
    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        _CEP_PATTERNS,
        stream_session_pattern_match,
    )

    out = run_stream_to_memory(
        spark,
        stream_session_pattern_match(read_event_stream(spark, events_path)),
        "t_cep",
        mode="append",
    )
    latest = {}
    for r in out.collect():
        cur = latest.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            latest[r.user_id] = (
                r.n_events,
                r.n_sessions,
                tuple(r[f"m{i}"] for i in range(len(_CEP_PATTERNS))),
            )
    n_sessions = sum(v[1] for v in latest.values())
    matched = [
        sum(v[2][i] for v in latest.values())
        for i in range(len(_CEP_PATTERNS))
    ]
    batch = {
        r.pattern: (r.n_sessions, r.n_matched)
        for r in QUERIES["s_session_pattern_match"]
        .builder(spark, sf_dir)
        .collect()
    }
    for i, (name, _rx) in enumerate(_CEP_PATTERNS):
        assert batch[name][0] == n_sessions, (name, batch[name], n_sessions)
        assert batch[name][1] == matched[i], (name, batch[name], matched[i])


def test_stream_value_drift_match_batch(spark, sf_dir, events_path):
    """The value-drift twin: streamed watermarked (day, value-bucket)
    counters, finalized at read time against the batch-derived
    reference grid via the SHARED value_drift_finalize, must
    reproduce the batch operator's per-day PSI rows bit-for-bit
    (complete mode — the counter table IS the state; counts are
    mergeable, PSI is recomputed on every refresh)."""
    from mcp_iceberg_duckdb_spark.registry import QUERIES
    from mcp_iceberg_duckdb_spark.streaming.events import (
        stream_value_drift_daily_counts,
        value_drift_finalize,
    )

    counts = run_stream_to_memory(
        spark,
        stream_value_drift_daily_counts(read_event_stream(spark, events_path)),
        "t_vdrift",
        mode="complete",
    )
    counts = spark.createDataFrame(counts.collect(), schema=counts.schema)
    e = load(spark, sf_dir, "events")
    v = e.select(F.expr("CAST(floor(value / 16) AS BIGINT)").alias("vb"))
    ref = v.groupBy("vb").agg(F.count("*").cast("long").alias("c_ref"))
    tot = v.agg(F.count("*").cast("long").alias("n_tot")).crossJoin(
        F.broadcast(ref.agg(F.count("*").cast("long").alias("nb")))
    )
    streamed = sorted(
        tuple(r) for r in value_drift_finalize(counts, ref, tot).collect()
    )
    batch = sorted(
        tuple(r)
        for r in QUERIES["s_value_drift_daily"].builder(spark, sf_dir).collect()
    )
    assert batch
    assert streamed == batch
