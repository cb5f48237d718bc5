"""Streaming operators over the `events` table schema.

Each transform takes an unbounded DataFrame (from ``events_stream`` or
any ``readStream``) and returns an unbounded DataFrame; sinks are the
caller's choice (tests use the memory sink with ``availableNow``; the
production shape is ``foreach_batch_sync`` → TableStore, mirroring the
reference's per-period transactional commit /root/reference/app/
main.py:342-379).

Scale notes: every stateful op here is keyed, so state shards across
executors; watermarks bound state size (G5 — the reference's only
late-data tolerance is a 3-block ≈ 2-minute tip buffer,
/root/reference/app/db/postgres.py:264-272, which we generalize).
"""

from __future__ import annotations

from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _parquet_ts_unit(
    directory: str, col: str = "ts", probe_files: int = 3
) -> str | None:
    """Probe part-file footers for `col`'s physical layout, mirroring
    the batch catalog (sources/catalog.py:_nanos_timestamp_cols):

    - ``"ns"``     — TIMESTAMP(NANOS): Spark only reads it as int64 via
      the ``nanosAsLong`` conf; we restore micros ourselves;
    - ``"us_ltz"`` — µs/ms, isAdjustedToUTC → Spark TimestampType;
    - ``"us_ntz"`` — µs/ms, no timezone → Spark TimestampNTZType
      (the layout Spark itself writes by default for NTZ data);
    - ``None``     — no files yet (a legal file-source starting state;
      caller falls back to ``ts_unit`` or the Spark-native default).

    Up to ``probe_files`` footers are checked (evenly spaced in name
    order, first and last always included — cheap, and name order is
    how the file source discovers them): a directory whose writers disagree on
    the unit would otherwise be silently misread through the single
    forced schema, so disagreement raises instead. A non-timestamp
    layout (e.g. raw int64 from a non-Spark writer) also raises here,
    at probe time, rather than as a confusing schema mismatch at read
    time — pass ``ts_unit`` explicitly to override.
    """
    import os

    import pyarrow.parquet as pq
    import pyarrow.types as pat

    if not os.path.isdir(directory):
        return None
    parts = sorted(
        f
        for f in os.listdir(directory)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    if not parts:
        return None
    if len(parts) <= probe_files:
        sample = parts
    else:
        # evenly spaced across name order, first and last always included
        step = (len(parts) - 1) / max(1, probe_files - 1)
        sample = [parts[round(i * step)] for i in range(probe_files)]

    def unit_of(part: str) -> str | None:
        schema = pq.read_schema(os.path.join(directory, part))
        if col not in schema.names:
            return None
        t = schema.field(col).type
        if not pat.is_timestamp(t):
            raise ValueError(
                f"{directory}/{part}: column {col!r} has non-timestamp "
                f"parquet type {t} — pass ts_unit explicitly"
            )
        if str(t).startswith("timestamp[ns"):
            return "ns"
        return "us_ltz" if t.tz is not None else "us_ntz"

    units = {part: unit_of(part) for part in sample}
    distinct = {u for u in units.values() if u is not None}
    if len(distinct) > 1:
        raise ValueError(
            f"{directory}: part files disagree on {col!r}'s timestamp "
            f"layout ({units}) — a single stream schema cannot read "
            "both; split the directory or rewrite the outliers"
        )
    return next(iter(distinct), None)


def _events_schema(ts_type: DataType) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


DEFAULT_WATERMARK = "2 minutes"  # the reference's 3-block tip buffer


def events_stream(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
    ts_unit: str | None = None,
) -> DataFrame:
    """File-source stream over a directory of events-shaped parquet.

    New files appearing in `directory` are the stream (the reference's
    "new rows past the tip"). ``maxFilesPerTrigger`` bounds micro-batch
    size like PANTASIA_TIME_INTERVAL bounds period size (G2).

    The timestamp physical unit is probed from the first part file's
    footer (ns vs µs, NTZ vs UTC-adjusted) so the stream reads the same
    wall times as the batch catalog regardless of which writer produced
    the directory. When the directory is empty at ``readStream`` time,
    pass ``ts_unit`` explicitly ("ns" | "us_ntz" | "us_ltz"); default is
    "us_ntz", the layout Spark itself writes.

    The emitted ``ts`` is always TimestampType: Spark's event-time
    watermark rejects TIMESTAMP_NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE),
    so NTZ input is cast under the pinned UTC session — wall times are
    bit-identical, and every downstream watermark/window works."""
    if ts_unit is None:
        ts_unit = _parquet_ts_unit(directory) or "us_ntz"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if ts_unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _events_schema(LongType())
    elif ts_unit == "us_ltz":
        schema = _events_schema(TimestampType())
    elif ts_unit == "us_ntz":
        schema = _events_schema(TimestampNTZType())
    else:
        raise ValueError(f"unknown ts_unit {ts_unit!r}")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(directory)
    if ts_unit == "ns":
        # integer DIV matches the batch catalog exactly (no float rounding)
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    elif ts_unit == "us_ntz":
        # NTZ → LTZ under UTC: same wall time, watermark-legal type
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_window_counts(
    events: DataFrame,
    window: str = "120 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """G2 — the 120-minute period aggregation as a native tumbling
    event-time window; watermark lets Spark emit+drop finished windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("period_start"),
            F.col("w.end").alias("period_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "120 minutes",
    slide: str = "60 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Sliding-window extension (each event lands in window/slide buckets)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("period_start"),
            F.col("w.end").alias("period_end"),
            "n_events",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Session-window extension: per-user activity bursts separated by
    `gap` of silence (no fixed-width analogue in the reference)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame, keys: Iterable[str] = ("event_id",), watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """G5 — replay idempotence with bounded state: duplicates arriving
    within the watermark horizon are dropped, state older than the
    watermark is evicted (the 100 TB-safe version of IdIndex dedup,
    /root/reference/app/db/id_index.py:22-25)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def _latest_state_schema(ts_type: DataType) -> StructType:
    """Output schema follows the input's ts type (LTZ vs NTZ) so the
    streaming result compares type-exactly against its batch twin."""
    return StructType(
        [
            StructField("user_id", LongType()),
            StructField("last_ts", ts_type),
            StructField("last_event_type", StringType()),
            StructField("last_value", DoubleType()),
            StructField("n_events", LongType()),
        ]
    )


def _latest_state_fn(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
):
    """Keep the argmax-by-ts row per key across micro-batches."""
    if state.exists:
        ts, etype, val, n = state.get
    else:
        ts, etype, val, n = None, None, None, 0
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        top = pdf.loc[pdf["ts"].idxmax()]
        if ts is None or top["ts"] > ts:
            ts, etype, val = top["ts"], top["event_type"], float(top["value"])
    state.update((ts, etype, val, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "last_ts": [ts],
            "last_event_type": [etype],
            "last_value": [val],
            "n_events": [n],
        }
    )


def latest_state_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """D3 as a custom stateful streaming operator: current-state-per-key
    (the reference's `current_wallet_id` / `asset_ext` tracking,
    /root/reference/app/main.py:226-248,290-315) via
    ``applyInPandasWithState`` — keyed state shards across executors;
    no driver dict."""
    ts_type = events.schema["ts"].dataType
    ts_ddl = "timestamp_ntz" if isinstance(ts_type, TimestampNTZType) else "timestamp"
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _latest_state_fn,
            outputStructType=_latest_state_schema(ts_type),
            stateStructType=f"last_ts {ts_ddl}, last_event_type string, "
            "last_value double, n_events bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _RUNNING_STATE_SCHEMA = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    class _RunningTotalsProcessor(StatefulProcessor):
        """Per-key running count + sum via the transformWithState API —
        the arbitrary-state successor to applyInPandasWithState (typed
        value/list/map state cells, timers, TTL). State is a typed
        ValueState cell, sharded by key across executors."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _RUNNING_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover - older Spark
    _RunningTotalsProcessor = None


_RUNNING_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas``
    (Spark 4 arbitrary-state API). Update mode: each micro-batch emits
    the new running value per touched key.

    GATED, not exercised by tests/queries in this environment: the API's
    driver-side runner needs a working ``google.protobuf``, absent from
    this container (crashes with STREAMING_PYTHON_RUNNER_INITIALIZATION_
    FAILURE). ``latest_state_stream`` (applyInPandasWithState) is the
    tested custom-stateful path; this is the forward-looking variant."""
    if _RunningTotalsProcessor is None:
        raise NotImplementedError("transformWithStateInPandas needs Spark >= 4.0")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as ex:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf (the state "
            "protocol's driver runner imports it); not installed here — "
            "verified 2026-08: the query plans but the runner crashes with "
            "STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. Re-verified "
            "2026-08-14 (round 8): `import google` still fails and the "
            "sandbox forbids package installs, so this gate is permanent "
            "for this environment; applyInPandasWithState remains the "
            "tested stateful path"
        ) from ex
    return events.groupBy("user_id").transformWithStateInPandas(
        _RunningTotalsProcessor(),
        outputStructType=_RUNNING_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def foreach_batch_sync(
    events: DataFrame,
    checkpoint_dir: str,
    batch_writer: Callable[[DataFrame, int], None],
    processing_time: str | None = None,
    available_now: bool = False,
):
    """A8/G3/G6 — the per-period transactional commit as ``foreachBatch``.

    `batch_writer(df, batch_id)` runs once per micro-batch with
    exactly-once replay semantics from the checkpoint (a re-delivered
    batch keeps its batch_id, so idempotent writers — e.g.
    TableStore.append(commit_id=batch_id) — dedupe naturally; the
    reference gets the same property from `pantasia_tip` resume,
    /root/reference/app/db/postgres.py:280-312). Returns the running
    StreamingQuery; caller stops it (G6)."""
    writer = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda df, bid: batch_writer(df, bid))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
