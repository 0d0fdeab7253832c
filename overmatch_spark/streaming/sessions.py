"""Gap-based sessionization (§2.8 extension — the reference has no
event-time semantics; this is the engine's standard custom stateful
streaming operator).

Rule: per user, events ordered by (ts, event_id); a gap of more than
`gap_us` microseconds since the previous event starts a new session
(1-based session_idx).

Two forms with IDENTICAL semantics (equality-tested):
  - `sessionize_batch`: pure window functions (lag -> gap flag ->
    running sum). This is the DuckDB-oracle-checkable form and the
    backfill path at 100 TB (one shuffle on user_id).
  - `sessionize_stream`: Structured Streaming via
    applyInPandasWithState — per-user state carries (last_ts_us,
    session_idx) across micro-batches, so an unbounded stream gets
    the same assignment as the batch form provided each user's
    events arrive in event-time order across batches (the engine's
    ingest contract; out-of-order arrivals within a micro-batch are
    sorted before application).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, event_id long, ts_us long, session_idx long"
)
STATE_SCHEMA = "last_ts_us long, session_idx long"


def sessionize_batch(events: DataFrame, gap_us: int = 1_800_000_000) -> DataFrame:
    """(user_id, event_id, ts_us, session_idx) for every event."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    # NTZ -> TZ cast: the engine pins session TZ to UTC, so the
    # epoch matches DuckDB epoch_us exactly
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = events.select(
        "user_id", "event_id", ts_us.alias("ts_us")
    )
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    new_sess = F.when(gap.isNull() | (gap > F.lit(gap_us)), 1).otherwise(0)
    return base.withColumn(
        "session_idx",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def sql_sessionize_batch(gap_us: int = 1_800_000_000) -> str:
    """DuckDB CTE text computing the same per-event assignment from
    the `events` view."""
    return f"""
        base AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        ),
        flagged AS (
          SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                          OR ts_us - lag(ts_us) OVER w > {gap_us}
                     THEN 1 ELSE 0 END AS new_sess
          FROM base
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        ),
        sessions AS (
          SELECT user_id, event_id, ts_us,
                 CAST(sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING
                 ) AS BIGINT) AS session_idx
          FROM flagged
        )"""


def sessionize_stream(events: DataFrame,
                      gap_us: int = 1_800_000_000) -> DataFrame:
    """Streaming sessionization: applyInPandasWithState keeps
    (last_ts_us, session_idx) per user. Input must be a streaming
    DataFrame with (user_id long, event_id long, ts timestamp)."""
    import numpy as np
    import pandas as pd

    def assign(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, sess = state.get
        else:
            last_ts, sess = None, 0
        # applyInPandasWithState may deliver a group's micro-batch as
        # MULTIPLE Arrow chunks with no cross-chunk order guarantee —
        # materialize them all before the single sort, otherwise a
        # >maxRecordsPerBatch group gets chunk-local ordering.
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            yield pd.DataFrame(
                columns=["user_id", "event_id", "ts_us", "session_idx"]
            )
            return
        pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
        pdf = pdf.sort_values(["ts_us", "event_id"])
        ts = pdf["ts_us"].to_numpy(np.int64)
        # Vectorized gap rule: flag[i] = (ts[i] - prev[i]) > gap_us,
        # with the first element seeded from carried state.
        flags = np.empty(len(ts), dtype=np.int64)
        flags[0] = 1 if last_ts is None else int(ts[0] - last_ts > gap_us)
        flags[1:] = (ts[1:] - ts[:-1]) > gap_us
        session_idx = sess + np.cumsum(flags)
        sess = int(session_idx[-1])
        last_ts = int(ts[-1])
        state.update((last_ts, sess))
        yield pd.DataFrame({
            "user_id": np.full(len(ts), user_id, dtype=np.int64),
            "event_id": pdf["event_id"].to_numpy(np.int64),
            "ts_us": ts,
            "session_idx": session_idx,
        })

    prepared = events.select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
