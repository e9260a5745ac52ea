"""Event-stream analytics in batch form: sessionization and tumbling
windows (the batch twins of the streaming module's windowed aggs).

Sessionization is the classic gap-based window chain: ``lag(ts)`` over
(user, ts) → boundary flag when the gap exceeds the timeout → running
sum of boundaries = session index. Two window passes over one shuffle
(both windows share the partitioning key), fully codegen'd.

Scale: partitioned by user_id — the natural key; Zipf-heavy users are
handled by AQE skew splitting since sessions never cross users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def _epoch_sec(col_name: str):
    """Seconds since the naive epoch — timezone-free (the events table
    carries TIMESTAMP_NTZ; a cast-to-long or unix_timestamp would drag
    the session timezone in, diverging from DuckDB's epoch())."""
    return F.expr(
        f"timestampdiff(SECOND, to_timestamp_ntz('1970-01-01 00:00:00'), {col_name})"
    ).cast("long")


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """(event_id, user_id, session_idx): 0-based session index per
    user; a new session starts when the gap from the previous event
    exceeds ``gap_minutes``. Ties on ts are broken by event_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = gap_minutes * 60
    boundary = (
        F.when(F.col("prev_ts").isNull(), F.lit(0))
        .when(_epoch_sec("ts") - _epoch_sec("prev_ts") > gap_sec, F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("boundary", boundary)
        .withColumn(
            "session_idx",
            F.sum("boundary").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("long"),
        )
        .select("event_id", "user_id", "session_idx")
    )


def sessionize_sql(gap_minutes: int = SESSION_GAP_MIN) -> str:
    gap_sec = gap_minutes * 60
    return f"""
SELECT event_id, user_id,
  CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
  AS session_idx
FROM (
  SELECT event_id, user_id, ts,
    CASE WHEN prev_ts IS NULL THEN 0
         WHEN epoch(ts) - epoch(prev_ts) > {gap_sec} THEN 1
         ELSE 0 END AS boundary
  FROM (
    SELECT event_id, user_id, ts,
      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
  )
)"""


def tumbling_window_stats(events: DataFrame, hours: int = 1) -> DataFrame:
    """Events + mean value per (tumbling ts window, event_type) — the
    batch twin of streaming.windowed_turn_counts. Window start is
    epoch-floored so both engines compute it identically."""
    secs = hours * 3600
    win = (F.floor(_epoch_sec("ts") / secs) * secs).cast("long")
    # value is summed in exact integer cents: a double SUM is
    # accumulation-order-dependent and would differ across engines
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        events.withColumn("window_start_epoch", win)
        .withColumn("cents", cents)
        .groupBy("window_start_epoch", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("sum_value_cents"),
        )
    )


def tumbling_window_stats_sql(hours: int = 1) -> str:
    secs = hours * 3600
    return f"""
SELECT CAST(FLOOR(epoch(ts) / {secs}) * {secs} AS BIGINT) AS window_start_epoch,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events
GROUP BY 1, 2"""
