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


# ------------------------------------------------------------ retention

WEEK_SEC = 7 * 24 * 3600


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention curve: users are cohorted by their first
    activity week (epoch-floored — identical in both engines), and
    each later active week counts toward that week offset. Output
    (week_offset, n_users) with n_users = distinct users active
    ``offset`` weeks after their own first week.

    Two aggregations on the uniform user key (first week, then
    distinct active weeks) and one distinct count keyed on the small
    (user, offset) domain — all integer arithmetic, map-side
    combinable, no window."""
    wk = F.floor(_epoch_sec("ts") / WEEK_SEC).cast("long")
    first = events.groupBy("user_id").agg(F.min(wk).alias("w0"))
    active = events.select("user_id", wk.alias("w")).distinct()
    return (
        active.join(first, "user_id")
        .select("user_id", (F.col("w") - F.col("w0")).alias("week_offset"))
        .groupBy("week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def cohort_retention_sql() -> str:
    return f"""
WITH first AS (
  SELECT user_id, MIN(CAST(FLOOR(epoch(ts) / {WEEK_SEC}) AS BIGINT)) AS w0
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / {WEEK_SEC}) AS BIGINT) AS w
  FROM events
)
SELECT a.w - f.w0 AS week_offset, COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN first f ON f.user_id = a.user_id
GROUP BY a.w - f.w0"""


# --------------------------------------------------------------- funnel

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_stages(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered funnel analysis: per user, the earliest time each step
    can be completed GIVEN the previous step happened strictly earlier
    (the classic strictly-increasing-timestamp funnel). Output one row
    per funnel stage: (stage, step, n_users) — how many users reached
    that stage.

    Spark-first shape: no sequence-pattern UDF and no window over the
    whole event stream — stage k is one conditional min-aggregate per
    user (``min(ts) where type = step_k and ts > t_{k-1}``) joined
    back on user_id, i.e. len(steps) small map-side-combinable
    aggregations over the (uniform) user key. Ties on the boundary are
    strict (a click at exactly the view's timestamp does not count) —
    the same rule in the SQL oracle."""
    per_user = None
    prev_col = None
    for i, step in enumerate(steps):
        ev = events.filter(F.col("event_type") == step).select("user_id", "ts")
        if per_user is None:
            agg = ev.groupBy("user_id").agg(F.min("ts").alias(f"t{i}"))
            per_user = agg
        else:
            joined = ev.join(
                per_user.select("user_id", prev_col), "user_id"
            ).filter(F.col("ts") > F.col(prev_col))
            agg = joined.groupBy("user_id").agg(F.min("ts").alias(f"t{i}"))
            per_user = per_user.join(agg, "user_id", "left")
        prev_col = f"t{i}"

    counts = per_user.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("int").alias("stage"),
                        F.lit(step).alias("step"),
                        F.col(f"n{i}").alias("n_users"),
                    )
                    for i, step in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.stage", "r.step", "r.n_users")


def funnel_stages_sql(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    ctes = []
    for i, step in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events "
                f"WHERE event_type = '{step}' GROUP BY user_id)"
            )
        else:
            ctes.append(f"""
s{i} AS (
  SELECT e.user_id, MIN(e.ts) AS t{i}
  FROM events e JOIN s{i - 1} p ON p.user_id = e.user_id
  WHERE e.event_type = '{step}' AND e.ts > p.t{i - 1}
  GROUP BY e.user_id
)""")
    selects = [
        f"SELECT CAST({i + 1} AS INTEGER) AS stage, '{step}' AS step, "
        f"(SELECT COUNT(*) FROM s{i}) AS n_users"
        for i, step in enumerate(steps)
    ]
    return (
        "WITH " + ",\n".join(c.strip() for c in ctes) + "\n"
        + "\nUNION ALL\n".join(selects)
    )


# ------------------------------------------------------------ as-of join

ASOF_LEFT_TYPE = "click"
ASOF_RIGHT_TYPE = "view"


def asof_join(
    events: DataFrame,
    left_type: str = ASOF_LEFT_TYPE,
    right_type: str = ASOF_RIGHT_TYPE,
) -> DataFrame:
    """As-of join — an operator Spark's DataFrame API lacks: for each
    ``left_type`` event, the most recent ``right_type`` event of the
    same user with ``right.ts <= left.ts`` (inclusive). Output
    (l_event_id, user_id, l_ts, l_value, r_event_id, r_value);
    unmatched lefts keep NULL right columns (left semantics).

    Spark-first shape: NOT a join at all. A naive formulation
    (``right.ts <= left.ts`` + per-left max) plans as a broadcast
    nested loop plus a re-aggregation; instead both streams union into
    one (user_id)-partitioned stream ordered by (ts, side, event_id)
    — right rows sort BEFORE left rows at equal ts, giving the
    inclusive bound — and a running ``last(..., ignorenulls)`` carries
    the latest right row forward. One shuffle on user_id, fully
    codegen'd, linear in |events| (the classic sort-merge as-of, as a
    window). Right rows sharing an exact (user_id, ts) collapse to the
    max event_id first so the match is well-defined (DuckDB's native
    ``ASOF JOIN`` — the independent oracle — requires the same).

    Per-user event counts are Zipf-ish but sessions of one user never
    shuffle apart; AQE's skew split handles hot users."""
    wdedup = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    right = (
        events.filter(F.col("event_type") == right_type)
        .withColumn("_rn", F.row_number().over(wdedup))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            "event_id",
            "value",
        )
    )
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_right = F.col("side") == 0
    return (
        right.unionByName(left)
        .withColumn(
            "r_event_id",
            F.last(F.when(is_right, F.col("event_id")), ignorenulls=True).over(w),
        )
        .withColumn(
            "r_value",
            F.last(F.when(is_right, F.col("value")), ignorenulls=True).over(w),
        )
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("l_event_id"),
            "user_id",
            F.col("ts").alias("l_ts"),
            F.col("value").alias("l_value"),
            "r_event_id",
            "r_value",
        )
    )


def asof_join_sql(
    left_type: str = ASOF_LEFT_TYPE, right_type: str = ASOF_RIGHT_TYPE
) -> str:
    """Independent oracle: DuckDB's NATIVE ``ASOF LEFT JOIN`` (a
    different algorithm than the window formulation)."""
    return f"""
WITH rgt AS (
  SELECT user_id, ts, event_id, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) AS _rn
    FROM events WHERE event_type = '{right_type}'
  ) WHERE _rn = 1
),
lft AS (SELECT * FROM events WHERE event_type = '{left_type}')
SELECT l.event_id AS l_event_id, l.user_id AS user_id, l.ts AS l_ts,
       l.value AS l_value, r.event_id AS r_event_id, r.value AS r_value
FROM lft l ASOF LEFT JOIN rgt r
  ON l.user_id = r.user_id AND l.ts >= r.ts"""


# ------------------------------------------------------------ range join

RANGE_WINDOW_MIN = 30


def range_join_window_counts(
    events: DataFrame,
    interval_type: str = "error",
    probe_type: str = "click",
    window_min: int = RANGE_WINDOW_MIN,
) -> DataFrame:
    """Range (interval) join: per ``interval_type`` event, count and
    sum the ``probe_type`` events of the same user inside
    ``[ts, ts + window_min)``. Output
    (int_id, n_probe_events, sum_value_cents).

    Spark-first shape: Catalyst plans a raw
    ``p.ts >= i.t0 AND p.ts < i.t1`` join as a nested loop —
    O(|intervals| · |probes|). Because every interval has bounded
    length, it decomposes EXACTLY into two ``window_min``-granularity
    epoch buckets (floor(t0/g) and floor(t1/g)); probes carry their
    single bucket, the join runs as a plain (user_id, bucket) hash
    equi-join with ≤2× interval fan-out, and the range predicate is a
    residual filter. Each probe's one bucket row meets at most one of
    an interval's two bucket rows, so no dedup pass is needed. Sums
    are exact integer cents (engine-order-independent)."""
    sec = window_min * 60
    ints = events.filter(F.col("event_type") == interval_type).select(
        F.col("event_id").alias("int_id"),
        "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr(f"INTERVAL {window_min} MINUTES")).alias("t1"),
    )
    ib = ints.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(_epoch_sec("t0") / sec).cast("long"),
                    F.floor(_epoch_sec("t1") / sec).cast("long"),
                )
            )
        ),
    )
    probes = events.filter(F.col("event_type") == probe_type).select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.floor(_epoch_sec("ts") / sec).cast("long").alias("bucket"),
    )
    hits = (
        # interval side builds (shuffle-hash: no sort on either
        # event-scale side; ≤2× fan-out keeps the build bounded)
        ib.hint("shuffle_hash").join(probes, ["user_id", "bucket"])
        .filter((F.col("p_ts") >= F.col("t0")) & (F.col("p_ts") < F.col("t1")))
        .groupBy("int_id")
        .agg(
            F.count("*").alias("n_probe_events"),
            F.sum("cents").alias("sum_value_cents"),
        )
    )
    return (
        ints.select("int_id")
        # hits ≤ one row per interval — hash-build it for the
        # zero-match left join too
        .join(hits.hint("shuffle_hash"), "int_id", "left")
        .na.fill({"n_probe_events": 0, "sum_value_cents": 0})
    )


def range_join_window_counts_sql(
    interval_type: str = "error",
    probe_type: str = "click",
    window_min: int = RANGE_WINDOW_MIN,
) -> str:
    """Independent oracle: the plain inequality join DuckDB executes
    natively (its IEJoin handles ranges without the bucket trick)."""
    return f"""
WITH ints AS (
  SELECT event_id AS int_id, user_id, ts AS t0,
         ts + INTERVAL {window_min} MINUTE AS t1
  FROM events WHERE event_type = '{interval_type}'
),
probes AS (
  SELECT user_id, ts, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = '{probe_type}'
)
SELECT i.int_id,
       COUNT(p.user_id) AS n_probe_events,
       COALESCE(CAST(SUM(p.cents) AS BIGINT), 0) AS sum_value_cents
FROM ints i LEFT JOIN probes p
  ON p.user_id = i.user_id AND p.ts >= i.t0 AND p.ts < i.t1
GROUP BY i.int_id"""


# ------------------------------------------------------- winsorization

WINSOR_PCT = 90


def winsorized_stats(events: DataFrame, pct: int = WINSOR_PCT) -> DataFrame:
    """Robust per-event-type value statistics with the heavy tail
    clipped at the type's own exact p``pct`` — the outlier-resistant
    aggregate a metrics pipeline reports when a few whale events would
    otherwise dominate a mean. Output (event_type, n_events,
    sum_value_cents, sum_winsorized_cents, p_cutoff_cents).

    Same histogram-CDF discipline as ``text.group_quantiles``: values
    quantize to exact integer cents, the quantile comes from a
    (type, cents) histogram — map-side combinable, window only over
    DISTINCT cent values — and the cutoff joins back as a
    broadcast (|event types| rows). Clipping is LEAST(cents, cutoff);
    every sum is an integer sum, so engines agree bit-for-bit."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    ev = events.select("event_type", cents.alias("cents"))
    hist = ev.groupBy("event_type", "cents").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("cents")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    cutoff = (
        cum.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("cum") * 100 >= pct * F.col("n"), F.col("cents")))
            .cast("long")
            .alias("cutoff")
        )
    )
    return (
        ev.join(F.broadcast(cutoff), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("sum_value_cents"),
            F.sum(F.least(F.col("cents"), F.col("cutoff"))).alias(
                "sum_winsorized_cents"
            ),
            F.min("cutoff").alias("p_cutoff_cents"),
        )
    )


def winsorized_stats_sql(pct: int = WINSOR_PCT) -> str:
    return f"""
WITH ev AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
hist AS (SELECT event_type, cents, COUNT(*) AS cnt FROM ev GROUP BY 1, 2),
cum AS (
  SELECT event_type, cents, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum
  FROM hist
),
tot AS (SELECT event_type, SUM(cnt) AS n FROM hist GROUP BY 1),
cutoff AS (
  SELECT c.event_type,
         CAST(MIN(CASE WHEN c.cum * 100 >= {pct} * t.n THEN c.cents END)
              AS BIGINT) AS cutoff
  FROM cum c JOIN tot t ON t.event_type = c.event_type
  GROUP BY c.event_type
)
SELECT e.event_type AS event_type,
       COUNT(*) AS n_events,
       CAST(SUM(e.cents) AS BIGINT) AS sum_value_cents,
       CAST(SUM(LEAST(e.cents, co.cutoff)) AS BIGINT) AS sum_winsorized_cents,
       CAST(MIN(co.cutoff) AS BIGINT) AS p_cutoff_cents
FROM ev e JOIN cutoff co ON co.event_type = e.event_type
GROUP BY e.event_type"""


# ------------------------------------------------- rolling active users

DAY_SEC = 24 * 3600
WAU_DAYS = 7


def rolling_active_users(events: DataFrame, window_days: int = WAU_DAYS) -> DataFrame:
    """DAU + rolling ``window_days``-day active users per day — the
    engagement report every event pipeline ships. Output (day_epoch,
    dau, wau) for each day with activity.

    COUNT(DISTINCT) over a sliding window is not expressible as a
    Spark window function, and the naive per-day self-join against a
    7-day range re-scans the activity table once per day. The scale
    shape used here: dedup to (user, day) once (map-side combinable),
    then EXPLODE each activity row into the ``window_days`` target
    days it contributes to — a bounded ×7 fan-out of an
    already-deduped, narrow relation — and count distinct users per
    target day. Two aggregations, keys uniform (days), no join, no
    per-day rescan; the same trick handles MAU with ×30 fan-out of
    rows that are ~1000× smaller than raw events."""
    day = F.floor(_epoch_sec("ts") / DAY_SEC).cast("long")
    active = events.select(
        "user_id", day.alias("day")
    ).distinct()
    dau = active.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    contrib = active.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (window_days - 1))
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau.hint("shuffle_hash"), "day")
        .select(F.col("day").alias("day_epoch"), "dau", "wau")
    )


def rolling_active_users_sql(window_days: int = WAU_DAYS) -> str:
    return f"""
WITH active AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / {DAY_SEC}) AS BIGINT) AS day
  FROM events
),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM active GROUP BY day),
contrib AS (
  SELECT user_id, day + off AS day
  FROM active, range(0, {window_days}) AS t(off)
),
wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY day)
SELECT d.day AS day_epoch, d.dau AS dau, w.wau AS wau
FROM dau d JOIN wau w ON w.day = d.day"""


# --------------------------------------------- semi-structured props


def props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured payload handling: pull the numeric ``k`` field
    out of the JSON ``props`` column and aggregate it per event type —
    the standard "JSON blob → typed column → rollup" step. Output
    (event_type, n_with_k, sum_k, min_k, max_k).

    Spark-first: ``get_json_object`` is a JVM-side JSON-path
    expression inside whole-stage codegen — the payload never reaches
    Python, and Catalyst prunes the scan to (event_type, props). Rows
    whose props lack ``k`` (or fail to parse) contribute NULL, which
    the aggregates skip; all outputs are exact integers."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def props_stats_sql() -> str:
    return """
SELECT event_type,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM (
  -- TRY_CAST, not CAST: a malformed / non-integer k must null out like
  -- Spark's get_json_object().cast('long'), not error the oracle
  SELECT event_type, TRY_CAST(props->>'$.k' AS BIGINT) AS k FROM events
)
GROUP BY event_type"""


MAU_DAYS = 30


def engagement_ratios(events: DataFrame) -> DataFrame:
    """DAU / WAU / MAU / stickiness in ONE pass: each deduped
    (user, day) activity row explodes into the 30 trailing days it can
    contribute to, and a single groupBy(day) computes all three active
    counts as conditional COUNT(DISTINCT) on the explode offset
    (off = 0 → today, ≤ 6 → trailing week, any → trailing month).
    Output (day_epoch, dau, wau, mau, stickiness_ppm) for days with
    activity; stickiness = dau·1e6 div mau, the classic engagement
    ratio, exact integers end to end. Same bounded-fan-out scale story
    as ``rolling_active_users`` — ×30 on a relation already collapsed
    to (user, day)."""
    day = F.floor(_epoch_sec("ts") / DAY_SEC).cast("long")
    active = events.select("user_id", day.alias("day")).distinct()
    contrib = active.select(
        "user_id",
        F.col("day").alias("src_day"),
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (MAU_DAYS - 1))
        ).alias("day"),
    ).withColumn("off", F.col("day") - F.col("src_day"))
    agg = contrib.groupBy("day").agg(
        F.countDistinct(F.when(F.col("off") == 0, F.col("user_id"))).alias("dau"),
        F.countDistinct(
            F.when(F.col("off") <= WAU_DAYS - 1, F.col("user_id"))
        ).alias("wau"),
        F.countDistinct("user_id").alias("mau"),
    )
    return (
        agg.join(active.select("day").distinct(), "day", "left_semi")
        .select(
            F.col("day").alias("day_epoch"),
            "dau",
            "wau",
            "mau",
            F.expr(f"(dau * {10**6}) div mau").cast("long").alias("stickiness_ppm"),
        )
    )


def engagement_ratios_sql() -> str:
    return f"""
WITH active AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / {DAY_SEC}) AS BIGINT) AS day
  FROM events
),
contrib AS (
  SELECT user_id, day AS src_day, day + off AS day, off
  FROM active, range(0, {MAU_DAYS}) AS t(off)
),
agg AS (
  SELECT day,
         COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END) AS dau,
         COUNT(DISTINCT CASE WHEN off <= {WAU_DAYS - 1} THEN user_id END) AS wau,
         COUNT(DISTINCT user_id) AS mau
  FROM contrib GROUP BY day
)
SELECT a.day AS day_epoch, a.dau AS dau, a.wau AS wau, a.mau AS mau,
       CAST((a.dau * {10**6}) // a.mau AS BIGINT) AS stickiness_ppm
FROM agg a WHERE a.day IN (SELECT day FROM active)"""
