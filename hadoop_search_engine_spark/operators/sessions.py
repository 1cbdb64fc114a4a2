"""Event sessionization and clickstream analytics.

The reference serves search over crawled pages; the operational side
of running it is a query/click event log, and the standard analytics
over that log are sessionization (gap-based session assignment),
per-session rollups, and event-transition counts. All three are
window/groupBy compositions — no UDFs, no driver state — and replay
exactly in DuckDB SQL (timestamps compared at microsecond integers,
never float epochs).

Scale shape: one shuffle keyed on ``user_id``; the per-user ordered
windows are bounded by that user's event count (the standard
sessionization shape — a pathological single-user firehose is a data
problem, not a plan problem). Rollups are partial-aggregated groupBys
on (user_id, session_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MINUTES = 30.0


def _micros(ts_col: str):
    """Exact unix microseconds of a timestamp column. Parquet event
    times read as TIMESTAMP_NTZ, which ``unix_micros`` rejects; the
    cast to TIMESTAMP is offset-free because the engine pins the
    session timezone to UTC (session.get_spark) — the same naive
    instant DuckDB's ``epoch_us`` sees."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_minutes: float = DEFAULT_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Assign each event a per-user ``session_idx``: a new session
    starts at the user's first event and whenever the gap since their
    previous event exceeds ``gap_minutes``. Deterministic ordering:
    (ts, *order_cols) breaks timestamp ties. Adds ``session_idx``
    (0-based per user) and ``is_session_start``; all input columns
    preserved."""
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be positive")
    gap_us = int(round(gap_minutes * 60.0 * 1_000_000))
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    us = _micros(ts_col)
    prev = F.lag(us).over(w)
    new_s = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.withColumn("is_session_start", new_s.cast("boolean"))
        .withColumn(
            "session_idx",
            (
                F.sum(new_s).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ) - 1
            ).cast("int"),
        )
    )


def session_stats(
    events: DataFrame,
    gap_minutes: float = DEFAULT_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per (user, session): event count, start/end (exact unix
    microseconds — float epochs would not hash-compare cross-engine),
    duration in seconds, and the rounded value sum."""
    s = sessionize(events, gap_minutes, user_col=user_col, ts_col=ts_col)
    us = _micros(ts_col)
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
            F.round(F.sum(value_col), 6).alias("value_sum"),
        )
        .withColumn(
            "duration_sec",
            F.round((F.col("end_us") - F.col("start_us")) / 1e6, 6),
        )
    )


def event_transitions(
    events: DataFrame,
    within_session: bool = True,
    gap_minutes: float = DEFAULT_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(prev_type -> type) transition counts per user stream — the
    clickstream Markov matrix (view->click, click->error...). With
    ``within_session`` the chain resets at session boundaries (an
    event that starts a session has no predecessor)."""
    s = sessionize(events, gap_minutes, user_col=user_col, ts_col=ts_col)
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col("event_id").asc()
    )
    prev = F.lag(F.col(type_col)).over(w)
    if within_session:
        prev = F.when(F.col("is_session_start"), F.lit(None)).otherwise(prev)
    return (
        s.withColumn("prev_type", prev)
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col(type_col).alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


def cohort_retention(
    events: DataFrame,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the calendar period
    of their FIRST event (the cohort), then per (cohort, period_n)
    how many of them were active n periods later — the product-
    analytics staple. Output ``(cohort, period_n, n_active,
    retention)`` with retention = n_active / cohort size (rounded
    6 dp); period_n 0 is the cohort itself (retention 1.0 by
    construction).

    ``period_n`` counts CALENDAR-period boundaries via epoch-day
    arithmetic (day: date diff; week: 7-day blocks anchored on the
    cohort's Monday-truncated start; month: month index difference)
    — exact integers, engine-replayable. Plan: one min-per-user
    aggregate (the cohort assignment), a join back keyed on the user
    (broadcast when the user dimension is small, shuffle otherwise),
    and one distinct-count groupBy — output is |cohorts × periods|
    rows, never event-volume."""
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day|week|month")
    ts = F.col(ts_col).cast("timestamp")
    first = (
        events.groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts).alias("_first"))
        .select(
            "_u", F.date_trunc(period, F.col("_first")).alias("_cohort")
        )
    )
    joined = events.select(
        F.col(user_col).alias("_u"),
        F.date_trunc(period, ts).alias("_p"),
    ).join(first, "_u")
    if period == "day":
        pn = F.datediff(F.col("_p"), F.col("_cohort"))
    elif period == "week":
        pn = (F.datediff(F.col("_p"), F.col("_cohort")) / 7).cast("int")
    else:
        pn = (
            (F.year("_p") - F.year("_cohort")) * 12
            + (F.month("_p") - F.month("_cohort"))
        )
    active = (
        joined.select("_u", "_cohort", pn.cast("int").alias("period_n"))
        .distinct()
        .groupBy("_cohort", "period_n")
        .agg(F.countDistinct("_u").alias("n_active"))
    )
    size = first.groupBy("_cohort").agg(
        F.countDistinct("_u").alias("_size")
    )
    return (
        active.join(size, "_cohort")
        .select(
            F.col("_cohort").alias("cohort"),
            "period_n",
            F.col("n_active").cast("long").alias("n_active"),
            F.round(F.col("n_active") / F.col("_size"), 6)
            .alias("retention"),
        )
        .orderBy("cohort", "period_n")
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: per step, how many users reached it IN ORDER —
    a user counts for step i if their earliest qualifying time for
    step i comes at or after their earliest qualifying time for every
    prior step (first-touch ordering, the standard strict funnel).
    Output ``(step_idx, step, n_users)``, step_idx 0-based, counts
    non-increasing by construction.

    Plan: one filtered min-per-(user, step) aggregate (|users| ×
    |steps| rows max), a per-user cummax comparison via a |steps|-wide
    pivot — no window over event volume, no self-join per step pair."""
    if not steps:
        raise ValueError("steps must name at least one event type")
    ts = F.col(ts_col).cast("timestamp")
    firsts = (
        events.where(F.col(type_col).isin(list(steps)))
        .groupBy(F.col(user_col).alias("_u"),
                 F.col(type_col).alias("_t"))
        .agg(F.min(ts).alias("_first"))
    )
    wide = firsts.groupBy("_u").pivot("_t", list(steps)).agg(
        F.first("_first")
    )
    # reached(i): every step 0..i present and times non-decreasing
    reached = []
    cond = None
    prev = None
    for s in steps:
        c = F.col(s).isNotNull() if cond is None else (
            cond & F.col(s).isNotNull() & (F.col(s) >= prev)
        )
        cond = c
        prev = F.col(s) if prev is None else F.greatest(prev, F.col(s))
        reached.append(F.sum(c.cast("int")).cast("long"))
    row = wide.agg(*[r.alias(f"_s{i}") for i, r in enumerate(reached)])
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.coalesce(F.col(f"_s{i}"), F.lit(0)).alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return row.select(F.explode(pairs).alias("r")).select(
        "r.step_idx", "r.step", "r.n_users"
    )
