"""Custom stateful streaming operators (applyInPandasWithState).

Batch sessionization (operators/sessions.py) answers "what were the
sessions"; a serving pipeline needs the same answer ON THE STREAM —
session state carried across micro-batches, sessions emitted the
moment a later event proves them closed. Spark's built-in windowed
aggregations can't express gap-based sessions, so this is the
documented escape hatch: ``applyInPandasWithState`` with per-user
state (the engine's only stateful-UDF surface; everything batch-side
stays built-in expressions).

Determinism contract: ``NoTimeout`` — a session closes only when a
later event for the same user arrives with gap > threshold, never by
wall clock, so output is a pure function of the input stream (tested
equal to the batch sessionizer on every closed session). State is
4 int64s + a double per user; within a micro-batch the events are
vectorized (NumPy gap/segment arithmetic), Python only touches the
per-user segment boundaries.

Also: exactly-once-style stream dedup with BOUNDED state
(``dropDuplicatesWithinWatermark`` — duplicate deliveries inside the
watermark horizon collapse; state for ids older than the watermark is
evicted, which unbounded ``dropDuplicates`` never does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_idx", IntegerType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("session_idx", IntegerType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """events stream -> CLOSED sessions, one row per (user, session):
    ``(user_id, session_idx, n_events, start_us, end_us, value_sum)``.
    A session is emitted when a later event from the same user arrives
    more than ``gap_minutes`` after it ended; the user's newest session
    stays open in state. Closed rows are identical to the batch
    :func:`~..operators.sessions.session_stats` rows (by test)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be positive")
    gap_us = int(round(gap_minutes * 60.0 * 1_000_000))

    def fn(key, pdf_iter, state: GroupState):
        user = key[0]
        if state.exists:
            sidx, n, st, en, vs = state.get
        else:
            sidx, n, st, en, vs = -1, 0, -1, -1, 0.0
        closed: list[tuple] = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            us = pdf["ts"].to_numpy("datetime64[us]").astype(np.int64)
            vals = pdf["value"].to_numpy(np.float64)
            # segment boundaries inside the batch (vectorized)
            brk = np.empty(us.shape[0], dtype=bool)
            brk[0] = (n == 0) or (us[0] - en > gap_us)
            brk[1:] = (us[1:] - us[:-1]) > gap_us
            # segment per event: 0 = continuation of the carried open
            # session (no break before the first event), 1.. = new
            seg = np.cumsum(brk)
            if brk[0] and n > 0:
                closed.append((user, sidx, n, st, en, vs))
                n = 0
            for s in range(int(seg[0]), int(seg[-1]) + 1):
                m = seg == s
                cnt, lo, hi, sv = (
                    int(m.sum()), int(us[m][0]), int(us[m][-1]),
                    float(vals[m].sum()),
                )
                if n == 0:
                    sidx, n, st, en, vs = sidx + 1, cnt, lo, hi, sv
                else:  # continue the carried open session
                    n, en, vs = n + cnt, hi, vs + sv
                if s < int(seg[-1]):  # closed by the next segment
                    closed.append((user, sidx, n, st, en, vs))
                    n = 0
        state.update((sidx, n, st, en, vs))
        if closed:
            yield pd.DataFrame(
                closed, columns=[f.name for f in SESSION_OUT_SCHEMA],
            )

    return (
        events_stream.groupBy("user_id").applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    events_stream: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """At-least-once delivery -> effectively-once: drop duplicate
    deliveries of the same id within the watermark horizon. Uses
    ``dropDuplicatesWithinWatermark``, whose per-id state is EVICTED
    once the watermark passes — bounded state, unlike a plain
    ``dropDuplicates`` whose id set grows forever at 100 TB/day."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(id_cols))
    )


def percolate_stream(
    docs_stream: DataFrame,
    queries: list[dict],
    sink_fn,
    synonyms: dict[str, str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming alerting (ES percolate on a document stream): each
    micro-batch of arriving docs is matched against the registered
    query set and the satisfied ``(doc_id, query_id, n_matched)``
    rows go to ``sink_fn(matches_df, epoch_id)`` — the "saved search
    fired" callback. Queries are compiled ONCE driver-side (not per
    batch) and broadcast into every micro-batch's join, the same plan
    the batch :func:`~..operators.percolate.percolate` audits.

    Returns the ``DataStreamWriter`` — the caller picks the trigger
    and checkpoint (``.option("checkpointLocation", ...)
    .trigger(availableNow=True).start()``). foreachBatch rather than
    a streaming aggregation: the match gate is per-batch complete
    (a doc either satisfies a query or not — no cross-batch state),
    so there is nothing for watermarks to hold."""
    from ..operators.percolate import compile_queries, percolate

    spark = docs_stream.sparkSession
    rows = compile_queries(queries, synonyms)
    qdf = spark.createDataFrame(
        rows, "query_id string, term string, n_required int"
    )

    def fb(batch_df: DataFrame, epoch_id: int) -> None:
        sink_fn(
            percolate(batch_df, qdf, id_col=id_col, text_col=text_col),
            epoch_id,
        )

    return docs_stream.writeStream.foreachBatch(fb)
