"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no streaming surface (SURVEY.md §2.9); built-in
windows cover the aggregation cases (streaming/events.py). This module
is the escape hatch for semantics the built-ins can't express — state
lives in Spark's state store (checkpointed, partitioned by group key),
the per-group logic runs in Arrow-batched pandas.

First use case: streaming exact deduplication — the streaming twin of
llm.dedup.exact_dedup_groups. Each key group keeps one tiny state
record ("seen + occurrence count"); only a key's FIRST arrival is
emitted. At 100 TB-scale ingest this is the standard "emit novel
documents only" gate: state is O(distinct keys), sharded across
executors by the group-by shuffle, optionally aged out with a state
timeout (TTL) for unbounded key spaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream_first_seen(events: DataFrame, key_cols: list[str]) -> DataFrame:
    """Emit each distinct key exactly once — on first arrival.

    The emitted set over a bounded stream equals ``SELECT DISTINCT
    key_cols`` of the same data as a batch (order-free, so it is
    oracle-comparable); the streaming value is that duplicates are
    suppressed ONLINE, per micro-batch, without re-scanning history.
    """
    out_schema = ", ".join(f"{c} string" for c in key_cols)
    state_schema = "n_seen bigint"

    # self-contained closure: pickles by value, no package refs
    def first_seen(key, pdfs, state):
        import pandas as pd

        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            (prev,) = state.get
            state.update((prev + n,))
            yield pd.DataFrame(columns=list(key_cols)).astype("string")
        else:
            state.update((n,))
            yield pd.DataFrame([key], columns=list(key_cols)).astype("string")

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = events.select(*[events[c].cast("string").alias(c) for c in key_cols])
    return keyed.groupBy(*key_cols).applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counts_stream(
    events: DataFrame, key_col: str, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-key RUNNING event counts: each micro-batch emits the key's
    updated cumulative total. Over a bounded stream the LAST emission
    per key equals the batch ``GROUP BY count(*)`` — the
    oracle-comparable contract; the streaming value is the total
    maintained ONLINE (dashboards, rate limits) without re-aggregating
    history.

    Built on ``applyInPandasWithState`` — the arbitrary-state API that
    works without extra Python dependencies (Spark 4's
    transformWithStateInPandas successor requires the ``protobuf``
    package for its state-server protocol, absent in minimal runtimes;
    probed and documented in tests). ``idle_timeout_ms`` ages out idle
    keys via processing-time timeout — the unbounded-key-space valve at
    100 TB ingest; None keeps state for the stream's lifetime.

    State: one bigint per key, sharded by the group-by shuffle —
    O(distinct keys), the same scale envelope as the dedup gate above.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout_ms = idle_timeout_ms

    # self-contained closure: pickles by value, no package refs
    def count_events(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        prev = state.get[0] if state.exists else 0
        total = prev + n
        state.update((total,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"key": [key[0]], "n_events": [total]})

    keyed = events.select(events[key_col].cast("string").alias("key"))
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        keyed.groupBy("key")
        .applyInPandasWithState(
            count_events,
            outputStructType="key string, n_events bigint",
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=timeout,
        )
        .withColumnRenamed("key", key_col)
    )


def funnel_stage_stream(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of ``operators.windows.funnel``: a per-user stage
    machine maintained ONLINE — each micro-batch advances users through
    the ordered stages (greedy earliest-completion, strictly-later
    timestamps, null event times ignored — the batch operator's exact
    rules) and emits the user's current reached stage. Per-stage user
    counts are a downstream aggregate of the latest emission per user
    (emissions are monotone, so max(reached) is the funnel position).

    PARITY CONTRACT: equals the batch fold when events arrive in
    event-time order across micro-batches (each batch is ts-sorted
    internally; a time-range-split file source or an in-order Kafka
    partition keyed by user satisfies this). Genuinely late events
    cannot retro-advance a machine that already passed their slot —
    that is the standard online-funnel semantics, and the price of
    never re-scanning history.

    State per user: (stage, last event-time micros) — two ints, sharded
    by the group-by shuffle; O(users) like the other stateful ops.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    stage_list = list(stages)
    k = len(stage_list)

    # self-contained closure: pickles by value, no package refs
    def step(key, pdfs, state):
        import pandas as pd

        parts = [pdf for pdf in pdfs if len(pdf)]
        stage, last_us = state.get if state.exists else (0, None)
        if parts:
            rows = pd.concat(parts, ignore_index=True)
            rows = rows.dropna(subset=["__ts"]).sort_values("__ts", kind="mergesort")
            ts_us = (rows["__ts"].astype("int64") // 1000).tolist()
            types = rows["__ty"].tolist()
            for t_us, ty in zip(ts_us, types):
                if (
                    stage < k
                    and ty == stage_list[stage]
                    and (stage == 0 or (last_us is not None and t_us > last_us))
                ):
                    stage += 1
                    last_us = t_us
        state.update((stage, last_us))
        # a NULL user id forms its own group like the batch fold's null
        # group — it arrives as None or NaN depending on the Arrow
        # batch's dtype; emit it rather than crashing the query
        raw = key[0]
        uid = None if raw is None or pd.isna(raw) else int(raw)
        yield pd.DataFrame({"user_id": [uid], "reached": [int(stage)]})

    keyed = (
        events.filter(F.col(ts_col).isNotNull() & F.col(type_col).isin(stage_list))
        .select(
            F.col(user_col).cast("bigint").alias("__u"),
            F.col(ts_col).cast("timestamp").alias("__ts"),
            F.col(type_col).alias("__ty"),
        )
    )
    return keyed.groupBy("__u").applyInPandasWithState(
        step,
        outputStructType="user_id bigint, reached int",
        stateStructType="stage int, last_us bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
