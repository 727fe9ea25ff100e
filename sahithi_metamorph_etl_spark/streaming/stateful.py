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
