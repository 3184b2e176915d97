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
