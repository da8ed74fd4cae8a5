"""Stateful streaming change detection (ST1) — the reference's per-key
watermark comparison (src/utils.py:168-194) as a continuously-running
operator: applyInPandasWithState keeps {key → last_seen_ts} in Spark's
state store and emits a row whenever a key's ts differs from its stored
value (equality semantics, matching the batch operator and FIXTURES.md
A3).

State is partitioned by key across executors — the JSON-file state store
this replaces is a single-writer bottleneck; here state scales with the
cluster and survives restarts via checkpointing.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("last_seen_ts", T.StringType()),
        T.StructField("change_kind", T.StringType()),  # 'new' | 'changed'
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_seen_ts", T.StringType())])


def _detect(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    stored = state.get[0] if state.exists else None
    latest = stored
    changes = []
    for pdf in pdfs:
        for ts in pdf["last_seen_ts"]:
            if latest is None:
                changes.append((key[0], ts, "new"))
                latest = ts
            elif ts != latest:
                changes.append((key[0], ts, "changed"))
                latest = ts
    if latest is not None:
        state.update((latest,))
    if changes:
        yield pd.DataFrame(changes, columns=["key", "last_seen_ts", "change_kind"])


def detect_changes_stream(source: DataFrame) -> DataFrame:
    """``source``: streaming DataFrame with (key, last_seen_ts) —
    emits one row per observed change, exactly the batch operator's
    output plus a change_kind tag."""
    return source.groupBy("key").applyInPandasWithState(
        _detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
