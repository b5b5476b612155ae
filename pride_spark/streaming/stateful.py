"""Custom stateful streaming operator — ``applyInPandasWithState``.

North-star extension (SURVEY §2.12): a per-key running aggregate whose
state survives across triggers — the escape hatch for operators Spark's
built-in windowed aggregations can't express (per-entity counters,
sessionized enrichment, online features).

State is one row per user: (count, value sum).  Each trigger emits the
UPDATED totals for users seen in that micro-batch (append mode), so the
sink receives a change log.  State size is O(distinct keys); use a
timeout (``GroupStateTimeout``) to bound it for unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n": [n], "total": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime (count, sum(value)) maintained in the state store.

    Works on a streaming DataFrame with columns ``user_id, value``; each
    micro-batch emits refreshed totals for the users it touched.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
