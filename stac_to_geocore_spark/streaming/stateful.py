"""Custom stateful streaming operator: first-seen dedup over a keyed stream.

The built-in watermarked aggregations (streaming/events.py) cover windowed
counts and session windows; this module shows the applyInPandasWithState
path for semantics Spark has no built-in for — emit each (user_id, event
key) the FIRST time it appears across micro-batches and drop all later
duplicates, keeping per-user seen-set state with a TTL-free GroupState.

At scale the state is partitioned by user_id (the groupBy key) across the
cluster's state store; per-batch work is an Arrow-batched pandas function.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, event_id long, event_type string, first_seen boolean"
STATE_SCHEMA = "seen array<long>"


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("event_id")
        fresh = ~pdf["event_id"].isin(seen)
        seen.update(int(x) for x in pdf.loc[fresh, "event_id"])
        emitted = pdf.loc[fresh, ["user_id", "event_id", "event_type"]].copy()
        emitted["first_seen"] = True
        out.append(emitted)
    state.update((sorted(seen),))
    yield pd.concat(out) if out else pd.DataFrame(columns=["user_id", "event_id", "event_type", "first_seen"])


def dedup_stream(events: DataFrame) -> DataFrame:
    """events stream -> first occurrence of each (user_id, event_id) only."""
    return (
        events.select("user_id", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _dedup_fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
