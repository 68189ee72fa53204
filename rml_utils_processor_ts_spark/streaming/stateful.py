"""Custom stateful streaming operator: CDC lifecycle classification with
``applyInPandasWithState`` — the Structured-Streaming alternative to the
snapshot-batch CDC in operators/cdc.py (SURVEY.md §2.B11 notes both; we
default to snapshot-batch + versioned state for resumability, this path
serves true event streams).

State per entity key: the last watched-properties fingerprint. Each
micro-batch emits create/update events for changed entities; deletes in
a pure event stream need explicit tombstones (is_present=false rows) —
absence is undetectable without snapshot semantics, exactly why the
reference's model is whole-snapshot replacement.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "iri string, lifecycle string, watched_hash string"
STATE_SCHEMA = "watched_hash string, present boolean"


def _classify(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    rows = pd.concat(list(batches), ignore_index=True)
    # latest event per entity wins within a batch (event-time order column)
    rows = rows.sort_values("seq").iloc[[-1]]
    new_hash = rows["watched_hash"].iloc[0]
    tombstone = not bool(rows["present"].iloc[0])

    if state.exists:
        (old_hash, present) = state.get
    else:
        old_hash, present = None, False

    iri = key[0]
    out = []
    if tombstone:
        if present:
            out.append((iri, "delete", new_hash))
        state.update((new_hash, False))
    elif not present:
        out.append((iri, "create", new_hash))
        state.update((new_hash, True))
    elif old_hash != new_hash:
        out.append((iri, "update", new_hash))
        state.update((new_hash, True))
    if out:
        yield pd.DataFrame(out, columns=["iri", "lifecycle", "watched_hash"])


def streaming_cdc(events: DataFrame) -> DataFrame:
    """events(iri, watched_hash, present, seq) — streaming or batch
    grouped-map; emits (iri, lifecycle, watched_hash) rows as entity
    state evolves across micro-batches."""
    return events.groupBy("iri").applyInPandasWithState(
        _classify,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
