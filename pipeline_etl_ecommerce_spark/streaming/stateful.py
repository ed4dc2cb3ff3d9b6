"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's queue workers keep per-key progress in MySQL status columns
(SURVEY.md §2.10 T5). The Spark-native generalization is arbitrary per-key
state in the state store; this module implements a running per-key
accumulator — event count + value total carried across micro-batches — the
building block for "how much have we processed for listing X" bookkeeping
without any external table.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _accumulate(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals: emits the updated (count, total)
    for every user seen in each micro-batch; state persists in the
    checkpointed state store across batches and restarts."""
    # append mode: each emission is a standalone row (the running snapshot at
    # that batch); pairs with append-only sinks like parquet. Semantically the
    # downstream consumer keeps the row with the highest n_events per key, or
    # routes through a keyed upsert sink.
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EXACT_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"
EXACT_STATE_SCHEMA = "n bigint, cents bigint"


def fold_running_totals(
    prev: tuple[int, int] | None, pdfs: Iterable[pd.DataFrame]
) -> tuple[int, int]:
    """The pure per-key state fold shared by BOTH stateful APIs
    (applyInPandasWithState and transformWithState): integer (count, cents)
    accumulation — associative and order-independent, so any micro-batch
    composition converges to the batch sum. Split out so the fold is
    unit-testable without a Spark state server (the transformWithState
    harness needs google.protobuf, absent in this container)."""
    n, cents = prev if prev is not None else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["cents"].sum())
    return n, cents


def _accumulate_cents(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = fold_running_totals(
        state.get if state.exists else None, pdfs
    )
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_cents": [cents]})


def running_user_totals_exact(events: DataFrame) -> DataFrame:
    """Oracle-exact variant of ``running_user_totals``: the value column
    arrives pre-quantized to integer ``cents``, so the per-key state is
    pure integer arithmetic — associative, order-independent, and
    bit-identical to any batch engine's sum regardless of micro-batch
    composition. The float variant's pandas double sum is deterministic
    per run but not SQL-replayable; this one is."""
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate_cents,
        outputStructType=EXACT_OUTPUT_SCHEMA,
        stateStructType=EXACT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithState: the successor API to applyInPandasWithState —
# named state variables on a StatefulProcessor handle instead of one opaque
# state tuple, timers, TTL, and composite types (list/map state). Requires
# the RocksDB state-store provider (runner.ROCKSDB_STATE_CONFS), which is
# also the 100 TB answer: state bounded by local disk, not executor heap.
# ---------------------------------------------------------------------------
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle  # noqa: E402
from pyspark.sql.streaming.stateful_processor import TimerValues  # noqa: E402


class RunningTotalsProcessor(StatefulProcessor):
    """transformWithState twin of ``_accumulate_cents``: per-key
    (count, integer-cents) running totals in a named ValueState. Integer
    arithmetic keeps every emission exactly SQL-replayable regardless of
    micro-batch composition (same contract as the exact GroupState
    variant above)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", EXACT_STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterable[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        n, cents = fold_running_totals(self._totals.get(), rows)
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals through ``transformWithStateInPandas``.
    Update mode: each micro-batch re-emits the keys it changed (pairs with
    a keyed MERGE sink); timeMode 'None' — pure data-driven state, no
    timers. The caller must run under the RocksDB state-store provider
    (transformWithState rejects the HDFS-backed default)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=EXACT_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
