"""Batch CDC apply: fold an insert/update/delete op log into a snapshot.

The reference's sinks are keyed upserts (SURVEY.md §2.1 S9-S13 —
`tarefa_consolidar_dados.php:144` keeps only the latest value per key);
a change-data-capture APPLY generalizes the whole family in one batch
operator: given a base snapshot and an ordered op log with 'I'/'U'/'D'
row markers, produce the post-image — the shape every warehouse needs to
consume a Debezium-style feed or replay a transaction log.

Semantics (latest-wins with tombstones):
- only each key's LATEST op (by the caller's total order) matters;
- latest op D deletes the key (whether or not it exists in base);
- latest op I/U sets the key's values (insert-or-update — the log is the
  truth, so an I on an existing key behaves as U, matching MySQL's
  REPLACE / Debezium snapshot-read semantics);
- keys without ops pass through from base unchanged.

Scale shape: ONE shuffle to reduce the log to latest-per-key (max_by over
an ordering struct — partial aggregation combines map-side, no per-key
sort), then ONE full-outer shuffle join against base. Never sorts the
full log, never windows over it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cdc_compact_log(
    ops: DataFrame,
    key_cols: Sequence[str],
    *,
    op_col: str,
    order_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Reduce an op log to its latest op per key, KEEPING delete tombstones
    as rows. Unlike :func:`cdc_apply` this is ASSOCIATIVE —
    ``compact(compact(a) ∪ b) == compact(a ∪ b)`` — because the ordering
    columns ride along in the output, so an incremental consumer (a
    streaming foreachBatch folding micro-batches into a mart) converges to
    the batch answer no matter how the log is split, including a later
    batch delivering an OLDER op for a key. Present the mart by filtering
    ``op != 'D'``; compact tombstones away only once they are older than
    every source that could still replay (Kafka retention, here: never)."""
    keys = list(key_cols)
    order = list(order_cols)
    payload = F.struct(
        *[F.col(c) for c in order],
        F.col(op_col).alias(op_col),
        *[F.col(c) for c in value_cols],
    )
    latest = ops.groupBy(*keys).agg(
        F.max_by(payload, F.struct(*[F.col(c) for c in order])).alias("__last")
    )
    return latest.select(
        *keys,
        *[F.col(f"__last.{c}").alias(c) for c in (*order, op_col, *value_cols)],
    )


def cdc_apply(
    base: DataFrame,
    ops: DataFrame,
    key_cols: Sequence[str],
    *,
    op_col: str,
    order_by: Sequence[str | Column],
    value_cols: Sequence[str],
) -> DataFrame:
    """Apply an op log to a snapshot; returns the post-image with the
    base's key + value columns. ``op_col`` holds 'I', 'U', or 'D';
    ``order_by`` must be a TOTAL order within each key (ties would make
    "latest" nondeterministic — include a unique id)."""
    keys = list(key_cols)
    vals = list(value_cols)
    order = F.struct(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    payload = F.struct(F.col(op_col).alias("__op"), *[F.col(c) for c in vals])
    latest = ops.groupBy(*keys).agg(F.max_by(payload, order).alias("__last"))
    b = base.select(*keys, F.lit(True).alias("__in_base"), *vals)
    j = b.join(latest, keys, "full_outer")
    is_delete = F.col("__last.__op") == F.lit("D")
    has_op = F.col("__last").isNotNull()
    out = j.filter(~(has_op & is_delete)).select(
        *keys,
        *[
            F.when(has_op, F.col(f"__last.{c}")).otherwise(F.col(c)).alias(c)
            for c in vals
        ],
    )
    return out
