"""Sequence packing: assemble documents into fixed token-budget packs — the
step that turns a curated corpus into training sequences.

Greedy offset-binning semantics (the distributed-friendly standard): within
a shard, documents are laid end-to-end in a deterministic order and a doc
belongs to pack ``floor(start_offset / budget)``. Documents are never split;
a pack can therefore overflow by at most one document's tokens (exactly the
behavior of greedy sequence packing with document boundaries respected).

Scale shape: ONE window per shard (`PARTITION BY shard ORDER BY id`), so
parallelism = shard count and no global sort exists. Shard by a natural
column (source, language, date) — the same sharding a 100 TB tokenization
job would use. A single-shard call is the explicit small-data escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    *,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Add ``pack_id`` (per-shard) and ``pack_offset`` (token start within
    the pack's budget grid) to every row. Deterministic: order is
    (shard, id), no RNG, no state."""
    shard = F.col(shard_col) if shard_col else F.lit(0)
    w = Window.partitionBy(shard).orderBy(F.col(id_col))
    cum_excl = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return df.withColumn("pack_id", F.floor(cum_excl / budget).cast("long")).withColumn(
        "pack_offset", (cum_excl % budget).cast("long")
    )
