"""Keyed sinks: the Spark-side equivalents of the reference's write patterns.

The reference writes exclusively through MySQL ``INSERT ... ON DUPLICATE KEY
UPDATE`` (11 distinct statements), ``INSERT IGNORE``, plain ``INSERT``,
``UPDATE ... WHERE key`` and ``TRUNCATE`` (SURVEY.md §2.1 S9-S14). All of its
pipelines are therefore idempotent keyed upserts — the property that makes
late-data reprocessing safe (§2.10 T3). We reproduce that contract as
DataFrame-level merge helpers plus path-level writers.

Scale notes
-----------
- ``merge_upsert`` is one shuffle on the key (the left_anti join); with AQE
  the small "new" side is broadcast automatically, so merging a day's delta
  into a 100 TB mart does NOT reshuffle the mart.
- For date-grain marts, prefer ``overwrite_date_partitions`` (dynamic
  partition overwrite): rewriting only the affected date partitions is the
  100 TB-safe upsert — cost is proportional to the delta's days, not to the
  mart.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedupe_last_wins(df: DataFrame, keys: list[str], order_by: list | None = None) -> DataFrame:
    """Keep one row per key. With ``order_by``, the greatest wins (mirrors the
    reference's per-row upsert loop where the last write for a key sticks);
    without it, an arbitrary row is kept via ``dropDuplicates``.
    """
    if not order_by:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc_nulls_last() if isinstance(c, str) else c for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _null_safe_key_cond(left_alias: str, right_alias: str, keys: list[str]):
    """Null-safe key equality for the merge joins: NULL key components must
    match each other (MySQL's dup-key check treats the row identity by
    position, and the reference's keys — e.g. vendas' nullable id_variacao —
    contain NULLs). A plain equi-join would never match NULL = NULL, so every
    re-run would duplicate those rows."""
    cond = None
    for k in keys:
        c = F.col(f"{left_alias}.{k}").eqNullSafe(F.col(f"{right_alias}.{k}"))
        cond = c if cond is None else cond & c
    return cond


def merge_upsert(old: DataFrame, new: DataFrame, keys: list[str], order_by: list | None = None) -> DataFrame:
    """``INSERT ... ON DUPLICATE KEY UPDATE`` semantics (SURVEY.md §2.1 S9):
    rows of ``old`` whose key appears in ``new`` are replaced; unseen keys
    survive; ``new`` is deduped by key first (last-wins with ``order_by``).
    Key comparison is null-safe (NULL components are part of the identity).
    """
    fresh = dedupe_last_wins(new, keys, order_by)
    kept = old.alias("__old").join(
        fresh.select(*keys).distinct().alias("__new"),
        _null_safe_key_cond("__old", "__new", keys),
        "left_anti",
    )
    return kept.unionByName(fresh.select(*old.columns))


def insert_if_absent(existing: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """``INSERT IGNORE`` (SURVEY.md §2.1 S10; reference
    ``tarefa_popular_fila_trafego.php:42-51``): only rows whose key is absent
    from ``existing`` are appended; first occurrence wins within ``new``.
    Null-safe on key components like ``merge_upsert``.
    """
    candidates = new.dropDuplicates(keys)
    return candidates.alias("__new").join(
        existing.select(*keys).distinct().alias("__old"),
        _null_safe_key_cond("__new", "__old", keys),
        "left_anti",
    )


def keyed_update(target: DataFrame, updates: DataFrame, keys: list[str], set_cols: list[str]) -> DataFrame:
    """``UPDATE t SET c=? WHERE key=?`` (SURVEY.md §2.1 S12; reference
    ``tarefa_atualizar_custos_erp.php:26,45-46``): update-only merge — keys
    missing from ``target`` are NOT inserted.
    """
    upd = updates.dropDuplicates(keys).select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__new_{c}") for c in set_cols],
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
        cond = c if cond is None else cond & c
    joined = target.join(upd, cond, "left")
    out = joined
    for c in set_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c)))
    return out.drop(*[f"__k_{k}" for k in keys], *[f"__new_{c}" for c in set_cols])


# --------------------------------------------------------------------------
# Path-level writers (parquet "marts")
# --------------------------------------------------------------------------


def append_to_path(df: DataFrame, path: str, *, partition_by: list[str] | None = None) -> None:
    """Plain ``INSERT`` append (SURVEY.md §2.1 S11)."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_path(df: DataFrame, path: str, *, partition_by: list[str] | None = None) -> None:
    """``TRUNCATE`` + reload (SURVEY.md §2.1 S13)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_date_partitions(df: DataFrame, path: str, partition_col: str) -> None:
    """Dynamic partition overwrite: replace exactly the date partitions present
    in ``df`` and leave the rest of the mart untouched. The scalable upsert for
    date-grain marts (SURVEY.md §2.1 S9 → Spark mapping)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def upsert_to_path(new: DataFrame, path: str, keys: list[str], order_by: list | None = None) -> None:
    """Keyed MERGE into a parquet path without Delta: read-merge-swap.

    Correct at any scale but rewrites the whole target; use only for dims and
    small marts. Date-grain facts should use ``overwrite_date_partitions``.
    """
    spark = new.sparkSession
    if not os.path.exists(path):
        new_df = dedupe_last_wins(new, keys, order_by)
        new_df.write.mode("overwrite").parquet(path)
        return
    old = spark.read.parquet(path)
    merged = merge_upsert(old, new, keys, order_by)
    tmp = tempfile.mkdtemp(prefix="upsert_", dir=os.path.dirname(path.rstrip("/")) or ".")
    merged.write.mode("overwrite").parquet(tmp)
    # Swap after the write fully materialized (merged plan lazily reads `path`,
    # so the write must complete before the old data is dropped).
    shutil.rmtree(path)
    shutil.move(tmp, path)


def compact_path(spark, path: str, *, target_partitions: int | None = None) -> int:
    """Compact a parquet mart's small files (the debris a checkpointed
    streaming upsert leaves after many micro-batches): rewrite the path with
    ``target_partitions`` output files via read → coalesce → write-to-temp →
    atomic swap. Content is byte-identical, only the file layout changes.

    Defaults to one file per 128 MB of on-disk data (min 1) — the parquet
    row-group sweet spot, and the same math a 100 TB table maintenance job
    would run per partition. Returns the number of output partitions."""
    size = 0
    for root, _, files in os.walk(path):
        size += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    n = target_partitions or max(1, size // (128 << 20))
    df = spark.read.parquet(path).coalesce(int(n))
    tmp = tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(path.rstrip("/")) or ".")
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return int(n)
