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


def merge_upsert(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    order_by: list | None = None,
    *,
    evolve_schema: bool = False,
) -> DataFrame:
    """``INSERT ... ON DUPLICATE KEY UPDATE`` semantics (SURVEY.md §2.1 S9):
    rows of ``old`` whose key appears in ``new`` are replaced; unseen keys
    survive; ``new`` is deduped by key first (last-wins with ``order_by``).
    Key comparison is null-safe (NULL components are part of the identity).

    Schema evolution (r9): a batch whose column NAMES drift from the target
    fails LOUDLY by default (the pre-r9 code silently dropped columns the
    target lacked — exactly how a mid-stream producer upgrade loses data).
    ``evolve_schema=True`` opts into the Delta ``mergeSchema`` contract
    instead: the schemas union by name — surviving old rows carry NULL for
    added columns, replaced/inserted rows carry NULL for columns the batch
    no longer ships.
    """
    # Drift guards run on the RAW batch, before dedupe_last_wins touches it
    # (ADVICE r9): a batch missing a KEY column used to fail inside the
    # dedupe window with an opaque AnalysisException, and a same-name TYPE
    # change sailed past the name-only check into unionByName.
    lost_keys = [k for k in keys if k not in new.columns]
    if lost_keys:
        raise ValueError(
            f"merge_upsert: batch lacks key column(s) {lost_keys}; a key is "
            "the row identity and can never drift away"
        )
    added = [c for c in new.columns if c not in old.columns]
    missing = [c for c in old.columns if c not in new.columns]
    if (added or missing) and not evolve_schema:
        raise ValueError(
            f"merge_upsert: batch schema drifts from target (adds {added}, "
            f"lacks {missing}); pass evolve_schema=True to union the "
            "schemas (NULL-filled on both sides), or fix the producer"
        )
    old_types = {f.name: f.dataType for f in old.schema.fields}
    retyped = [
        f"{f.name}: {old_types[f.name].simpleString()} -> {f.dataType.simpleString()}"
        for f in new.schema.fields
        if f.name in old_types and f.dataType != old_types[f.name]
    ]
    if retyped and not evolve_schema:
        raise ValueError(
            f"merge_upsert: batch retypes column(s) [{', '.join(retyped)}]; "
            "pass evolve_schema=True to accept Spark's union type coercion, "
            "or fix the producer"
        )
    fresh = dedupe_last_wins(new, keys, order_by)
    kept = old.alias("__old").join(
        fresh.select(*keys).distinct().alias("__new"),
        _null_safe_key_cond("__old", "__new", keys),
        "left_anti",
    )
    if added or missing:
        return kept.unionByName(fresh, allowMissingColumns=True)
    return kept.unionByName(fresh.select(*old.columns))


def replace_groups(old: DataFrame, new: DataFrame, group_keys: list[str]) -> DataFrame:
    """Wholesale group replacement (``MERGE ... WHEN MATCHED DELETE`` +
    insert): every group of ``group_keys`` present in ``new`` replaces the
    old group's ENTIRE row set. Unlike ``merge_upsert`` on a composite key,
    a shrinking group leaves no stale tail rows — the fix for a redelivered
    document whose re-chunking produces FEWER chunks than before (ADVICE
    r1). Groups absent from ``new`` survive untouched; null-safe on key
    components like the other merges."""
    kept = old.alias("__old").join(
        new.select(*group_keys).distinct().alias("__new"),
        _null_safe_key_cond("__old", "__new", group_keys),
        "left_anti",
    )
    return kept.unionByName(new.select(*old.columns))


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

    NOT crash-atomic: a failure between the rmtree and the move below loses
    the mart (VERDICT r1). ``transactional_upsert_to_path`` is the
    crash-safe variant — same merge semantics, versioned snapshots behind an
    atomically-swapped pointer file; prefer it for any mart a crash matters
    for.
    """
    spark = new.sparkSession
    if not os.path.exists(path):
        new_df = dedupe_last_wins(new, keys, order_by)
        new_df.write.mode("overwrite").parquet(path)
        return
    old = spark.read.parquet(path)
    merged = merge_upsert(old, new, keys, order_by)
    _write_and_swap(merged, path, prefix="upsert_")


def replace_groups_to_path(new: DataFrame, path: str, group_keys: list[str]) -> None:
    """Path-level ``replace_groups``: groups present in ``new`` are replaced
    wholesale, others survive. Same read-merge-swap shape (and the same
    non-atomicity caveat) as ``upsert_to_path``."""
    spark = new.sparkSession
    if not os.path.exists(path):
        new.write.mode("overwrite").parquet(path)
        return
    old = spark.read.parquet(path)
    merged = replace_groups(old, new, group_keys)
    _write_and_swap(merged, path, prefix="replace_")


def _write_and_swap(df: DataFrame, path: str, *, prefix: str = "swap_") -> None:
    """Write ``df`` (whose plan lazily reads ``path``) to a temp dir, then
    swap it in. The write must fully materialize before the old data drops."""
    tmp = tempfile.mkdtemp(prefix=prefix, dir=os.path.dirname(path.rstrip("/")) or ".")
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)


# --------------------------------------------------------------------------
# Transactional (crash-safe) upsert: versioned snapshots + atomic pointer.
#
# This is the plain-parquet reduction of what Delta Lake / Iceberg MERGE
# gives you: immutable snapshot directories plus one atomically-committed
# pointer to the current snapshot. Mapping to Delta: each `_v/v{N}` dir is a
# table version, `_CURRENT` is the transaction log's latest-commit entry,
# `vacuum_versions` is VACUUM, and `transactional_upsert_to_path` is
# `MERGE INTO t USING new ON keys WHEN MATCHED UPDATE WHEN NOT MATCHED
# INSERT`. On a real cluster, swap this for Delta/Iceberg and keep the same
# call sites — the API contract (merge semantics, crash safety, old reads
# keep working during a write) is identical.
#
# Crash safety: the pointer file is committed with os.replace (atomic on
# POSIX); a crash anywhere before it leaves `_CURRENT` aimed at the previous
# complete snapshot, and a half-written `_v/v{N}` dir is invisible garbage
# that the next vacuum removes. Concurrent READERS are safe at any point;
# concurrent WRITERS still need an external lock (single-writer, like Delta
# without a locking LogStore).
# --------------------------------------------------------------------------

_VERSIONS_DIR = "_v"
_POINTER_FILE = "_CURRENT"


def _current_version(path: str) -> str | None:
    ptr = os.path.join(path, _POINTER_FILE)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return fh.read().strip() or None


def current_snapshot_path(path: str) -> str | None:
    """Directory of the current committed snapshot, or None if uninitialized."""
    ver = _current_version(path)
    return os.path.join(path, _VERSIONS_DIR, ver) if ver else None


def read_versioned(spark, path: str, *, version: str | None = None) -> DataFrame:
    """Read a committed snapshot of a transactional mart — the current one,
    or a pinned earlier ``version`` (time travel, Delta's
    ``VERSION AS OF``): any version not yet vacuumed is immutable on disk,
    so an audit/debug read of "the mart as of commit N" is just a different
    directory. Versions newer than the pointer are uncommitted debris and
    refuse to load."""
    if version is not None:
        cur = _current_version(path)
        if cur is None or version > cur:
            raise FileNotFoundError(f"version {version} is not committed under {path}")
        snap = os.path.join(path, _VERSIONS_DIR, version)
        if not os.path.isdir(snap):
            raise FileNotFoundError(f"version {version} missing (vacuumed?) under {path}")
        return spark.read.parquet(snap)
    snap = current_snapshot_path(path)
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    return spark.read.parquet(snap)


def _commit_pointer(path: str, version: str) -> None:
    """Atomically point `_CURRENT` at ``version`` (write-temp + os.replace)."""
    fd, tmp = tempfile.mkstemp(prefix="_ptr_", dir=path)
    with os.fdopen(fd, "w") as fh:
        fh.write(version)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(path, _POINTER_FILE))


def transactional_upsert_to_path(
    new: DataFrame,
    path: str,
    keys: list[str],
    order_by: list | None = None,
    *,
    evolve_schema: bool = False,
) -> str:
    """Crash-safe keyed MERGE (SURVEY.md §2.1 S9, the reference's central
    ``INSERT ... ON DUPLICATE KEY UPDATE`` at tarefa_consolidar_dados.php:144
    and 10 more sites): merge into a NEW immutable snapshot, then commit by
    atomically swapping the pointer file. The previous snapshot stays on disk
    (and readable) until ``vacuum_versions``; a crash at ANY step leaves a
    readable mart. Returns the committed version id. ``evolve_schema``
    forwards to :func:`merge_upsert` — a mid-stream producer upgrade (new
    column arrives) lands as a NEW schema version with NULL backfill, and
    schema drift without the opt-in fails before any snapshot is written."""
    spark = new.sparkSession
    os.makedirs(os.path.join(path, _VERSIONS_DIR), exist_ok=True)
    cur = _current_version(path)
    if cur is None:
        merged = dedupe_last_wins(new, keys, order_by)
        next_ver = "v00000001"
    else:
        old = spark.read.parquet(os.path.join(path, _VERSIONS_DIR, cur))
        merged = merge_upsert(old, new, keys, order_by, evolve_schema=evolve_schema)
        next_ver = f"v{int(cur[1:]) + 1:08d}"
    # write the full snapshot BEFORE touching the pointer; the merge plan
    # lazily reads the old snapshot, which is never mutated
    merged.write.mode("overwrite").parquet(os.path.join(path, _VERSIONS_DIR, next_ver))
    _commit_pointer(path, next_ver)
    return next_ver


def vacuum_versions(path: str, *, keep: int = 2) -> list[str]:
    """Drop all but the newest ``keep`` committed snapshots plus any
    half-written (crashed) snapshot dirs NEWER than the current pointer.
    Never touches the current snapshot. Returns the removed version ids.

    Concurrent-reader contract (r3 verdict item 6): a reader pinned at a
    vacuumed version either completes (it materialized before the vacuum) or
    fails LOUDLY — it can never silently read a half-deleted snapshot. The
    mechanism is a tombstone RENAME before the recursive delete: rename is
    atomic on POSIX, so the version directory disappears from its committed
    path in one step — an in-flight reader's file list dangles entirely
    (FileNotFound at execution, not a partial scan) and ``read_versioned``'s
    isdir check refuses new pins. A crash between rename and rmtree leaves
    only a ``.del_*`` tombstone, invisible to readers and swept by the next
    vacuum."""
    cur = _current_version(path)
    vdir = os.path.join(path, _VERSIONS_DIR)
    if cur is None or not os.path.isdir(vdir):
        return []
    # sweep tombstones left by a vacuum that crashed between rename+rmtree
    for d in os.listdir(vdir):
        if d.startswith(".del_"):
            shutil.rmtree(os.path.join(vdir, d), ignore_errors=True)
    versions = sorted(d for d in os.listdir(vdir) if d.startswith("v"))
    # uncommitted debris: anything newer than the pointer (crashed writes)
    debris = [v for v in versions if v > cur]
    committed = [v for v in versions if v <= cur]
    drop = debris + (committed[:-keep] if len(committed) > keep else [])
    drop = [v for v in drop if v != cur]
    for v in drop:
        tomb = os.path.join(vdir, f".del_{v}")
        os.rename(os.path.join(vdir, v), tomb)  # atomic: readers see all-or-nothing
        shutil.rmtree(tomb)
    return drop


def write_sorted_mart(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    *,
    target_partitions: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write with a range-clustered layout: ``repartitionByRange`` on
    ``sort_cols`` then sort within partitions, so every output file covers a
    DISJOINT range of the sort key and its parquet min/max footer stats
    actually prune. This is the data-skipping layout (Z-order's 1-D case):
    at 100 TB a time- or key-range query then touches only the files whose
    stats overlap the predicate instead of scanning the mart.

    Use for the read-mostly marts whose dominant predicate is a range on
    ``sort_cols`` (event time, date, id range). Combine with
    ``partition_by`` for coarse-grained directory pruning on a second,
    low-cardinality key."""
    n = target_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


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


def snapshot_diff(
    spark, path: str, v_old: str, v_new: str, key_cols: list[str]
) -> DataFrame:
    """Row-level change feed between two committed snapshots of a
    transactional mart (Delta CDF's table_changes reduction): full-outer
    join on the key with an xxhash64 row fingerprint over the non-key
    columns — emits (keys..., change_type ∈ added|removed|changed) and
    skips unchanged rows. One co-partitioned join; fingerprints are
    computed map-side so only keys + 8-byte hashes shuffle beyond the
    changed payloads."""
    old = read_versioned(spark, path, version=v_old)
    new = read_versioned(spark, path, version=v_new)
    payload = [c for c in old.columns if c not in key_cols]
    fp = lambda df: df.select(  # noqa: E731
        *key_cols, F.xxhash64(*[F.col(c) for c in payload]).alias("__fp")
    )
    o, n = fp(old).alias("o"), fp(new).alias("n")
    cond = None
    for k in key_cols:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full")
    change = (
        F.when(F.col("o.__fp").isNull(), F.lit("added"))
        .when(F.col("n.__fp").isNull(), F.lit("removed"))
        .when(F.col("o.__fp") != F.col("n.__fp"), F.lit("changed"))
    )
    keys_out = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols
    ]
    return (
        joined.select(*keys_out, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


class writer_lock:
    """Advisory single-writer lock for a transactional mart (the missing
    piece called out in the versioned-snapshot docs above: readers are
    always safe, but two concurrent writers could both build v{N+1} and
    race the pointer). ``flock`` on a sidecar file — same guarantee class
    as Delta without a locking LogStore, made explicit:

        with writer_lock(path):
            transactional_upsert_to_path(df, path, keys)

    ``blocking=False`` raises ``WriterLockHeld`` instead of waiting, so a
    second ingest job can back off rather than queue. The lock is advisory
    (cooperating writers only) and process-scoped, like every flock.
    """

    def __init__(self, path: str, *, blocking: bool = True):
        self._path = path
        self._blocking = blocking
        self._fh = None

    def __enter__(self):
        import fcntl

        os.makedirs(self._path, exist_ok=True)
        self._fh = open(os.path.join(self._path, "_WRITER_LOCK"), "w")
        flags = fcntl.LOCK_EX | (0 if self._blocking else fcntl.LOCK_NB)
        try:
            fcntl.flock(self._fh, flags)
        except BlockingIOError as ex:
            self._fh.close()
            self._fh = None
            raise WriterLockHeld(f"another writer holds {self._path}") from ex
        return self

    def __exit__(self, *exc):
        import fcntl

        if self._fh is not None:
            fcntl.flock(self._fh, fcntl.LOCK_UN)
            self._fh.close()
            self._fh = None
        return False


class WriterLockHeld(RuntimeError):
    """Raised by non-blocking ``writer_lock`` when the mart is being written."""


def zorder_key(x, y, *, bits: int = 16):
    """Two-column Morton key — thin delegate to the n-dimensional builder
    in ``operators.layout`` (ONE bit-interleave implementation repo-wide;
    for d=2 column j's bit i lands at 2i+j, identical to the historical
    inline form — integer adds commute, and reading only bits 0..bits-1
    equals the old defensive mask). Inputs must already be quantized to
    ``[0, 2^bits)``."""
    from pyspark.sql import functions as F

    from ..operators.layout import zorder_key as _zk

    xm = F.col(x) if isinstance(x, str) else x
    ym = F.col(y) if isinstance(y, str) else y
    return _zk([xm, ym], bits=bits)


def write_zorder_mart(
    df: DataFrame,
    path: str,
    x_col,
    y_col,
    *,
    bits: int = 16,
    target_partitions: int | None = None,
) -> None:
    """Two-dimensional data-skipping layout (Delta ``OPTIMIZE ZORDER BY``
    reduction): cluster files by the Morton key of (x, y) so a box
    predicate on EITHER or BOTH dimensions overlaps a bounded subset of
    files — the multi-dim generalization of ``write_sorted_mart``, which
    can only serve one dimension. The ``__zkey`` column is PERSISTED so
    readers can range-filter on it directly (min/max footer stats prune);
    delegates to ``operators.layout.write_zordered`` with keep_key."""
    from ..operators.layout import write_zordered

    n = target_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    xm = F.col(x_col) if isinstance(x_col, str) else x_col
    ym = F.col(y_col) if isinstance(y_col, str) else y_col
    write_zordered(df, path, [xm, ym], bits=bits, target_files=n, keep_key=True)


def merge_aggregate_mart(
    old: DataFrame | None,
    delta_agg: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental view maintenance for an additive aggregate mart: the
    delta batch's PARTIAL aggregates merge into the mart by summing
    per-key — the opposite contract from ``merge_upsert`` (which
    REPLACES a key's row). Valid for any commutative-monoid measure
    (counts, sums, min/max with the right combiner); averages must be
    carried as (sum, count) pairs and derived on read.

    At 100 TB this is why a daily ingest costs O(delta): the fact table
    is never re-scanned — each batch aggregates itself and merges
    key-wise into the mart (one small shuffle on the mart key)."""
    if old is None:
        return delta_agg
    allc = keys + sum_cols
    stacked = old.select(*allc).unionByName(delta_agg.select(*allc))
    return stacked.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def merge_aggregate_mart_to_path(
    delta_agg: DataFrame, path: str, keys: list[str], sum_cols: list[str]
) -> None:
    """Path-level IVM merge: read the mart if present, additively merge
    the delta's partial aggregates, swap. Same non-atomic caveat as
    ``upsert_to_path``; wrap with ``writer_lock`` / use the
    transactional mart for crash safety."""
    spark = delta_agg.sparkSession
    if not os.path.exists(path):
        delta_agg.write.mode("overwrite").parquet(path)
        return
    old = spark.read.parquet(path)
    merged = merge_aggregate_mart(old, delta_agg, keys, sum_cols)
    _write_and_swap(merged, path, prefix="ivm_")
