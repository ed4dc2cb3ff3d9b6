"""Tests for keyed sinks (SURVEY.md §2.1 S9-S13)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark.sources.sinks import (
    dedupe_last_wins,
    insert_if_absent,
    keyed_update,
    merge_upsert,
    overwrite_date_partitions,
    read_versioned,
    replace_groups,
    replace_groups_to_path,
    transactional_upsert_to_path,
    upsert_to_path,
    vacuum_versions,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v int, ts long")


def test_merge_upsert_replaces_matched_keys(spark):
    old = _df(spark, [("a", 1, 1), ("b", 2, 1)])
    new = _df(spark, [("b", 20, 2), ("c", 30, 2)])
    got = {r["k"]: r["v"] for r in merge_upsert(old, new, ["k"]).collect()}
    assert got == {"a": 1, "b": 20, "c": 30}


def test_merge_upsert_last_wins_within_batch(spark):
    old = _df(spark, [("a", 1, 1)])
    new = _df(spark, [("a", 10, 2), ("a", 99, 5), ("a", 50, 3)])
    got = merge_upsert(old, new, ["k"], order_by=["ts"]).collect()
    assert len(got) == 1 and got[0]["v"] == 99


def test_insert_if_absent_ignores_existing(spark):
    existing = _df(spark, [("a", 1, 1)])
    new = _df(spark, [("a", 10, 2), ("b", 20, 2), ("b", 21, 3)])
    got = {r["k"]: r["v"] for r in insert_if_absent(existing, new, ["k"]).collect()}
    assert set(got) == {"b"}  # 'a' ignored; 'b' deduped to one row


def test_keyed_update_does_not_insert(spark):
    target = _df(spark, [("a", 1, 1), ("b", 2, 1)])
    updates = _df(spark, [("b", 20, 2), ("zzz", 99, 2)])
    got = {r["k"]: r["v"] for r in keyed_update(target, updates, ["k"], ["v"]).collect()}
    assert got == {"a": 1, "b": 20}  # 'zzz' not inserted (S12 update-only)


def test_replace_groups_drops_stale_tail_rows(spark):
    """A shrinking group (doc re-chunked to FEWER rows) must lose its old
    tail — merge_upsert on the composite key would keep ('a', 2)."""
    old = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 11), ("a", 2, 12), ("b", 0, 20)], "g string, i int, v int"
    )
    new = spark.createDataFrame([("a", 0, 99), ("a", 1, 98)], "g string, i int, v int")
    got = sorted((r["g"], r["i"], r["v"]) for r in replace_groups(old, new, ["g"]).collect())
    assert got == [("a", 0, 99), ("a", 1, 98), ("b", 0, 20)]


def test_replace_groups_to_path_roundtrip(spark, tmp_path):
    path = os.path.join(str(tmp_path), "groups")
    df = spark.createDataFrame([("a", 0, 1), ("a", 1, 2), ("b", 0, 3)], "g string, i int, v int")
    replace_groups_to_path(df, path, ["g"])
    shorter = spark.createDataFrame([("a", 0, 9)], "g string, i int, v int")
    replace_groups_to_path(shorter, path, ["g"])
    got = sorted((r["g"], r["i"], r["v"]) for r in spark.read.parquet(path).collect())
    assert got == [("a", 0, 9), ("b", 0, 3)]


def test_dedupe_last_wins(spark):
    df = _df(spark, [("a", 1, 1), ("a", 2, 9), ("a", 3, 5)])
    got = dedupe_last_wins(df, ["k"], ["ts"]).collect()
    assert len(got) == 1 and got[0]["v"] == 2


def test_upsert_to_path_roundtrip(spark, tmp_path):
    path = os.path.join(str(tmp_path), "mart")
    upsert_to_path(_df(spark, [("a", 1, 1), ("b", 2, 1)]), path, ["k"])
    upsert_to_path(_df(spark, [("b", 20, 2), ("c", 30, 2)]), path, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1, "b": 20, "c": 30}


def test_transactional_upsert_roundtrip(spark, tmp_path):
    path = os.path.join(str(tmp_path), "tmart")
    v1 = transactional_upsert_to_path(_df(spark, [("a", 1, 1), ("b", 2, 1)]), path, ["k"])
    v2 = transactional_upsert_to_path(_df(spark, [("b", 20, 2), ("c", 30, 2)]), path, ["k"])
    assert (v1, v2) == ("v00000001", "v00000002")
    got = {r["k"]: r["v"] for r in read_versioned(spark, path).collect()}
    assert got == {"a": 1, "b": 20, "c": 30}
    # previous snapshot still intact (readable during/after the new write)
    old = {r["k"]: r["v"] for r in spark.read.parquet(os.path.join(path, "_v", v1)).collect()}
    assert old == {"a": 1, "b": 2}


def test_transactional_upsert_crash_between_write_and_commit(spark, tmp_path, monkeypatch):
    """Kill the writer AFTER the new snapshot is fully written but BEFORE the
    pointer swap: the mart must still read as the previous committed version,
    and the next vacuum must clear the orphaned snapshot."""
    import pipeline_etl_ecommerce_spark.sources.sinks as sinks

    path = os.path.join(str(tmp_path), "tmart")
    transactional_upsert_to_path(_df(spark, [("a", 1, 1)]), path, ["k"])

    def boom(_path, _version):
        raise RuntimeError("simulated crash before pointer commit")

    monkeypatch.setattr(sinks, "_commit_pointer", boom)
    try:
        transactional_upsert_to_path(_df(spark, [("a", 99, 2)]), path, ["k"])
    except RuntimeError:
        pass
    monkeypatch.undo()

    # still readable, still the OLD committed content
    got = {r["k"]: r["v"] for r in read_versioned(spark, path).collect()}
    assert got == {"a": 1}
    # the half-committed v2 dir exists as debris, then vacuum removes it
    assert os.path.isdir(os.path.join(path, "_v", "v00000002"))
    assert vacuum_versions(path) == ["v00000002"]
    # a later upsert commits cleanly on top
    transactional_upsert_to_path(_df(spark, [("a", 7, 3)]), path, ["k"])
    assert {r["k"]: r["v"] for r in read_versioned(spark, path).collect()} == {"a": 7}


def test_vacuum_keeps_newest_committed(spark, tmp_path):
    path = os.path.join(str(tmp_path), "tmart")
    for i in range(4):
        transactional_upsert_to_path(_df(spark, [("a", i, i)]), path, ["k"])
    removed = vacuum_versions(path, keep=2)
    assert removed == ["v00000001", "v00000002"]
    assert {r["v"] for r in read_versioned(spark, path).collect()} == {3}


def test_overwrite_date_partitions_touches_only_delta_days(spark, tmp_path):
    path = os.path.join(str(tmp_path), "daily")
    base = spark.createDataFrame(
        [("2025-08-01", "a", 1), ("2025-08-02", "b", 2)], "d string, k string, v int"
    )
    base.write.partitionBy("d").parquet(path)
    delta = spark.createDataFrame([("2025-08-02", "b", 99)], "d string, k string, v int")
    overwrite_date_partitions(delta, path, "d")
    # partition values are type-inferred on read (string -> date), so compare as str
    got = {(str(r["d"]), r["k"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {("2025-08-01", "a"): 1, ("2025-08-02", "b"): 99}


def test_merge_upsert_null_safe_keys(spark):
    # nullable key component (e.g. vendas' id_variacao): NULL must match NULL
    # or every re-run duplicates those rows
    schema = "k1 long, k2 string, v int"
    old = spark.createDataFrame([(1, None, 10), (1, "a", 20)], schema)
    new = spark.createDataFrame([(1, None, 99)], schema)
    got = {(r["k1"], r["k2"]): r["v"] for r in merge_upsert(old, new, ["k1", "k2"]).collect()}
    assert got == {(1, None): 99, (1, "a"): 20}
    # idempotent: upserting the same batch again changes nothing
    twice = merge_upsert(merge_upsert(old, new, ["k1", "k2"]), new, ["k1", "k2"])
    assert twice.count() == 2


def test_insert_if_absent_null_safe_keys(spark):
    schema = "k1 long, k2 string, v int"
    existing = spark.createDataFrame([(1, None, 10)], schema)
    new = spark.createDataFrame([(1, None, 99), (2, None, 5)], schema)
    got = {(r["k1"], r["k2"]) for r in insert_if_absent(existing, new, ["k1", "k2"]).collect()}
    assert got == {(2, None)}


def test_compact_path_preserves_content(spark, tmp_path):
    from pipeline_etl_ecommerce_spark.sources.sinks import append_to_path, compact_path

    path = str(tmp_path / "mart")
    # simulate streaming debris: many tiny appends -> many tiny files
    for i in range(8):
        append_to_path(spark.range(i * 10, (i + 1) * 10).withColumnRenamed("id", "k"), path)
    import glob

    files_before = glob.glob(f"{path}/*.parquet")
    before = {r["k"] for r in spark.read.parquet(path).collect()}
    assert len(files_before) >= 8

    n = compact_path(spark, path, target_partitions=2)
    files_after = glob.glob(f"{path}/*.parquet")
    assert n == 2 and len(files_after) <= 2
    assert {r["k"] for r in spark.read.parquet(path).collect()} == before


def test_time_travel_read_pinned_version(spark, tmp_path):
    path = str(tmp_path / "tt")
    transactional_upsert_to_path(_df(spark, [("a", 1, 1)]), path, ["k"])
    transactional_upsert_to_path(_df(spark, [("a", 99, 2), ("b", 5, 2)]), path, ["k"])

    # current = v2; v1 is still readable as-of
    assert {r["v"] for r in read_versioned(spark, path).collect()} == {99, 5}
    v1 = {r["v"] for r in read_versioned(spark, path, version="v00000001").collect()}
    assert v1 == {1}

    # future/uncommitted versions refuse to load
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_versioned(spark, path, version="v00000009")

    # vacuum keeps 2 -> v1 survives here; after a third commit it is dropped
    transactional_upsert_to_path(_df(spark, [("c", 7, 3)]), path, ["k"])
    vacuum_versions(path, keep=2)
    with _pytest.raises(FileNotFoundError):
        read_versioned(spark, path, version="v00000001")


def test_write_sorted_mart_files_cover_disjoint_ranges(spark, tmp_path):
    from pipeline_etl_ecommerce_spark.sources.sinks import write_sorted_mart

    path = str(tmp_path / "sorted_mart")
    df = spark.range(0, 10000).withColumnRenamed("id", "k").withColumn(
        "v", (F.col("k") * 7) % 100
    )
    # shuffle the input so the layout is the writer's doing, not luck
    write_sorted_mart(df.orderBy(F.rand(seed=1)), path, ["k"], target_partitions=4)

    import glob

    import pyarrow.parquet as pq

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        ci = next(
            md.row_group(0).column(i)
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "k"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "k"
            )
            mins.append(c.statistics.min)
            maxs.append(c.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 4
    ranges.sort()
    # each file covers a disjoint range of the sort key -> min/max stats prune
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # content survives the re-layout
    assert spark.read.parquet(path).count() == 10000


def test_snapshot_diff_change_feed(spark, tmp_path):
    from pipeline_etl_ecommerce_spark.sources.sinks import snapshot_diff

    path = str(tmp_path / "cdf")
    transactional_upsert_to_path(_df(spark, [("a", 1, 1), ("b", 2, 1)]), path, ["k"])
    transactional_upsert_to_path(_df(spark, [("b", 20, 2), ("c", 30, 2)]), path, ["k"])

    diff = {r.k: r.change_type for r in snapshot_diff(
        spark, path, "v00000001", "v00000002", ["k"]
    ).collect()}
    # a unchanged (absent from the feed), b changed, c added
    assert diff == {"b": "changed", "c": "added"}

    # reverse direction flips added <-> removed
    rev = {r.k: r.change_type for r in snapshot_diff(
        spark, path, "v00000002", "v00000001", ["k"]
    ).collect()}
    assert rev == {"b": "changed", "c": "removed"}


# ---------------------------------------------------------------------------
# Property-based merge laws (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_strat = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", None]),   # key (NULL is an identity!)
        st.integers(min_value=0, max_value=9),    # value
        st.integers(min_value=0, max_value=5),    # ts
    ),
    min_size=0,
    max_size=12,
)


def _kdf(spark, rows):
    return spark.createDataFrame(rows, "k string, v int, ts long") if rows else \
        spark.createDataFrame([], "k string, v int, ts long")


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(old_rows=rows_strat, new_rows=rows_strat)
def test_merge_upsert_laws(spark, old_rows, new_rows):
    old = dedupe_last_wins(_kdf(spark, old_rows), ["k"], order_by=["ts"])
    new = _kdf(spark, new_rows)
    merged = merge_upsert(old, new, ["k"], order_by=["ts"])
    got = {r.k: r.v for r in merged.collect()}

    # key set = old ∪ new (null-safe: None is a key like any other)
    old_keys = {r.k for r in old.collect()}
    new_keys = {k for k, _, _ in new_rows}
    assert set(got) == old_keys | new_keys
    # new keys win with their max-ts row; untouched old keys survive
    best_new = {}
    for k, v, t in new_rows:
        if k not in best_new or (t, v) > (best_new[k][1], best_new[k][0]):
            best_new[k] = (v, t)
    # hypothesis ties: only assert a definite winner when ts is unique-max
    for k in new_keys:
        ts_of_k = sorted(t for kk, _, t in new_rows if kk == k)
        if len(ts_of_k) < 2 or ts_of_k[-1] != ts_of_k[-2]:
            assert got[k] == best_new[k][0]
    for r in old.collect():
        if r.k not in new_keys:
            assert got[r.k] == r.v
    # idempotence: merging the same batch again changes nothing
    again = merge_upsert(merged, new, ["k"], order_by=["ts"])
    assert {r.k: r.v for r in again.collect()} == got


def test_writer_lock_excludes_second_writer(spark, tmp_path):
    from pipeline_etl_ecommerce_spark.sources.sinks import WriterLockHeld, writer_lock

    path = str(tmp_path / "locked")
    with writer_lock(path):
        transactional_upsert_to_path(_df(spark, [("a", 1, 1)]), path, ["k"])
        # a second non-blocking writer must back off while we hold the lock
        import pytest as _pytest

        with _pytest.raises(WriterLockHeld):
            with writer_lock(path, blocking=False):
                pass
    # released: the next writer proceeds
    with writer_lock(path, blocking=False):
        transactional_upsert_to_path(_df(spark, [("b", 2, 2)]), path, ["k"])
    assert read_versioned(spark, path).count() == 2


def test_zorder_key_interleaves_bits_exactly(spark):
    from pipeline_etl_ecommerce_spark.sources.sinks import zorder_key

    def ref(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(x, y) for x in [0, 1, 5, 255, 65535] for y in [0, 2, 7, 1024, 65535]]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key("x", "y").alias("z")).collect()
    }
    assert got == {(x, y): ref(x, y) for x, y in rows}
    # locality sanity: neighbors in both dims stay within a small z-window
    assert abs(ref(10, 10) - ref(11, 11)) < 16


def test_write_zorder_mart_files_cover_disjoint_zkey_ranges(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from pipeline_etl_ecommerce_spark.sources.sinks import write_zorder_mart

    path = str(tmp_path / "zmart")
    df = (
        spark.range(0, 8000)
        .withColumn("x", (F.col("id") * 13) % 256)
        .withColumn("y", (F.col("id") * 29) % 256)
    )
    write_zorder_mart(df.orderBy(F.rand(seed=2)), path, "x", "y", bits=8, target_partitions=4)

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "__zkey"
            )
            mins.append(c.statistics.min)
            maxs.append(c.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint — footer stats actually prune
    # a small 2-D box maps to a bounded zkey interval: the box [0,15]^2
    # lives entirely under zkey < 16*16 (bits interleave), so only files
    # whose range overlaps [0, 256) can contain it
    touching = [r for r in ranges if r[0] < 256]
    assert len(touching) < len(ranges)


def test_merge_aggregate_mart_matches_full_recompute(spark, tmp_path):
    from pipeline_etl_ecommerce_spark.sources.sinks import merge_aggregate_mart_to_path

    path = str(tmp_path / "ivm")
    df = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(300)], "k int, n long, v double"
    )
    for part in range(4):
        delta = df.filter(F.col("n") % 4 == part)
        agg = delta.groupBy("k").agg(
            F.count("*").alias("rows"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("sv"),
        )
        merge_aggregate_mart_to_path(agg, path, ["k"], ["rows", "sv"])
    got = {r["k"]: (r["rows"], float(r["sv"])) for r in spark.read.parquet(path).collect()}
    want = {
        r["k"]: (r["rows"], float(r["sv"]))
        for r in df.groupBy("k")
        .agg(F.count("*").alias("rows"), F.sum(F.col("v").cast("decimal(18,2)")).alias("sv"))
        .collect()
    }
    assert got == want


def test_merge_aggregate_mart_handles_retractions(spark, tmp_path):
    # CDC deletes as NEGATIVE deltas: retracting rows subtracts their
    # partials, converging the mart to the aggregate of the survivors
    from pipeline_etl_ecommerce_spark.sources.sinks import merge_aggregate_mart_to_path

    path = str(tmp_path / "ivm_retract")
    df = spark.createDataFrame(
        [(i % 2, i, float(i)) for i in range(100)], "k int, n long, v double"
    )
    agg_all = df.groupBy("k").agg(
        F.count("*").alias("rows"), F.sum(F.col("v").cast("decimal(18,2)")).alias("sv")
    )
    merge_aggregate_mart_to_path(agg_all, path, ["k"], ["rows", "sv"])
    # retract every n >= 50 by ingesting its negation
    retract = (
        df.filter("n >= 50")
        .groupBy("k")
        .agg(
            (-F.count("*")).alias("rows"),
            (-F.sum(F.col("v").cast("decimal(18,2)"))).alias("sv"),
        )
    )
    merge_aggregate_mart_to_path(retract, path, ["k"], ["rows", "sv"])
    got = {r["k"]: (r["rows"], float(r["sv"])) for r in spark.read.parquet(path).collect()}
    want = {
        r["k"]: (r["rows"], float(r["sv"]))
        for r in df.filter("n < 50")
        .groupBy("k")
        .agg(F.count("*").alias("rows"), F.sum(F.col("v").cast("decimal(18,2)")).alias("sv"))
        .collect()
    }
    assert got == want


def test_vacuum_retention_gives_concurrent_readers_one_commit_grace(spark, tmp_path):
    """The retention contract for readers running WHILE a writer commits:
    a reader that resolved the current snapshot just before a commit is one
    version behind afterwards — with the default keep=2, vacuum must never
    delete that snapshot, so the in-flight (lazy, un-materialized) read
    still completes. Only a reader >= keep commits stale loses its files."""
    from pipeline_etl_ecommerce_spark.sources.sinks import current_snapshot_path

    path = str(tmp_path / "grace")
    transactional_upsert_to_path(_df(spark, [("a", 1, 1)]), path, ["k"])

    # reader resolves v1 and builds a LAZY plan over its files
    pinned = current_snapshot_path(path)
    lazy_reader = spark.read.parquet(pinned)

    # writer commits v2 and vacuums with the default retention
    transactional_upsert_to_path(_df(spark, [("a", 99, 2)]), path, ["k"])
    vacuum_versions(path, keep=2)

    # the one-behind reader still completes against its pinned snapshot
    assert {r["v"] for r in lazy_reader.collect()} == {1}

    # one more commit + vacuum expires v1: a reader two commits stale is
    # out of the retention window by contract
    transactional_upsert_to_path(_df(spark, [("a", 7, 3)]), path, ["k"])
    vacuum_versions(path, keep=2)
    assert not os.path.isdir(pinned)


def test_vacuum_expired_reader_fails_loudly_never_partial(spark, tmp_path):
    """r3 verdict item 6: a reader pinned at a version that vacuum removes
    must either complete (materialized before the vacuum) or fail LOUDLY —
    never silently return a partial/empty snapshot. vacuum's atomic
    tombstone-rename guarantees all-or-nothing visibility."""
    import pytest as _pytest

    from pipeline_etl_ecommerce_spark.sources.sinks import current_snapshot_path, read_versioned

    path = str(tmp_path / "loud")
    transactional_upsert_to_path(_df(spark, [("a", 1, 1), ("b", 2, 1)]), path, ["k"])
    pinned_dir = current_snapshot_path(path)

    # lazy reader over v1, NOT materialized; snapshot-pinned reader too
    lazy = spark.read.parquet(pinned_dir)
    pinned = read_versioned(spark, path, version="v00000001")
    # a reader that materialized before the vacuum completes regardless
    survived = read_versioned(spark, path, version="v00000001").localCheckpoint()

    # three commits push v1 out of the keep=2 window
    transactional_upsert_to_path(_df(spark, [("a", 9, 2)]), path, ["k"])
    transactional_upsert_to_path(_df(spark, [("a", 10, 3)]), path, ["k"])
    removed = vacuum_versions(path, keep=2)
    assert "v00000001" in removed and not os.path.isdir(pinned_dir)

    # loud failure, not a partial result, for both un-materialized readers
    for df in (lazy, pinned):
        with _pytest.raises(Exception) as exc:
            df.collect()
        assert "v00000001" in str(exc.value) or "exist" in str(exc.value).lower()
    # the materialized reader still serves the old snapshot (v1 state:
    # a->1, b->2 — the later commits' a->9/a->10 must not leak in)
    assert {(r["k"], r["v"]) for r in survived.collect()} == {("a", 1), ("b", 2)}
    # a NEW pin of the vacuumed version is refused up-front
    with _pytest.raises(FileNotFoundError, match="vacuumed"):
        read_versioned(spark, path, version="v00000001")


def test_vacuum_tombstone_crash_is_swept_and_invisible(spark, tmp_path):
    """A vacuum that crashes between tombstone-rename and rmtree leaves only
    a .del_* dir: invisible to read_versioned (the committed path is gone in
    one atomic step) and swept by the next vacuum."""
    import pytest as _pytest

    from pipeline_etl_ecommerce_spark.sources.sinks import _VERSIONS_DIR, read_versioned

    path = str(tmp_path / "tomb")
    transactional_upsert_to_path(_df(spark, [("a", 1, 1)]), path, ["k"])
    transactional_upsert_to_path(_df(spark, [("a", 2, 2)]), path, ["k"])
    transactional_upsert_to_path(_df(spark, [("a", 3, 3)]), path, ["k"])
    vdir = os.path.join(path, _VERSIONS_DIR)
    # simulate the crash: v1 renamed to tombstone, rmtree never ran
    os.rename(os.path.join(vdir, "v00000001"), os.path.join(vdir, ".del_v00000001"))
    with _pytest.raises(FileNotFoundError, match="vacuumed"):
        read_versioned(spark, path, version="v00000001")
    vacuum_versions(path, keep=2)
    assert not any(d.startswith(".del_") for d in os.listdir(vdir))
    # current snapshot unaffected throughout
    assert {r["v"] for r in read_versioned(spark, path).collect()} == {3}


def test_merge_upsert_schema_drift_raises_by_default(spark):
    """r9: a batch whose columns drift from the target must fail loudly —
    the pre-r9 code silently dropped columns the target lacked."""
    import pytest

    old = _df(spark, [("a", 1, 1)])
    widened = spark.createDataFrame(
        [("b", 2, 2, 0.5)], "k string, v int, ts long, discount double"
    )
    with pytest.raises(ValueError, match="schema drifts"):
        merge_upsert(old, widened, ["k"])
    narrowed = spark.createDataFrame([("b", 2)], "k string, v int")
    with pytest.raises(ValueError, match="schema drifts"):
        merge_upsert(old, narrowed, ["k"])


def test_merge_upsert_missing_key_raises_before_dedupe(spark):
    """r10 (ADVICE r9): a batch missing a KEY column must raise the loud
    ValueError up front — it used to fail inside dedupe_last_wins with an
    opaque AnalysisException — and evolve_schema cannot waive it (a key is
    the row identity)."""
    import pytest

    old = _df(spark, [("a", 1, 1)])
    keyless = spark.createDataFrame([(2, 2)], "v int, ts long")
    with pytest.raises(ValueError, match="lacks key column"):
        merge_upsert(old, keyless, ["k"])
    with pytest.raises(ValueError, match="lacks key column"):
        merge_upsert(old, keyless, ["k"], evolve_schema=True)


def test_merge_upsert_retyped_column_raises_by_default(spark):
    """r10 (ADVICE r9): a same-NAME column whose TYPE drifts used to slip
    past the name-only check and die later in unionByName; now it raises
    up front, and evolve_schema=True opts into Spark's union coercion
    (int -> long widens cleanly)."""
    import pytest

    old = _df(spark, [("a", 1, 1)])
    retyped = spark.createDataFrame([("b", 2, 2)], "k string, v bigint, ts long")
    with pytest.raises(ValueError, match="retypes column"):
        merge_upsert(old, retyped, ["k"])
    got = {
        r["k"]: r["v"]
        for r in merge_upsert(old, retyped, ["k"], evolve_schema=True).collect()
    }
    assert got == {"a": 1, "b": 2}


def test_merge_upsert_evolve_schema_null_backfills(spark):
    """evolve_schema=True: union-by-name with NULL on both sides (the
    Delta mergeSchema contract for MERGE)."""
    old = _df(spark, [("a", 1, 1)])
    widened = spark.createDataFrame(
        [("b", 2, 2, 0.5)], "k string, v int, ts long, discount double"
    )
    got = {
        r["k"]: (r["v"], r["discount"])
        for r in merge_upsert(old, widened, ["k"], evolve_schema=True).collect()
    }
    assert got == {"a": (1, None), "b": (2, 0.5)}


def test_transactional_upsert_schema_evolution_mid_stream(spark, tmp_path):
    """r8 verdict item 7: a NEW column arriving mid-stream lands as a new
    snapshot version with NULL backfill for pre-existing keys; the same
    batch WITHOUT the opt-in fails before any snapshot is written (the
    pointer still aims at the old version)."""
    import pytest

    path = str(tmp_path / "mart")
    v1 = transactional_upsert_to_path(_df(spark, [("a", 1, 1), ("b", 2, 1)]), path, ["k"])
    widened = spark.createDataFrame(
        [("b", 20, 2, "EUR"), ("c", 30, 2, "USD")],
        "k string, v int, ts long, currency string",
    )
    with pytest.raises(ValueError, match="schema drifts"):
        transactional_upsert_to_path(widened, path, ["k"])
    assert read_versioned(spark, path).columns == ["k", "v", "ts"]  # v1 intact
    v2 = transactional_upsert_to_path(widened, path, ["k"], evolve_schema=True)
    assert v2 > v1
    got = {
        r["k"]: (r["v"], r["currency"]) for r in read_versioned(spark, path).collect()
    }
    assert got == {"a": (1, None), "b": (20, "EUR"), "c": (30, "USD")}
