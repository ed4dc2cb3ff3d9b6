"""Property tests for the round-5 surfaces: the max_by aggregate route
must equal the row_number window route on random event sets, the table
checksum must be invariant to physical row order but sensitive to any row
mutation, and the single-pass head/tail explode must equal the naive
two-branch union."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def _random_events(spark, rng: random.Random, n_users=10, n_events=200):
    rows = [
        (
            i,  # event_id (unique)
            rng.randrange(n_users),  # user_id
            rng.randrange(0, 10_000),  # tus (ties across events likely)
            rng.choice(["click", "view", "purchase"]),
        )
        for i in range(n_events)
    ]
    rng.shuffle(rows)
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, tus bigint, event_type string"
    )


def test_max_by_equals_window_route_on_random_events(spark):
    """The aggregate argmax (one partial-aggregated shuffle) and the W7
    row_number window (per-key sort) are two plans for the same semantics;
    with the (tus, event_id) total order they must agree row-for-row even
    when timestamps tie."""
    rng = random.Random(505)
    e = _random_events(spark, rng)
    agg = {
        (r["user_id"], r["last_event_type"])
        for r in e.groupBy("user_id")
        .agg(F.expr("max_by(event_type, struct(tus, event_id))").alias("last_event_type"))
        .collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.desc("tus"), F.desc("event_id"))
    win = {
        (r["user_id"], r["event_type"])
        for r in e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert agg == win


def _checksum(df):
    canon = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("tus").cast("string"),
        F.col("user_id").cast("string"),
        F.coalesce(F.col("event_type"), F.lit("~")),
    )
    v = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(v).alias("sum_v")
    ).collect()[0]
    return (row["n"], row["sum_v"])


def test_checksum_order_invariant_and_mutation_sensitive(spark):
    rng = random.Random(506)
    e = _random_events(spark, rng)
    base = _checksum(e)
    # physical order / partitioning changes must not move the checksum
    assert _checksum(e.repartition(7)) == base
    assert _checksum(e.orderBy(F.desc("tus"))) == base
    # any single-row mutation must move it
    mutated = e.withColumn(
        "event_type",
        F.when(F.col("event_id") == 0, F.lit("MUTATED")).otherwise(F.col("event_type")),
    )
    assert _checksum(mutated) != base
    # dropping a row changes both count and sum
    assert _checksum(e.filter(F.col("event_id") != 1)) != base


def test_head_tail_single_pass_equals_union_route(spark):
    rng = random.Random(507)
    rows = [
        (rng.choice(["pt", "en", "es"]), i, rng.randrange(0, 50))
        for i in range(120)
    ]
    d = spark.createDataFrame(rows, "lang string, doc_id bigint, n_chars bigint")
    wa = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wd = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.desc("doc_id"))
    t = d.select(
        "lang", "doc_id", "n_chars",
        F.row_number().over(wa).cast("long").alias("ra"),
        F.row_number().over(wd).cast("long").alias("rd"),
    )
    tags = F.filter(
        F.array(
            F.struct(F.lit("head").alias("sample_end"), F.col("ra").alias("rn")),
            F.struct(F.lit("tail").alias("sample_end"), F.col("rd").alias("rn")),
        ),
        lambda s: s["rn"] <= 2,
    )
    single = {
        tuple(r)
        for r in t.select("lang", "doc_id", "n_chars", F.explode(tags).alias("s"))
        .select("lang", "doc_id", "n_chars", "s.sample_end", "s.rn")
        .collect()
    }
    union = {
        tuple(r)
        for r in t.filter(F.col("ra") <= 2)
        .select("lang", "doc_id", "n_chars", F.lit("head"), "ra")
        .unionAll(
            t.filter(F.col("rd") <= 2)
            .select("lang", "doc_id", "n_chars", F.lit("tail"), "rd")
        )
        .collect()
    }
    assert single == union
