"""Readers: parquet test tables, JSON ingestion payloads, JDBC marts.

The reference scans MySQL tables into PHP hash maps (SURVEY.md §2.1 S1-S3);
here every table is a DataFrame scan that Catalyst prunes/pushes into. REST
pagination (S4-S7) is an ingestion concern outside the engine; its payloads
enter as JSON files with the explicit schemas in ``schemas.py`` — never
schema inference in production paths (inference is a full extra pass over
100 TB of input).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Column pruning + predicate pushdown reach the
    parquet scan automatically because callers express filters/projections
    declaratively (verify with ``df.explain('formatted')`` → PushedFilters)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's TPC-H-ish tables as a dict of DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def read_json_payloads(
    spark: SparkSession, path: str | list[str], schema: StructType, *, multiline: bool = False
) -> DataFrame:
    """Read API-shaped JSON payloads with an explicit schema (SURVEY.md §2.1 S4-S8).

    ``path`` may be a directory/glob or an explicit list of files (the REST
    landing zone passes the exact files it just landed).
    ``multiline=True`` for pretty-printed single-document files; default is
    JSON-lines, the scalable layout (splittable → parallel scan)."""
    reader = spark.read.schema(schema)
    if multiline:
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Production-path reader for the reference's MySQL marts.

    Always pass ``partition_column`` bounds for big tables — without them the
    JDBC source reads through a single connection (one task), which cannot
    scale past one executor.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000_000))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def register_catalog(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> list[str]:
    """Register every testdata table as a temp view so callers can use plain
    ``spark.sql`` over the catalog (the engine is DataFrame-first, but the
    SQL surface is free — same Catalyst plans). Returns the view names."""
    names = []
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            if name == "events":
                # nanosecond timestamps need the legacy long read (see
                # testdata_queries._events)
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.read.parquet(path).createOrReplaceTempView(name)
            names.append(name)
    return names
