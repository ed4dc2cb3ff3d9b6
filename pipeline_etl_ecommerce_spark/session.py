"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads); the
same configs are the ones we'd set on a 1000-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, plan re-optimization) —
  at 100 TB the static shuffle-partition guess is always wrong; AQE fixes it.
- ``spark.sql.shuffle.partitions`` sized to the local core count for tests;
  on a real cluster AQE's coalescing makes the initial number a ceiling.
- Arrow enabled so any ``applyInPandas``/``mapInPandas`` operator (multimodal,
  embedding kernels) moves data in vectorized batches, never row-at-a-time.
- Session timezone pinned to ``America/Sao_Paulo`` — the reference's business
  timezone (reference ``tarefa_coletar_financas.php:89-91``); date-grain
  semantics must be stable regardless of host tz.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_TZ = "America/Sao_Paulo"


def get_spark(
    app_name: str = "pipeline-etl-ecommerce-spark",
    *,
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    tz: str = DEFAULT_TZ,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", tz)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession, *, tz: str | None = None) -> SparkSession:
    """Apply the engine's runtime-settable configs to an existing session.

    Used when the caller (e.g. the verification driver) owns the session and
    we can only adjust dynamic confs, not JVM-startup ones.
    """
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    if tz:
        spark.conf.set("spark.sql.session.timeZone", tz)
    return spark
