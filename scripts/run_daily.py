"""Daily pipeline driver — the engine's cron entry point.

Replaces the reference's per-script cron fan (SURVEY.md §3): one invocation
processes a target day end-to-end over a marts directory, from API-shaped
JSON-lines payload drops (the connector's output). Stages run in dependency
order and each stage is skipped gracefully when its payload file is absent
(exactly like a reference cron script no-oping on an empty API response).

Usage:
  python scripts/run_daily.py --payloads DIR --marts DIR [--date YYYY-MM-DD]
  python scripts/run_daily.py ... --backfill 2025-08-01:2025-08-05

Every sink is a keyed upsert / date-partition overwrite, so re-running any
day converges (the reference's idempotent ON DUPLICATE KEY UPDATE contract).
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pipeline_etl_ecommerce_spark import schemas  # noqa: E402
from pipeline_etl_ecommerce_spark.plans.bridge import consolidate_mapa  # noqa: E402
from pipeline_etl_ecommerce_spark.plans.catalog import sync_catalog  # noqa: E402
from pipeline_etl_ecommerce_spark.plans.consolidation import consolidate_daily  # noqa: E402
from pipeline_etl_ecommerce_spark.plans.listings import sync_listings  # noqa: E402
from pipeline_etl_ecommerce_spark.plans.sales import transform_orders  # noqa: E402
from pipeline_etl_ecommerce_spark.plans.traffic import process_traffic_tasks  # noqa: E402
from pipeline_etl_ecommerce_spark.session import get_spark  # noqa: E402
from pipeline_etl_ecommerce_spark.sources.readers import read_json_payloads  # noqa: E402
from pipeline_etl_ecommerce_spark.sources.sinks import (  # noqa: E402
    append_to_path,
    upsert_to_path,
)

LATENESS_DAYS = 3  # the reference's D-3 rule (tarefa_consolidar_dados.php:29)


def _payload(spark, payload_dir: str, name: str, schema):
    path = os.path.join(payload_dir, f"{name}.jsonl")
    if not os.path.exists(path):
        return None
    return read_json_payloads(spark, path, schema)


def run_day(spark, payload_dir: str, marts: str, day: dt.date) -> dict[str, int]:
    """Process one day; returns per-mart row counts for logging."""
    stats: dict[str, int] = {}

    # --- dims ---
    tiny = _payload(
        spark,
        payload_dir,
        "tiny_products",
        "id long, codigo string, nome string, classe_produto string, idProdutoPai long, preco_custo string, ean string",
    )
    if tiny is not None:
        cat = sync_catalog(tiny)
        upsert_to_path(cat, f"{marts}/produtos_catalogo", ["sku"])
        stats["produtos_catalogo"] = cat.count()

    listings = _payload(spark, payload_dir, "listings", schemas.MELI_LISTING)
    if listings is not None:
        anuncios = sync_listings(listings)
        upsert_to_path(anuncios, f"{marts}/anuncios_canais", ["id_anuncio_canal"])
        stats["anuncios_canais"] = anuncios.count()

    cat_path = f"{marts}/produtos_catalogo"
    an_path = f"{marts}/anuncios_canais"
    if os.path.exists(cat_path) and os.path.exists(an_path):
        mapa, alertas = consolidate_mapa(spark.read.parquet(cat_path), spark.read.parquet(an_path))
        upsert_to_path(mapa, f"{marts}/mapa_produtos_anuncios", ["id_anuncio_canal"])
        n_alerts = alertas.count()
        if n_alerts:
            append_to_path(
                alertas.withColumn("data_alerta", F.lit(str(day)).cast("date")), f"{marts}/alertas_mapa"
            )
        stats["mapa_produtos_anuncios"] = mapa.count()
        stats["alertas"] = n_alerts

    # --- facts ---
    orders = _payload(spark, payload_dir, "orders", schemas.MELI_ORDER)
    shipments = _payload(spark, payload_dir, "shipments", "shipping_id long, logistic_type string, list_cost double")
    if orders is not None:
        if shipments is None:
            shipments = spark.createDataFrame([], "shipping_id long, logistic_type string, list_cost double")
        vendas = transform_orders(orders, shipments)
        upsert_to_path(vendas, f"{marts}/vendas_financeiro", ["id_ordem", "id_anuncio", "id_variacao"])
        stats["vendas_financeiro"] = vendas.count()

    visits = _payload(spark, payload_dir, "visits", schemas.MELI_VISITS)
    ads = _payload(
        spark,
        payload_dir,
        "ads_metrics",
        "id_anuncio string, data_metrica date, clicks int, prints int, cost double, units_quantity int, total_amount double, organic_items_quantity int",
    )
    if os.path.exists(an_path) and (visits is not None or ads is not None):
        active = (
            spark.read.parquet(an_path)
            .filter(F.col("status") == "active")
            .select(F.col("id_anuncio_pai").alias("id_anuncio"))
            .distinct()
            .withColumn("data_metrica", F.lit(str(day)).cast("date"))
        )
        empty_visits = spark.createDataFrame([], schemas.MELI_VISITS)
        empty_ads = spark.createDataFrame(
            [],
            "id_anuncio string, data_metrica date, clicks int, prints int, cost double, units_quantity int, total_amount double, organic_items_quantity int",
        )
        trafego = process_traffic_tasks(
            active, visits if visits is not None else empty_visits, ads if ads is not None else empty_ads
        )
        upsert_to_path(trafego, f"{marts}/trafego_diario", ["id_anuncio", "data_metrica"])
        stats["trafego_diario"] = trafego.count()

    # --- flagship consolidation ---
    needed = ["vendas_financeiro", "trafego_diario", "mapa_produtos_anuncios", "produtos_catalogo"]
    if all(os.path.exists(f"{marts}/{t}") for t in needed):
        rel = consolidate_daily(
            spark.read.parquet(f"{marts}/vendas_financeiro"),
            spark.read.parquet(f"{marts}/trafego_diario"),
            spark.read.parquet(f"{marts}/mapa_produtos_anuncios"),
            spark.read.parquet(f"{marts}/produtos_catalogo"),
            day,
        )
        upsert_to_path(rel, f"{marts}/relatorio_diario", ["data_relatorio", "id_anuncio_variacao"])
        stats["relatorio_diario"] = rel.count()

    return stats


JOURNAL_NAME = "_backfill_journal"


def run_backfill(
    spark,
    payload_dir: str,
    marts: str,
    start: dt.date,
    end: dt.date,
    *,
    day_fn=run_day,
) -> list[dt.date]:
    """Resumable multi-day consolidation (the reference's commented backfill
    loop, ``tarefa_consolidar_dados.php:33-49``, made first-class): process
    every day in [start, end] IN ORDER, journaling each completed day to
    ``marts/_backfill_journal`` (single ``day`` column — the same
    processed-days shape ``streaming.runner.incremental_day_targets``
    consumes). A crashed run resumes where it stopped: already-journaled
    days are skipped, and the in-flight day re-runs safely because every
    sink is a keyed upsert (the journal row is appended only AFTER the day
    completes — at-least-once day execution, exactly-once day effects).

    Returns the days actually processed this invocation."""
    journal_path = os.path.join(marts, JOURNAL_NAME)
    done: set[dt.date] = set()
    if os.path.exists(journal_path):
        done = {r[0] for r in spark.read.parquet(journal_path).select("day").collect()}
    processed = []
    for i in range((end - start).days + 1):
        day = start + dt.timedelta(days=i)
        if day in done:
            continue
        stats = day_fn(spark, payload_dir, marts, day)
        print(f"[{day}] " + ", ".join(f"{k}={v}" for k, v in stats.items()))
        # journal append is the commit point for the day
        spark.createDataFrame([(day,)], "day date").write.mode("append").parquet(journal_path)
        processed.append(day)
    return processed


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--payloads", required=True, help="dir with <name>.jsonl payload drops")
    ap.add_argument("--marts", required=True, help="output marts directory")
    ap.add_argument("--date", default=None, help="target day (default: today - 3)")
    ap.add_argument(
        "--backfill",
        default=None,
        help="START:END inclusive date range; journaled per completed day "
        "under <marts>/_backfill_journal, so a crashed run resumes where it "
        "stopped (re-invoke with the same range)",
    )
    args = ap.parse_args(argv)

    spark = get_spark("run-daily")
    spark.sparkContext.setLogLevel("ERROR")

    if args.backfill:
        start_s, end_s = args.backfill.split(":")
        start, end = dt.date.fromisoformat(start_s), dt.date.fromisoformat(end_s)
        run_backfill(spark, args.payloads, args.marts, start, end)
        return 0
    if args.date:
        days = [dt.date.fromisoformat(args.date)]
    else:
        days = [dt.date.today() - dt.timedelta(days=LATENESS_DAYS)]

    for day in days:
        stats = run_day(spark, args.payloads, args.marts, day)
        print(f"[{day}] " + ", ".join(f"{k}={v}" for k, v in stats.items()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
