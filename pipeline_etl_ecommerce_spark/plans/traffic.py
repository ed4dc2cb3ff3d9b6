"""Traffic worker transform: queued (listing, day) tasks → ``trafego_diario``.

Spark restatement of reference ``worker_processar_trafego.php`` (SURVEY.md
§2.3 J9, §2.9 E3): per task, match the visits time-window payload on the
task's calendar day (day-trunc of the result date), pull the six ads metrics
with zero defaults, upsert keyed (id_anuncio, data_metrica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def process_traffic_tasks(tasks: DataFrame, visits: DataFrame, ads_metrics: DataFrame) -> DataFrame:
    """tasks: claimed queue rows (id_anuncio, data_metrica) — see
    ``plans.queues.claim_batch`` for the locking semantics.
    visits: ``schemas.MELI_VISITS`` payloads (id_anuncio, results[date,total]).
    ads_metrics: (id_anuncio, data_metrica, clicks, prints, cost,
    units_quantity, total_amount, organic_items_quantity) — the reference's
    per-task ads API response (lines 76-87).
    """
    # E3 + J9: explode daily visit rows, keep the one matching the task's day
    # (reference substr(date,0,10) == data_metrica, lines 57-70)
    visit_days = (
        visits.select(F.col("id_anuncio").alias("v_id_anuncio"), F.explode("results").alias("r"))
        .select(
            "v_id_anuncio",
            F.to_date(F.substring(F.col("r.date"), 1, 10)).alias("v_date"),
            F.col("r.total").cast("int").alias("v_total"),
        )
        # first match wins (reference breaks on first hit)
        .groupBy("v_id_anuncio", "v_date")
        .agg(F.first("v_total").alias("visitas"))
    )

    ads = ads_metrics.select(
        F.col("id_anuncio").alias("a_id_anuncio"),
        F.col("data_metrica").alias("a_data"),
        F.col("clicks").alias("a_clicks"),
        F.col("prints").alias("a_prints"),
        F.col("cost").alias("a_cost"),
        F.col("units_quantity").alias("a_units"),
        F.col("total_amount").alias("a_amount"),
        F.col("organic_items_quantity").alias("a_organic"),
    )

    return (
        tasks.select("id_anuncio", "data_metrica")
        .join(
            F.broadcast(visit_days),
            (F.col("id_anuncio") == F.col("v_id_anuncio")) & (F.col("data_metrica") == F.col("v_date")),
            "left",
        )
        .join(
            F.broadcast(ads),
            (F.col("id_anuncio") == F.col("a_id_anuncio")) & (F.col("data_metrica") == F.col("a_data")),
            "left",
        )
        .select(
            "id_anuncio",
            "data_metrica",
            F.coalesce(F.col("a_clicks"), F.lit(0)).cast("int").alias("cliques_ads"),
            F.coalesce(F.col("a_prints"), F.lit(0)).cast("int").alias("impressoes_ads"),
            F.coalesce(F.col("a_cost"), F.lit(0.0)).cast("double").alias("custo_ads"),
            F.coalesce(F.col("a_units"), F.lit(0)).cast("int").alias("vendas_ads_qtd"),
            F.coalesce(F.col("visitas"), F.lit(0)).cast("int").alias("visitas_totais"),
            F.coalesce(F.col("a_organic"), F.lit(0)).cast("int").alias("vendas_organicas_qtd"),
            F.coalesce(F.col("a_amount"), F.lit(0.0)).cast("double").alias("faturamento_total_ads"),
        )
    )
