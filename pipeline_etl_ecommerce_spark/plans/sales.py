"""Sales ingestion transform: Meli orders → ``vendas_financeiro`` fact.

Spark restatement of the engine part of reference ``tarefa_coletar_financas.php``
(SURVEY.md §3.2): the HTTP pagination/N+1 fetches are a connector concern; the
dataflow is

  orders ⨝ shipments (left, J8) → tz-convert date (F2) → explode order_items
  (E1) → per-order revenue window (A4) → freight rateio (W6) → derived money
  columns → keyed upsert (S9).

Scale: explode + window both partition on the order key, one shuffle total;
everything else is per-row expression inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def transform_orders(orders: DataFrame, shipments: DataFrame) -> DataFrame:
    """orders uses ``schemas.MELI_ORDER``; shipments carries the per-shipment
    detail the reference fetches N+1 style (reference lines 107-119):
    (shipping_id, logistic_type, list_cost).

    Output grain: one row per (id_ordem, order item) with the reference's
    derived columns (reference lines 121-143).
    """
    enriched = (
        orders.join(
            F.broadcast(shipments),
            orders["shipping"]["id"] == shipments["shipping_id"],
            "left",
        )
        # 'N/A' default + self_service freight exclusion (reference lines 105-117)
        .withColumn("logistic_type", F.coalesce(F.col("logistic_type"), F.lit("N/A")))
        .withColumn(
            "custo_frete_vendedor",
            F.when(
                F.col("logistic_type") != "self_service", F.coalesce(F.col("list_cost"), F.lit(0.0))
            ).otherwise(F.lit(0.0)),
        )
        # F2: ISO8601-with-offset → SP wall clock; malformed → NULL (lines
        # 79-98). try_to_timestamp because ANSI mode (Spark 4 default) makes
        # plain to_timestamp throw on garbage — the reference catches and nulls.
        .withColumn("data_venda", F.try_to_timestamp(F.col("date_created")))
    )

    item = F.explode("order_items")  # E1 (line 126)
    exploded = enriched.select(
        F.col("id").alias("id_ordem"),
        F.col("pack_id"),
        "data_venda",
        "logistic_type",
        "custo_frete_vendedor",
        item.alias("oi"),
    ).select(
        "id_ordem",
        "pack_id",
        "data_venda",
        "logistic_type",
        "custo_frete_vendedor",
        F.col("oi.item.id").alias("id_anuncio"),
        F.col("oi.item.variation_id").alias("id_variacao"),
        F.coalesce(F.col("oi.item.seller_sku"), F.lit("")).alias("sku"),  # '' default (line 129)
        F.col("oi.quantity").cast("int").alias("qtd_vendida"),
        F.col("oi.unit_price").cast("double").alias("preco_unitario"),
        F.coalesce(F.col("oi.sale_fee"), F.lit(0.0)).cast("double").alias("tarifa_ml"),
    )

    # A4 denominator + W6 rateio, computed in the reference's operation order:
    # prop = bruto / total; frete_rateado = frete * prop (lines 121-135)
    w = Window.partitionBy("id_ordem")
    bruto = F.col("preco_unitario") * F.col("qtd_vendida")
    total = F.sum(bruto).over(w)
    prop = F.when(total > 0, bruto / total).otherwise(F.lit(0.0))

    return (
        exploded.withColumn("faturamento_bruto_item", bruto)
        .withColumn("custo_frete_rateado", F.col("custo_frete_vendedor") * prop)
        .withColumn(
            "liquido_recebido",
            F.col("faturamento_bruto_item") - F.col("tarifa_ml") - F.col("custo_frete_rateado"),
        )
        .select(
            "id_ordem",
            "pack_id",
            "id_anuncio",
            "id_variacao",
            "sku",
            "data_venda",
            "qtd_vendida",
            "preco_unitario",
            "faturamento_bruto_item",
            "tarifa_ml",
            "custo_frete_rateado",
            "liquido_recebido",
            "logistic_type",
        )
    )
