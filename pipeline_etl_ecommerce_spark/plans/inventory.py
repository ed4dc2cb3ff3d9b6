"""Inventory worker transform: queued SKU snapshots → ``estoque_diario``.

Spark restatement of reference ``worker_processar_estoque.php`` (SURVEY.md
§2.3 J6, §2.5 W7, §2.8 F11): Tiny warehouse balances come out of the
``depositos[]`` array with higher-order functions; the fulfillment ("Full")
stock resolves through the first fulfillment listing mapped to the SKU, that
listing's variation whose SKU matches, its inventory_id, and the inventory
stock table.

The reference's "first fulfillment listing" is PHP insertion order; we make
it deterministic by ordering on id_anuncio_pai (documented fix, SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import extract_deposito_saldo
from ..operators.ranking import first_per_group


def _variation_sku(var: Column) -> Column:
    match = F.filter(var["attributes"], lambda a: a["id"] == F.lit("SELLER_SKU"))
    return F.coalesce(
        F.nullif(F.when(F.size(match) > 0, match[0]["value_name"]), F.lit("")),
        F.nullif(var["seller_custom_field"], F.lit("")),
    )


def resolve_inventory_ids(mapa: DataFrame, listings: DataFrame) -> DataFrame:
    """(sku → inventory_id) through the first fulfillment listing per SKU.

    mapa: ``schemas.MAPA_PRODUTOS_ANUNCIOS``; listings: ``schemas.MELI_LISTING``.
    Mirrors reference lines 97-160: filter logistic_type='fulfillment', first
    listing per SKU (W7), then find the variation whose resolved SKU equals
    the task SKU (or the parent itself for no-variation listings).
    """
    full_first = first_per_group(
        mapa.filter(F.col("logistic_type") == "fulfillment").select("sku", "id_anuncio_pai"),
        "sku",
        ["id_anuncio_pai"],
    )

    var = F.explode_outer("variations")
    flat = listings.select(
        F.col("id").alias("listing_id"),
        F.nullif(F.col("seller_custom_field"), F.lit("")).alias("listing_scf"),
        F.col("attributes").alias("listing_attrs"),
        F.col("inventory_id").alias("listing_inventory_id"),
        var.alias("v"),
    )
    attr_match = F.filter(F.col("listing_attrs"), lambda a: a["id"] == F.lit("SELLER_SKU"))
    listing_sku = F.coalesce(
        F.nullif(F.when(F.size(attr_match) > 0, attr_match[0]["value_name"]), F.lit("")),
        F.col("listing_scf"),
    )
    flat = flat.select(
        "listing_id",
        F.when(F.col("v").isNotNull(), _variation_sku(F.col("v"))).otherwise(listing_sku).alias("resolved_sku"),
        F.when(F.col("v").isNotNull(), F.col("v")["inventory_id"]).otherwise(F.col("listing_inventory_id")).alias(
            "inventory_id"
        ),
    )

    return (
        full_first.join(
            flat,
            (full_first["id_anuncio_pai"] == flat["listing_id"]) & (full_first["sku"] == flat["resolved_sku"]),
            "left",
        )
        .select("sku", "id_anuncio_pai", "inventory_id")
        .dropDuplicates(["sku"])
    )


def process_stock_tasks(
    tasks: DataFrame,
    tiny_stock: DataFrame,
    mapa: DataFrame,
    listings: DataFrame,
    inventory_stock: DataFrame,
) -> DataFrame:
    """tasks: claimed queue rows (sku, data_snapshot).
    tiny_stock: ``schemas.TINY_STOCK`` (sku, depositos[]).
    inventory_stock: (inventory_id, total) — the fulfillment stock endpoint.
    Output: ``schemas.ESTOQUE_DIARIO`` rows (zero defaults everywhere).
    """
    tiny = tiny_stock.select(
        F.col("sku").alias("t_sku"),
        extract_deposito_saldo(F.col("depositos"), "Geral").cast("int").alias("estoque_geral_tiny"),
        extract_deposito_saldo(F.col("depositos"), "Direct").cast("int").alias("estoque_direct_tiny"),
    )

    inv = resolve_inventory_ids(mapa, listings).join(
        inventory_stock.select(
            F.col("inventory_id").alias("i_id"), F.col("total").cast("int").alias("full_total")
        ),
        F.col("inventory_id") == F.col("i_id"),
        "left",
    ).select(F.col("sku").alias("f_sku"), "full_total")

    return (
        tasks.select("sku", "data_snapshot")
        .join(F.broadcast(tiny), F.col("sku") == F.col("t_sku"), "left")
        .join(F.broadcast(inv), F.col("sku") == F.col("f_sku"), "left")
        .select(
            "sku",
            "data_snapshot",
            F.coalesce("estoque_geral_tiny", F.lit(0)).alias("estoque_geral_tiny"),
            F.coalesce("estoque_direct_tiny", F.lit(0)).alias("estoque_direct_tiny"),
            F.coalesce("full_total", F.lit(0)).alias("estoque_full_ml"),
        )
    )
