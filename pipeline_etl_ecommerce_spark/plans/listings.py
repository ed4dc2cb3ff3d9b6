"""Listing dimension sync: Meli listings → ``anuncios_canais``.

Spark restatement of reference ``tarefa_sincronizar_anuncios_meli.php:87-149``
(SURVEY.md §2.9 E2 + §2.11 UD2): explode variations (listings without
variations emit one row keyed by the parent id), resolve the SKU through the
reference's two-drawer fallback chain, drop rows with no SKU, enrich the
category name.

All of it is native expressions — the nested attributes[] scan is a
higher-order ``filter(...)`` (no Python in the plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _first_seller_sku(attrs: Column) -> Column:
    """First SELLER_SKU value_name in an attributes[] array, NULL if absent
    or empty (PHP ``empty()`` treats '' as missing, so '' falls through to
    the next drawer — reference lines 96-108)."""
    match = F.filter(attrs, lambda a: a["id"] == F.lit("SELLER_SKU"))
    return F.nullif(F.when(F.size(match) > 0, match[0]["value_name"]), F.lit(""))


def sync_listings(listings: DataFrame, categories: DataFrame | None = None) -> DataFrame:
    """listings uses ``schemas.MELI_LISTING``; optional categories
    (category_id, category_name) stands in for the per-listing category
    enrichment fetch (reference lines 79-85).
    """
    var = F.explode_outer("variations")
    base = listings.select(
        F.col("id").alias("id_anuncio_pai"),
        F.col("title").alias("titulo_anuncio"),
        F.col("status"),
        F.col("category_id").alias("id_categoria"),
        F.coalesce(F.col("shipping")["logistic_type"], F.lit("default")).alias("logistic_type"),
        F.nullif(F.col("seller_custom_field"), F.lit("")).alias("listing_scf"),
        F.col("attributes").alias("listing_attrs"),
        var.alias("variacao"),
    )

    is_variation = F.col("variacao").isNotNull()
    sku = F.when(
        is_variation,
        # drawer 1: variation attributes; drawer 2: variation seller_custom_field
        F.coalesce(
            _first_seller_sku(F.col("variacao")["attributes"]),
            F.nullif(F.col("variacao")["seller_custom_field"], F.lit("")),
        ),
    ).otherwise(
        # simple listing: parent attributes, then parent seller_custom_field
        F.coalesce(_first_seller_sku(F.col("listing_attrs")), F.col("listing_scf"))
    )

    out = (
        base.withColumn("sku_produto", sku)
        .withColumn(
            "id_anuncio_canal",
            F.when(is_variation, F.col("variacao")["id"]).otherwise(F.col("id_anuncio_pai")),
        )
        # rows without a resolvable SKU are not saved (reference lines 111, 142)
        .filter(F.col("sku_produto").isNotNull() & (F.col("sku_produto") != ""))
        .withColumn("canal_venda", F.lit("Mercado Livre"))
        .withColumn("data_atualizacao", F.current_timestamp())
    )

    if categories is not None:
        out = out.join(F.broadcast(categories), out["id_categoria"] == categories["category_id"], "left")
        categoria = F.coalesce(F.col("category_name"), F.lit("N/A"))
    else:
        categoria = F.lit("N/A")

    return out.select(
        "id_anuncio_canal",
        "canal_venda",
        "id_anuncio_pai",
        "sku_produto",
        "titulo_anuncio",
        "id_categoria",
        categoria.alias("categoria_anuncio"),
        "status",
        "logistic_type",
        "data_atualizacao",
    )
