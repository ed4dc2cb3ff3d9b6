"""Conformed product↔listing bridge: ``mapa_produtos_anuncios`` + alerts.

Spark restatement of reference ``tarefa_consolidar_mapa.php`` (SURVEY.md §2.3
J5): listings with a SKU inner-join the catalog (matched → bridge rows);
listings whose SKU misses the catalog become the anti-join side output that
the reference emails (S15) — here an alerts DataFrame the caller sinks
wherever it wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def consolidate_mapa(catalogo: DataFrame, anuncios: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (mapa, alertas).

    catalogo: ``schemas.PRODUTOS_CATALOGO``; anuncios: ``schemas.ANUNCIOS_CANAIS``.
    mapa grain: id_anuncio_canal (the upsert key, reference line 36);
    alertas: one message row per unmatched listing (reference line 77).
    """
    cat = (
        catalogo.filter(F.col("sku").isNotNull() & (F.col("sku") != ""))
        .select("sku", "id_produto_tiny", "ean", "nome_produto")
        .dropDuplicates(["sku"])
    )
    an = anuncios.filter(F.col("sku_produto").isNotNull() & (F.col("sku_produto") != "")).select(
        "id_anuncio_pai", "id_anuncio_canal", "sku_produto", "categoria_anuncio", "logistic_type"
    )

    matched = an.join(F.broadcast(cat), an["sku_produto"] == cat["sku"], "inner")
    mapa = matched.select(
        F.col("sku_produto").alias("sku"),
        F.col("id_produto_tiny").cast("string").alias("id_produto_tiny"),
        "ean",
        F.col("nome_produto").alias("titulo_produto"),
        "id_anuncio_canal",
        "id_anuncio_pai",
        F.col("categoria_anuncio").alias("categoria"),
        "logistic_type",
        F.lit("meli_lare").alias("plataforma"),
        F.current_timestamp().alias("data_atualizacao"),
    ).dropDuplicates(["id_anuncio_canal"])

    alertas = an.join(F.broadcast(cat), an["sku_produto"] == cat["sku"], "left_anti").select(
        F.format_string(
            "O anúncio '%s' possui o SKU '%s', mas este SKU não foi encontrado na tabela 'produtos_catalogo'.",
            F.col("id_anuncio_pai"),
            F.col("sku_produto"),
        ).alias("alerta"),
        "id_anuncio_pai",
        F.col("sku_produto").alias("sku"),
    )
    return mapa, alertas
