"""Product-catalog sync: Tiny ERP products → ``produtos_catalogo``.

Spark restatement of reference ``tarefa_sincronizar_catalogo_tiny.php``
(SURVEY.md §2.3 J7, §2.8 F4): the reference builds an id→sku hash map in a
first API pass and probes it to translate ``idProdutoPai`` → ``sku_pai``;
here that's a broadcast self-join. The pt-BR decimal-comma cost parse is a
native regexp_replace + cast.

Also the queue-worker variant (reference ``worker_sincronizar_catalogo.php``):
per-task outcome routing — OK payloads upsert the catalog, failures carry an
``erro`` status + ``mensagem_erro`` back to the queue (S14 side output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import parse_locale_double


def sync_catalog(tiny_products: DataFrame) -> DataFrame:
    """tiny_products: one row per ``produto.obter`` detail payload —
    (id long, codigo string, nome string, classe_produto string,
    idProdutoPai long, preco_custo string, ean string nullable).

    Output matches ``schemas.PRODUTOS_CATALOGO`` minus nothing: rows without
    a SKU are skipped (reference line 72), ``sku_pai`` resolves via the
    id→sku self-join (line 79, NULL when idProdutoPai is 0/unknown), cost
    parses '1.234,56'-style strings (line 81).
    """
    parent_map = tiny_products.select(
        F.col("id").alias("pai_id"), F.col("codigo").alias("pai_codigo")
    ).filter(F.col("pai_id").isNotNull() & F.col("pai_codigo").isNotNull())

    return (
        tiny_products.filter(F.col("codigo").isNotNull() & (F.col("codigo") != ""))
        .join(
            F.broadcast(parent_map),
            (F.col("idProdutoPai") != 0) & (F.col("idProdutoPai") == F.col("pai_id")),
            "left",
        )
        .select(
            F.col("codigo").alias("sku"),
            F.col("id").alias("id_produto_tiny"),
            F.coalesce(F.col("nome"), F.lit("")).alias("nome_produto"),
            F.coalesce(F.col("classe_produto"), F.lit("S")).alias("tipo_produto"),
            F.col("pai_codigo").alias("sku_pai"),
            F.col("ean"),
            parse_locale_double(F.coalesce(F.col("preco_custo"), F.lit("0"))).alias("custo_produto"),
            F.current_timestamp().alias("data_atualizacao"),
        )
    )


def process_catalog_tasks(tasks: DataFrame, details: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Queue-worker transform (reference ``worker_sincronizar_catalogo.php:
    38-88``): join claimed tasks to their detail payloads and split outcomes.

    tasks: claimed rows (id, id_produto_tiny).
    details: produto.obter payloads — (id_produto_tiny long, status string,
    erro string nullable, sku string nullable, codigo string nullable,
    nome string, gtin string nullable, preco_custo string nullable).

    Returns (catalog_rows, outcomes):
    - catalog_rows: upserts for ``produtos_catalogo`` (sku from the
      reference's ``sku ?? codigo`` fallback, ean from gtin);
    - outcomes: (id, status, mensagem_erro) — 'concluido' for saved rows,
      'erro' + message for missing-SKU / API failures (lines 59-63, 83-87).
    """
    joined = tasks.select("id", "id_produto_tiny").join(
        F.broadcast(details), "id_produto_tiny", "left"
    )
    sku = F.coalesce(F.nullif(F.col("sku"), F.lit("")), F.nullif(F.col("codigo"), F.lit("")))
    api_ok = F.col("status").isNotNull() & (F.col("status") == "OK")

    ok = joined.filter(api_ok & sku.isNotNull())
    catalog_rows = ok.select(
        sku.alias("sku"),
        "id_produto_tiny",
        F.coalesce(F.col("nome"), F.lit("")).alias("nome_produto"),
        F.col("gtin").alias("ean"),
        parse_locale_double(F.coalesce(F.col("preco_custo"), F.lit("0"))).alias("custo_produto"),
        F.current_timestamp().alias("data_atualizacao"),
    )

    outcomes = joined.select(
        "id",
        F.when(api_ok & sku.isNotNull(), F.lit("concluido"))
        .otherwise(F.lit("erro"))
        .alias("status"),
        F.when(api_ok & sku.isNull(), F.lit("Produto sem SKU ou Código no Tiny"))
        .when(~api_ok | F.col("status").isNull(),
              F.concat(F.lit("Falha na API ou status NOK: "),
                       F.coalesce(F.col("erro"), F.lit("Erro desconhecido"))))
        .alias("mensagem_erro"),
    )
    return catalog_rows, outcomes
