"""Explicit StructTypes for every table of the reference's star schema.

Schemas recovered from the reference's prepared statements and ``bind_param``
type strings (SURVEY.md §1.2; e.g. reference ``tarefa_consolidar_dados.php:
144-150``, ``tarefa_coletar_financas.php:48-56``). Money stays ``DoubleType``
for oracle hash-parity with the reference's FP doubles; a DecimalType(18,2)
upgrade is the documented production path.

Also defines the nested ingestion payload schemas (Meli orders/listings, Tiny
stock, visits) that the reference flattens imperatively and we model as
``ArrayType(StructType)`` + ``explode`` (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --------------------------------------------------------------------------
# Dimensions
# --------------------------------------------------------------------------

# reference tarefa_sincronizar_catalogo_tiny.php:39-47, worker_sincronizar_catalogo.php:28-37
# sku is the upsert key but stays nullable at the schema level: upstream rows
# can arrive keyless and are filtered by the pipelines (P4 guards).
PRODUTOS_CATALOGO = _st(
    _f("sku", StringType()),
    _f("id_produto_tiny", LongType()),
    _f("nome_produto", StringType()),
    _f("tipo_produto", StringType()),  # 'S' simple | 'K' kit | 'V' variation
    _f("sku_pai", StringType()),
    _f("ean", StringType()),
    _f("custo_produto", DoubleType()),
    _f("data_atualizacao", TimestampType()),
)

# reference tarefa_sincronizar_anuncios_meli.php:49-55
ANUNCIOS_CANAIS = _st(
    _f("id_anuncio_canal", StringType(), False),
    _f("canal_venda", StringType()),
    _f("id_anuncio_pai", StringType()),
    _f("sku_produto", StringType()),
    _f("titulo_anuncio", StringType()),
    _f("id_categoria", StringType()),
    _f("categoria_anuncio", StringType()),
    _f("status", StringType()),  # active | paused | closed
    _f("logistic_type", StringType()),  # fulfillment | self_service | default
    _f("data_atualizacao", TimestampType()),
)

# reference tarefa_consolidar_mapa.php:29-41
MAPA_PRODUTOS_ANUNCIOS = _st(
    _f("sku", StringType()),
    _f("id_produto_tiny", StringType()),
    _f("ean", StringType()),
    _f("titulo_produto", StringType()),
    _f("id_anuncio_canal", StringType(), False),
    _f("id_anuncio_pai", StringType()),
    _f("categoria", StringType()),
    _f("logistic_type", StringType()),
    _f("plataforma", StringType()),
    _f("data_atualizacao", TimestampType()),
)

# --------------------------------------------------------------------------
# Facts
# --------------------------------------------------------------------------

# reference tarefa_coletar_financas.php:48-56,139-142 (order-item grain)
VENDAS_FINANCEIRO = _st(
    _f("id_ordem", LongType(), False),
    _f("pack_id", LongType()),
    _f("id_anuncio", StringType()),
    _f("id_variacao", StringType()),
    _f("sku", StringType()),
    _f("data_venda", TimestampType()),
    _f("qtd_vendida", IntegerType()),
    _f("preco_unitario", DoubleType()),
    _f("faturamento_bruto_item", DoubleType()),
    _f("tarifa_ml", DoubleType()),
    _f("custo_frete_rateado", DoubleType()),
    _f("liquido_recebido", DoubleType()),
    _f("logistic_type", StringType()),
)

# reference worker_processar_trafego.php:35-42 (listing-parent × day)
TRAFEGO_DIARIO = _st(
    _f("id_anuncio", StringType(), False),
    _f("data_metrica", DateType(), False),
    _f("cliques_ads", IntegerType()),
    _f("impressoes_ads", IntegerType()),
    _f("custo_ads", DoubleType()),
    _f("vendas_ads_qtd", IntegerType()),
    _f("visitas_totais", IntegerType()),
    _f("vendas_organicas_qtd", IntegerType()),
    _f("faturamento_total_ads", DoubleType()),
)

# reference worker_processar_estoque.php:34-38 (sku × day)
ESTOQUE_DIARIO = _st(
    _f("sku", StringType(), False),
    _f("data_snapshot", DateType(), False),
    _f("estoque_geral_tiny", IntegerType()),
    _f("estoque_direct_tiny", IntegerType()),
    _f("estoque_full_ml", IntegerType()),
)

# reference tarefa_consolidar_dados.php:144-150 — the 18-col mart
RELATORIO_DIARIO = _st(
    _f("data_relatorio", DateType(), False),
    _f("id_anuncio", StringType()),
    _f("id_anuncio_variacao", StringType(), False),
    _f("sku", StringType()),
    _f("categoria_anuncio", StringType()),
    _f("titulo_anuncio", StringType()),
    _f("impressoes_ads", IntegerType()),
    _f("cliques_ads", IntegerType()),
    _f("custo_ads", DoubleType()),
    _f("vendas_ads_qtd", IntegerType()),
    _f("faturamento_ads", DoubleType()),
    _f("vendas_totais_qtd", IntegerType()),
    _f("faturamento_total", DoubleType()),
    _f("tarifa_venda_total", DoubleType()),
    _f("custo_frete_total", DoubleType()),
    _f("liquido_recebido_total", DoubleType()),
    _f("custo_produto_total", DoubleType()),
    _f("visitas_totais", IntegerType()),
)

# reference tarefa_importar_log_despesas_semanal.php:32-41
LOG_DESPESAS_ERP = _st(
    _f("id_lancamento_tiny", LongType(), False),
    _f("data_vencimento", DateType()),
    _f("valor", DoubleType()),
    _f("categoria_mapeada", StringType()),
    _f("historico", StringType()),
    _f("fornecedor", StringType()),
)

# reference tarefa_importar_log_recebiveis.php:64-72
LOG_RECEBIVEIS_ERP = _st(
    _f("id_lancamento_tiny", LongType(), False),
    _f("data_recebimento", DateType()),
    _f("valor_recebido", DoubleType()),
    _f("historico", StringType()),
    _f("cliente", StringType()),
)

# reference tarefa_coletar_posicionamento.php:48-54 (posicao NULL when not found)
POSICIONAMENTO_ANUNCIOS = _st(
    _f("data_verificacao", DateType(), False),
    _f("palavra_chave", StringType(), False),
    _f("id_anuncio_pai", StringType(), False),
    _f("posicao", IntegerType()),
    _f("pagina", IntegerType()),
)

# reference tarefa_coletar_tendencias.php:17-22
TENDENCIAS_MERCADO = _st(
    _f("data_verificacao", DateType(), False),
    _f("id_categoria", StringType(), False),
    _f("palavra_chave", StringType(), False),
    _f("posicao_tendencia", IntegerType()),
)

# --------------------------------------------------------------------------
# Queue tables (poor-man's stream; SURVEY.md §1.1, §2.10 T5)
# --------------------------------------------------------------------------

_QUEUE_COMMON = [
    _f("id", LongType(), False),
    _f("status", StringType(), False),  # pendente|processando|concluido|erro
    _f("data_processamento", TimestampType()),
]

TAREFAS_PENDENTES_TRAFEGO = _st(
    _QUEUE_COMMON[0],
    _f("id_anuncio", StringType(), False),
    _f("data_metrica", DateType(), False),
    *_QUEUE_COMMON[1:],
)

TAREFAS_PENDENTES_ESTOQUE = _st(
    _QUEUE_COMMON[0],
    _f("sku", StringType(), False),
    _f("id_produto_tiny", LongType()),
    _f("data_snapshot", DateType(), False),
    *_QUEUE_COMMON[1:],
)

TAREFAS_PENDENTES_CATALOGO = _st(
    _QUEUE_COMMON[0],
    _f("id_produto_tiny", LongType(), False),
    *_QUEUE_COMMON[1:],
    _f("mensagem_erro", StringType()),
)

# --------------------------------------------------------------------------
# Nested ingestion payloads (SURVEY.md §1.1, FIXTURES.md §1.11)
# --------------------------------------------------------------------------

_ATTRIBUTE = _st(_f("id", StringType()), _f("value_name", StringType()))

# Meli order search payload → reference tarefa_coletar_financas.php:73-136
MELI_ORDER = _st(
    _f("id", LongType(), False),
    _f("pack_id", LongType()),
    _f("date_created", StringType()),  # ISO8601 with offset; parsed by F2
    _f("shipping", _st(_f("id", LongType()), _f("logistic_type", StringType()), _f("list_cost", DoubleType()))),
    _f(
        "order_items",
        ArrayType(
            _st(
                _f(
                    "item",
                    _st(
                        _f("id", StringType()),
                        _f("variation_id", StringType()),
                        _f("seller_sku", StringType()),
                    ),
                ),
                _f("quantity", IntegerType()),
                _f("unit_price", DoubleType()),
                _f("sale_fee", DoubleType()),
            )
        ),
    ),
)

# Meli listing payload → reference tarefa_sincronizar_anuncios_meli.php:87-149
MELI_LISTING = _st(
    _f("id", StringType(), False),
    _f("title", StringType()),
    _f("status", StringType()),
    _f("category_id", StringType()),
    _f("shipping", _st(_f("logistic_type", StringType()))),
    _f("seller_custom_field", StringType()),
    _f("inventory_id", StringType()),
    _f("attributes", ArrayType(_ATTRIBUTE)),
    _f(
        "variations",
        ArrayType(
            _st(
                _f("id", StringType()),
                _f("seller_custom_field", StringType()),
                _f("inventory_id", StringType()),
                _f("attributes", ArrayType(_ATTRIBUTE)),
            )
        ),
    ),
)

# Tiny stock payload → reference worker_processar_estoque.php:69-80
TINY_STOCK = _st(
    _f("sku", StringType()),
    _f(
        "depositos",
        ArrayType(_st(_f("deposito", _st(_f("nome", StringType()), _f("saldo", DoubleType()))))),
    ),
)

# Visits payload → reference worker_processar_trafego.php:53-70
MELI_VISITS = _st(
    _f("id_anuncio", StringType()),
    _f("results", ArrayType(_st(_f("date", StringType()), _f("total", IntegerType())))),
)

# --------------------------------------------------------------------------
# Driver testdata (TPC-H-ish; TESTDATA.md) — names only, schemas live in parquet
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
