"""Tests for listing sync (E2/UD2), bridge map (J5 + alerts), catalog sync (J7/F4)."""

from __future__ import annotations

import pytest

from pipeline_etl_ecommerce_spark import schemas
from pipeline_etl_ecommerce_spark.plans.bridge import consolidate_mapa
from pipeline_etl_ecommerce_spark.plans.catalog import sync_catalog
from pipeline_etl_ecommerce_spark.plans.listings import sync_listings


def _listing(id, variations=None, attributes=None, scf=None, status="active", lt="fulfillment"):
    return (
        id,
        f"Title {id}",
        status,
        "CAT1",
        {"logistic_type": lt},
        scf,
        None,
        attributes,
        variations,
    )


@pytest.fixture(scope="module")
def listing_rows(spark):
    listings = spark.createDataFrame(
        [
            # variation with SELLER_SKU attribute (drawer 1)
            _listing(
                "MLB10",
                variations=[
                    {"id": "V11", "seller_custom_field": None, "inventory_id": None,
                     "attributes": [{"id": "COLOR", "value_name": "red"}, {"id": "SELLER_SKU", "value_name": "SKU-A"}]},
                    # empty attr value -> falls through to seller_custom_field (drawer 2)
                    {"id": "V12", "seller_custom_field": "SKU-B", "inventory_id": None,
                     "attributes": [{"id": "SELLER_SKU", "value_name": ""}]},
                    # no sku anywhere -> row dropped
                    {"id": "V13", "seller_custom_field": None, "inventory_id": None, "attributes": []},
                ],
            ),
            # simple listing: parent attributes first
            _listing("MLB20", attributes=[{"id": "SELLER_SKU", "value_name": "SKU-C"}]),
            # simple listing: falls back to parent seller_custom_field
            _listing("MLB30", scf="SKU-D", attributes=[]),
            # simple listing without sku -> dropped
            _listing("MLB40", attributes=[]),
        ],
        schemas.MELI_LISTING,
    )
    categories = spark.createDataFrame([("CAT1", "Lanternas")], "category_id string, category_name string")
    return {r["id_anuncio_canal"]: r.asDict() for r in sync_listings(listings, categories).collect()}


def test_variation_sku_fallback_chain(listing_rows):
    assert listing_rows["V11"]["sku_produto"] == "SKU-A"
    assert listing_rows["V12"]["sku_produto"] == "SKU-B"  # '' attr -> drawer 2
    assert "V13" not in listing_rows  # no sku -> not saved
    assert listing_rows["V11"]["id_anuncio_pai"] == "MLB10"


def test_simple_listing_uses_parent_id_as_canal(listing_rows):
    assert listing_rows["MLB20"]["sku_produto"] == "SKU-C"
    assert listing_rows["MLB30"]["sku_produto"] == "SKU-D"
    assert "MLB40" not in listing_rows
    assert listing_rows["MLB20"]["id_anuncio_canal"] == "MLB20"


def test_category_enrichment(listing_rows):
    assert listing_rows["V11"]["categoria_anuncio"] == "Lanternas"


def test_bridge_map_and_alerts(spark, catalogo):
    anuncios = spark.createDataFrame(
        [
            ("V1", "Mercado Livre", "MLB1", "SKU-1", "T", "C1", "catA", "active", "fulfillment", None),
            ("V2", "Mercado Livre", "MLB2", "SKU-MISSING", "T", "C1", "catA", "active", "default", None),
            ("V3", "Mercado Livre", "MLB3", None, "T", "C1", "catA", "active", "default", None),
            ("V4", "Mercado Livre", "MLB4", "", "T", "C1", "catA", "paused", "default", None),
        ],
        schemas.ANUNCIOS_CANAIS,
    )
    mapa, alertas = consolidate_mapa(catalogo, anuncios)
    mapa_rows = {r["id_anuncio_canal"]: r.asDict() for r in mapa.collect()}
    alert_rows = alertas.collect()
    assert set(mapa_rows) == {"V1"}  # only the matched, non-empty-SKU listing
    assert mapa_rows["V1"]["plataforma"] == "meli_lare"
    assert mapa_rows["V1"]["titulo_produto"] == "Prod 1"
    assert len(alert_rows) == 1 and "SKU-MISSING" in alert_rows[0]["alerta"]


def test_catalog_parent_sku_and_locale_parse(spark):
    tiny = spark.createDataFrame(
        [
            (1, "PAI-1", "Produto Pai", "S", 0, "10,50", None),
            (2, "FILHO-1", "Variação", "V", 1, "1.234,56", "789"),
            (3, None, "Sem SKU", "S", 0, "1,00", None),  # skipped
            (4, "ORFAO-1", "Pai desconhecido", "V", 999, None, None),
        ],
        "id long, codigo string, nome string, classe_produto string, idProdutoPai long, preco_custo string, ean string",
    )
    rows = {r["sku"]: r.asDict() for r in sync_catalog(tiny).collect()}
    assert set(rows) == {"PAI-1", "FILHO-1", "ORFAO-1"}
    assert rows["FILHO-1"]["sku_pai"] == "PAI-1"  # J7 self-join id->sku
    assert rows["PAI-1"]["sku_pai"] is None
    assert rows["ORFAO-1"]["sku_pai"] is None  # unknown parent id
    assert rows["FILHO-1"]["custo_produto"] == pytest.approx(1234.56)  # F4 note: '1.234,56'
    assert rows["PAI-1"]["custo_produto"] == pytest.approx(10.50)
    assert rows["ORFAO-1"]["custo_produto"] == 0.0


def test_catalog_worker_outcome_routing(spark):
    from pipeline_etl_ecommerce_spark.plans.catalog import process_catalog_tasks

    tasks = spark.createDataFrame([(1, 10), (2, 20), (3, 30), (4, 40)], "id long, id_produto_tiny long")
    details = spark.createDataFrame(
        [
            (10, "OK", None, None, "SKU-A", "Prod A", "789", "4,50"),   # sku from codigo fallback
            (20, "OK", None, "", "", "Prod B", None, "1,00"),           # empty sku+codigo -> erro
            (30, "NOK", "token invalido", None, None, None, None, None),  # API failure
            # 40: no detail row at all -> erro (API failure path)
        ],
        "id_produto_tiny long, status string, erro string, sku string, codigo string, nome string, gtin string, preco_custo string",
    )
    catalog_rows, outcomes = process_catalog_tasks(tasks, details)
    cat = {r["sku"]: r.asDict() for r in catalog_rows.collect()}
    out = {r["id"]: (r["status"], r["mensagem_erro"]) for r in outcomes.collect()}
    assert set(cat) == {"SKU-A"}
    assert cat["SKU-A"]["custo_produto"] == 4.5 and cat["SKU-A"]["ean"] == "789"
    assert out[1] == ("concluido", None)
    assert out[2] == ("erro", "Produto sem SKU ou Código no Tiny")
    assert out[3][0] == "erro" and "token invalido" in out[3][1]
    assert out[4][0] == "erro" and "Erro desconhecido" in out[4][1]
