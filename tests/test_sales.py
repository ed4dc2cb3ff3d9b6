"""Golden tests for the sales ingestion transform (SURVEY.md §3.2)."""

from __future__ import annotations

import pytest

from pipeline_etl_ecommerce_spark import schemas
from pipeline_etl_ecommerce_spark.plans.sales import transform_orders


@pytest.fixture(scope="module")
def result(spark):
    orders = spark.createDataFrame(
        [
            # multi-item order: freight 30 split 60/40 by revenue
            (
                1,
                None,
                "2025-08-01T14:22:09.000-03:00",
                {"id": 101, "logistic_type": None, "list_cost": None},
                [
                    {"item": {"id": "MLB1", "variation_id": "V1", "seller_sku": "SKU-1"}, "quantity": 2, "unit_price": 30.0, "sale_fee": 5.0},
                    {"item": {"id": "MLB2", "variation_id": None, "seller_sku": None}, "quantity": 1, "unit_price": 40.0, "sale_fee": 4.0},
                ],
            ),
            # self_service order: freight excluded entirely
            (
                2,
                77,
                "2025-08-01T23:30:00.000-03:00",
                {"id": 102, "logistic_type": None, "list_cost": None},
                [
                    {"item": {"id": "MLB3", "variation_id": None, "seller_sku": "SKU-3"}, "quantity": 1, "unit_price": 100.0, "sale_fee": 11.0},
                ],
            ),
            # malformed date -> NULL data_venda; no shipping record -> N/A
            (
                3,
                None,
                "not-a-date",
                {"id": None, "logistic_type": None, "list_cost": None},
                [
                    {"item": {"id": "MLB4", "variation_id": None, "seller_sku": "SKU-4"}, "quantity": 1, "unit_price": 10.0, "sale_fee": 1.0},
                ],
            ),
        ],
        schemas.MELI_ORDER,
    )
    shipments = spark.createDataFrame(
        [(101, "fulfillment", 30.0), (102, "self_service", 25.0)],
        "shipping_id long, logistic_type string, list_cost double",
    )
    rows = transform_orders(orders, shipments).collect()
    return {(r["id_ordem"], r["id_anuncio"]): r.asDict() for r in rows}


def test_freight_rateio_split(result):
    r1 = result[(1, "MLB1")]
    r2 = result[(1, "MLB2")]
    assert r1["faturamento_bruto_item"] == 60.0
    assert r1["custo_frete_rateado"] == pytest.approx(18.0)  # 30 * 60/100
    assert r2["custo_frete_rateado"] == pytest.approx(12.0)  # 30 * 40/100
    assert r1["liquido_recebido"] == pytest.approx(60.0 - 5.0 - 18.0)
    assert r2["sku"] == ""  # missing seller_sku defaults to '' (line 129)
    assert r1["id_variacao"] == "V1" and r2["id_variacao"] is None


def test_self_service_freight_excluded(result):
    r = result[(2, "MLB3")]
    assert r["logistic_type"] == "self_service"
    assert r["custo_frete_rateado"] == 0.0
    assert r["liquido_recebido"] == pytest.approx(89.0)
    assert r["pack_id"] == 77


def test_malformed_date_null_and_na_logistic(result):
    r = result[(3, "MLB4")]
    assert r["data_venda"] is None
    assert r["logistic_type"] == "N/A"
    assert r["custo_frete_rateado"] == 0.0


def test_tz_conversion(spark):
    # -03:00 offset parses to the right instant; rendered in the session tz
    # (America/Sao_Paulo) it keeps the SP wall clock like the reference's
    # DateTime::setTimezone. (collect() renders in the driver's local tz, so
    # the assertion goes through Spark-side date_format.)
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("2025-08-01T14:22:09.000-03:00",)], "date_created string")
    got = df.select(
        F.date_format(F.try_to_timestamp("date_created"), "yyyy-MM-dd HH:mm:ss").alias("s")
    ).first()["s"]
    assert got == "2025-08-01 14:22:09"
