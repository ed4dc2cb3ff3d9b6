"""Tests for traffic/inventory workers, queue producers, finance logs,
position capture, and trends (SURVEY.md §2 J6/J9/W4/W5/W7, S10/S14, F3/F11)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark import schemas
from pipeline_etl_ecommerce_spark.plans.finance_logs import import_despesas, import_recebiveis
from pipeline_etl_ecommerce_spark.plans.inventory import process_stock_tasks
from pipeline_etl_ecommerce_spark.plans.position import capture_positions
from pipeline_etl_ecommerce_spark.plans.queues import claim_batch, enqueue_stock, enqueue_traffic, mark_done
from pipeline_etl_ecommerce_spark.plans.traffic import process_traffic_tasks
from pipeline_etl_ecommerce_spark.plans.trends import capture_trends

D = dt.date(2025, 8, 10)


def test_traffic_worker_day_match_and_defaults(spark):
    tasks = spark.createDataFrame([("MLB1", D), ("MLB2", D)], "id_anuncio string, data_metrica date")
    visits = spark.createDataFrame(
        [
            ("MLB1", [{"date": "2025-08-10T00:00:00Z", "total": 42}, {"date": "2025-08-09T00:00:00Z", "total": 9}]),
        ],
        "id_anuncio string, results array<struct<date:string,total:int>>",
    )
    ads = spark.createDataFrame(
        [("MLB1", D, 10, 100, 5.5, 3, 200.0, 7)],
        "id_anuncio string, data_metrica date, clicks int, prints int, cost double, units_quantity int, total_amount double, organic_items_quantity int",
    )
    rows = {r["id_anuncio"]: r.asDict() for r in process_traffic_tasks(tasks, visits, ads).collect()}
    assert rows["MLB1"]["visitas_totais"] == 42  # day-matched, not the D-1 row
    assert rows["MLB1"]["cliques_ads"] == 10 and rows["MLB1"]["faturamento_total_ads"] == 200.0
    # MLB2: no visits, no ads -> all zeros
    assert rows["MLB2"]["visitas_totais"] == 0 and rows["MLB2"]["custo_ads"] == 0.0


def test_inventory_worker_full_stock_chain(spark, mapa):
    tasks = spark.createDataFrame([("SKU-1", D), ("SKU-9", D)], "sku string, data_snapshot date")
    tiny = spark.createDataFrame(
        [
            ("SKU-1", [{"deposito": {"nome": "Geral", "saldo": 12.0}}, {"deposito": {"nome": "Direct", "saldo": 3.0}}]),
        ],
        "sku string, depositos array<struct<deposito:struct<nome:string,saldo:double>>>",
    )
    listings = spark.createDataFrame(
        [
            (
                "MLB100",
                "T",
                "active",
                "CAT1",
                {"logistic_type": "fulfillment"},
                None,
                None,
                [],
                [
                    {"id": "V101", "seller_custom_field": None, "inventory_id": "INV-1",
                     "attributes": [{"id": "SELLER_SKU", "value_name": "SKU-1"}]},
                ],
            ),
        ],
        schemas.MELI_LISTING,
    )
    inv_stock = spark.createDataFrame([("INV-1", 55)], "inventory_id string, total int")
    rows = {r["sku"]: r.asDict() for r in process_stock_tasks(tasks, tiny, mapa, listings, inv_stock).collect()}
    assert rows["SKU-1"]["estoque_geral_tiny"] == 12
    assert rows["SKU-1"]["estoque_direct_tiny"] == 3
    assert rows["SKU-1"]["estoque_full_ml"] == 55  # sku -> fulfillment listing -> variation -> inventory
    assert rows["SKU-9"] == {"sku": "SKU-9", "data_snapshot": D, "estoque_geral_tiny": 0, "estoque_direct_tiny": 0, "estoque_full_ml": 0}


def test_enqueue_traffic_insert_ignore(spark, mapa):
    anuncios = spark.createDataFrame(
        [
            ("V1", "ML", "MLB1", "S1", "T", "C", "cat", "active", "d", None),
            ("V2", "ML", "MLB1", "S2", "T", "C", "cat", "active", "d", None),  # same parent -> distinct
            ("V3", "ML", "MLB2", "S3", "T", "C", "cat", "paused", "d", None),  # not active
            ("V4", "ML", "MLB3", "S4", "T", "C", "cat", "active", "d", None),  # already queued
        ],
        schemas.ANUNCIOS_CANAIS,
    )
    existing = spark.createDataFrame([("MLB3", D)], "id_anuncio string, data_metrica date")
    got = {r["id_anuncio"] for r in enqueue_traffic(anuncios, existing, D).collect()}
    assert got == {"MLB1"}


def test_enqueue_stock_fixed_precedence_filter(spark):
    catalogo = spark.createDataFrame(
        [
            ("SKU-1", 1, "a", "S", None, None, 1.0, None),
            ("SKU-2", 2, "b", "K", None, None, 1.0, None),
            ("EMB-1", 3, "c", "K", None, None, 1.0, None),  # EMB guard must hold for 'K' too
            ("SKU-3", 4, "d", "V", None, None, 1.0, None),  # wrong tipo
            (None, 5, "e", "S", None, None, 1.0, None),
            ("", 6, "f", "K", None, None, 1.0, None),
        ],
        schemas.PRODUTOS_CATALOGO,
    )
    got = {r["sku"] for r in enqueue_stock(catalogo, D).collect()}
    assert got == {"SKU-1", "SKU-2"}


def test_claim_batch_and_mark_done(spark):
    queue = spark.createDataFrame(
        [(i, f"MLB{i}", D, "pendente", None) for i in range(1, 8)]
        + [(99, "MLB99", D, "concluido", None)],
        schemas.TAREFAS_PENDENTES_TRAFEGO,
    )
    claimed, after = claim_batch(queue, batch_size=3)
    claimed_ids = sorted(r["id"] for r in claimed.collect())
    assert claimed_ids == [1, 2, 3]  # id-ordered deterministic claim
    statuses = {r["id"]: r["status"] for r in after.collect()}
    assert statuses[1] == "processando" and statuses[7] == "pendente" and statuses[99] == "concluido"
    done = mark_done(after, claimed.select("id"))
    statuses2 = {r["id"]: r["status"] for r in done.collect()}
    assert statuses2[1] == "concluido" and statuses2[7] == "pendente"


def test_finance_logs_window_and_defaults(spark):
    contas = spark.createDataFrame(
        [
            (1, "05/08/2025", 100.0, None, None, "desc-1", {"nome": "Forn A"}),
            (2, "01/01/2020", 50.0, "Frete", "hist", "d", {"nome": "B"}),  # out of window
            (3, "10/08/2025", 70.0, "Frete", "hist-3", None, {"nome": None}),
            (3, "10/08/2025", 70.0, "Frete", "hist-3", None, {"nome": None}),  # dup id
        ],
        "id long, vencimento string, valor double, categoria string, historico string, descricao string, cliente struct<nome:string>",
    )
    desp = {r["id_lancamento_tiny"]: r.asDict() for r in import_despesas(contas, "2025-08-04", "2025-08-10").collect()}
    assert set(desp) == {1, 3}
    assert desp[1]["categoria_mapeada"] == "Sem Categoria"
    assert desp[1]["historico"] == "desc-1"  # historico ?? descricao
    assert str(desp[1]["data_vencimento"]) == "2025-08-05"
    rec = {r["id_lancamento_tiny"]: r.asDict() for r in import_recebiveis(contas, "2025-08-04", "2025-08-10").collect()}
    assert set(rec) == {1, 3} and rec[3]["valor_recebido"] == 70.0


def test_position_capture_with_nulls(spark):
    targets = spark.createDataFrame(
        [("faca", "MLB1"), ("faca", "MLB404"), ("lanterna", "MLB2")],
        "palavra_chave string, id_anuncio_pai string",
    )
    results = spark.createDataFrame(
        [("faca", i, f"MLB{i}") for i in range(60)]  # MLB1 at ordem=1 -> posicao 2
        + [("lanterna", i, "MLBx" if i != 55 else "MLB2") for i in range(60)],
        "palavra_chave string, ordem int, id_resultado string",
    )
    rows = {(r["palavra_chave"], r["id_anuncio_pai"]): r.asDict() for r in capture_positions(targets, results, D).collect()}
    assert rows[("faca", "MLB1")]["posicao"] == 2 and rows[("faca", "MLB1")]["pagina"] == 1
    assert rows[("lanterna", "MLB2")]["posicao"] == 56 and rows[("lanterna", "MLB2")]["pagina"] == 2
    assert rows[("faca", "MLB404")]["posicao"] is None  # kept with NULLs (W4)


def test_trends_posexplode_rank(spark):
    trends = spark.createDataFrame(
        [("MLB430264", ["lanterna tatica", "lanterna led", "faca"])],
        "id_categoria string, keywords array<string>",
    )
    rows = {r["palavra_chave"]: r["posicao_tendencia"] for r in capture_trends(trends, D).collect()}
    assert rows == {"lanterna tatica": 1, "lanterna led": 2, "faca": 3}


def test_reclaim_stale_reverts_timed_out_claims(spark):
    from pipeline_etl_ecommerce_spark.plans.queues import reclaim_stale

    now = dt.datetime(2025, 8, 10, 12, 0, 0, tzinfo=dt.timezone.utc)
    old = now - dt.timedelta(hours=2)
    fresh = now - dt.timedelta(minutes=5)
    queue = spark.createDataFrame(
        [
            (1, "MLB1", D, "processando", old),     # stranded -> pendente
            (2, "MLB2", D, "processando", fresh),   # live claim, untouched
            (3, "MLB3", D, "pendente", None),       # untouched
            (4, "MLB4", D, "concluido", old),       # terminal, untouched
        ],
        schemas.TAREFAS_PENDENTES_TRAFEGO,
    )
    out = {r["id"]: (r["status"], r["tentativas"]) for r in
           reclaim_stale(queue, now=now, timeout_minutes=30).collect()}
    assert out[1] == ("pendente", 1)
    assert out[2] == ("processando", 0)
    assert out[3] == ("pendente", 0)
    assert out[4] == ("concluido", 0)


def test_reclaim_stale_dead_letters_poison_rows(spark):
    from pipeline_etl_ecommerce_spark.plans.queues import reclaim_stale

    now = dt.datetime(2025, 8, 10, 12, 0, 0, tzinfo=dt.timezone.utc)
    old = now - dt.timedelta(hours=2)
    queue = spark.createDataFrame(
        [(1, "MLB1", D, "processando", old)], schemas.TAREFAS_PENDENTES_TRAFEGO
    )
    q = queue
    # crash-loop the worker: claim times out over and over
    for _ in range(3):
        q = reclaim_stale(q, now=now, timeout_minutes=30)
        row = q.collect()[0]
        assert row["status"] == "pendente"
        q = q.withColumn("status", F.lit("processando"))  # re-claimed, dies again
    final = reclaim_stale(q, now=now, timeout_minutes=30).collect()[0]
    assert final["status"] == "erro" and final["tentativas"] == 3


def test_reclaim_stale_null_counter_counts_as_zero(spark):
    """Rows appended AFTER the tentativas column was introduced carry NULL
    there; NULL must behave as 0 (retry, increment to 1) — a NULL-blind
    comparison would leave the counter stuck at NULL and retry forever."""
    from pipeline_etl_ecommerce_spark.plans.queues import reclaim_stale

    now = dt.datetime(2025, 8, 10, 12, 0, 0, tzinfo=dt.timezone.utc)
    old = now - dt.timedelta(hours=2)
    queue = spark.createDataFrame(
        [(1, "MLB1", dt.date(2025, 8, 10), "processando", old, None)],
        "id bigint, id_anuncio string, data_metrica date, status string, "
        "data_processamento timestamp, tentativas int",
    )
    q = queue
    for expect in (1, 2, 3):
        row = reclaim_stale(q, now=now, timeout_minutes=30).collect()[0]
        assert row["status"] == "pendente" and row["tentativas"] == expect
        q = (
            reclaim_stale(q, now=now, timeout_minutes=30)
            .withColumn("status", F.lit("processando"))
        )
    final = reclaim_stale(q, now=now, timeout_minutes=30).collect()[0]
    assert final["status"] == "erro" and final["tentativas"] == 3


def test_reclaim_stale_rejects_ambiguous_now(spark):
    """ADVICE r3: a naive datetime (or string) `now` is interpreted in the
    ambient session timezone while data_processamento is a UTC instant, so
    the timeout would shift by hours under a UTC driver session. The
    contract requires an unambiguous instant."""
    import pytest as _pytest

    from pipeline_etl_ecommerce_spark.plans.queues import reclaim_stale

    queue = spark.createDataFrame(
        [(1, "MLB1", D, "processando", dt.datetime(2025, 8, 10, 10, 0, 0))],
        schemas.TAREFAS_PENDENTES_TRAFEGO,
    )
    with _pytest.raises(ValueError, match="naive"):
        reclaim_stale(queue, now=dt.datetime(2025, 8, 10, 12, 0, 0))
    with _pytest.raises(TypeError, match="tz-aware"):
        reclaim_stale(queue, now="2025-08-10 12:00:00")


def test_reclaim_stale_accepts_epoch_micros(spark):
    from pipeline_etl_ecommerce_spark.plans.queues import reclaim_stale

    now = dt.datetime(2025, 8, 10, 12, 0, 0, tzinfo=dt.timezone.utc)
    old = now - dt.timedelta(hours=2)
    queue = spark.createDataFrame(
        [(1, "MLB1", D, "processando", old)], schemas.TAREFAS_PENDENTES_TRAFEGO
    )
    now_us = int(now.timestamp() * 1_000_000)
    row = reclaim_stale(queue, now=now_us, timeout_minutes=30).collect()[0]
    assert row["status"] == "pendente" and row["tentativas"] == 1


def test_reclaim_stale_micros_are_float_exact(spark):
    """ADVICE r4: int(now.timestamp() * 1e6) truncates through float64 and
    can be 1 µs low (2038-02-11T03:25:45.000003Z really does truncate to
    ...002). The cutoff must use exact integer epoch arithmetic: a claim
    exactly 1 µs past the timeout is reclaimed, one exactly AT the
    boundary is not — under the float path the first row is missed."""
    from pipeline_etl_ecommerce_spark.plans.queues import reclaim_stale

    now = dt.datetime(2038, 2, 11, 3, 25, 45, 3, tzinfo=dt.timezone.utc)
    exact_us = (now - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)) // dt.timedelta(
        microseconds=1
    )
    assert int(now.timestamp() * 1_000_000) == exact_us - 1  # the trap is real
    boundary = now - dt.timedelta(minutes=30)
    just_past = boundary - dt.timedelta(microseconds=1)
    queue = spark.createDataFrame(
        [
            (1, "MLB1", D, "processando", just_past),
            (2, "MLB2", D, "processando", boundary),
        ],
        schemas.TAREFAS_PENDENTES_TRAFEGO,
    )
    out = {r["id"]: r["status"] for r in
           reclaim_stale(queue, now=now, timeout_minutes=30).collect()}
    assert out == {1: "pendente", 2: "processando"}
    # and the datetime path agrees with the explicit epoch-micros path
    out_int = {r["id"]: r["status"] for r in
               reclaim_stale(queue, now=exact_us, timeout_minutes=30).collect()}
    assert out_int == out
