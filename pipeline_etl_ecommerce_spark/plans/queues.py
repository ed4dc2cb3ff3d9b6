"""Queue semantics: producers (INSERT IGNORE dedup) and batch claim.

Spark restatement of the reference's MySQL work queues (SURVEY.md §2.10 T5,
§2.1 S10/S14): producers enqueue only keys absent from the queue; workers
claim a bounded batch of pending rows (status ``pendente`` → ``processando``)
and mark them ``concluido``/``erro`` when done. In batch mode the claim is a
deterministic id-ordered limit; the streaming runner replaces this whole
mechanism with checkpointed micro-batches (see ``streaming.runner``).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.sinks import insert_if_absent


def enqueue_traffic(anuncios: DataFrame, existing: DataFrame, target_date: dt.date | str) -> DataFrame:
    """Producer for traffic tasks (reference ``tarefa_popular_fila_trafego.php``):
    DISTINCT active parent listings × the D-3 target day, deduped against the
    queue via left_anti (INSERT IGNORE)."""
    candidates = (
        anuncios.filter(F.col("status") == "active")
        .select("id_anuncio_pai")
        .distinct()
        .select(
            F.col("id_anuncio_pai").alias("id_anuncio"),
            F.lit(str(target_date)).cast("date").alias("data_metrica"),
        )
    )
    return insert_if_absent(existing.select("id_anuncio", "data_metrica"), candidates, ["id_anuncio", "data_metrica"])


def enqueue_stock(catalogo: DataFrame, target_date: dt.date | str) -> DataFrame:
    """Producer for inventory tasks (reference ``tarefa_popular_fila_estoque.php``).

    The reference's WHERE clause has an operator-precedence bug (``... AND
    tipo='S' OR tipo='K'`` lets 'K' rows bypass the NULL/EMB guards); we
    implement the intended ``tipo_produto IN ('S','K')`` with all guards
    applied (SURVEY.md §2.2 P6, fixed per §7.0)."""
    return (
        catalogo.filter(
            F.col("sku").isNotNull()
            & (F.col("sku") != "")
            & ~F.col("sku").startswith("EMB")
            & F.col("tipo_produto").isin("S", "K")
        )
        .select(
            "sku",
            "id_produto_tiny",
            F.lit(str(target_date)).cast("date").alias("data_snapshot"),
        )
        .distinct()
    )


def claim_batch(queue: DataFrame, batch_size: int = 50) -> tuple[DataFrame, DataFrame]:
    """Worker-side claim (reference ``UPDATE ... SET status='processando'
    WHERE status='pendente' LIMIT n``): returns (claimed, queue_after) — the
    id-ordered first ``batch_size`` pending rows, and the queue with their
    status transitioned. Deterministic where the reference relied on MySQL
    scan order."""
    pending_ids = (
        queue.filter(F.col("status") == "pendente")
        .orderBy("id")
        .limit(batch_size)
        .select("id")
    )
    claimed = queue.join(F.broadcast(pending_ids), "id", "left_semi").withColumn(
        "status", F.lit("processando")
    ).withColumn("data_processamento", F.current_timestamp())
    rest = queue.join(F.broadcast(pending_ids), "id", "left_anti")
    return claimed, rest.unionByName(claimed)


def mark_done(queue: DataFrame, done_ids: DataFrame, status: str = "concluido") -> DataFrame:
    """Transition claimed rows to their terminal status (S14)."""
    flagged = queue.join(F.broadcast(done_ids.select("id")), "id", "left_semi").withColumn(
        "status", F.lit(status)
    )
    untouched = queue.join(F.broadcast(done_ids.select("id")), "id", "left_anti")
    return untouched.unionByName(flagged)


def reclaim_stale(
    queue: DataFrame,
    *,
    now,
    timeout_minutes: int = 30,
    max_retries: int = 3,
) -> DataFrame:
    """Crash recovery the reference LACKS (SURVEY.md §7.3): a worker that
    dies after claiming leaves its rows stranded in ``processando`` forever
    — the reference has no path back to ``pendente``, so those ids are
    simply never processed. Define the recovery instead of copying the gap:

    - ``processando`` rows whose ``data_processamento`` is older than
      ``timeout_minutes`` (vs the caller-supplied ``now`` — injected, never
      wall-clock inside the plan, so replays are deterministic) revert to
      ``pendente`` with ``tentativas`` incremented;
    - rows that have already been retried ``max_retries`` times go to
      ``erro`` — the queue's ONE documented failure status
      (schemas.py `_QUEUE_COMMON`; also what ``mark_done`` writes) —
      instead of looping forever on a poison message. Dead-lettered rows
      are distinguishable from worker-reported errors by
      ``tentativas >= max_retries``.

    Safe under at-least-once: reclaimed work re-runs, and every downstream
    sink is a keyed upsert, so duplicates converge. A missing ``tentativas``
    column — or a NULL value in it (rows appended after the column was
    introduced) — counts as 0.

    ``now`` must be an UNAMBIGUOUS instant: a timezone-AWARE
    ``datetime.datetime``, or an int of epoch MICROSECONDS. A naive datetime
    or a string is rejected — those are interpreted in the ambient session
    timezone, while ``data_processamento`` was written by
    ``current_timestamp()`` (a UTC instant), so under a UTC vs
    America/Sao_Paulo driver session the 30-minute timeout would silently
    shift by hours (ADVICE r3 — the same ambient-conf dependence class the
    hostile selfcheck gate exists to kill). The cutoff is built with
    ``timestamp_micros`` epoch arithmetic: no expression in the chain reads
    ``spark.sql.session.timeZone``."""
    import datetime as _dt

    if isinstance(now, bool) or not isinstance(now, (int, _dt.datetime)):
        raise TypeError(
            f"reclaim_stale: now must be a tz-aware datetime or epoch-micros int, got {type(now).__name__}"
        )
    if isinstance(now, _dt.datetime):
        if now.tzinfo is None:
            raise ValueError(
                "reclaim_stale: naive datetime is ambiguous (session-tz-"
                "dependent); pass a tz-aware datetime or epoch micros"
            )
        # exact epoch micros: .timestamp() goes through a float64, which can
        # be 1 µs off near the precision edge (ADVICE r4) — integer
        # timedelta division never rounds
        epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        now_us = (now - epoch) // _dt.timedelta(microseconds=1)
    else:
        now_us = now
    if "tentativas" not in queue.columns:
        queue = queue.withColumn("tentativas", F.lit(0).cast("int"))
    cutoff = F.timestamp_micros(F.lit(now_us - int(timeout_minutes) * 60_000_000))
    stale = (F.col("status") == "processando") & (
        F.col("data_processamento") < cutoff
    )
    # NULL-safe counter: a NULL tentativas would make BOTH when-branches
    # NULL (treated as false), so a poison row would revert to pendente
    # with its counter stuck at NULL and retry FOREVER
    tent = F.coalesce(F.col("tentativas"), F.lit(0))
    exhausted = tent >= F.lit(int(max_retries))
    # one select so BOTH expressions see the ORIGINAL row — sequential
    # withColumns would let the status test read the already-incremented
    # counter and dead-letter one retry early
    new_status = (
        F.when(stale & exhausted, F.lit("erro"))
        .when(stale, F.lit("pendente"))
        .otherwise(F.col("status"))
        .alias("status")
    )
    new_tent = (
        F.when(stale & ~exhausted, tent + 1)
        .otherwise(tent)
        .alias("tentativas")
    )
    replaced = {"status": new_status, "tentativas": new_tent}
    return queue.select(*[replaced.get(c, F.col(c)) for c in queue.columns])
