from .runner import (
    read_json_stream,
    daily_rollup_stream,
    run_upsert_stream,
    dedup_stream,
    backfill,
    incremental_day_targets,
)

__all__ = [
    "read_json_stream",
    "daily_rollup_stream",
    "run_upsert_stream",
    "dedup_stream",
    "backfill",
    "incremental_day_targets",
]
