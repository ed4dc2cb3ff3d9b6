"""UD4 OAuth helpers: refresh-on-expiry, single refresh under concurrency,
retry-once-on-401, and composition with the S4 pagination loop — all with
injected transport/clock, no network."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from pipeline_etl_ecommerce_spark.sources.auth import (
    TokenExpired,
    TokenProvider,
    bearer_fetch,
    with_auth_retry,
)
from pipeline_etl_ecommerce_spark.sources.rest import fetch_offset_limit


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _provider(clock, expires_in=600):
    calls = []

    def refresh():
        calls.append(clock())
        return {"access_token": f"tok{len(calls)}", "expires_in": expires_in}

    return TokenProvider(refresh, skew_seconds=60, clock=clock), calls


def test_token_cached_until_skewed_expiry():
    clock = FakeClock()
    p, calls = _provider(clock)
    assert p.token() == "tok1" and p.token() == "tok1"
    clock.t = 539.0  # inside expiry - skew
    assert p.token() == "tok1"
    clock.t = 540.0  # expiry - skew reached -> refresh
    assert p.token() == "tok2"
    assert len(calls) == 2


def test_concurrent_token_calls_refresh_once():
    clock = FakeClock()
    p, calls = _provider(clock)
    with ThreadPoolExecutor(max_workers=8) as pool:
        tokens = list(pool.map(lambda _: p.token(), range(64)))
    assert set(tokens) == {"tok1"} and len(calls) == 1


def test_retry_on_401_refreshes_and_replays():
    clock = FakeClock()
    p, calls = _provider(clock)
    seen = []

    def call(token):
        seen.append(token)
        if len(seen) == 1:
            raise TokenExpired()  # server revoked tok1 early
        return {"ok": token}

    assert with_auth_retry(p, call) == {"ok": "tok2"}
    assert seen == ["tok1", "tok2"] and len(calls) == 2


def test_non_auth_errors_propagate():
    clock = FakeClock()
    p, _ = _provider(clock)
    with pytest.raises(ValueError):
        with_auth_retry(p, lambda tok: (_ for _ in ()).throw(ValueError("boom")))


def test_bearer_fetch_composes_with_offset_pagination():
    clock = FakeClock()
    p, _ = _provider(clock)
    rows = [{"id": i} for i in range(10)]

    def transport(offset, limit, headers):
        assert headers["Authorization"].startswith("Bearer tok")
        return {"results": rows[offset : offset + limit], "paging": {"total": 10}}

    pages = list(fetch_offset_limit(bearer_fetch(p, transport), limit=4))
    assert [r["id"] for pg in pages for r in pg] == list(range(10))


def test_concurrent_401s_on_same_token_refresh_once():
    """N in-flight pages all failing on the same stale token must cause ONE
    refresh, not N: invalidate() is compare-and-clear, so siblings arriving
    after the first refresh see a different cached token and keep it."""
    clock = FakeClock()
    p, calls = _provider(clock)
    stale = p.token()  # tok1, now revoked server-side

    def worker(_):
        def call(token):
            if token == stale:
                raise TokenExpired()
            return {"ok": token}

        return with_auth_retry(p, call)["ok"]

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(worker, range(16)))
    assert set(results) == {"tok2"}
    assert len(calls) == 2  # initial grant + exactly one re-grant
