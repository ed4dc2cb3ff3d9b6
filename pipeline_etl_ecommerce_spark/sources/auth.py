"""OAuth2 token refresh + authenticated-fetch helpers (SURVEY.md §2 UD4).

The reference wraps every API call in a get-token / refresh-on-expiry /
retry-on-401 dance (reference ``api_helpers.php`` call sites across the
cron jobs). That logic is connector-side and has nothing to do with query
execution — but the pagination loops in ``sources.rest`` need a ``fetch``
callable that already carries a LIVE credential, so the engine ships the
standard OAuth2 client-credentials/refresh-token state machine with the
two I/O points injected (``refresh`` transport and ``clock``): fully
deterministic under test, zero network in the engine.

Threading note: the offset dialect fetches pages concurrently
(``fetch_offset_limit(max_workers=N)``), so token refresh is serialized
under a lock — one refresh per expiry, not one per in-flight page.
"""

from __future__ import annotations

import threading
import time as _time
from collections.abc import Callable


class TokenExpired(RuntimeError):
    """Raised by a fetch to signal the server rejected the credential (401);
    ``with_auth_retry`` refreshes once and replays."""


class TokenProvider:
    """Caches an access token until shortly before expiry.

    ``refresh() -> {"access_token": str, "expires_in": sec}`` is the only
    transport call — inject the real HTTP POST in production, a stub in
    tests. ``skew_seconds`` refreshes early so a token never dies mid-page.
    """

    def __init__(
        self,
        refresh: Callable[[], dict],
        *,
        skew_seconds: float = 60.0,
        clock: Callable[[], float] = _time.monotonic,
    ):
        self._refresh = refresh
        self._skew = skew_seconds
        self._clock = clock
        self._lock = threading.Lock()
        self._token: str | None = None
        self._expires_at: float = float("-inf")

    def token(self) -> str:
        with self._lock:
            if self._token is None or self._clock() >= self._expires_at:
                payload = self._refresh()
                self._token = str(payload["access_token"])
                self._expires_at = self._clock() + float(
                    payload.get("expires_in", 0)
                ) - self._skew
            return self._token

    def invalidate(self, failed_token: str | None = None) -> None:
        """Force the next ``token()`` to refresh (server-side revocation —
        the 401-despite-unexpired case).

        Pass the token that FAILED: the clear is compare-and-swap, so when
        N concurrent pages all 401 on the same stale token, only the first
        invalidation clears it — the siblings see the cache already holds a
        DIFFERENT (fresh) token and leave it alone. An unconditional clear
        would discard the replacement and turn one expiry into N refresh
        calls (and, with providers that revoke the prior grant on each
        refresh, into a revocation storm). ``None`` forces the clear."""
        with self._lock:
            if failed_token is None or self._token == failed_token:
                self._token = None


def with_auth_retry(
    provider: TokenProvider, call: Callable[[str], dict], *, retries: int = 1
) -> dict:
    """Run ``call(token)``; on ``TokenExpired`` invalidate + refresh and
    replay up to ``retries`` times (the reference's retry-on-401 loop).
    Anything else propagates — auth retry must not mask real errors."""
    for _ in range(retries):
        tok = provider.token()
        try:
            return call(tok)
        except TokenExpired:
            provider.invalidate(tok)  # compare-and-clear: see invalidate()
    return call(provider.token())


def bearer_fetch(
    provider: TokenProvider,
    transport: Callable[..., dict],
) -> Callable[..., dict]:
    """Wrap a transport ``(..., headers=...) -> payload`` into the
    ``fetch`` signature the pagination loops take, injecting a live Bearer
    header per call and retrying once on 401."""

    def fetch(*args, **kwargs) -> dict:
        def call(token: str) -> dict:
            return transport(*args, headers={"Authorization": f"Bearer {token}"}, **kwargs)

        return with_auth_retry(provider, call)

    return fetch
