"""Pluggable fetch stage — the real-deployment seam.

In this sandbox the crawl "fetches" by scanning the corpus parquet (a
pushdown join, stages/parse.py) — the right substitution where no network
exists. A real deployment replaces that scan with THIS stage: a callable
CLASS run as a ``map_batches`` actor pool over the admitted frontier,
holding one pooled HTTP client per actor (the reference builds one reqwest
Client with a 5 s connect timeout and reuses it for every request,
/root/reference/src/main.rs:71-73, and fetches each dispatched finding
through it, main.rs:150-159, 264-270).

Contract: input batches are ``(fetch_url, url, kind, depth)`` — one row
per admitted dispatch, ``fetch_url`` the defragmented form actually
requested; output batches are ``(url, kind, depth, html)``, exactly the
schema ``attach_frontier`` produces, so ``process_wave_batch`` and
everything downstream is fetch-implementation-agnostic. Failed fetches
emit NO row — the wave accounting derives fetch_miss_* from dispatched
minus returned, identically for both paths.

``DictFetcher`` is the deterministic offline implementation (corpus
broadcast once via ``ray.put``); the seam test runs a whole crawl through
it and asserts bit-identical output against the corpus-scan path.
"""

from __future__ import annotations

import pyarrow as pa

FETCH_IN_SCHEMA = pa.schema(
    [
        ("fetch_url", pa.string()),
        ("url", pa.string()),
        ("kind", pa.string()),
        ("depth", pa.int32()),
    ]
)


def _emit(batch: pa.Table, keep_idx: list[int], htmls: list[bytes]) -> pa.Table:
    return pa.table(
        {
            "url": batch["url"].take(pa.array(keep_idx, pa.int64())),
            "kind": batch["kind"].take(pa.array(keep_idx, pa.int64())),
            "depth": batch["depth"].take(pa.array(keep_idx, pa.int64())),
            "html": pa.array(htmls, pa.binary()),
        }
    )


class HttpFetcher:
    """Actor-pool HTTP fetch: client built ONCE per actor in __init__
    (the expensive, stateful part — connection pools, TLS contexts), used
    per batch in __call__. Stdlib-only so it imports anywhere; a real
    deployment would swap in an async pooled client behind the same
    contract. This sandbox has no network: constructing the actor is fine
    and cheap, the first request raises — which is exactly the honest
    boundary (same pattern as the multimodal codec stub)."""

    def __init__(
        self, connect_timeout_s: float = 5.0, user_agent: str = "crawler-ray/0.1"
    ) -> None:
        import urllib.request

        self.opener = urllib.request.build_opener()
        self.opener.addheaders = [("User-Agent", user_agent)]
        self.timeout = connect_timeout_s

    def fetch_one(self, url: str) -> "bytes | None":
        try:
            with self.opener.open(url, timeout=self.timeout) as resp:
                return resp.read()
        except Exception:
            return None  # miss: reference warns and drops (main.rs:151-155)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep, htmls = [], []
        for i, fu in enumerate(batch["fetch_url"].to_pylist()):
            body = self.fetch_one(fu)
            if body is not None:
                keep.append(i)
                htmls.append(body)
        return _emit(batch, keep, htmls)


class DictFetcher:
    """Offline fetcher: resolves against a corpus dict broadcast once via
    ``ray.put`` (pass the ObjectRef as ``corpus_ref``). Deterministic —
    the seam's test double AND a usable local-corpus fetch mode."""

    def __init__(self, corpus_ref) -> None:
        import ray

        self.corpus: dict = ray.get(corpus_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep, htmls = [], []
        for i, fu in enumerate(batch["fetch_url"].to_pylist()):
            body = self.corpus.get(fu)
            if body is not None:
                keep.append(i)
                htmls.append(body if isinstance(body, bytes) else body.encode())
        return _emit(batch, keep, htmls)
