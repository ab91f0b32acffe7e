"""Bronze ingestion: Eurostat REST fetch + partitioned JSON landing
(SURVEY.md §2.1 S1-S6).

Mirrors the reference's bronze stage semantics
(/root/reference/src/ingestion/ingestion_hicp_raw.py):

- S1 ``fetch_json``: GET ``{base}/{dataset}?param=...`` with a timeout,
  raise with a truncated body on non-2xx (ingestion_hicp_raw.py:19-28).
- S2 ``fetch_with_fallbacks``: try the full param set, retry with ``unit``
  dropped on failure, report which params were actually used
  (ingestion_hicp_raw.py:31-47).
- S3/S4 ``land_payload``: wrap in the ``{"meta":..., "data":...}``
  envelope and write to a Hive-style partitioned path
  ``geo=<g>/coicop=<c>/ts=<ts>.json`` (ingestion_hicp_raw.py:63-78).
- S5/S6 ``latest_payload_path``: newest object under a prefix — the
  reference's list-and-max-by-last-modified (storage/blob.py:43-60) over a
  local/HDFS filesystem.

Architecture note: the HTTP fetch stays OUTSIDE the cluster (one small
request per series — parallelism belongs across series, driver-side or via
a scheduler), exactly as the reference runs it as a standalone stage. The
cluster's entry point is the landed JSON, which
``sources.jsonstat.read_jsonstat_files`` parses distributed. ``urllib``
(stdlib) is used instead of ``requests`` so the module has zero extra
dependencies; the transport is injectable for tests and for swapping in a
session-pooled client in production.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

EUROSTAT_BASE = (
    "https://ec.europa.eu/eurostat/api/dissemination/statistics/1.0/data"
)
DEFAULT_TIMEOUT = 60  # seconds — matches ingestion_hicp_raw.py:19

Transport = Callable[[str, int], tuple[int, bytes]]


class FetchError(RuntimeError):
    """Non-2xx response; message carries a truncated body for diagnosis."""


def _urllib_transport(url: str, timeout: int) -> tuple[int, bytes]:
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still has a body
        return e.code, e.read()


def fetch_json(
    dataset: str,
    params: dict[str, str],
    base: str = EUROSTAT_BASE,
    timeout: int = DEFAULT_TIMEOUT,
    transport: Transport = _urllib_transport,
) -> dict[str, Any]:
    """S1: GET one dataset with query params; raise on non-2xx with a
    truncated body (ingestion_hicp_raw.py:19-28)."""
    url = f"{base}/{dataset}?{urllib.parse.urlencode(params)}"
    status, body = transport(url, timeout)
    if not 200 <= status < 300:
        raise FetchError(f"GET {url} -> {status}: {body[:500]!r}")
    return json.loads(body.decode("utf-8"))


def fetch_with_fallbacks(
    dataset: str,
    params: dict[str, str],
    drop_on_retry: tuple[str, ...] = ("unit",),
    **kw: Any,
) -> tuple[dict[str, Any], dict[str, str]]:
    """S2: try the full param set; on failure retry with ``drop_on_retry``
    keys removed; return (payload, params actually used)
    (ingestion_hicp_raw.py:31-47)."""
    try:
        return fetch_json(dataset, params, **kw), params
    except (FetchError, urllib.error.URLError):
        reduced = {k: v for k, v in params.items() if k not in drop_on_retry}
        if reduced == params:
            raise
        return fetch_json(dataset, reduced, **kw), reduced


def land_payload(
    payload: dict[str, Any],
    root: str,
    dataset: str,
    geo: str,
    coicop: str,
    params_used: dict[str, str] | None = None,
    now: datetime | None = None,
) -> str:
    """S3+S4: envelope + Hive-partitioned landing path; returns the path.

    Layout ``raw/<dataset>/geo=<g>/coicop=<c>/ts=<ts>.json`` mirrors
    ingestion_hicp_raw.py:76 so partition discovery and pruning work on
    read; overwrite-on-write matches blob.py:23-27 (W2).
    """
    ts = (now or datetime.now(timezone.utc)).strftime("%Y%m%d_%H%M%S")
    envelope = {
        "meta": {
            "dataset": dataset,
            "params": params_used or {},
            "fetched_at_utc": (now or datetime.now(timezone.utc)).isoformat(),
            "stage": "raw",
        },
        "data": payload,
    }
    out = Path(root) / "raw" / dataset / f"geo={geo}" / f"coicop={coicop}" / f"ts={ts}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(envelope, ensure_ascii=False))
    return str(out)


def latest_payload_path(root: str, prefix: str = "") -> str | None:
    """S5+S6: newest landed file under a prefix, by modification time with
    path as the deterministic tie-break (blob.py:55-60)."""
    base = Path(root) / prefix if prefix else Path(root)
    if not base.exists():
        return None
    files = [p for p in base.rglob("*.json") if p.is_file()]
    if not files:
        return None
    return str(max(files, key=lambda p: (p.stat().st_mtime_ns, str(p))))


def latest_payload_per_partition(root: str, dataset: str) -> list[str]:
    """S6 at series granularity: the newest ``ts=*.json`` in EACH
    ``geo=*/coicop=*`` partition directory — the reference's
    latest-blob-only incremental model (each run supersedes the previous
    landing for its series; history stays on disk for audit/replay).

    The ``ts=`` filename key sorts lexicographically by fetch time, so
    "newest" is the max filename — deterministic even when mtimes collide.
    """
    base = Path(root) / "raw" / dataset
    if not base.exists():
        return []
    out = []
    for part_dir in sorted(base.glob("geo=*/coicop=*")):
        if not part_dir.is_dir():
            continue
        files = [p for p in part_dir.glob("ts=*.json") if p.is_file()]
        if files:
            out.append(str(max(files, key=lambda p: p.name)))
    return out
