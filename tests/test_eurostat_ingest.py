"""Bronze ingestion tests (S1-S6) with an injected transport — no network.

End-to-end: fake-fetch -> land (envelope + partitioned path) -> latest
resolution -> distributed JSON-stat parse of the landed files.
"""

from __future__ import annotations

import json
import time
from datetime import datetime, timezone

import pytest

from european_public_data_pipeline_spark.sources.eurostat import (
    FetchError,
    fetch_json,
    fetch_with_fallbacks,
    land_payload,
    latest_payload_path,
)
from european_public_data_pipeline_spark.sources.jsonstat import read_jsonstat_files
from tests.test_jsonstat import base_payload


def ok_transport(url, timeout):
    return 200, json.dumps(base_payload()).encode()


def test_fetch_json_parses_body():
    payload = fetch_json("prc_hicp_midx", {"geo": "LU"}, transport=ok_transport)
    assert payload["id"] == ["freq", "unit", "coicop", "geo", "time"]


def test_fetch_json_raises_with_truncated_body():
    def err_transport(url, timeout):
        return 500, b"boom" * 1000

    with pytest.raises(FetchError, match="500"):
        fetch_json("prc_hicp_midx", {}, transport=err_transport)


def test_fetch_with_fallbacks_drops_unit_on_retry():
    calls = []

    def flaky_transport(url, timeout):
        calls.append(url)
        if "unit=" in url:
            return 400, b"bad param"
        return 200, json.dumps(base_payload()).encode()

    payload, used = fetch_with_fallbacks(
        "prc_hicp_midx",
        {"geo": "LU", "unit": "I15"},
        transport=flaky_transport,
    )
    assert len(calls) == 2
    assert used == {"geo": "LU"}
    assert payload["id"][0] == "freq"


def test_fetch_with_fallbacks_reraises_when_nothing_to_drop():
    def err_transport(url, timeout):
        return 404, b"nope"

    with pytest.raises(FetchError):
        fetch_with_fallbacks("ds", {"geo": "LU"}, transport=err_transport)


def test_land_and_latest_and_distributed_parse(spark, tmp_path):
    root = str(tmp_path)
    now1 = datetime(2026, 8, 13, 10, 0, 0, tzinfo=timezone.utc)
    p1 = land_payload(base_payload(), root, "prc_hicp_midx", "LU", "CP00", now=now1)
    time.sleep(0.01)
    now2 = datetime(2026, 8, 13, 11, 0, 0, tzinfo=timezone.utc)
    p2 = land_payload(base_payload(), root, "prc_hicp_midx", "DE", "CP00", now=now2)

    # Envelope shape (meta + data) and partitioned layout.
    envelope = json.loads(open(p1).read())
    assert envelope["meta"]["stage"] == "raw"
    assert "geo=LU/coicop=CP00" in p1.replace("\\", "/")

    # Latest = most recently written (S6).
    assert latest_payload_path(root) == p2
    assert latest_payload_path(root, "raw/prc_hicp_midx/geo=LU") == p1

    # The landed files parse distributed, envelope unwrapped (S7 + R1).
    df = read_jsonstat_files(
        spark, f"{root}/raw/prc_hicp_midx/*/*/*.json",
        dims=("freq", "unit", "coicop", "geo", "time"),
    )
    assert df.count() == 8
    assert df.filter("value IS NOT NULL").count() == 8
