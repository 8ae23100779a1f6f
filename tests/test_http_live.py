"""Live-HTTP S1/S10: an in-process fake FROST server drives the full
fetch → QC → batched-PATCH round trip over localhost, plus unit tests of
the retry/backoff client (injected sleeper — no real waiting).

Reference parity: paginated OData GET ``src/main.py:349-364``, count
probe ``src/main.py:86``, ``$batch`` PATCH write-back
``src/main.py:854-859,318`` with dry-run default ``src/main.py:317``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from qualityassurancetool_spark.sources.http_client import (
    HttpError,
    request_json,
    with_query,
)

N_OBS = 57


def _make_obs(i: int) -> dict:
    return {
        "@iot.id": i,
        "result": float(10 + (i % 7)),
        "phenomenonTime": f"2023-08-22T10:{i % 60:02d}:00Z",
        "resultQuality": 0,
        "FeatureOfInterest": {
            "feature": {"coordinates": [3.1 + i * 1e-3, 51.2 + i * 1e-3]},
            "@iot.id": 9000 + i,
        },
    }


class _FakeFrost(BaseHTTPRequestHandler):
    """SensorThings-ish server: count probe, $top/$skip pages, $batch
    PATCH endpoint, and per-path one-shot 503 failure injection."""

    server_version = "FakeFrost/1"

    def _respond(self, code: int, doc) -> None:
        payload = json.dumps(doc).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_GET(self):  # noqa: N802 (stdlib API name)
        st = self.server.state
        with st["lock"]:
            st["gets"] += 1
            if st["fail_next_gets"] > 0:
                st["fail_next_gets"] -= 1
                self._respond(503, {"error": "injected"})
                return
        q = parse_qs(urlparse(self.path).query)
        top = int(q.get("$top", ["1000"])[0])
        skip = int(q.get("$skip", ["0"])[0])
        doc = {}
        if q.get("$count", ["false"])[0] == "true":
            doc["@iot.count"] = N_OBS
        if top > 0:
            doc["Datastreams"] = [
                {
                    "@iot.id": 1,
                    "unitOfMeasurement": {"name": "degC"},
                    "ObservedProperty": {"name": "temperature"},
                    "Observations": [
                        _make_obs(i)
                        for i in range(skip, min(skip + top, N_OBS))
                    ],
                }
            ]
        self._respond(200, doc)

    def do_POST(self):  # noqa: N802
        st = self.server.state
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        if not urlparse(self.path).path.endswith("/$batch"):
            self._respond(404, {"error": "not found"})
            return
        with st["lock"]:
            if st["fail_next_posts"] > 0:
                st["fail_next_posts"] -= 1
                self._respond(503, {"error": "injected"})
                return
            st["batches"].append(body)
        self._respond(
            200,
            {"responses": [
                {"id": r["id"], "status": 200} for r in body["requests"]
            ]},
        )

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture()
def frost():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeFrost)
    srv.state = {
        "lock": threading.Lock(),
        "gets": 0,
        "batches": [],
        "fail_next_gets": 0,
        "fail_next_posts": 0,
    }
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}/v1.1"
    try:
        yield srv, base
    finally:
        srv.shutdown()
        srv.server_close()


def test_request_json_retries_then_succeeds(frost):
    srv, base = frost
    srv.state["fail_next_gets"] = 2
    waits = []
    doc = request_json(
        with_query(f"{base}/Things(1)", "$top=0&$count=true"),
        retries=3,
        backoff=0.25,
        sleep=waits.append,
    )
    assert doc["@iot.count"] == N_OBS
    assert waits == [0.25, 0.5]  # exponential backoff, injected sleeper


def test_request_json_exhausts_retries(frost):
    srv, base = frost
    srv.state["fail_next_gets"] = 5
    with pytest.raises(HttpError, match="failed after 3 attempts"):
        request_json(
            f"{base}/Things(1)", retries=2, backoff=0.1, sleep=lambda s: None
        )


def test_request_json_client_error_no_retry(frost):
    srv, base = frost
    with pytest.raises(HttpError) as ei:
        request_json(f"{base}/nope", method="POST", body={}, retries=3)
    assert ei.value.status == 404
    # one request only: 4xx is terminal
    assert srv.state["gets"] == 0


def test_live_fetch_pages_as_partitions(spark, frost):
    srv, base = frost
    from qualityassurancetool_spark.sources.sta_datasource import (
        SensorThingsDataSource,
    )

    spark.dataSource.register(SensorThingsDataSource)
    df = (
        spark.read.format("sensorthings")
        .option("page_size", 20)
        .load(f"{base}/Things(1)?$expand=Datastreams")
    )
    assert df.rdd.getNumPartitions() == 3  # ceil(57/20) pages
    rows = df.collect()
    assert len(rows) == N_OBS
    byid = {r["iot_id"]: r for r in rows}
    assert byid[3]["result"] == 13.0
    assert byid[3]["observation_type"] == "temperature"
    assert byid[3]["lat"] == pytest.approx(51.203)
    assert byid[3]["feature_id"] == 9003


def test_fetch_qc_patch_round_trip(spark, frost):
    """The reference's whole operational loop over localhost: paginated
    fetch → range QC → severity-merged flags → batched $batch PATCH."""
    from pyspark.sql import functions as F

    from qualityassurancetool_spark.sources.sinks import (
        http_patch_sink,
        make_http_batch_sender,
    )
    from qualityassurancetool_spark.sources.sta_datasource import (
        SensorThingsDataSource,
    )

    srv, base = frost
    spark.dataSource.register(SensorThingsDataSource)
    obs = (
        spark.read.format("sensorthings")
        .option("page_size", 25)
        .load(f"{base}/Things(1)?$expand=Datastreams")
    )
    # strict range check: result in (0, 14) exclusive → result >= 14 is BAD
    flagged = obs.withColumn(
        "qc_flag",
        F.when(
            (F.col("result") > 0.0) & (F.col("result") < 14.0), F.lit(1)
        ).otherwise(F.lit(4)).cast("tinyint"),
    )
    # dry-run default: nothing posted
    n_dry = http_patch_sink(flagged)
    assert n_dry == N_OBS and srv.state["batches"] == []

    srv.state["fail_next_posts"] = 1  # first batch POST 503s, then heals
    n = http_patch_sink(
        flagged,
        sender=make_http_batch_sender(base, retries=3, backoff=0.0),
        batch_size=10,
        dry_run=False,
    )
    assert n == N_OBS
    reqs = [r for b in srv.state["batches"] for r in b["requests"]]
    assert len(reqs) == N_OBS
    assert all(r["method"] == "patch" for r in reqs)
    got = {
        int(r["url"].split("(")[1].rstrip(")")): r["body"]["resultQuality"]
        for r in reqs
    }
    exp = {i: (4 if 10 + (i % 7) >= 14 else 1) for i in range(N_OBS)}
    assert got == exp
    # batching honored: every $batch body holds <= batch_size requests
    assert max(len(b["requests"]) for b in srv.state["batches"]) <= 10
