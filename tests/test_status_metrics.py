"""Status + metrics surface (bragi /status and /metrics port).

Pins `mimirsbrunn_spark.status` against the reference's shapes:
- StatusResponseBody key structure (api.rs:243-269, handlers.rs:386-407)
- storage health semantics green/yellow/red (status.rs:33-51, re-read
  for the published lake)
- the prometheus series names, label sets, and the exact
  exponential_buckets(0.001, 1.5, 25) ladder both reference histograms
  register (prometheus_handler.rs:39-58, handlers.rs:56-62)
- the PATH_TO_NAME resource table incl. the /features prefix rule
  (prometheus_handler.rs:6-35)
- end-to-end: the serving job publishes _metrics.prom + _status.json.
"""

from __future__ import annotations

import json
import re

import pytest

from mimirsbrunn_spark.status import (
    BRAGI_BUCKETS,
    MetricsRegistry,
    exponential_buckets,
    get_resource_name,
    status_response,
    storage_status,
)


# ---------------------------------------------------------------- resources

@pytest.mark.parametrize("path,expected", [
    ("/api/v1/", "/"),
    ("/api/v1/metrics", "metrics"),
    ("/api/v1/status", "status"),
    ("/api/v1/reverse", "reverse"),
    ("/api/v1/autocomplete", "autocomplete"),
    ("/api/v1/autocomplete-explain", "autocomplete-explain"),
    ("/api/v1/features", "/api/v1/features"),
    ("/api/v1/features/admin:osm:relation:7444", "/api/v1/features"),
    ("/somewhere/else", ""),
])
def test_resource_name_table(path, expected):
    assert get_resource_name(path) == expected


# ------------------------------------------------------------------ buckets

def test_exponential_buckets_reference_ladder():
    # prometheus::exponential_buckets(0.001, 1.5, 25)
    assert len(BRAGI_BUCKETS) == 25
    assert BRAGI_BUCKETS[0] == pytest.approx(0.001)
    for lo, hi in zip(BRAGI_BUCKETS, BRAGI_BUCKETS[1:]):
        assert hi / lo == pytest.approx(1.5)
    # closed form of the prometheus impl: start * factor^i
    for i, ub in enumerate(BRAGI_BUCKETS):
        assert ub == pytest.approx(0.001 * 1.5 ** i)


def test_exponential_buckets_rejects_invalid():
    for bad in [(0, 1.5, 25), (0.001, 1.0, 25), (0.001, 1.5, 0)]:
        with pytest.raises(ValueError):
            exponential_buckets(*bad)


# ----------------------------------------------------------------- registry

def test_histogram_cumulative_and_inf():
    reg = MetricsRegistry()
    # 0.001*1.5^0 = 0.001 (bucket 0 upper), 0.0014 -> bucket 1, huge -> +Inf
    reg.observe_duration("reverse", 0.001)
    reg.observe_duration("reverse", 0.0014)
    reg.observe_duration("reverse", 999.0)
    text = reg.render()
    # cumulative: le=0.001 -> 1, le=0.0015 -> 2, last finite bucket -> 2, +Inf -> 3
    m = {k: v for k, v in re.findall(
        r'bragi_http_request_duration_seconds_bucket\{handler="reverse",le="([^"]+)",method="GET"\} (\d+)',
        text,
    )}
    assert m["0.001"] == "1"
    assert m["+Inf"] == "3"
    finite = [v for k, v in m.items() if k != "+Inf"]
    assert finite[-1] == "2"  # 999 s is beyond the 25-bucket ladder
    assert 'bragi_http_request_duration_seconds_count{handler="reverse",method="GET"} 3' in text
    sum_line = re.search(
        r'bragi_http_request_duration_seconds_sum\{handler="reverse",method="GET"\} ([0-9.]+)',
        text,
    )
    assert float(sum_line.group(1)) == pytest.approx(999.0024)


def test_counter_and_gauge_render():
    reg = MetricsRegistry()
    reg.inc_request("reverse", status=200, n=5)
    reg.inc_request("reverse", status=400, n=2)
    reg.inc_request("autocomplete", status=200)
    with reg.track():
        assert reg.in_flight == 1
        mid = reg.render()
    assert 'bragi_http_requests_in_flight 1' in mid
    text = reg.render()
    assert 'bragi_http_requests_total{handler="reverse",method="GET",status="200"} 5' in text
    assert 'bragi_http_requests_total{handler="reverse",method="GET",status="400"} 2' in text
    assert 'bragi_http_requests_total{handler="autocomplete",method="GET",status="200"} 1' in text
    assert text.rstrip().endswith("bragi_http_requests_in_flight 0")
    # exposition-format sanity: every non-comment line is `name{labels} value`
    for line in text.strip().splitlines():
        if line.startswith("#"):
            continue
        assert re.fullmatch(r'[a-z_]+(\{[^}]*\})? [0-9.+Ine-]+', line), line


# ------------------------------------------------------------------- status

def test_storage_status_health_tiers(spark, tmp_path):
    from mimirsbrunn_spark.sources import publish_table

    base = tmp_path / "lake"
    df = spark.range(3)

    # red: root absent
    assert storage_status(spark, str(base))["health"] == "red"

    # green: one healthy published table
    publish_table(df, str(base), "addr")
    st = storage_status(spark, str(base))
    assert st["health"] == "green" and st["tables"] == {"addr": "green"}
    assert st["version"] == spark.version

    # yellow: add a table whose _CURRENT points at a missing generation
    bad = base / "poi"
    bad.mkdir()
    (bad / "_CURRENT").write_text(json.dumps({"generation": "gen_nope"}))
    st = storage_status(spark, str(base))
    assert st["health"] == "yellow"
    assert st["tables"] == {"addr": "green", "poi": "red"}

    # red again when ONLY broken tables are asked about
    assert storage_status(spark, str(base), ["poi"])["health"] == "red"

    # a pointer that is valid JSON but not an object maps to red, not a crash
    (bad / "_CURRENT").write_text(json.dumps("gen_nope"))
    assert storage_status(spark, str(base))["tables"]["poi"] == "red"


def test_status_response_body_shape(spark, tmp_path):
    from mimirsbrunn_spark import __version__
    from mimirsbrunn_spark.sources import publish_table

    base = tmp_path / "lake"
    publish_table(spark.range(2), str(base), "addr")
    body = status_response(spark, str(base))
    # exact serialized key names of StatusResponseBody (api.rs:243-269)
    assert set(body) == {"bragi", "mimir", "elasticsearch"}
    assert body["bragi"] == {"version": __version__}
    assert body["mimir"] == {"version": __version__}
    assert set(body["elasticsearch"]) == {"version", "health", "url"}
    assert body["elasticsearch"]["health"] == "green"
    assert body["elasticsearch"]["url"] == str(base)
    json.dumps(body)  # serializable as the endpoint would emit it
