"""Status + metrics surface (bragi ``/status`` and ``/metrics``).

The last unported bragi adapter files were ``handlers.rs:386-407``
(status endpoint), ``status.rs:33-51`` (the storage health probe) and
``prometheus_handler.rs`` (the metrics registry). Spark-native mapping:

- ``storage_status`` ≈ ``ElasticsearchStorage::status`` (status.rs:33):
  the "cluster" is the published lake — health is green when every
  expected table resolves a live ``_CURRENT`` generation, yellow when
  some do, red when none do or the root is absent. The version is the
  Spark runtime version (the reference reports the ES cluster version).
- ``status_response`` ≈ ``handlers.rs:386-407`` building
  ``StatusResponseBody { bragi, mimir, elasticsearch }``
  (api.rs:243-269, serde snake_case). Key names are kept verbatim so a
  reference client parsing ``/status`` JSON parses ours.
- ``MetricsRegistry`` ≈ ``prometheus_handler.rs``: the three bragi
  series — ``bragi_http_requests_total{handler,method,status}``
  (counter), ``bragi_http_request_duration_seconds{handler,method}``
  (histogram, exponential_buckets(0.001, 1.5, 25) — the exact reference
  bucket ladder), ``bragi_http_requests_in_flight`` (gauge) — rendered
  in the prometheus text exposition format. No prometheus client dep:
  the registry is ~100 lines of counters, which also keeps it picklable
  into a spark-submit driver.
- ``get_resource_name`` ≈ ``prometheus_handler.rs:21-35`` — the
  hardcoded path→handler table including the ``/api/v1/features``
  prefix rule.

Serving jobs update the registry per batch and publish the rendered
text as ``metrics.prom`` next to their run report — the file stands in
for the scrape endpoint (there is no HTTP server in a Spark job; a real
deployment points node_exporter's textfile collector at it).
"""

from __future__ import annotations

import os
from pathlib import Path

from mimirsbrunn_spark import __version__

# prometheus_handler.rs:6-16 PATH_TO_NAME
_PATH_TO_NAME = {
    "/api/v1/": "/",
    "/api/v1/metrics": "metrics",
    "/api/v1/status": "status",
    "/api/v1/reverse": "reverse",
    "/api/v1/autocomplete": "autocomplete",
    "/api/v1/autocomplete-explain": "autocomplete-explain",
}
_FEATURES_ROUTE = "/api/v1/features"


def get_resource_name(path: str) -> str:
    """prometheus_handler.rs:21-35: map a request path to its handler
    label; unknown paths label "" except the /features/{id} prefix."""
    hit = _PATH_TO_NAME.get(path)
    if hit is not None:
        return hit
    if path.startswith(_FEATURES_ROUTE):
        return _FEATURES_ROUTE
    return ""


def exponential_buckets(start: float, factor: float, count: int) -> list[float]:
    """prometheus::exponential_buckets — upper bounds of `count` buckets
    starting at `start`, each `factor` × the previous."""
    if start <= 0 or factor <= 1 or count < 1:
        raise ValueError("exponential_buckets: start>0, factor>1, count>=1")
    out, cur = [], start
    for _ in range(count):
        out.append(cur)
        cur *= factor
    return out


# the exact ladder both reference histograms use (handlers.rs:56-62,
# prometheus_handler.rs:46-52)
BRAGI_BUCKETS = exponential_buckets(0.001, 1.5, 25)


class _Histogram:
    def __init__(self, buckets: list[float]):
        self.uppers = list(buckets)
        self.counts = [0] * len(buckets)  # per-bucket (non-cumulative)
        self.sum = 0.0
        self.count = 0

    def observe(self, v: float) -> None:
        self.sum += v
        self.count += 1
        for i, ub in enumerate(self.uppers):
            if v <= ub:
                self.counts[i] += 1
                return
        # falls through to +Inf only

    def cumulative(self) -> list[int]:
        out, acc = [], 0
        for c in self.counts:
            acc += c
            out.append(acc)
        return out


def _fmt_labels(labels: dict[str, str]) -> str:
    if not labels:
        return ""
    inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
    return "{" + inner + "}"


def _fmt_val(v: float) -> str:
    return repr(round(v, 12)) if isinstance(v, float) else str(v)


class MetricsRegistry:
    """The three bragi series from prometheus_handler.rs, text-renderable."""

    def __init__(self):
        self._counters: dict[tuple[str, str, str], int] = {}
        self._hists: dict[tuple[str, str], _Histogram] = {}
        self.in_flight = 0

    # HTTP_COUNTER (prometheus_handler.rs:39-44)
    def inc_request(self, handler: str, method: str = "GET", status: int = 200, n: int = 1) -> None:
        key = (handler, method, str(status))
        self._counters[key] = self._counters.get(key, 0) + n

    # HTTP_REQ_HISTOGRAM (prometheus_handler.rs:46-52)
    def observe_duration(self, handler: str, seconds: float, method: str = "GET") -> None:
        key = (handler, method)
        if key not in self._hists:
            self._hists[key] = _Histogram(BRAGI_BUCKETS)
        self._hists[key].observe(seconds)

    # HTTP_IN_FLIGHT (prometheus_handler.rs:54-58)
    def track(self):
        reg = self

        class _InFlight:
            def __enter__(self):
                reg.in_flight += 1
                return reg

            def __exit__(self, *exc):
                reg.in_flight -= 1
                return False

        return _InFlight()

    def render(self) -> str:
        """Prometheus text exposition format, series ordered as the
        reference registers them."""
        lines = [
            "# HELP bragi_http_requests_total Total number of HTTP requests made.",
            "# TYPE bragi_http_requests_total counter",
        ]
        for (handler, method, status), n in sorted(self._counters.items()):
            lbl = _fmt_labels({"handler": handler, "method": method, "status": status})
            lines.append(f"bragi_http_requests_total{lbl} {n}")
        lines += [
            "# HELP bragi_http_request_duration_seconds The HTTP request latencies in seconds.",
            "# TYPE bragi_http_request_duration_seconds histogram",
        ]
        for (handler, method), h in sorted(self._hists.items()):
            base = {"handler": handler, "method": method}
            for ub, cum in zip(h.uppers, h.cumulative()):
                lbl = _fmt_labels({**base, "le": _fmt_val(ub)})
                lines.append(f"bragi_http_request_duration_seconds_bucket{lbl} {cum}")
            lbl = _fmt_labels({**base, "le": "+Inf"})
            lines.append(f"bragi_http_request_duration_seconds_bucket{lbl} {h.count}")
            lines.append(
                f"bragi_http_request_duration_seconds_sum{_fmt_labels(base)} {_fmt_val(h.sum)}"
            )
            lines.append(
                f"bragi_http_request_duration_seconds_count{_fmt_labels(base)} {h.count}"
            )
        lines += [
            "# HELP bragi_http_requests_in_flight current number of http request being served",
            "# TYPE bragi_http_requests_in_flight gauge",
            f"bragi_http_requests_in_flight {self.in_flight}",
        ]
        return "\n".join(lines) + "\n"

    def write(self, path: str | Path) -> None:
        # tmp + os.replace so a textfile-collector scrape never reads a
        # truncated exposition (same pattern as lifecycle.publish_table)
        path = Path(path)
        tmp = path.with_name(path.name + ".tmp")
        tmp.write_text(self.render())
        os.replace(tmp, path)


def storage_status(spark, base_dir: str, tables: list[str] | None = None) -> dict:
    """status.rs:33-51 — health + version of the storage backend.

    Health (ES cluster green/yellow/red, re-read for a lake):
    - green: every expected table has a ``_CURRENT`` pointer naming a
      generation directory that exists
    - yellow: at least one does, but not all (dangling pointer or
      missing table ≈ unassigned replicas)
    - red: the root is missing/unreadable, or no table resolves

    ``tables=None`` autodetects: every subdirectory of ``base_dir``
    containing a ``_CURRENT`` pointer or a ``gen_*`` generation.
    """
    root = Path(base_dir)
    if not root.is_dir():
        return {"version": spark.version, "health": "red", "tables": {}}
    if tables is None:
        tables = sorted(
            d.name
            for d in root.iterdir()
            if d.is_dir()
            and ((d / "_CURRENT").exists() or any(d.glob("gen_*")))
        )
    from mimirsbrunn_spark.sources.lifecycle import resolve_generation

    per_table: dict[str, str] = {}
    for name in tables:
        try:
            per_table[name] = (
                "green" if resolve_generation(root / name).is_dir() else "red"
            )
        except (OSError, ValueError, KeyError, TypeError):
            per_table[name] = "red"
    greens = sum(1 for v in per_table.values() if v == "green")
    if per_table and greens == len(per_table):
        health = "green"
    elif greens:
        health = "yellow"
    else:
        health = "red"
    return {"version": spark.version, "health": health, "tables": per_table}


def status_response(spark, base_dir: str, tables: list[str] | None = None) -> dict:
    """handlers.rs:386-407 — the StatusResponseBody (api.rs:243-269).

    Same serialized key names as the reference so a client of bragi's
    ``/status`` parses this verbatim; the ``elasticsearch`` section
    reports the storage backend (here: Spark + the lake URL)."""
    storage = storage_status(spark, base_dir, tables)
    return {
        "bragi": {"version": __version__},
        "mimir": {"version": __version__},
        "elasticsearch": {
            "version": storage["version"],
            "health": storage["health"],
            "url": str(base_dir),
        },
    }
