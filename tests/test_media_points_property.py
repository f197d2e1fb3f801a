"""Randomized sweep of media_points (the raster layer's nearest-by-
offset media↔geo pairing) against a pure-Python oracle, over span
sequences datagen never produces: exact distance ties (earlier geo
must win), docs with no geo span (media un-locatable → dropped),
malformed geo text (no ';', non-numeric — skipped like the engine's
try_cast path), duplicate media refs, and two DISTINCT media spans
sharing one offset (hostile input: both must survive)."""

from __future__ import annotations

import random

import pytest

from mimirsbrunn_spark.operators.coverage import media_points

_GEO_TEXTS = ["{lon:.6f};{lat:.6f}", "{lon:.6f}", "x;y", "", "{lon:.6f};nan?"]


def _mk_docs(rng: random.Random, n: int = 120) -> list[dict]:
    docs = []
    for d in range(n):
        spans = []
        n_spans = rng.randrange(1, 10)
        for o in range(n_spans):
            r = rng.random()
            if r < 0.45:
                tmpl = rng.choice(_GEO_TEXTS)
                txt = tmpl.format(lon=rng.uniform(-180, 180), lat=rng.uniform(-90, 90))
                spans.append({"kind": "geo", "text": txt, "media_ref": "", "offset": o})
            elif r < 0.8:
                spans.append({"kind": "media", "text": "",
                              "media_ref": f"m:{d}:{o}", "offset": o})
            else:
                spans.append({"kind": "text", "text": "w", "media_ref": "", "offset": o})
        # hostile shape: a second DISTINCT media span at an existing offset
        if rng.random() < 0.3 and spans:
            o = rng.choice(spans)["offset"]
            spans.append({"kind": "media", "text": "", "media_ref": f"m:{d}:dup", "offset": o})
        docs.append({"doc_id": f"doc:{d}", "spans": spans})
    return docs


def _parse_geo(text: str) -> tuple[float, float] | None:
    parts = text.split(";")
    try:
        lon = float(parts[0])
        lat = float(parts[1]) if len(parts) > 1 else None
    except (ValueError, IndexError):
        return None
    return None if lat is None else (lon, lat)


def _oracle(docs: list[dict]) -> set[tuple]:
    out = set()
    for doc in docs:
        geos = []
        for s in doc["spans"]:
            if s["kind"] == "geo":
                p = _parse_geo(s["text"])
                if p is not None:
                    geos.append((s["offset"], *p))
        if not geos:
            continue
        for s in doc["spans"]:
            if s["kind"] != "media":
                continue
            go, lon, lat = min(geos, key=lambda g: (abs(s["offset"] - g[0]), g[0]))
            out.add((doc["doc_id"], s["media_ref"], s["offset"], lon, lat))
    return out


@pytest.mark.parametrize("seed", [19, 73, 127])
def test_media_points_matches_python_oracle(spark, seed):
    docs = _mk_docs(random.Random(seed))
    df = spark.createDataFrame(
        docs,
        schema="doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>",
    )
    got = {
        (r["doc_id"], r["media_ref"], r["offset"], r["lon"], r["lat"])
        for r in media_points(df).collect()
    }
    assert got == _oracle(docs), f"seed {seed}"
