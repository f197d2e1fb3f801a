"""Interleaved-corpus span operators.

The engine's primary input (BASELINE.json.input_hint) is a table
``docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.
Geometry-bearing spans have kind='geo' and text='{lon};{lat}'
(coordinate validity ranges per /root/reference/libs/places/src/
coord.rs:21-29).

Two extraction paths, same output:

- ``extract_geo_points``: pure Catalyst (explode + split + cast), fully
  JVM-side/codegen — this is what you want at 100 TB, and what the
  DuckDB oracle mirrors.
- ``extract_geo_points_arrow``: vectorized Arrow batches via mapInPandas
  (per input_hint; useful when parsing is genuinely irregular).

Both *read* spans without mutating them — the span-sequence invariant
(kind, text, media_ref, order) is checked by ``span_fingerprint`` /
``assert_span_invariant``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEO_POINT_SCHEMA = "doc_id string, span_offset int, lon double, lat double"


def extract_geo_points(docs: DataFrame) -> DataFrame:
    """Catalyst-native: docs → (doc_id, span_offset, lon, lat).

    Invalid coordinates are dropped, mirroring the reference's per-row
    Coord validation (coord.rs:21-29; invalid rows are skipped with a
    warning at e.g. bano.rs:113-114).
    """
    s = F.col("s")
    parts = F.split(s["text"], ";")
    return (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .filter(s["kind"] == "geo")
        .select(
            "doc_id",
            s["offset"].alias("span_offset"),
            # try_cast: malformed coordinates become NULL and are dropped
            # (ANSI mode would otherwise fail the job on one bad row)
            parts.getItem(0).try_cast("double").alias("lon"),
            parts.getItem(1).try_cast("double").alias("lat"),
        )
        .filter(
            F.col("lon").isNotNull()
            & F.col("lat").isNotNull()
            & (F.col("lon") >= -180.0) & (F.col("lon") <= 180.0)
            & (F.col("lat") >= -90.0) & (F.col("lat") <= 90.0)
        )
    )


def extract_geo_points_arrow(docs: DataFrame) -> DataFrame:
    """Same contract via vectorized Arrow batches (mapInPandas)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids, offsets, texts = [], [], []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                for sp in spans:
                    if sp["kind"] == "geo":
                        doc_ids.append(doc_id)
                        offsets.append(sp["offset"])
                        texts.append(sp["text"])
            if not doc_ids:
                continue
            split = pd.Series(texts).str.split(";", n=1, expand=True)
            lon = pd.to_numeric(split[0], errors="coerce")
            lat = pd.to_numeric(split[1], errors="coerce")
            out = pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "span_offset": np.asarray(offsets, dtype=np.int32),
                    "lon": lon.to_numpy(dtype=np.float64),
                    "lat": lat.to_numpy(dtype=np.float64),
                }
            )
            ok = (
                out.lon.notna() & out.lat.notna()
                & out.lon.between(-180.0, 180.0) & out.lat.between(-90.0, 90.0)
            )
            yield out[ok]

    return docs.mapInPandas(gen, schema=GEO_POINT_SCHEMA)


# ---------------------------------------------------------------------------
# span-sequence invariant
# ---------------------------------------------------------------------------


def span_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) where fp hashes the exact (kind, text, media_ref, order)
    sequence — array order is sequence order, offset is carried in the hash."""
    fp = F.sha2(
        F.to_json(
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            )
        ),
        256,
    )
    return docs.select("doc_id", fp.alias("span_fp"))


def span_structure_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, span_sfp): hashes the (kind, media_ref, offset, order)
    sequence with TEXT EXCLUDED — the invariant a text-rewriting stage
    (PII scrub, repetition filter) must still preserve: it may edit span
    text but may never drop, reorder, retype or re-ref a span
    (VERDICT r03 #2)."""
    fp = F.sha2(
        F.to_json(
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            )
        ),
        256,
    )
    return docs.select("doc_id", fp.alias("span_sfp"))


def _fp_violations(a: DataFrame, b: DataFrame, col: str) -> int:
    joined = a.alias("a").join(b.alias("b"), "doc_id", "full")
    return joined.filter(
        F.col(f"a.{col}").isNull()
        | F.col(f"b.{col}").isNull()
        | (F.col(f"a.{col}") != F.col(f"b.{col}"))
    ).count()


def span_invariant_violations(before: DataFrame, after: DataFrame) -> int:
    """Count docs whose exact span sequence (text included) changed."""
    return _fp_violations(span_fingerprint(before), span_fingerprint(after), "span_fp")


def span_structure_violations(before: DataFrame, after: DataFrame) -> int:
    """Count docs whose span STRUCTURE (kind, media_ref, offset, order)
    changed — the gate for doc-rewriting stages."""
    return _fp_violations(
        span_structure_fingerprint(before), span_structure_fingerprint(after), "span_sfp"
    )


def assert_span_invariant(before: DataFrame, after: DataFrame) -> None:
    n = span_invariant_violations(before, after)
    if n:
        raise AssertionError(f"span-sequence invariant violated for {n} docs")
