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
- ``extract_geo_points_arrow``: vectorized Arrow batches via mapInArrow
  (per input_hint; useful when parsing is genuinely irregular).

Both *read* spans without mutating them — the span-sequence invariant
(kind, text, media_ref, order) is checked by ``span_fingerprint`` /
``assert_span_invariant``.
"""

from __future__ import annotations

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
            # (ANSI mode would otherwise fail the job on one bad row).
            # F.get, not getItem: under ANSI, getItem(1) THROWS
            # INVALID_ARRAY_INDEX when the text has no ';' (1-element
            # split) — and the crash hides behind filter short-circuit
            # order, so it only fires when element 0 try_casts to a
            # NUMBER (e.g. text "3.5"): lon.isNotNull() passes and lat
            # is then evaluated. get() returns NULL out-of-bounds, so
            # such rows are dropped like every other malformed coord.
            F.get(parts, 0).try_cast("double").alias("lon"),
            F.get(parts, 1).try_cast("double").alias("lat"),
        )
        .filter(
            F.col("lon").isNotNull()
            & F.col("lat").isNotNull()
            & (F.col("lon") >= -180.0) & (F.col("lon") <= 180.0)
            & (F.col("lat") >= -90.0) & (F.col("lat") <= 90.0)
        )
    )


def extract_geo_points_arrow(docs: DataFrame) -> DataFrame:
    """Same contract via vectorized Arrow batches (mapInArrow).

    Every step is a whole-batch kernel — ``list_parent_indices`` /
    ``list_flatten`` for the explode, ``extract_regex`` for the
    '{lon};{lat}' parse, and Java-trim → dialect-regex gate →
    ``pc.cast(float64)`` for the numeric coercion — with no per-row
    Python anywhere (BASELINE.json input_hint). Parse semantics match
    ``extract_geo_points`` BIT-EXACTLY on the standard decimal /
    scientific dialect, including the edge the Catalyst split implies:
    'a;b;c' parses as (a, b); text without ';' is dropped. Bit-exact
    because both sides are correctly-rounded parsers (Java
    Double.parseDouble / Arrow fast_float) — pandas' ``to_numeric``
    (precise_xstrtod) is NOT correctly rounded and drifts 1 ULP on
    ~17-significant-digit literals, which is why the coercion is
    Arrow-native rather than pandas (caught by the randomized sweep in
    tests/test_span_extract_property.py). The explicit regex gate
    defines the shared dialect: engine-only extensions Java would
    accept (trailing 'd'/'f' suffixes, hex floats like '0x1.8p1',
    'Infinity'/'NaN' spellings) parse in the Catalyst path but are
    NULL here — of those, only suffixed/hex FINITE in-range literals
    can actually diverge post-filter, since ±Infinity/NaN rows fail
    the coordinate range filter on both paths."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # Java String.trim semantics (Catalyst trims before parseDouble):
    # strip chars <= U+0020 from both ends — NOT unicode whitespace
    java_ws = "".join(chr(c) for c in range(0x21))
    # the shared numeric dialect both engines parse identically
    num_re = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"

    def parse_double(col: "pa.Array") -> "pa.Array":
        t = pc.utf8_trim(col, characters=java_ws)
        valid = pc.fill_null(pc.match_substring_regex(t, num_re), False)
        return pc.cast(pc.if_else(valid, t, pa.scalar(None, pa.string())), pa.float64())

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field("span_offset", pa.int32()),
            pa.field("lon", pa.float64()),
            pa.field("lat", pa.float64()),
        ]
    )

    def gen(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for b in batches:
            if b.num_rows == 0:
                continue
            names = b.schema.names
            spans = b.column(names.index("spans"))
            flat = pc.list_flatten(spans)
            if len(flat) == 0:
                continue
            parent = pc.list_parent_indices(spans)
            doc_id = pc.take(b.column(names.index("doc_id")), parent)
            geo = pc.fill_null(pc.equal(pc.struct_field(flat, "kind"), "geo"), False)
            doc_id = pc.filter(doc_id, geo)
            if len(doc_id) == 0:
                continue
            text = pc.filter(pc.struct_field(flat, "text"), geo)
            offset = pc.filter(pc.struct_field(flat, "offset"), geo)
            # split-then-element-0/1 semantics: each group stops at the
            # next ';', so 'a;b;c' → (a, b); no ';' → no match → NULL
            m = pc.extract_regex(text, r"^(?P<lon>[^;]*);(?P<lat>[^;]*)")
            lon = parse_double(pc.struct_field(m, "lon"))
            lat = parse_double(pc.struct_field(m, "lat"))
            ok = pc.and_(
                pc.and_(pc.greater_equal(lon, -180.0), pc.less_equal(lon, 180.0)),
                pc.and_(pc.greater_equal(lat, -90.0), pc.less_equal(lat, 90.0)),
            )
            mask = pc.fill_null(ok, False)
            if not pc.any(mask).as_py():
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(pc.filter(doc_id, mask), pa.string()),
                    pc.cast(pc.filter(offset, mask), pa.int32()),
                    pc.filter(lon, mask),
                    pc.filter(lat, mask),
                ],
                schema=out_schema,
            )

    return docs.select("doc_id", "spans").mapInArrow(gen, schema=GEO_POINT_SCHEMA)


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


def _fp_violations(
    a: DataFrame, b: DataFrame, col: str, allow_missing_after: bool = False
) -> int:
    """Full-outer fingerprint compare. ``allow_missing_after=True`` lets a
    doc-DROPPING stage pass its expected drops (before-only rows) while
    still flagging invented docs (after-only) and changed fingerprints —
    so the caller never needs to pre-align the WIDE before-table to the
    survivors with a full-corpus semi-join; the only join in the gate is
    this one, over two narrow (doc_id, fingerprint) projections.

    Side presence is detected via explicit marker columns, NOT via the
    fingerprint being NULL: a surviving doc whose ``spans`` column is NULL
    hashes to a NULL fingerprint (``to_json(NULL)`` is NULL), and treating
    that as "doc was dropped" would let a stage that nulls a survivor's
    span array slip through the gate. Fingerprints of two present rows are
    compared null-safely for the same reason (NULL spans vs real spans is
    a structure change, not a match)."""
    a2 = a.withColumn("_present_a", F.lit(True))
    b2 = b.withColumn("_present_b", F.lit(True))
    joined = a2.alias("a").join(b2.alias("b"), "doc_id", "full")
    both = F.col("_present_a").isNotNull() & F.col("_present_b").isNotNull()
    cond = F.col("_present_a").isNull() | (
        both & ~F.col(f"a.{col}").eqNullSafe(F.col(f"b.{col}"))
    )
    if not allow_missing_after:
        cond = cond | F.col("_present_b").isNull()
    return joined.filter(cond).count()


def span_invariant_violations(
    before: DataFrame, after: DataFrame, allow_missing_after: bool = False
) -> int:
    """Count docs whose exact span sequence (text included) changed."""
    return _fp_violations(
        span_fingerprint(before), span_fingerprint(after), "span_fp", allow_missing_after
    )


def span_structure_violations(
    before: DataFrame, after: DataFrame, allow_missing_after: bool = False
) -> int:
    """Count docs whose span STRUCTURE (kind, media_ref, offset, order)
    changed — the gate for doc-rewriting stages."""
    return _fp_violations(
        span_structure_fingerprint(before),
        span_structure_fingerprint(after),
        "span_sfp",
        allow_missing_after,
    )


def assert_span_invariant(before: DataFrame, after: DataFrame) -> None:
    n = span_invariant_violations(before, after)
    if n:
        raise AssertionError(f"span-sequence invariant violated for {n} docs")
