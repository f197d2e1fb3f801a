"""The "munin" union view: one queryable surface over all place types.

The reference routes every document type into its own ES index and
exposes aliases ``munin`` (all), ``munin_{type}`` and
``munin_{type}_{dataset}`` (configuration.rs:45-73); queries fan out to
a subset of indices chosen from the requested types
(build_es_indices_to_search, handlers.rs:423-490 — J8).

Spark-side: each type is a table; the union view is a ``unionByName``
over a shared projection with a ``type`` discriminator. Partition
pruning on ``type`` plays the per-type-alias role: a query for
types=[addr] never touches the other tables because the view is built
lazily from only the requested ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the shared projection every place table must be able to produce
PLACE_COLS = ["id", "type", "name", "label", "weight", "lon", "lat", "zip_codes"]

# known dtypes for the shared columns: a table missing one contributes a
# null of the RIGHT type — a string-typed null lon would make
# unionByName silently coerce every branch's lon to string, breaking
# numeric predicates downstream
_PLACE_COL_TYPES = {
    "id": "string", "name": "string", "label": "string",
    "weight": "double", "lon": "double", "lat": "double",
}


def _project(df: DataFrame, type_name: str, mapping: dict[str, str],
             extra_types: dict[str, str] | None = None) -> DataFrame:
    cols = []
    for target in PLACE_COLS:
        if target == "type":
            cols.append(F.lit(type_name).alias("type"))
        elif target in mapping:
            cols.append(F.col(mapping[target]).alias(target))
        elif target in df.columns:
            cols.append(F.col(target))
        elif target == "zip_codes":
            cols.append(F.array().cast("array<string>").alias("zip_codes"))
        elif target == "weight":
            cols.append(F.lit(0.0).alias("weight"))
        else:
            cols.append(
                F.lit(None).cast(_PLACE_COL_TYPES.get(target, "string")).alias(target)
            )
    for name, dtype in (extra_types or {}).items():
        if name in df.columns:
            cols.append(F.col(name))
        else:
            cols.append(F.lit(None).cast(dtype).alias(name))
    return df.select(*cols)


def places_view(
    spark: SparkSession,
    addrs: DataFrame | None = None,
    streets: DataFrame | None = None,
    admins: DataFrame | None = None,
    pois: DataFrame | None = None,
    stops: DataFrame | None = None,
    types: list[str] | None = None,
    visibility: dict[str, str] | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Union of the requested place types in the shared projection.

    Passing ``types`` prunes entire tables from the plan (the J8 index
    narrowing) — not just a filter Catalyst must push.

    ``visibility`` maps type → "public" (default) | "private", the S9
    ContainerVisibility (configuration.rs:23-27). The reference publishes
    every container under its own ``munin_{type}_{dataset}`` alias but
    adds only PUBLIC ones to the type-wide and global ``munin`` aliases
    (storage.rs:180-198) — so here a private table is excluded from the
    implicit all-types view and joins the union only when its type is
    explicitly requested in ``types`` (the "address the container
    directly" path)."""
    candidates = {
        "addr": (addrs, {"id": "addr_id"}),
        "street": (streets, {"id": "street_id"}),
        "admin": (admins, {}),
        "poi": (pois, {"id": "poi_id"}),
        "stop": (stops, {"id": "stop_id"}),
    }
    visibility = visibility or {}
    unknown = set(visibility) - set(candidates)
    if unknown:
        raise ValueError(f"visibility for unknown types: {sorted(unknown)}")
    if types is not None:
        bad = set(types) - set(candidates)
        if bad:
            raise ValueError(f"unknown place types: {sorted(bad)}")
    # rich passthrough columns (i18n names/labels, admins structs, …):
    # each keeps the dtype of the first table that carries it; tables
    # without it contribute typed nulls so the union stays aligned
    extra_types: dict[str, str] = {}
    if extra_cols:
        for name in dict.fromkeys(c for c in extra_cols if c not in PLACE_COLS):
            for df, _ in candidates.values():
                if df is not None and name in df.columns:
                    extra_types[name] = df.schema[name].dataType.simpleString()
                    break
            else:
                extra_types[name] = "string"
    parts = []
    for t, (df, mapping) in candidates.items():
        if df is None:
            continue
        if types is not None and t not in types:
            continue
        if visibility.get(t, "public") == "private" and types is None:
            continue  # private: only reachable by explicit request
        if t == "admin" and "lon" not in df.columns and "coord" in df.columns:
            df = df.withColumn("lon", F.col("coord.lon")).withColumn("lat", F.col("coord.lat"))
        parts.append(_project(df, t, mapping, extra_types))
    if not parts:
        raise ValueError("no place tables supplied (or all pruned by types)")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
