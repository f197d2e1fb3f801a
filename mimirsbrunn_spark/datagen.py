"""Deterministic seeded fixture generators (no external data).

Produces the geospatial corpus described in FIXTURES.md:

- ``admins``: octagon-boundary admins (the exact octagon family of the
  reference unit tests, /root/reference/src/admin_geofinder.rs:326-367)
  arranged as a 3-level nested hierarchy country ⊃ state_district ⊃ city,
  plus the canonical semantic-stress configurations (overlapping
  same-zone-type pair, untyped pair, orphan state, untyped outsider);
- ``docs``: interleaved text+media documents per BASELINE.json.input_hint,
  with geo spans drawn from a uniform + Zipf-clustered ("urban core")
  mixture to exercise skew handling;
- ``addresses`` (BANO-shaped), ``streets``, ``pois``, ``stops``.

Everything is numpy-seeded; identical seeds ⇒ identical parquet bytes
(modulo parquet metadata), which the resume/lineage layer relies on.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from .geometry import mp_bbox, mp_centroid, mp_to_wkb

DEFAULT_SEED = 42


def octagon(offset_x: float, offset_y: float, size: float) -> np.ndarray:
    """The reference tests' octagon ring (admin_geofinder.rs:336-351),
    parameterized with independent x/y offsets so we can lay out grids."""
    pts = [(3, 0), (6, 0), (9, 3), (9, 6), (6, 9), (3, 9), (0, 6), (0, 3)]
    return np.array(
        [(x * size + offset_x, y * size + offset_y) for x, y in pts], dtype=np.float64
    )


def _admin_row(id, name, zone_type, parent_id, ring, level, insee="", zips=(), weight=0.0):
    mp = [[ring]]
    cx, cy = (float(v) for v in mp_centroid(mp))
    minx, miny, maxx, maxy = (float(v) for v in mp_bbox(mp))
    return {
        "id": id,
        "insee": insee,
        "level": level,
        "name": name,
        "label": f"{name} ({';'.join(zips)})" if zips else name,
        "zip_codes": list(zips),
        "weight": float(weight),
        "coord": {"lon": cx, "lat": cy},
        "boundary_wkb": mp_to_wkb(mp),
        "bbox": {"minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy},
        "zone_type": zone_type,
        "parent_id": parent_id,
        "codes": {"ISO3166-1:alpha2": name[:2].upper()} if zone_type == "country" else {},
    }


def gen_admins(n_countries: int = 4) -> pd.DataFrame:
    """Nested octagon hierarchy + the reference's stress configurations.

    Layout: countries are 27°-wide octagons on a row at lat offset 0;
    each contains a 2×2 grid of state_districts (9° octagons), each of
    which contains a 2×2 grid of cities (3.6° octagons). Nesting is exact
    (city ⊂ state ⊂ country) by construction.
    """
    rows = []
    zipc = 10000
    for c in range(n_countries):
        cx0 = -160.0 + c * 40.0
        cy0 = -20.0
        cid = f"admin:osm:country:{c}"
        rows.append(
            _admin_row(cid, f"country{c}", "country", None, octagon(cx0, cy0, 3.0), 2,
                       insee="", zips=(), weight=0.9)
        )
        for s in range(4):
            sx = cx0 + 3.0 + (s % 2) * 11.0
            sy = cy0 + 3.0 + (s // 2) * 11.0
            sid = f"admin:osm:state:{c}:{s}"
            rows.append(
                _admin_row(sid, f"state{c}_{s}", "state_district", cid,
                           octagon(sx, sy, 1.0), 4, weight=0.5)
            )
            for t in range(4):
                tx = sx + 1.0 + (t % 2) * 4.0
                ty = sy + 1.0 + (t // 2) * 4.0
                tid = f"admin:osm:city:{c}:{s}:{t}"
                zipc += 1
                rows.append(
                    _admin_row(
                        tid, f"city{c}_{s}_{t}", "city", sid, octagon(tx, ty, 0.4), 8,
                        insee=f"{zipc}", zips=(str(zipc),), weight=0.2 + 0.01 * t,
                    )
                )
    # semantic stress cases, far away from the grid (reference vectors):
    # two overlapping same-zone-type cities (offset 40 / 43)
    rows.append(_admin_row("admin:osm:overlap:a", "overlapA", "city", None, octagon(40.0, 40.0, 1.0), 8))
    rows.append(_admin_row("admin:osm:overlap:b", "overlapB", "city", None, octagon(43.0, 43.0, 1.0), 8))
    # two overlapping untyped admins
    rows.append(_admin_row("admin:osm:untyped:a", "untypedA", None, None, octagon(40.0, -60.0, 1.0), 8))
    rows.append(_admin_row("admin:osm:untyped:b", "untypedB", None, None, octagon(43.0, -57.0, 1.0), 8))
    # orphan second state over country 0's first state area
    rows.append(
        _admin_row("admin:osm:orphanstate:0", "orphanState", "state_district",
                   "admin:osm:country:0", octagon(-157.0, -17.0, 1.0), 4)
    )
    # untyped zone overlapping a city of country 0
    rows.append(
        _admin_row("admin:osm:freezone:0", "freeZone", None, None, octagon(-156.0, -16.0, 1.0), 0)
    )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# point clouds (uniform + Zipf urban cores → H3 skew)
# ---------------------------------------------------------------------------


def _point_cloud(n: int, rng: np.random.Generator, admins: pd.DataFrame):
    """60% clustered around city centroids (Zipf-weighted → hot cells),
    40% uniform over the admin band (some landing outside all polygons)."""
    cities = admins[admins.zone_type == "city"].reset_index(drop=True)
    n_clustered = int(n * 0.6)
    n_uniform = n - n_clustered
    # Zipf weights over cities: city k gets weight 1/(k+1)
    w = 1.0 / np.arange(1, len(cities) + 1)
    w /= w.sum()
    idx = rng.choice(len(cities), size=n_clustered, p=w)
    cx = np.array([c["lon"] for c in cities.coord])[idx]
    cy = np.array([c["lat"] for c in cities.coord])[idx]
    lon_c = cx + rng.normal(0.0, 0.5, n_clustered)
    lat_c = cy + rng.normal(0.0, 0.5, n_clustered)
    lon_u = rng.uniform(-170.0, 60.0, n_uniform)
    lat_u = rng.uniform(-65.0, 45.0, n_uniform)
    lon = np.clip(np.concatenate([lon_c, lon_u]), -179.999, 179.999)
    lat = np.clip(np.concatenate([lat_c, lat_u]), -89.999, 89.999)
    perm = rng.permutation(n)
    return lon[perm], lat[perm]


_WORDS = (
    "rue place boulevard avenue chemin route allee impasse quai pont "
    "saint grand petit haut bas vieux neuf nord sud est ouest "
    "hector malot allegre chastang pasteur hugo zola curie"
).split()


def gen_docs(n_docs: int, seed: int = DEFAULT_SEED, admins: pd.DataFrame | None = None) -> pd.DataFrame:
    """Interleaved corpus: doc_id + ordered spans (text | geo | media)."""
    rng = np.random.default_rng(seed)
    if admins is None:
        admins = gen_admins()
    n_spans = rng.integers(1, 9, n_docs)
    total = int(n_spans.sum())
    kinds_pool = rng.random(total)
    lon, lat = _point_cloud(total, rng, admins)
    word_idx = rng.integers(0, len(_WORDS), (total, 3))

    docs = []
    pos = 0
    for d in range(n_docs):
        spans = []
        for o in range(int(n_spans[d])):
            r = kinds_pool[pos]
            if r < 0.45:
                spans.append({"kind": "text", "text": " ".join(_WORDS[w] for w in word_idx[pos]), "media_ref": "", "offset": o})
            elif r < 0.85:
                spans.append({"kind": "geo", "text": f"{lon[pos]:.6f};{lat[pos]:.6f}", "media_ref": "", "offset": o})
            else:
                h = hashlib.sha1(f"{seed}:{d}:{o}".encode()).hexdigest()[:12]
                spans.append({"kind": "media", "text": "", "media_ref": f"media:{h}", "offset": o})
            pos += 1
        docs.append({"doc_id": f"doc:{d:012d}", "spans": spans})
    return pd.DataFrame(docs)


def gen_addresses(n: int, seed: int = DEFAULT_SEED, admins: pd.DataFrame | None = None) -> pd.DataFrame:
    """BANO-shaped rows (src/bano.rs:44-53): id carries insee+fantoir."""
    rng = np.random.default_rng(seed + 1)
    if admins is None:
        admins = gen_admins()
    lon, lat = _point_cloud(n, rng, admins)
    hn = rng.integers(1, 200, n)
    suffix = rng.choice(["", "", "", "Bis", "B", "T"], n)
    streets = [
        f"{_WORDS[a].capitalize()} {_WORDS[b].capitalize()}"
        for a, b in rng.integers(0, len(_WORDS), (n, 2))
    ]
    rows = {
        "id": [f"{75100 + i % 900:05d}{i:04d}_{i % 97:02d}" for i in range(n)],
        "house_number": [f"{h}{s}" for h, s in zip(hn, suffix)],
        "street": streets,
        "zip": [f"{75000 + i % 1000:05d}" for i in range(n)],
        "city": [f"city{i % 64}" for i in range(n)],
        "src": ["OSM"] * n,
        "lat": lat,
        "lon": lon,
    }
    return pd.DataFrame(rows)


def gen_streets(n: int, seed: int = DEFAULT_SEED, admins: pd.DataFrame | None = None) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 2)
    if admins is None:
        admins = gen_admins()
    lon, lat = _point_cloud(n, rng, admins)
    n_nodes = rng.integers(2, 8, n)
    rows = []
    for i in range(n):
        k = int(n_nodes[i])
        dx = rng.normal(0, 0.002, k).cumsum()
        dy = rng.normal(0, 0.002, k).cumsum()
        pts = [{"lon": float(lon[i] + dx[j]), "lat": float(lat[i] + dy[j])} for j in range(k)]
        name_i = f"{_WORDS[i % len(_WORDS)].capitalize()} {_WORDS[(i * 7) % len(_WORDS)].capitalize()}"
        highway = "residential" if i % 17 else "bus_stop"  # excluded kind mixed in (F1)
        rows.append(
            {
                "osm_id": int(1000 + i),
                "kind": "way" if i % 11 else "relation",
                "name": name_i if i % 23 else None,  # some nameless (dropped by F1)
                "highway": highway,
                "public_transport": None if i % 13 else "platform",
                "node_points": pts,
            }
        )
    return pd.DataFrame(rows)


_POI_TAGS = [
    {"amenity": "college"},
    {"amenity": "university"},
    {"amenity": "theatre"},
    {"amenity": "hospital"},
    {"amenity": "post_office"},
    {"amenity": "bicycle_rental"},
    {"amenity": "parking"},
    {"amenity": "police"},
    {"amenity": "townhall"},
    {"leisure": "garden"},
    {"leisure": "park"},
    {"shop": "bakery"},  # unclassified → no poi_type
]


def gen_pois(n: int, seed: int = DEFAULT_SEED, admins: pd.DataFrame | None = None) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 3)
    if admins is None:
        admins = gen_admins()
    lon, lat = _point_cloud(n, rng, admins)
    rows = []
    for i in range(n):
        tags = dict(_POI_TAGS[i % len(_POI_TAGS)])
        if i % 5:
            tags["name"] = f"poi {_WORDS[i % len(_WORDS)]} {i}"
        if i % 29 == 0:
            tags["addr:postcode"] = f"{80000 + i % 100:05d}"
        rows.append(
            {
                "osm_id": int(5000 + i),
                "kind": ("node", "way", "relation")[i % 3],
                "tags": tags,
                "lon": float(lon[i]),
                "lat": float(lat[i]),
            }
        )
    return pd.DataFrame(rows)


def gen_stops(n: int, seed: int = DEFAULT_SEED, admins: pd.DataFrame | None = None) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 4)
    if admins is None:
        admins = gen_admins()
    lon, lat = _point_cloud(n, rng, admins)
    modes = ["Bus", "Metro", "Tramway", "RapidTransit", "LocalTrain"]
    rows = []
    for i in range(n):
        n_sp = int(rng.integers(1, 9))
        rows.append(
            {
                "stop_area_id": f"stop_area:SA:{i:06d}",
                "name": f"stop {_WORDS[i % len(_WORDS)]} {i}",
                "lon": float(lon[i]),
                "lat": float(lat[i]),
                "stop_point_ids": [f"stop_point:SP:{i:06d}:{j}" for j in range(n_sp)],
                "physical_modes": [modes[(i + j) % len(modes)] for j in range(1 + i % 3)],
            }
        )
    return pd.DataFrame(rows)


def gen_docs_spark(spark, n_docs: int, admins: pd.DataFrame | None = None, seed: int = DEFAULT_SEED):
    """Distributed interleaved-corpus generator (pure JVM expressions) —
    how you'd synthesize a 10^12-doc bench corpus on a real cluster.

    Deterministic given (n_docs, seed): all randomness derives from
    xxhash64 of (doc_id, span index, salt). Span mix ≈ 45% text /
    40% geo / 15% media; geo points are 60% Zipf-clustered around city
    centroids (hot cells) + 40% uniform, mirroring gen_docs."""
    from pyspark.sql import functions as F

    if admins is None:
        admins = gen_admins()
    cities = admins[admins.zone_type == "city"].reset_index(drop=True)
    centroids = [(i, float(c["lon"]), float(c["lat"])) for i, c in enumerate(cities.coord)]
    cities_df = F.broadcast(
        spark.createDataFrame(centroids, "city_idx int, clon double, clat double")
    )
    n_cities = len(centroids)

    def h(i, salt):
        # uniform double in [0,1) from a 64-bit hash — deterministic
        return (
            F.pmod(F.xxhash64(F.col("id"), i, F.lit(salt)), F.lit(1 << 30))
            / float(1 << 30)
        )

    base = spark.range(n_docs).withColumn("n_spans", (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(8)) + 1))
    span = (
        base.select("id", F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("o"))
        .withColumn("r", h(F.col("o"), seed + 1))
        .withColumn("rc", h(F.col("o"), seed + 2))
        .withColumn(
            "city_idx",
            F.floor(F.pow(h(F.col("o"), seed + 3), 3.0) * n_cities).cast("int"),
        )
        .join(cities_df, "city_idx")
        .withColumn("ulon", h(F.col("o"), seed + 4) * 360.0 - 180.0)
        .withColumn("ulat", h(F.col("o"), seed + 5) * 180.0 - 90.0)
        .withColumn("glon", F.col("clon") + (h(F.col("o"), seed + 6) - 0.5))
        .withColumn("glat", F.col("clat") + (h(F.col("o"), seed + 7) - 0.5))
        .withColumn("lon", F.when(F.col("rc") < 0.6, F.col("glon")).otherwise(F.col("ulon")))
        .withColumn("lat", F.when(F.col("rc") < 0.6, F.col("glat")).otherwise(F.col("ulat")))
        .withColumn(
            "span",
            F.when(
                F.col("r") < 0.45,
                F.struct(
                    F.lit("text").alias("kind"),
                    F.concat(F.lit("txt "), F.conv(F.abs(F.xxhash64("id", "o")).cast("string"), 10, 16)).alias("text"),
                    F.lit("").alias("media_ref"),
                    F.col("o").cast("int").alias("offset"),
                ),
            )
            .when(
                F.col("r") < 0.85,
                F.struct(
                    F.lit("geo").alias("kind"),
                    F.format_string(
                        "%.6f;%.6f",
                        F.greatest(F.least(F.col("lon"), F.lit(179.999)), F.lit(-179.999)),
                        F.greatest(F.least(F.col("lat"), F.lit(89.999)), F.lit(-89.999)),
                    ).alias("text"),
                    F.lit("").alias("media_ref"),
                    F.col("o").cast("int").alias("offset"),
                ),
            )
            .otherwise(
                F.struct(
                    F.lit("media").alias("kind"),
                    F.lit("").alias("text"),
                    F.concat(F.lit("media:"), F.conv(F.abs(F.xxhash64("id", "o", F.lit(9))).cast("string"), 10, 16)).alias("media_ref"),
                    F.col("o").cast("int").alias("offset"),
                )
            ),
        )
    )
    return (
        span.groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct(F.col("o"), F.col("span")))).alias("ordered"))
        .select(
            F.format_string("doc:%012d", F.col("id")).alias("doc_id"),
            F.transform("ordered", lambda s: s["span"]).alias("spans"),
        )
    )


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def write_fixtures(out_dir: str, n_docs: int = 2000, n_addresses: int = 2000,
                   n_streets: int = 300, n_pois: int = 300, n_stops: int = 200,
                   seed: int = DEFAULT_SEED, spark=None) -> dict:
    """Generate + write all fixture tables as parquet under out_dir.

    Uses Spark for writing when a session is passed (so schemas match
    schemas.py exactly); falls back to pandas/pyarrow otherwise.
    """
    from . import schemas

    os.makedirs(out_dir, exist_ok=True)
    admins = gen_admins()
    tables = {
        "admins": (admins, schemas.ADMINS),
        "docs": (gen_docs(n_docs, seed, admins), schemas.DOCS),
        "addresses": (gen_addresses(n_addresses, seed, admins), schemas.ADDRESSES_RAW),
        "streets": (gen_streets(n_streets, seed, admins), schemas.STREETS_RAW),
        "pois": (gen_pois(n_pois, seed, admins), schemas.POIS_RAW),
        "stops": (gen_stops(n_stops, seed, admins), schemas.STOPS_RAW),
    }
    paths = {}
    for name, (pdf, schema) in tables.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        if spark is not None:
            sdf = spark.createDataFrame(
                [tuple(rec) for rec in pdf.itertuples(index=False, name=None)], schema=schema
            )
            sdf.coalesce(4).write.mode("overwrite").parquet(path)
        else:
            pdf.to_parquet(path, index=False)
        paths[name] = path
    return paths
