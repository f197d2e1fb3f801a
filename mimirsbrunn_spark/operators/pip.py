"""Point-in-polygon admin attachment — the engine's core spatial join.

Re-expresses the reference's filter-refine join
(/root/reference/src/admin_geofinder.rs: envelope pre-filter :52-70,
exact refine :101-104, dedup+memo semantics :220-269) as Spark plans:

**broadcast strategy** (default; polygon side fits the broadcast budget,
as in the reference where the whole admin set lives in one process):
the admin dimension — id, zone_type, parent_id, WKB boundary — is
broadcast once per executor via a SparkContext broadcast variable; points
flow through ``mapInPandas`` where a lazily-built per-executor
AdminGeoFinder (multi-res cell index) answers batches. No shuffle at all:
the join is map-side, scaling linearly with point count. Geometry tests
are vectorized per (admin × batch-subset); only the final dedup loop is
per-point Python over a handful of pre-tested candidates.

**partitioned strategy** (polygon side too big to broadcast): both sides
shuffle on covering-cell id and meet in a cogrouped ``applyInPandas``
refine — the classic distributed spatial join. Geometry stays inside the
cogroup; only the tiny admin *skeleton* (id, zone_type, parent_id — no
boundary) is broadcast for the hierarchy-memo replay, which is exact
because memoization in the reference only short-circuits boundary tests,
never changes observable results.

Output: input point columns + ``admin_ids array<string>`` in the
reference's result order (zone_type rank, id tie-break).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geofinder import AdminGeoFinder, AdminRec, zone_rank
from ..geometry import points_in_multipolygon, wkb_to_mp
from ..tiles import grid_cell_np

ADMIN_DIM_COLS = ["id", "zone_type", "parent_id", "boundary_wkb"]


# ---------------------------------------------------------------------------
# shared refine kernel (vectorized geometry + exact G5 replay)
# ---------------------------------------------------------------------------


def _candidate_map(finder: AdminGeoFinder, lon: np.ndarray, lat: np.ndarray):
    """For a batch: admin_id → np.array of point indices that are bbox
    candidates (cell hit + envelope containment, the G2 filter phase)."""
    cand: dict[str, list[int]] = {}
    for res, idx in finder.cell_index.items():
        cells = grid_cell_np(lon, lat, res)
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        starts = np.searchsorted(sorted_cells, np.unique(sorted_cells), side="left")
        uniq = sorted_cells[starts]
        bounds = np.append(starts, len(sorted_cells))
        for u, s, e in zip(uniq, bounds[:-1], bounds[1:]):
            admins = idx.get(int(u))
            if not admins:
                continue
            pts = order[s:e]
            for aid in admins:
                cand.setdefault(aid, []).append(pts)
    out: dict[str, np.ndarray] = {}
    for aid, chunks in cand.items():
        pts = np.unique(np.concatenate(chunks))
        rec = finder.by_id[aid]
        bb = rec.bbox
        m = (lon[pts] >= bb[0]) & (lon[pts] <= bb[2]) & (lat[pts] >= bb[1]) & (lat[pts] <= bb[3])
        pts = pts[m]
        if len(pts):
            out[aid] = pts
    return out


def refine_batch(finder: AdminGeoFinder, lon: np.ndarray, lat: np.ndarray) -> list[list[str]]:
    """Vectorized filter-refine + exact replay of AdminGeoFinder::get
    (admin_geofinder.rs:220-269) for every point of a batch.

    Returns per-point ordered admin-id lists."""
    n = len(lon)
    cand_by_admin = _candidate_map(finder, lon, lat)

    # vectorized exact PIP per admin over its candidate subset
    contains_by_admin: dict[str, np.ndarray] = {}
    for aid, pts in cand_by_admin.items():
        mp = finder.by_id[aid].mp
        mask = points_in_multipolygon(lon[pts], lat[pts], mp)
        contains_by_admin[aid] = pts[mask]

    by_id = finder.by_id

    # Build per-point candidate lists already in pinned (zone_rank, id)
    # order by iterating admins in that global order — no per-point sort.
    # Each entry carries its precomputed contains flag.
    admin_order = sorted(cand_by_admin, key=lambda a: (zone_rank(by_id[a].zone_type), a))
    cands_per_point: list[list[tuple[str, bool]]] = [[] for _ in range(n)]
    for aid in admin_order:
        cset = set(contains_by_admin[aid].tolist())
        for p in cand_by_admin[aid]:
            cands_per_point[p].append((aid, p in cset))

    # Points sharing (candidates, contains-flags) get identical results —
    # memoize the dedup loop by that signature (clustered corpora hit the
    # memo for the vast majority of points).
    memo: dict[tuple, list[str]] = {}
    results: list[list[str]] = []
    for p in range(n):
        key = tuple(cands_per_point[p])
        res = memo.get(key)
        if res is None:
            tested_hierarchy: set[str] = set()
            added_zone_types: set[str] = set()
            res = []
            for aid, contained in key:
                rec = by_id[aid]
                if aid in tested_hierarchy:
                    res.append(aid)
                elif rec.zone_type is not None and rec.zone_type in added_zone_types:
                    pass
                elif contained:
                    if rec.zone_type is not None:
                        added_zone_types.add(rec.zone_type)
                    parent_id = rec.parent_id
                    while parent_id is not None:
                        parent = by_id.get(parent_id)
                        if parent is not None and parent.zone_type is not None:
                            added_zone_types.add(parent.zone_type)
                        if parent_id in tested_hierarchy:
                            break
                        tested_hierarchy.add(parent_id)
                        parent_id = parent.parent_id if parent is not None else None
                    res.append(aid)
            memo[key] = res
        results.append(res)
    return results


# ---------------------------------------------------------------------------
# broadcast strategy
# ---------------------------------------------------------------------------

_FINDER_CACHE: dict[int, AdminGeoFinder] = {}


def _finder_from_rows(rows: list[tuple]) -> AdminGeoFinder:
    finder = AdminGeoFinder()
    for id_, zt, pid, wkb in rows:
        finder.insert(
            AdminRec(id=id_, zone_type=zt, parent_id=pid, mp=wkb_to_mp(bytes(wkb)) if wkb else [])
        )
    return finder


def attach_admins_broadcast(
    points: DataFrame, admins: DataFrame, lon_col: str = "lon", lat_col: str = "lat"
) -> DataFrame:
    """Map-side spatial join: broadcast admin dim, mapInPandas refine."""
    spark = SparkSession.getActiveSession()
    rows = [
        (r["id"], r["zone_type"], r["parent_id"],
         bytes(r["boundary_wkb"]) if r["boundary_wkb"] is not None else None)
        for r in admins.select(*ADMIN_DIM_COLS).collect()
    ]
    bc = spark.sparkContext.broadcast(rows)
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(points.schema.fields)
        + [T.StructField("admin_ids", T.ArrayType(T.StringType()), True)]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        key = id(bc.value) if bc.value is not None else 0
        finder = _FINDER_CACHE.get(key)
        if finder is None:
            finder = _finder_from_rows(bc.value)
            _FINDER_CACHE[key] = finder
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lon = pdf[lon_col].to_numpy(dtype=np.float64)
            lat = pdf[lat_col].to_numpy(dtype=np.float64)
            pdf = pdf.copy()
            pdf["admin_ids"] = refine_batch(finder, lon, lat)
            yield pdf

    return points.mapInPandas(gen, schema=out_schema)


# ---------------------------------------------------------------------------
# partitioned strategy (no broadcast of geometry)
# ---------------------------------------------------------------------------


def admin_cell_cover(admins: DataFrame, spark: SparkSession | None = None) -> DataFrame:
    """Explode each admin into its covering cells (multi-res, bounded
    per-admin cell budget — geofinder cover policy). Distributed: runs as
    mapInPandas over the admin table itself."""
    from ..geofinder import _bbox_cells
    from ..geometry import mp_bbox

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tmp = AdminGeoFinder()
        for pdf in batches:
            out = {"cell": [], "id": [], "boundary_wkb": []}
            for _, r in pdf.iterrows():
                wkb = r["boundary_wkb"]
                if wkb is None:
                    continue
                mp = wkb_to_mp(bytes(wkb))
                bbox = mp_bbox(mp)
                res = tmp._pick_res(bbox)
                for c in _bbox_cells(bbox, res):
                    out["cell"].append(c)
                    out["id"].append(r["id"])
                    out["boundary_wkb"].append(bytes(wkb))
            if out["cell"]:
                yield pd.DataFrame(out)

    return admins.select(*ADMIN_DIM_COLS).mapInPandas(
        gen, schema="cell long, id string, boundary_wkb binary"
    )


def attach_admins_partitioned(
    points: DataFrame,
    admins: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    point_id_col: str = "point_uid",
) -> DataFrame:
    """Shuffle-on-cell spatial join for polygon sets beyond broadcast budget.

    Phase 1 (cogrouped by cell): exact PIP + bbox candidacy per point.
    Phase 2 (map-side): replay of the G5 dedup/memo loop using the
    broadcast admin *skeleton* (no geometry). Identical results to the
    broadcast path — covered by tests.
    """
    spark = SparkSession.getActiveSession()
    cover = admin_cell_cover(admins)

    # Points keyed by their cell at every resolution the cover actually
    # uses (usually 1-2 of the 4 candidates — avoids 4x point duplication).
    res_levels = [
        int(r["res"])
        for r in cover.select((F.col("cell") / F.lit(2**58)).cast("long").alias("res")).distinct().collect()
    ] or list(AdminGeoFinder.RES_CANDIDATES)
    pts = points.select(
        point_id_col, lon_col, lat_col,
        F.explode(
            F.array(*[
                (F.lit(int(r)) * F.lit(2**58)
                 + F.least(F.greatest(F.floor((F.col(lon_col) + 180.0) / 360.0 * float(1 << (r + 6))), F.lit(0)), F.lit((1 << (r + 6)) - 1)) * F.lit(2**29)
                 + F.least(F.greatest(F.floor((F.col(lat_col) + 90.0) / 180.0 * float(1 << (r + 6))), F.lit(0)), F.lit((1 << (r + 6)) - 1)))
                for r in res_levels
            ])
        ).alias("cell"),
    )

    # skeleton for phase 2 (tiny: no geometry)
    skeleton = {
        r["id"]: (r["zone_type"], r["parent_id"], r["boundary_wkb"] is not None)
        for r in admins.select("id", "zone_type", "parent_id", "boundary_wkb").collect()
    }
    bc_skel = spark.sparkContext.broadcast(skeleton)

    # Co-partition both sides on cell via a tagged union + hash
    # repartition, then refine whole PARTITIONS in one Python call each
    # (a per-cell cogroup would pay per-group Python overhead × millions
    # of cells at scale; per-partition it's × shuffle.partitions).
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    tagged_pts = pts.select(
        "cell",
        F.lit("p").alias("side"),
        F.col(point_id_col).alias("point_uid"),
        F.col(lon_col).alias("lon"),
        F.col(lat_col).alias("lat"),
        F.lit(None).cast("string").alias("admin_id"),
        F.lit(None).cast("binary").alias("wkb"),
    )
    tagged_cov = cover.select(
        "cell",
        F.lit("a").alias("side"),
        F.lit(None).cast("string").alias("point_uid"),
        F.lit(None).cast("double").alias("lon"),
        F.lit(None).cast("double").alias("lat"),
        F.col("id").alias("admin_id"),
        F.col("boundary_wkb").alias("wkb"),
    )
    both = tagged_pts.unionByName(tagged_cov).repartition(n_parts, "cell")

    def partition_refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..geometry import mp_bbox as _bb

        # a partition holds complete cells (hash-partitioned on cell);
        # accumulate it, then refine per cell group vectorized.
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        adm = pdf[pdf["side"] == "a"]
        pts_l = pdf[pdf["side"] == "p"]
        if adm.empty or pts_l.empty:
            return
        geom_cache: dict[str, tuple] = {}
        # cell -> admin rows; iterate point cells present
        adm_by_cell: dict[int, list[str]] = {}
        for cell, aid, wkb in zip(adm["cell"], adm["admin_id"], adm["wkb"]):
            adm_by_cell.setdefault(int(cell), []).append(aid)
            if aid not in geom_cache:
                mp = wkb_to_mp(bytes(wkb))
                geom_cache[aid] = (mp, _bb(mp))
        lon = pts_l["lon"].to_numpy(dtype=np.float64)
        lat = pts_l["lat"].to_numpy(dtype=np.float64)
        uids = pts_l["point_uid"].to_numpy()
        cells = pts_l["cell"].to_numpy()
        # group point indices per (cell, admin) via cell dict
        pair_pts: dict[str, list[int]] = {}
        for i, c in enumerate(cells):
            for aid in adm_by_cell.get(int(c), ()):
                pair_pts.setdefault(aid, []).append(i)
        out_uid, out_adm, out_contains = [], [], []
        for aid, idxs in pair_pts.items():
            mp, bb = geom_cache[aid]
            sub = np.asarray(idxs)
            m = (lon[sub] >= bb[0]) & (lon[sub] <= bb[2]) & (lat[sub] >= bb[1]) & (lat[sub] <= bb[3])
            sub = sub[m]
            if not len(sub):
                continue
            inside = points_in_multipolygon(lon[sub], lat[sub], geom_cache[aid][0])
            out_uid.extend(uids[sub])
            out_adm.extend([aid] * len(sub))
            out_contains.extend(bool(x) for x in inside)
        if out_uid:
            yield pd.DataFrame(
                {"point_uid": out_uid, "admin_id": out_adm, "contains": out_contains}
            )

    pairs = both.mapInPandas(
        partition_refine, schema="point_uid string, admin_id string, contains boolean"
    ).dropDuplicates(["point_uid", "admin_id"])  # multi-res cover may duplicate pairs

    gathered = pairs.groupBy("point_uid").agg(
        F.collect_list(F.struct("admin_id", "contains")).alias("cands")
    )

    def replay(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        skel = bc_skel.value
        for pdf in batches:
            out = []
            for cands in pdf["cands"]:
                info = sorted(
                    (c["admin_id"] for c in cands),
                    key=lambda a: (zone_rank(skel[a][0]), a),
                )
                contains = {c["admin_id"]: c["contains"] for c in cands}
                tested: set[str] = set()
                added: set[str] = set()
                res: list[str] = []
                for aid in info:
                    zt, pid, _ = skel[aid]
                    if aid in tested:
                        res.append(aid)
                    elif zt is not None and zt in added:
                        pass
                    elif contains.get(aid, False):
                        if zt is not None:
                            added.add(zt)
                        parent_id = pid
                        while parent_id is not None:
                            pz = skel.get(parent_id)
                            if pz is not None and pz[0] is not None:
                                added.add(pz[0])
                            if parent_id in tested:
                                break
                            tested.add(parent_id)
                            parent_id = pz[1] if pz is not None else None
                        res.append(aid)
                out.append(res)
            yield pd.DataFrame({"point_uid": pdf["point_uid"], "admin_ids": out})

    attached = gathered.mapInPandas(replay, schema="point_uid string, admin_ids array<string>")
    return points.join(attached, point_id_col, "left").withColumn(
        "admin_ids", F.coalesce("admin_ids", F.array().cast("array<string>"))
    )


def attach_admins(
    points: DataFrame,
    admins: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    strategy: str = "broadcast",
    point_id_col: str = "point_uid",
) -> DataFrame:
    if strategy == "broadcast":
        return attach_admins_broadcast(points, admins, lon_col, lat_col)
    if strategy == "partitioned":
        return attach_admins_partitioned(points, admins, lon_col, lat_col, point_id_col)
    raise ValueError(f"unknown strategy {strategy!r}")
