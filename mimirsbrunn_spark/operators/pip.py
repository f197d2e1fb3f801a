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
per-point Python over a handful of pre-tested candidates. For dims too
big to pickle through the driver, ``dim_path`` stages the dim as parquet
once and executors build the finder from the file (stage_admin_dim).

**partitioned strategy** (polygon side too big to broadcast): a
three-stage shuffle plan — (1) points equi-join a slim
(cell, admin-idx, bbox) cover with the envelope check inside the
Catalyst join; (2) exact refine, either the (admin, salt) cogroup with
the vectorized numpy ray cast (default — WKB crosses the wire exactly
``n_salts`` times, a giant polygon's candidates spread across reducers)
or a pure-Catalyst higher-order-function predicate over closed-edge
arrays (``refine="jvm"``); (3) int-encoded flags gather per point
(map-side partial collect_list), the dedup/memo loop replays against
the broadcast admin *skeleton* (id, zone_type, parent_id — no
boundary; exact because memoization in the reference only
short-circuits boundary tests), and the narrow result joins back to
the points. Carry-the-payload-through-the-gather variants were
measured slower in r3 (see BENCH/BASELINE.md).

Output: input point columns + ``admin_ids array<string>`` in the
reference's result order (zone_type rank, id tie-break).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geofinder import AdminGeoFinder, AdminRec, zone_rank
from ..geometry import points_in_multipolygon, wkb_to_mp
from ..tiles import grid_cell_np

ADMIN_DIM_COLS = ["id", "zone_type", "parent_id", "boundary_wkb"]

# simplify_tolerance="auto" policy (VERDICT r04 #1): only polygons at
# least this dense are simplified, with tolerance = EDGE_FACTOR × mean
# edge length (the r4 8.45× A/B used tol ≈ 5× the densified rings' mean
# edge). Exactness does not depend on these — the band recheck restores
# it for ANY tolerance; they only trade classify cost vs band size.
AUTO_SIMPLIFY_MIN_VERTICES = 512
AUTO_SIMPLIFY_EDGE_FACTOR = 5.0


def _auto_simplify_tolerance(mp) -> float | None:
    """Perimeter-derived DP tolerance for one multipolygon, or None when
    the geometry is too slim to benefit (rectangles, octagons, any
    hand-drawn admin): ~EDGE_FACTOR × mean edge length prunes micro-
    detail (coastline zigzag) while keeping the exact-recheck band a few
    edge-lengths wide."""
    n_vertices = 0
    perimeter = 0.0
    for poly in mp:
        for ring in poly:
            r = np.asarray(ring, dtype=np.float64)
            n_vertices += len(r)
            d = np.diff(r, axis=0)
            perimeter += float(np.hypot(d[:, 0], d[:, 1]).sum())
    if n_vertices < AUTO_SIMPLIFY_MIN_VERTICES or perimeter <= 0.0:
        return None
    return AUTO_SIMPLIFY_EDGE_FACTOR * perimeter / n_vertices


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

    # vectorized exact PIP per admin over its candidate subset — keep
    # the per-candidate boolean mask (the replay consumes it directly)
    contains_mask: dict[str, np.ndarray] = {}
    for aid, pts in cand_by_admin.items():
        mp = finder.by_id[aid].mp
        contains_mask[aid] = points_in_multipolygon(lon[pts], lat[pts], mp)

    by_id = finder.by_id

    # Candidate iteration order is pinned (zone_rank, id). r6: instead
    # of building one Python list of (aid, contained) per point, encode
    # each point's candidate sequence as a row of a small int32 matrix
    # (code = admin_order_index*2 + contained, -1 padding) filled with
    # vectorized scatter — then np.unique(axis=0) groups points with
    # IDENTICAL candidate sequences exactly (no hashing), and the
    # dedup/memo replay below runs once per distinct signature instead
    # of once per point. Same replay, same order, same results; the
    # per-point Python is now one list indexing pass.
    admin_order = sorted(cand_by_admin, key=lambda a: (zone_rank(by_id[a].zone_type), a))
    counts = np.zeros(n, dtype=np.int32)
    for aid in admin_order:
        counts[cand_by_admin[aid]] += 1
    maxc = int(counts.max()) if n else 0
    if maxc == 0:
        return [[] for _ in range(n)]
    M = np.full((n, maxc), -1, dtype=np.int32)
    ptr = np.zeros(n, dtype=np.int32)
    for ai, aid in enumerate(admin_order):
        pts = cand_by_admin[aid]
        M[pts, ptr[pts]] = ai * 2 + contains_mask[aid]
        ptr[pts] += 1
    uniq, inverse = np.unique(M, axis=0, return_inverse=True)

    group_results: list[list[str]] = []
    for row in uniq:
        tested_hierarchy: set[str] = set()
        added_zone_types: set[str] = set()
        res: list[str] = []
        for code in row:
            if code < 0:
                break
            aid = admin_order[code >> 1]
            contained = bool(code & 1)
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
        group_results.append(res)
    inv = inverse.ravel()
    return [group_results[g] for g in inv]


# ---------------------------------------------------------------------------
# broadcast strategy
# ---------------------------------------------------------------------------

# keyed by a content digest of the admin dim, NOT id(bc.value): object ids
# are recycled by the allocator in long-lived Python workers, which could
# silently serve a stale finder built from a *different* admin broadcast.
_FINDER_CACHE: dict[str, AdminGeoFinder] = {}
_FINDER_CACHE_MAX = 4


def _finder_from_rows(rows: list[tuple]) -> AdminGeoFinder:
    finder = AdminGeoFinder()
    for id_, zt, pid, wkb in rows:
        finder.insert(
            AdminRec(id=id_, zone_type=zt, parent_id=pid, mp=wkb_to_mp(bytes(wkb)) if wkb else [])
        )
    return finder


def _dim_rows(admins: DataFrame) -> list[tuple]:
    return [
        (r["id"], r["zone_type"], r["parent_id"],
         bytes(r["boundary_wkb"]) if r["boundary_wkb"] is not None else None)
        for r in admins.select(*ADMIN_DIM_COLS).collect()
    ]


def _dim_token(rows: list[tuple]) -> str:
    """Stable driver-side digest of the admin dimension's content — the
    FULL WKB, not a prefix: a boundary edit past the first vertices with
    an unchanged vertex count must change the token, or a long-lived
    worker's _FINDER_CACHE would serve the stale finder (blake2b streams
    at GB/s, so the full hash is noise next to the collect that built
    ``rows``)."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for id_, zt, pid, wkb in rows:
        for part in (id_, zt, pid):
            h.update(repr(part).encode())
            h.update(b"\x00")
        h.update(len(wkb or b"").to_bytes(8, "little"))
        if wkb:
            h.update(wkb)
    return h.hexdigest()


def broadcast_admin_dim(spark: SparkSession, admins: DataFrame):
    """Broadcast the admin dim as (content_token, rows)."""
    rows = _dim_rows(admins)
    return spark.sparkContext.broadcast((_dim_token(rows), rows))


def stage_admin_dim(spark: SparkSession, admins: DataFrame, dim_path: str) -> str:
    """File-distributed alternative to driver pickle (VERDICT r02 #8):
    persist the admin dim as parquet on worker-visible storage ONCE and
    let each executor build its finder from the file — the driver never
    collects a WKB byte, so a world-scale (multi-GB) dim no longer rides
    the pickle/broadcast channel. The content token is computed
    distributed (order-insensitive xxhash sum) and doubles as the write
    marker, so re-staging an unchanged dim is a no-op. Returns the token."""
    from ..sources.readers import _fs_exists

    tok_row = admins.select(
        F.sum(F.xxhash64("id", "zone_type", "parent_id", "boundary_wkb").cast("decimal(38,0)")).alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]
    token = f"{int(tok_row['h'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}_{tok_row['n']}"
    marker = f"{dim_path}/_TOKEN_{token}"
    if not _fs_exists(spark, marker):
        admins.select(*ADMIN_DIM_COLS).write.mode("overwrite").parquet(dim_path)
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(marker)
        p.getFileSystem(spark._jsc.hadoopConfiguration()).createNewFile(p)
    return token


def _finder_from_parquet(path: str) -> AdminGeoFinder:
    """Executor-side staged-dim read. pyarrow cannot open hdfs://|s3a://
    URI strings directly (ADVICE r03 #2), so URI-schemed paths resolve
    through pyarrow.fs.FileSystem.from_uri (s3a/s3n — Hadoop's aliases —
    map to pyarrow's s3); bare paths stay on the fast local route."""
    import pyarrow.parquet as pq

    filesystem, inner = None, path
    if "://" in path:
        from pyarrow import fs as pafs

        scheme, rest = path.split("://", 1)
        uri = f"s3://{rest}" if scheme in ("s3a", "s3n") else path
        filesystem, inner = pafs.FileSystem.from_uri(uri)
    t = pq.read_table(inner, columns=ADMIN_DIM_COLS, filesystem=filesystem)
    cols = [t.column(c).to_pylist() for c in ADMIN_DIM_COLS]
    return _finder_from_rows(list(zip(*cols)))


def finder_for_broadcast(bc_value: tuple) -> AdminGeoFinder:
    """Per-worker finder cache lookup by content token (bounded).
    ``bc_value`` is (token, rows) — inline dim — or (token, None, path):
    build from the staged parquet instead."""
    token, rows = bc_value[0], bc_value[1]
    finder = _FINDER_CACHE.get(token)
    if finder is None:
        finder = _finder_from_rows(rows) if rows is not None else _finder_from_parquet(bc_value[2])
        if len(_FINDER_CACHE) >= _FINDER_CACHE_MAX:
            _FINDER_CACHE.pop(next(iter(_FINDER_CACHE)))
        _FINDER_CACHE[token] = finder
    return finder


def attach_admins_broadcast(
    points: DataFrame,
    admins: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    dim_path: str | None = None,
) -> DataFrame:
    """Map-side spatial join: broadcast admin dim, mapInPandas refine.
    With ``dim_path``, only (token, path) is broadcast and executors read
    the staged dim parquet directly (see stage_admin_dim) — the driver
    pickle ceiling on dim size is gone; the path must be worker-visible
    (shared storage on a real cluster, any local path on local[N])."""
    from .skew import ensure_parallelism

    spark = SparkSession.getActiveSession()
    # under-split scans (single-file points tables) would run the whole
    # refine on 1-2 tasks — rebalance first (no-op on parallel inputs)
    points = ensure_parallelism(points)
    if dim_path is not None:
        token = stage_admin_dim(spark, admins, dim_path)
        bc = spark.sparkContext.broadcast((token, None, dim_path))
    else:
        bc = broadcast_admin_dim(spark, admins)
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(points.schema.fields)
        + [T.StructField("admin_ids", T.ArrayType(T.StringType()), True)]
    )

    # mapInArrow, not mapInPandas (r6, guide §4.1/§4.2): the refine
    # kernel is ~7 µs/point of numpy, but the pandas round trip
    # (Arrow→object columns→pdf.copy→list-of-lists→Arrow) cost ~10× the
    # kernel at bench scale. Arrow batches pass the point columns
    # through untouched and the admin_ids list column is assembled
    # directly from (offsets, flat values) — one allocation per batch.
    def gen(batches):
        import itertools

        import pyarrow as pa

        finder = finder_for_broadcast(bc.value)
        lon_i = lat_i = None
        for b in batches:
            if b.num_rows == 0:
                continue
            if lon_i is None:
                names = b.schema.names
                lon_i, lat_i = names.index(lon_col), names.index(lat_col)
            lon = b.column(lon_i).to_numpy(zero_copy_only=False)
            lat = b.column(lat_i).to_numpy(zero_copy_only=False)
            results = refine_batch(
                finder,
                np.asarray(lon, dtype=np.float64),
                np.asarray(lat, dtype=np.float64),
            )
            offsets = np.zeros(len(results) + 1, dtype=np.int32)
            np.cumsum([len(r) for r in results], out=offsets[1:])
            flat = pa.array(
                list(itertools.chain.from_iterable(results)), type=pa.string()
            )
            admin_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
            yield pa.RecordBatch.from_arrays(
                [*b.columns, admin_arr],
                names=[*b.schema.names, "admin_ids"],
            )

    return points.mapInArrow(gen, schema=out_schema)


# ---------------------------------------------------------------------------
# partitioned strategy (no broadcast of geometry)
# ---------------------------------------------------------------------------


def admin_cell_cover(admins: DataFrame, spark: SparkSession | None = None) -> DataFrame:
    """Explode each admin into its covering cells — SLIM (cell, id) rows
    only, never the geometry: replicating WKB once per covering cell (up
    to MAX_CELLS_PER_ADMIN copies) was the round-1 scale killer. Each
    admin is covered at exactly ONE resolution (its size class, the
    geofinder cover policy). Distributed: mapInPandas over the admin
    table itself."""
    from ..geofinder import _bbox_cells
    from ..geometry import mp_bbox

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tmp = AdminGeoFinder()
        for pdf in batches:
            out = {"cell": [], "id": [], "minx": [], "miny": [], "maxx": [], "maxy": []}
            # itertuples, not iterrows: iterrows builds a Series per row
            # — free speed on multi-million-admin dims (VERDICT r05 #3)
            for r in pdf[["id", "boundary_wkb"]].itertuples(index=False):
                wkb = r.boundary_wkb
                if wkb is None:
                    continue
                mp = wkb_to_mp(bytes(wkb))
                bbox = mp_bbox(mp)
                res = tmp._pick_res(bbox)
                for c in _bbox_cells(bbox, res):
                    out["cell"].append(c)
                    out["id"].append(r.id)
                    out["minx"].append(bbox[0])
                    out["miny"].append(bbox[1])
                    out["maxx"].append(bbox[2])
                    out["maxy"].append(bbox[3])
            if out["cell"]:
                yield pd.DataFrame(out)

    # bbox columns ride along so the G2 envelope check can run JVM-side
    # at the pair join (callers that only need (cell, id) just ignore them)
    return admins.select(*ADMIN_DIM_COLS).mapInPandas(
        gen,
        schema="cell long, id string, minx double, miny double, maxx double, maxy double",
    )


def attach_admins_partitioned(
    points: DataFrame,
    admins: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    point_id_col: str = "point_uid",
    n_salts: int = 8,
    refine: str = "arrow",
    simplify_tolerance: float | str | None = "auto",
) -> DataFrame:
    """Shuffle spatial join for polygon sets beyond broadcast budget —
    the 100-TB-regime path. Three stages, each a standard Spark shape:

    1. **Candidate pairs** (filter phase, G2): points explode to one cell
       per *live* cover resolution (= admin size class, usually 1-3) and
       equi-join the slim (cell, admin_id) cover. Pure Catalyst: AQE
       broadcast-plans the cover when it fits, skew-splits hot city cells
       otherwise. Pairs are unique by construction (one cover res per
       admin), so no dedup shuffle.
    2. **Exact refine** (G3), two backends:
       - ``refine="arrow"`` (default): cogroup on (admin, salt) with the
         vectorized numpy ray cast — each admin's WKB crosses the wire
         exactly ``n_salts`` times, candidates of a giant polygon spread
         across reducers by the deterministic uid-hash salt.
       - ``refine="jvm"``: geometry travels as nested closed-edge arrays
         and the even-odd ray cast runs as a Catalyst higher-order-
         function predicate INSIDE the pair join (shuffled hash, no
         sort; geometry.edge_polys_inside_sql — bit-identical to the
         numpy kernel). No Arrow trip, no cogroup, no salting — but HOFs
         are interpreted per element, and the r3 A/B at 36M points /
         ~10^8 pairs measured 104 s vs arrow's 50.6 s (2×): Arrow's
         serialization cost is smaller than numpy's vectorization win at
         any realistic pair volume, so this backend is an option (and an
         independent cross-check of the kernel), not the default.
    3. **Replay** (G5): candidates gather per point (map-side partial
       collect_list) and the dedup/memo loop replays against the
       broadcast admin *skeleton* (id/zone_type/parent_id — no geometry),
       exactly as admin_geofinder.rs:220-269; the narrow (uid, admin_ids)
       result joins back to the points. The r2-flagged join-back
       exchange was attacked in r3 with two carry-through designs and
       both measured SLOWER than this plan (interleaved A/B, same flags
       input) — the payload-padded union exchange costs more than the
       agg + narrow join it replaces.

    Identical results to the broadcast path — gate `pip_admins_partitioned`
    is hash-checked against the same closed-form oracle.

    ``simplify_tolerance`` (arrow backend): classify against Douglas–
    Peucker-simplified rings, then exact-recheck ONLY points within the
    tolerance band of the simplified boundary — exact by construction
    (the discarded vertices lie within tol of the retained chords), and
    measured 8.45× on ~2000-vertex boundaries (BENCH/BASELINE.md
    SIMPLIFY-TABLE). Default ``"auto"`` (VERDICT r04 #1): per polygon,
    dense rings (>= {mv} vertices) get a perimeter-derived tolerance
    (~{k}× the mean edge length); slim dims (rectangles/octagons) are
    untouched, so the toy-dim floor is unchanged. Pass a float to pin
    the tolerance, or None to force full-geometry classification.
    """.format(mv=AUTO_SIMPLIFY_MIN_VERTICES, k=AUTO_SIMPLIFY_EDGE_FACTOR)
    from ..geometry import EDGE_POLYS_TYPE, edge_polys_inside_sql, mp_to_edge_polys
    from .skew import salted_mod_col

    spark = SparkSession.getActiveSession()
    # persist the cover: the res_levels collect below is a full cover
    # compute (WKB parse + cell enumeration per admin) and the pairs join
    # would otherwise recompute the same lineage — persisting the slim
    # (cell, id, bbox) rows halves the dim-side work (plus AQE retries).
    # Left persisted for the job's lifetime: the output DataFrame is
    # lazy, so there is no safe unpersist point inside this function.
    cover = admin_cell_cover(admins).persist()

    # live cover resolutions (one per admin size class actually present)
    res_levels = [
        int(r["res"])
        for r in cover.select((F.col("cell") / F.lit(2**58)).cast("long").alias("res")).distinct().collect()
    ] or list(AdminGeoFinder.RES_CANDIDATES)
    # cover row count (cheap on the persisted cover): the slim
    # (cell, idx, bbox) rows are ~50 B each, so this decides whether the
    # pair join below can broadcast the cover. The GEOMETRY is what this
    # strategy refuses to broadcast; the slim cover usually still fits —
    # and when it does not (10^8-cell world dims), a SHUFFLE_HASH hint
    # keeps the 3-cells-per-point fact side from being SORTED: the
    # planner has no stats for a mapInPandas output and was picking a
    # sort-merge join that sorted every exploded point row (guide §3.1).
    n_cover = cover.count()
    COVER_BROADCAST_ROWS = 4_000_000  # ~200 MB of slim rows

    # the refine/replay Arrow schemas carry the CALLER's id dtype — a
    # bigint point id must not crash at Arrow conversion against a
    # hardcoded string field
    uid_dt = points.schema[point_id_col].dataType.simpleString()

    pts = points.select(
        F.col(point_id_col).alias("point_uid"),
        F.col(lon_col).alias("__plon"),
        F.col(lat_col).alias("__plat"),
        F.explode(
            F.array(*[
                (F.lit(int(r)) * F.lit(2**58)
                 + F.least(F.greatest(F.floor((F.col(lon_col) + 180.0) / 360.0 * float(1 << (r + 6))), F.lit(0)), F.lit((1 << (r + 6)) - 1)) * F.lit(2**29)
                 + F.least(F.greatest(F.floor((F.col(lat_col) + 90.0) / 180.0 * float(1 << (r + 6))), F.lit(0)), F.lit((1 << (r + 6)) - 1)))
                for r in res_levels
            ])
        ).alias("cell"),
    )

    # Driver-side admin index: candidates travel as ONE int
    # (idx*2 + contains) instead of (admin_id string, bool) — the refine
    # output and the gather shuffle are the two dominant costs at bench
    # scale (profiled: ~32 s + ~25 s of 70 s at 36M points), and both are
    # proportional to flag-row width.
    skel_rows = admins.select("id", "zone_type", "parent_id").collect()
    ids_sorted = sorted(r["id"] for r in skel_rows)
    idx_of = {aid: i for i, aid in enumerate(ids_sorted)}
    info = {r["id"]: (r["zone_type"], r["parent_id"]) for r in skel_rows}
    # per idx: (id, zone_rank, parent_idx|-1, zone_type)
    skel_idx = [
        (aid, zone_rank(info[aid][0]), idx_of.get(info[aid][1], -1), info[aid][0])
        for aid in ids_sorted
    ]
    # admins that are some admin's ancestor: ONLY their non-contained
    # candidacies can influence the replay (the tested_hierarchy
    # acceptance, admin_geofinder.rs:236-238); everyone else's
    # contains=False rows are dropped at the refine, shrinking the gather.
    ancestor_idx: set[int] = set()
    for aid in ids_sorted:
        pid = info[aid][1]
        while pid is not None and pid in idx_of:
            if idx_of[pid] in ancestor_idx:
                break
            ancestor_idx.add(idx_of[pid])
            pid = info[pid][1]
    bc_skel = spark.sparkContext.broadcast((skel_idx, ancestor_idx))

    def _adm_idx_df():
        # fresh lineage per use: reusing one DataFrame in both the cover
        # and geometry joins trips Spark's ambiguous-self-join check
        return spark.createDataFrame(
            [(aid, i) for i, aid in enumerate(ids_sorted)], "admin_id string, __aidx int"
        )

    adm_idx_df = _adm_idx_df()
    cover_idx = (
        cover.withColumnRenamed("id", "admin_id")
        .join(F.broadcast(adm_idx_df), "admin_id")
        .select("cell", "__aidx", "minx", "miny", "maxx", "maxy")
    )

    # stage 1 — candidate pairs (narrow rows: uid, lon, lat, admin idx).
    # The G2 envelope check runs HERE, JVM-side, before anything shuffles
    # or crosses Arrow — identical candidate set to the broadcast path's
    # _candidate_map (cell hit + bbox containment).
    pair_cols = ["point_uid", "__plon", "__plat", "__aidx"]
    if refine == "arrow":
        pair_cols.append(salted_mod_col("point_uid", n_salts).alias("__salt"))
    cover_side = (
        F.broadcast(cover_idx)
        if n_cover <= COVER_BROADCAST_ROWS
        else cover_idx.hint("SHUFFLE_HASH")
    )
    pairs = (
        pts.join(cover_side, "cell")
        .filter(
            (F.col("__plon") >= F.col("minx")) & (F.col("__plon") <= F.col("maxx"))
            & (F.col("__plat") >= F.col("miny")) & (F.col("__plat") <= F.col("maxy"))
        )
        .select(*pair_cols)
    )

    geom_base = (
        admins.select(F.col("id").alias("admin_id"), "boundary_wkb")
        .filter(F.col("boundary_wkb").isNotNull())
        .join(F.broadcast(_adm_idx_df()), "admin_id")
        .select("__aidx", "boundary_wkb")
    )

    if refine == "jvm":
        # stage 2a — pure-Catalyst refine: geometry as closed-edge arrays,
        # the ray cast as a HOF predicate inside the pair equi-join.
        anc = frozenset(int(i) for i in ancestor_idx)

        def to_edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "__aidx": pdf["__aidx"],
                        "__is_anc": [int(a) in anc for a in pdf["__aidx"]],
                        "polys": [
                            mp_to_edge_polys(wkb_to_mp(bytes(b)))
                            for b in pdf["boundary_wkb"]
                        ],
                    }
                )

        geom_e = geom_base.mapInPandas(
            to_edges, schema=f"__aidx int, __is_anc boolean, polys {EDGE_POLYS_TYPE}"
        )
        # SHUFFLE_HASH: the pair side is huge and the join key (__aidx) is
        # low-cardinality — a sort-merge join would SORT all pairs for no
        # benefit; a shuffled hash join builds on the (small-per-partition)
        # geometry side and streams pairs. AQE's skew split applies to SHJ.
        flags = (
            pairs.join(geom_e.hint("SHUFFLE_HASH"), "__aidx")
            .withColumn(
                "__in", F.expr(edge_polys_inside_sql("polys", "__plon", "__plat"))
            )
            # non-ancestors' contains=False rows are inert in the replay
            .filter(F.col("__in") | F.col("__is_anc"))
            .select(
                "point_uid",
                (F.col("__aidx") * 2 + F.col("__in").cast("int")).cast("int").alias("cand"),
            )
        )
    elif refine == "arrow":
        # stage 2b — cogroup on (admin, salt): WKB × n_salts total, numpy
        # vectorized ray cast (the 10^5+-vertex-polygon regime)
        geom = geom_base.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )

        def arrow_refine(key, pairs_tbl, geom_tbl):
            # applyInArrow (r6): lon/lat come out as zero-copy numpy and
            # the kept uids leave via an Arrow take — the uid strings
            # are never materialized as Python objects (the old pandas
            # version paid object-column conversion for every pair row
            # in both directions, guide §4.1/§4.2).
            import pyarrow as pa

            empty = pa.table(
                {
                    "point_uid": pa.array([], type=pairs_tbl.schema.field("point_uid").type),
                    "cand": pa.array([], type=pa.int32()),
                }
            )
            if geom_tbl.num_rows == 0 or pairs_tbl.num_rows == 0:
                return empty
            aidx = int(key[0].as_py() if hasattr(key[0], "as_py") else key[0])
            mp = wkb_to_mp(bytes(geom_tbl.column("boundary_wkb")[0].as_py()))
            # no bbox recheck: stage 1 already applied the identical
            # envelope filter JVM-side (same mp_bbox values, carried on
            # the cover), so every pair row here has passed it
            lon = pairs_tbl.column("__plon").to_numpy(zero_copy_only=False)
            lat = pairs_tbl.column("__plat").to_numpy(zero_copy_only=False)
            uid_col = pairs_tbl.column("point_uid")
            tol = simplify_tolerance
            if tol == "auto":  # per-polygon: dense rings only (r04 #1)
                tol = _auto_simplify_tolerance(mp)
            if tol:
                # simplified-refine with exact re-check band (VERDICT r03
                # #8): classify on DP-simplified rings (cheap: E_s << E
                # edges per point), then exact-test ONLY points within
                # the DP tolerance of the simplified boundary — the only
                # region where the two geometries can disagree. Result is
                # EXACT; 1.5x band pads the DP bound for float slack.
                from ..geometry import points_near_mp_boundary, simplify_mp

                simp = simplify_mp(mp, tol)
                inside = points_in_multipolygon(lon, lat, simp)
                band = points_near_mp_boundary(lon, lat, simp, tol * 1.5)
                if band.any():
                    inside[band] = points_in_multipolygon(lon[band], lat[band], mp)
            else:
                inside = points_in_multipolygon(lon, lat, mp)
            if aidx not in bc_skel.value[1]:  # not an ancestor: False rows are inert
                kept = np.nonzero(inside)[0]
                if not len(kept):
                    return empty
                uid_out = uid_col.take(pa.array(kept, pa.int64()))
                cand = np.full(len(kept), aidx * 2 + 1, dtype=np.int32)
            else:
                uid_out = uid_col
                cand = (aidx * 2 + inside.astype(np.int32)).astype(np.int32)
            return pa.table({"point_uid": uid_out, "cand": pa.array(cand, pa.int32())})

        flags = (
            pairs.groupBy("__aidx", "__salt")
            .cogroup(geom.groupBy("__aidx", "__salt"))
            .applyInArrow(arrow_refine, schema=f"point_uid {uid_dt}, cand int")
        )
    else:
        raise ValueError(f"unknown refine {refine!r} (jvm|arrow)")

    # stage 3 — gather per point (map-side partial collect_list) + batch
    # replay + uid join-back. Two carry-the-payload-through-the-gather
    # redesigns were built and MEASURED AGAINST this in r3 (interleaved,
    # same flags input, 36M points / 82M flags): a string-keyed pandas
    # gather (64.7 s) and a 128-bit-numeric-key variant (the same union
    # exchange with a TRIVIAL kernel already costs 34 s) — both lose to
    # this plan's 28 s because pushing 118M payload-padded rows through
    # one Arrow repartition costs more than the JVM agg plus the narrow
    # join-back. Negative result recorded in BENCH/BASELINE.md.
    gathered = flags.groupBy("point_uid").agg(F.collect_list("cand").alias("cands"))

    def replay(batches) -> "Iterator":
        # mapInArrow (r6): the cands arrays arrive as one flat int32
        # buffer + offsets and the admin_ids lists leave the same way —
        # no pandas object columns for 10^6 small lists in either
        # direction; the dedup/memo loop itself is unchanged.
        import itertools

        import pyarrow as pa

        skel, _ = bc_skel.value
        # candidate iteration order is (zone_rank, id) — precompute the
        # per-idx sort key once per worker
        order_key = [(rank, aid) for (aid, rank, _, _) in skel]
        memo: dict[tuple, list[str]] = {}
        for b in batches:
            if b.num_rows == 0:
                continue
            names = b.schema.names
            cands_col = b.column(names.index("cands"))
            uid_col = b.column(names.index("point_uid"))
            # .values + raw offsets (NOT flatten(): a sliced batch's
            # offsets do not start at 0, flatten() would re-base them)
            flat = cands_col.values.to_numpy(zero_copy_only=False)
            offs = cands_col.offsets.to_numpy(zero_copy_only=False)
            out: list[list[str]] = []
            for i in range(b.num_rows):
                key = tuple(sorted(flat[offs[i]:offs[i + 1]].tolist()))
                res = memo.get(key)
                if res is None:
                    decoded = sorted(
                        ((c >> 1, bool(c & 1)) for c in key), key=lambda p: order_key[p[0]]
                    )
                    tested: set[int] = set()
                    added: set[str] = set()
                    res = []
                    for aidx, contained in decoded:
                        aid, _rank, pidx, zt = skel[aidx]
                        if aidx in tested:
                            res.append(aid)
                        elif zt is not None and zt in added:
                            pass
                        elif contained:
                            if zt is not None:
                                added.add(zt)
                            p = pidx
                            while p >= 0:
                                pz = skel[p][3]
                                if pz is not None:
                                    added.add(pz)
                                if p in tested:
                                    break
                                tested.add(p)
                                p = skel[p][2]
                            res.append(aid)
                    memo[key] = res
                out.append(res)
            roffs = np.zeros(len(out) + 1, dtype=np.int32)
            np.cumsum([len(r) for r in out], out=roffs[1:])
            rflat = pa.array(list(itertools.chain.from_iterable(out)), type=pa.string())
            yield pa.RecordBatch.from_arrays(
                [uid_col, pa.ListArray.from_arrays(pa.array(roffs, pa.int32()), rflat)],
                names=["point_uid", "admin_ids"],
            )

    attached = gathered.mapInArrow(
        replay, schema=f"point_uid {uid_dt}, admin_ids array<string>"
    )
    # SHUFFLE_HASH for the uid join-back: both sides are ~point-count
    # rows, and a sort-merge join would sort the (string-keyed) points
    # twice for a single equi-probe; the hash build side is one shuffle
    # partition of the narrow (uid, admin_ids) result (guide §3.1).
    return points.join(
        attached.withColumnRenamed("point_uid", point_id_col).hint("SHUFFLE_HASH"),
        point_id_col,
        "left",
    ).withColumn(
        "admin_ids", F.coalesce("admin_ids", F.array().cast("array<string>"))
    )


def simplify_admin_boundaries(
    admins: DataFrame, tolerance_deg: float, wkb_col: str = "boundary_wkb"
) -> DataFrame:
    """Opt-in boundary simplification prep for the partitioned strategy:
    Douglas–Peucker per ring (geometry.simplify_mp) over the admin dim,
    shrinking the WKB each polygon ships ``n_salts`` times through the
    refine (coastline-grade boundaries carry 10^5+ vertices; most
    attachment workloads tolerate a ~10-100 m boundary band). Adds
    ``n_vertices_before/after`` so the caller can log the reduction.
    APPROXIMATION: points within ~tolerance of a boundary may attach
    differently — never applied implicitly by attach_admins."""
    from ..geometry import mp_to_wkb, simplify_mp

    out_schema = T.StructType(
        list(admins.schema.fields)
        + [
            T.StructField("n_vertices_before", T.LongType()),
            T.StructField("n_vertices_after", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            before, after, blobs = [], [], []
            for b in pdf[wkb_col]:
                if b is None:
                    before.append(0)
                    after.append(0)
                    blobs.append(None)
                    continue
                mp = wkb_to_mp(bytes(b))
                nb = sum(len(r) for poly in mp for r in poly)
                sm = simplify_mp(mp, tolerance_deg)
                na = sum(len(r) for poly in sm for r in poly)
                before.append(nb)
                after.append(na)
                blobs.append(mp_to_wkb(sm))
            pdf = pdf.copy()
            pdf[wkb_col] = blobs
            pdf["n_vertices_before"] = before
            pdf["n_vertices_after"] = after
            yield pdf

    return admins.mapInPandas(gen, schema=out_schema)


#: default per-executor budget for a resident admin dim. Spark's own
#: autoBroadcastJoinThreshold defaults to 10 MB for row broadcasts; a
#: finder dim is worth holding at much larger sizes because the
#: alternative is the ~3.5x-slower shuffle path, but past a few hundred
#: MB the resident copy starts to crowd executor memory at 100-TB fact
#: scale (one copy per executor, plus the numpy finder overlay).
AUTO_BROADCAST_BUDGET_BYTES = 256 * 1024 * 1024


def estimate_dim_bytes(admins: DataFrame) -> int:
    """Size estimate for the admin dim as broadcast payload: WKB bytes
    dominate; ids/types/parents are counted at observed string length
    plus per-row container overhead. One slim columnar aggregate over
    the dim — no geometry leaves the executors. (On a real deployment
    the same number can come from table-metadata column stats without
    a scan; this computes it when stats are absent.)"""
    row = admins.select(
        F.coalesce(F.sum(F.length("boundary_wkb")), F.lit(0)).alias("wkb"),
        F.coalesce(
            F.sum(
                F.coalesce(F.length("id"), F.lit(0))
                + F.coalesce(F.length("zone_type"), F.lit(0))
                + F.coalesce(F.length("parent_id"), F.lit(0))
            ),
            F.lit(0),
        ).alias("meta"),
        F.count("*").alias("n"),
    ).collect()[0]
    return int(row["wkb"] + row["meta"] + row["n"] * 64)


def choose_pip_strategy(
    admins: DataFrame, broadcast_budget_bytes: int = AUTO_BROADCAST_BUDGET_BYTES
) -> str:
    """strategy='auto' policy: broadcast whenever the dim fits the
    budget (the fast, shuffle-free regime), else the partitioned
    shuffle join (the beyond-broadcast 100-TB regime)."""
    return (
        "broadcast" if estimate_dim_bytes(admins) <= broadcast_budget_bytes else "partitioned"
    )


def attach_admins(
    points: DataFrame,
    admins: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    strategy: str = "broadcast",
    point_id_col: str = "point_uid",
    n_salts: int = 8,
    refine: str = "arrow",
    dim_path: str | None = None,
    simplify_tolerance: float | str | None = "auto",
    broadcast_budget_bytes: int = AUTO_BROADCAST_BUDGET_BYTES,
) -> DataFrame:
    if strategy == "auto":
        strategy = choose_pip_strategy(admins, broadcast_budget_bytes)
    if strategy == "broadcast":
        return attach_admins_broadcast(points, admins, lon_col, lat_col, dim_path=dim_path)
    if strategy == "partitioned":
        return attach_admins_partitioned(
            points, admins, lon_col, lat_col, point_id_col, n_salts=n_salts, refine=refine,
            simplify_tolerance=simplify_tolerance,
        )
    raise ValueError(f"unknown strategy {strategy!r}")
