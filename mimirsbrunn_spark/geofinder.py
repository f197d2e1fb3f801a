"""Admin-attachment semantics kernel (the engine's correctness heart).

A from-scratch Python implementation of the semantics of
``AdminGeoFinder::get`` (/root/reference/src/admin_geofinder.rs:220-269)
and ``AdminGeoFinder::get_admins_if`` (:160-208):

``get(point)``:
  1. candidates = admins whose *envelope* contains the point (we use a
     multi-resolution cell cover instead of an R-tree — same filter-refine
     contract, admin_geofinder.rs:48-51);
  2. sort candidates by zone_type ascending, untyped (None) first —
     matching Rust's ``Option<ZoneType>`` ordering — with admin id as the
     pinned tie-break (the reference inherits R-tree iteration order for
     ties; its own tests are tie-insensitive, SURVEY.md §7 risk 1);
  3. loop: if the candidate id was already visited as a parent →
     accept WITHOUT a boundary test (hierarchy memoization); else if its
     zone_type was already matched → skip; else exact point-in-polygon →
     on match record its zone_type, then walk the parent chain marking
     every ancestor visited and recording ancestor zone_types.

Result: ≤1 admin per zone_type, all untyped containing admins, plus every
ancestor that is itself a bbox candidate — in (zone_type, id) order.

``get_admins_if(point, condition)`` returns full hierarchy *branches*
(leaf + parents, parents deduped across branches via visited set) for
candidates passing ``condition`` — used by streets
(/root/reference/src/osm_reader/street.rs:338-343).

This class is small-data (the admin dimension); it is broadcast to
executors and queried from vectorized batch UDFs (see operators/pip.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .geometry import (
    mp_bbox,
    points_in_multipolygon,
    points_intersect_multipolygon,
    wkb_to_mp,
)
from .tiles import grid_cell_np, grid_decompose

# cosmogony ZoneType variant order (smallest → largest); None ranks first,
# mirroring Rust Option ordering (admin_geofinder.rs:179,231 sort_by_key).
ZONE_TYPE_RANK = {
    "suburb": 0,
    "city_district": 1,
    "city": 2,
    "state_district": 3,
    "state": 4,
    "country_region": 5,
    "country": 6,
    "non_administrative": 7,
}


# a zone_type string outside the cosmogony enum (malformed dump, future
# variant) must not KeyError inside an executor: rank it after every
# known variant (least specific), ties broken downstream by id — the
# reference's serde enum would reject the row at read time, but our
# readers project the raw string, so the guard belongs here
_UNKNOWN_ZONE_RANK = len(ZONE_TYPE_RANK)


def zone_rank(zone_type: str | None) -> int:
    return -1 if zone_type is None else ZONE_TYPE_RANK.get(zone_type, _UNKNOWN_ZONE_RANK)


@dataclass
class AdminRec:
    id: str
    zone_type: str | None
    parent_id: str | None
    mp: list  # MultiPolygon (may be empty if boundary-less; skipped at insert)
    bbox: tuple[float, float, float, float] | None = None
    payload: dict = field(default_factory=dict)


class AdminGeoFinder:
    """Multi-resolution-cell indexed point→admin finder."""

    # cover budget: pick the finest res whose bbox cover stays small,
    # so one huge polygon doesn't explode the index (SURVEY §7 risk 2).
    # res 0 covers continent-scale polygons within budget (5.6° cells).
    MAX_CELLS_PER_ADMIN = 256
    RES_CANDIDATES = (0, 2, 4, 6, 8)

    def __init__(self):
        self.by_id: dict[str, AdminRec] = {}
        # res -> cell -> [admin_id]; which resolutions are live
        self.cell_index: dict[int, dict[int, list[str]]] = {}

    # -- build ------------------------------------------------------------

    def insert(self, rec: AdminRec) -> None:
        """Admins without boundary are not indexed (admin_geofinder.rs:149-152)
        but remain resolvable by id for the parent walk (:196-200, 251-256)."""
        self.by_id[rec.id] = rec
        if not rec.mp:
            return
        rec.bbox = mp_bbox(rec.mp)
        res = self._pick_res(rec.bbox)
        cells = _bbox_cells(rec.bbox, res)
        idx = self.cell_index.setdefault(res, {})
        for c in cells:
            idx.setdefault(c, []).append(rec.id)

    def insert_wkb(self, id, zone_type, parent_id, wkb: bytes | None, **payload) -> None:
        mp = wkb_to_mp(wkb) if wkb else []
        self.insert(AdminRec(id=id, zone_type=zone_type, parent_id=parent_id, mp=mp, payload=payload))

    def _pick_res(self, bbox) -> int:
        for res in reversed(self.RES_CANDIDATES):
            if _bbox_cell_count(bbox, res) <= self.MAX_CELLS_PER_ADMIN:
                return res
        return self.RES_CANDIDATES[0]

    # -- query ------------------------------------------------------------

    def _candidates(self, lon: float, lat: float) -> list[AdminRec]:
        """Filter phase: cell hit + envelope containment (G2). The cell
        is computed with scalar integer math (bit-identical to
        grid_cell_np) — this path runs once per street node inside
        executors, and a fresh 1-element numpy array pair per live
        resolution dominated the per-node cost at millions of nodes."""
        from .tiles import _I_SHIFT, _RES_SHIFT, _grid_ij_int

        seen: set[str] = set()
        out: list[AdminRec] = []
        for res, idx in self.cell_index.items():
            ci, cj = _grid_ij_int(lon, lat, res)
            cell = res * _RES_SHIFT + ci * _I_SHIFT + cj
            for aid in idx.get(cell, ()):
                if aid in seen:
                    continue
                seen.add(aid)
                rec = self.by_id[aid]
                bb = rec.bbox
                if bb[0] <= lon <= bb[2] and bb[1] <= lat <= bb[3]:
                    out.append(rec)
        out.sort(key=lambda r: (zone_rank(r.zone_type), r.id))
        return out

    def _contains(self, rec: AdminRec, lon: float, lat: float) -> bool:
        return bool(points_in_multipolygon(np.array([lon]), np.array([lat]), rec.mp)[0])

    def _intersects(self, rec: AdminRec, lon: float, lat: float) -> bool:
        """Boundary-inclusive variant (admin_geofinder.rs:186-188:
        ``bound.intersects(&Point)``) — only the get_admins_if path."""
        return bool(
            points_intersect_multipolygon(np.array([lon]), np.array([lat]), rec.mp)[0]
        )

    def get(self, lon: float, lat: float) -> list[AdminRec]:
        """Port of admin_geofinder.rs:220-269 (semantics 1:1)."""
        tested_hierarchy: set[str] = set()
        added_zone_types: set[str] = set()
        res: list[AdminRec] = []
        for cand in self._candidates(lon, lat):
            if cand.id in tested_hierarchy:
                res.append(cand)
            elif cand.zone_type is not None and cand.zone_type in added_zone_types:
                pass  # already have this zone type
            elif self._contains(cand, lon, lat):
                if cand.zone_type is not None:
                    added_zone_types.add(cand.zone_type)
                parent_id = cand.parent_id
                while parent_id is not None:
                    parent = self.by_id.get(parent_id)
                    if parent is not None and parent.zone_type is not None:
                        added_zone_types.add(parent.zone_type)
                    if parent_id in tested_hierarchy:
                        break
                    tested_hierarchy.add(parent_id)
                    parent_id = parent.parent_id if parent is not None else None
                res.append(cand)
        return res

    def get_admins_if(self, lon: float, lat: float, condition) -> list[list[AdminRec]]:
        """Port of admin_geofinder.rs:160-208: hierarchy branches."""
        visited_ids: set[str] = set()
        branches: list[list[AdminRec]] = []
        for cand in self._candidates(lon, lat):
            if not condition(cand):
                continue
            if cand.id in visited_ids or not self._intersects(cand, lon, lat):
                continue
            branch = [cand]
            branch_ids = {cand.id}
            while True:
                parent_id = branch[-1].parent_id
                # cycle guard: a malformed dump with a parent_id loop
                # (A→B→A, or A→A) must not spin an executor forever —
                # same hardening class as _UNKNOWN_ZONE_RANK (get() is
                # already safe via its tested_hierarchy break)
                if parent_id is None or parent_id in branch_ids:
                    break
                parent = self.by_id.get(parent_id)
                if parent is None:
                    break
                visited_ids.add(parent.id)
                branch_ids.add(parent.id)
                branch.append(parent)
            branches.append(branch)
        return branches

    def get_ids(self, lon: float, lat: float) -> list[str]:
        return [r.id for r in self.get(lon, lat)]


# ---------------------------------------------------------------------------
# cell-cover helpers
# ---------------------------------------------------------------------------


def _bbox_cell_range(bbox, res: int):
    minx, miny, maxx, maxy = bbox
    c0 = grid_cell_np(np.array([minx]), np.array([miny]), res)
    c1 = grid_cell_np(np.array([maxx]), np.array([maxy]), res)
    _, i0, j0 = grid_decompose(c0)
    _, i1, j1 = grid_decompose(c1)
    return int(i0[0]), int(j0[0]), int(i1[0]), int(j1[0])


def _bbox_cell_count(bbox, res: int) -> int:
    i0, j0, i1, j1 = _bbox_cell_range(bbox, res)
    return (i1 - i0 + 1) * (j1 - j0 + 1)


def _bbox_cells(bbox, res: int) -> list[int]:
    from .tiles import _I_SHIFT, _RES_SHIFT  # layout constants

    i0, j0, i1, j1 = _bbox_cell_range(bbox, res)
    return [
        res * _RES_SHIFT + i * _I_SHIFT + j
        for i in range(i0, i1 + 1)
        for j in range(j0, j1 + 1)
    ]


def build_finder_from_rows(rows) -> AdminGeoFinder:
    """Rows: dicts with id, zone_type, parent_id, boundary_wkb (+ extras)."""
    finder = AdminGeoFinder()
    for r in rows:
        finder.insert_wkb(
            r["id"],
            r.get("zone_type"),
            r.get("parent_id"),
            r.get("boundary_wkb"),
            **{k: v for k, v in r.items() if k not in ("id", "zone_type", "parent_id", "boundary_wkb")},
        )
    return finder
