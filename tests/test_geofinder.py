"""The six canonical correctness vectors, ported 1:1 from
/root/reference/src/admin_geofinder.rs:311-530 (see SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest

from mimirsbrunn_spark.datagen import octagon
from mimirsbrunn_spark.geofinder import AdminGeoFinder, AdminRec


def make_admin(id, offset, zone_type, zone_size=1.0, parent_id=None):
    ring = octagon(offset, offset, zone_size)
    return AdminRec(id=id, zone_type=zone_type, parent_id=parent_id, mp=[[ring]])


def finder_of(*admins):
    f = AdminGeoFinder()
    for a in admins:
        f.insert(a)
    return f


def test_two_fake_admins():
    # admin_geofinder.rs:369-394
    f = finder_of(
        make_admin("admin:offset:40", 40.0, "city"),
        make_admin("admin:offset:43", 43.0, "state"),
    )
    for lon, lat in [(48.0, 41.0), (411.0, 41.0), (51.0, 54.0), (53.0, 53.0)]:
        assert f.get_ids(lon, lat) == []
    assert f.get_ids(44.0, 44.0) == ["admin:offset:40"]
    assert f.get_ids(48.0, 48.0) == ["admin:offset:43"]
    assert sorted(f.get_ids(46.0, 46.0)) == ["admin:offset:40", "admin:offset:43"]


def test_two_admin_same_zone_type():
    # admin_geofinder.rs:396-405 — a point in 2 cities attaches to only one
    f = finder_of(
        make_admin("admin:offset:40", 40.0, "city"),
        make_admin("admin:offset:43", 43.0, "city"),
    )
    assert len(f.get_ids(46.0, 46.0)) == 1


def test_two_no_zone_type():
    # admin_geofinder.rs:407-417 — untyped admins all match
    f = finder_of(
        make_admin("admin:offset:40", 40.0, None),
        make_admin("admin:offset:43", 43.0, None),
    )
    assert len(f.get_ids(46.0, 46.0)) == 2


def _hierarchy_admins():
    return [
        make_admin("bob_city", 40.0, "city", 1.0, "bob_state"),
        make_admin("bob_state", 40.0, "state_district", 2.0, "bob_country"),
        make_admin("bob_country", 40.0, "country", 3.0, None),
    ]


def test_hierarchy():
    # admin_geofinder.rs:419-450
    f = finder_of(*_hierarchy_admins())
    assert f.get_ids(46.0, 46.0) == ["bob_city", "bob_state", "bob_country"]


def test_hierarchy_orphan():
    # admin_geofinder.rs:452-493 — second state suppressed by memoization
    f = finder_of(
        *_hierarchy_admins(),
        make_admin("another_state", 40.0, "state_district", 2.0, "bob_country"),
    )
    assert f.get_ids(46.0, 46.0) == ["bob_city", "bob_state", "bob_country"]


def test_hierarchy_and_not_typed_zone():
    # admin_geofinder.rs:495-529 — untyped outsider additionally returned,
    # ordered first (None sorts before any zone_type)
    f = finder_of(
        *_hierarchy_admins(),
        make_admin("no_typed_zone", 40.0, None, 2.0, None),
    )
    assert f.get_ids(46.0, 46.0) == ["no_typed_zone", "bob_city", "bob_state", "bob_country"]


def test_get_admins_if_branches():
    # get_admins_if semantics (admin_geofinder.rs:160-208): street-style
    # condition zone_type <= city (street.rs:338-343) returns the city leaf
    # with its full parent chain.
    f = finder_of(*_hierarchy_admins())
    from mimirsbrunn_spark.geofinder import zone_rank

    branches = f.get_admins_if(46.0, 46.0, lambda a: zone_rank(a.zone_type) <= zone_rank("city"))
    assert len(branches) == 1
    assert [a.id for a in branches[0]] == ["bob_city", "bob_state", "bob_country"]


def test_boundaryless_admin_not_indexed_but_resolvable():
    # admin_geofinder.rs:149-154: no boundary → not in the spatial index
    f = finder_of(make_admin("bob_city", 40.0, "city", 1.0, "ghost_parent"))
    f.insert(AdminRec(id="ghost_parent", zone_type="state", parent_id=None, mp=[]))
    assert f.get_ids(44.0, 44.0) == ["bob_city"]


def test_get_admins_if_boundary_inclusive():
    """admin_geofinder.rs:186-188: get_admins_if tests
    bound.intersects(&Point) — boundary-INCLUSIVE — while get (:101-104)
    uses exclusive contains. A node exactly on an admin edge (a shared
    OSM way/boundary node) must attach via get_admins_if."""
    from mimirsbrunn_spark.geofinder import AdminRec

    square = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    f = finder_of(
        AdminRec(id="admin:sq", zone_type="city", parent_id="admin:top", mp=[[square]]),
        AdminRec(id="admin:top", zone_type="state", parent_id=None, mp=[]),
    )
    cond = lambda rec: rec.zone_type is not None  # noqa: E731
    # (0.5, 1.0) sits exactly on the TOP edge — the even-odd ray cast puts
    # it outside (half-open convention), so `get` excludes it...
    assert f.get_ids(0.5, 1.0) == []
    # ...but the boundary-inclusive get_admins_if attaches the full branch
    branches = f.get_admins_if(0.5, 1.0, cond)
    assert [[a.id for a in br] for br in branches] == [["admin:sq", "admin:top"]]
    # vertex case
    branches = f.get_admins_if(0.0, 1.0, cond)
    assert [[a.id for a in br] for br in branches] == [["admin:sq", "admin:top"]]
    # strictly interior / exterior behave as before
    assert [[a.id for a in br] for br in f.get_admins_if(0.5, 0.5, cond)] == [["admin:sq", "admin:top"]]
    assert f.get_admins_if(2.0, 2.0, cond) == []
