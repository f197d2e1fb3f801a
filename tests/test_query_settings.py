"""Query-settings config parity: the vendored reference
config/query/default.toml parses into exactly the constants this engine
scores with, and forward_geocode(settings=...) applies overrides."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from mimirsbrunn_spark.functions import geocode as g
from mimirsbrunn_spark.gate_geocode import geocode_places_df

TOML = str(Path(__file__).parent / "data" / "query_default.toml")


def test_reference_default_toml_parses_to_engine_constants():
    s = g.load_query_settings(TOML)
    assert s["type_boosts"] == g.TYPE_BOOSTS
    assert s["global_boost"] == g.GLOBAL_BOOST
    assert s["string_boosts"] == g.STRING_BOOSTS
    # the engine folds a x12 magnitude into STRING_GLOBAL (BM25 scores
    # are O(10), coverage scores O(1)); the config value itself is 8.3e-4
    assert s["string_global"] * 12.0 == g.STRING_GLOBAL
    assert s["importance_types"] == g.IMPORTANCE_TYPES
    assert s["radius_range"] == g.RADIUS_RANGE
    assert s["min_radius_prefix"] == g.MIN_RADIUS_PREFIX
    assert s["min_radius_fuzzy"] == g.MIN_RADIUS_FUZZY
    assert s["max_radius"] == g.MAX_RADIUS
    assert s["proximity_weight"] == g.PROXIMITY_WEIGHT
    assert (s["proximity_scale_m"], s["proximity_offset_m"], s["proximity_decay"]) == (
        130_000.0, 20_000.0, 0.4,
    )
    assert s["reverse_radius_m"] == 1000.0


def test_default_settings_do_not_change_scores(spark):
    places = geocode_places_df(spark, "/root/testdata/sf0.001")
    base = g.forward_geocode(places, "St-Martin", k=20, query_type="prefix")
    withs = g.forward_geocode(
        places, "St-Martin", k=20, query_type="prefix",
        settings=g.load_query_settings(TOML),
    )
    a = [(r["id"], r["score"]) for r in base.collect()]
    b = [(r["id"], r["score"]) for r in withs.collect()]
    assert a == b


def test_settings_override_changes_ranking(spark):
    """Cranking the street type boost must put streets above admins
    (sf0.01: the match set spans all four types)."""
    places = geocode_places_df(spark, "/root/testdata/sf0.01")
    s = g.load_query_settings(TOML)
    s["type_boosts"] = dict(s["type_boosts"], street=500.0)
    out = g.forward_geocode(
        places, "St-Martin", k=5, query_type="prefix", settings=s
    )
    rows = out.collect()
    assert rows and rows[0]["type"] == "street"
    base_rows = g.forward_geocode(places, "St-Martin", k=5, query_type="prefix").collect()
    assert base_rows[0]["type"] != "street"


def test_string_boost_override_moves_match_score(spark):
    places = geocode_places_df(spark, "/root/testdata/sf0.001")
    s = g.load_query_settings(TOML)
    s["string_boosts"] = dict(s["string_boosts"], name=100.0)
    hi = g.forward_geocode(places, "St-Martin", k=3, query_type="prefix", settings=s)
    lo = g.forward_geocode(places, "St-Martin", k=3, query_type="prefix")
    hi_top = hi.select(F.max("match_score")).collect()[0][0]
    lo_top = lo.select(F.max("match_score")).collect()[0][0]
    assert hi_top > lo_top * 10


def test_unsupported_decay_func_refused(tmp_path):
    import pytest

    bad = tmp_path / "bad.toml"
    bad.write_text(
        Path(TOML).read_text().replace('func = "exp"', 'func = "gauss"')
    )
    with pytest.raises(ValueError, match="only 'exp'"):
        g.load_query_settings(str(bad))


def test_proximity_curve_override_moves_importance_weights(spark):
    """ADVICE r04: the reference's build_weight_depending_on_radius
    (dsl.rs:188-217) derives its zoom radius from the SAME settings
    curve (offset+scale) as the proximity decay — overriding the curve
    must therefore move the importance term too, not only the decay.

    With coord set and a huge scale, radius clamps to RADIUS_RANGE hi →
    pure max_radius weights; with a tiny scale+offset it clamps to lo →
    pure min_radius weights. Admin weights differ (0.002 vs 0.4 at the
    defaults), so scores on admin rows must differ."""
    places = geocode_places_df(spark, "/root/testdata/sf0.001")
    s_lo = g.load_query_settings(TOML)
    s_lo["proximity_scale_m"] = 1.0
    s_lo["proximity_offset_m"] = 0.0
    s_hi = g.load_query_settings(TOML)
    s_hi["proximity_scale_m"] = 1e9
    coord = (2.35, 48.85)
    lo = g.forward_geocode(places, "rue", k=20, coord=coord,
                           types=["admin"], query_type="prefix", settings=s_lo)
    hi = g.forward_geocode(places, "rue", k=20, coord=coord,
                           types=["admin"], query_type="prefix", settings=s_hi)
    a = {r["id"]: r["score"] for r in lo.collect()}
    b = {r["id"]: r["score"] for r in hi.collect()}
    common = sorted(set(a) & set(b))
    assert common
    # with scale=1e9 the decay term is ~flat-1 near the coord; the change
    # must not be explainable by decay alone — check that per-id score
    # DIFFERENCES are not a constant shift (importance interpolation is
    # multiplicative in the weight, decay is additive via proximity term)
    diffs = [b[i] - a[i] for i in common]
    assert max(diffs) - min(diffs) > 1e-9


def test_zoom_weights_radius_from_settings_curve():
    """Unit pin: _zoom_weights with (scale, offset) = (1, 0) clamps to
    RADIUS_RANGE lo → exactly MIN_RADIUS_PREFIX; with 1e9 clamps to hi →
    exactly MAX_RADIUS."""
    lo = g._zoom_weights("prefix", (0.0, 0.0), proximity_scale_offset=(1.0, 0.0))
    hi = g._zoom_weights("prefix", (0.0, 0.0), proximity_scale_offset=(1e9, 0.0))
    assert lo == g.MIN_RADIUS_PREFIX
    assert hi == g.MAX_RADIUS
