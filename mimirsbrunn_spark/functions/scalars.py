"""Scalar column functions completing SURVEY §2.8 (C2, C7, C8, C9, A3, W4).

All pure Column expressions (JVM, codegen)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def i18n_labels(name_col: Column | str, names_map: Column | str, city_names: Column | str,
                langs: list[str]) -> Column:
    """C2 — per-language labels (labels.rs:29-42): for each lang, use the
    localized admin/city name when present; langs whose result equals the
    default label are skipped (format_international_poi_label
    labels.rs:93-119). Returns map<lang, label>."""
    name = F.col(name_col) if isinstance(name_col, str) else name_col
    names = F.col(names_map) if isinstance(names_map, str) else names_map
    cities = F.col(city_names) if isinstance(city_names, str) else city_names
    default = name
    entries = []
    for lang in langs:
        loc_name = F.coalesce(names[lang], name)
        loc_city = cities[lang]
        label = F.when(
            loc_city.isNotNull(), F.concat(loc_name, F.lit(" ("), loc_city, F.lit(")"))
        ).otherwise(loc_name)
        entries.append((lang, label))
    pairs = F.array(*[
        F.when(label != default, F.struct(F.lit(lang).alias("k"), label.alias("v")))
        for lang, label in entries
    ])
    kept = F.filter(pairs, lambda s: s.isNotNull())
    return F.map_from_entries(kept)


def codes_from_tags(tags: Column | str) -> Column:
    """C7 — extract ISO3166 / ref:* / wikidata codes from an OSM tag map
    (osm_utils.rs:69-78)."""
    t = F.col(tags) if isinstance(tags, str) else tags
    return F.map_filter(
        t,
        lambda k, v: k.startswith("ISO3166") | k.startswith("ref:") | (k == "wikidata"),
    )


def i18n_names_from_tags(tags: Column | str, langs: list[str], prefix: str = "name:") -> Column:
    """C8 — language-suffixed names from tags filtered by a lang allowlist
    (osm_utils.rs:80-95): ``name:{lang}`` keys → map<lang, value>."""
    t = F.col(tags) if isinstance(tags, str) else tags
    start = F.lit(len(prefix) + 1)

    def _suffix(k):
        # full suffix after the prefix — a fixed-width substring would
        # silently never match langs longer than the width AND collide
        # two keys sharing a truncated suffix into duplicate map keys
        return k.substr(start, F.length(k))

    filtered = F.map_filter(t, lambda k, v: k.startswith(prefix) & _suffix(k).isin(langs))
    entries = F.transform(
        F.map_entries(filtered),
        lambda e: F.struct(_suffix(e["key"]).alias("k"), e["value"].alias("v")),
    )
    return F.map_from_entries(entries)


def country_code_from_codes(codes: Column | str) -> Column:
    """C9 — lowercase ISO3166-1:alpha2 country code from the codes map
    (libs/places/src/utils.rs get_country_code)."""
    c = F.col(codes) if isinstance(codes, str) else codes
    return F.lower(c["ISO3166-1:alpha2"])


def population_weight(tags: Column | str, center_tags: Column | str | None = None) -> Column:
    """A3 — population from tags (fallback center_tags), as a double; 0
    when unparseable (src/admin.rs:113-122)."""
    t = F.col(tags) if isinstance(tags, str) else tags
    pop = t["population"].try_cast("double")
    if center_tags is not None:
        ct = F.col(center_tags) if isinstance(center_tags, str) else center_tags
        pop = F.coalesce(pop, ct["population"].try_cast("double"))
    return F.coalesce(pop, F.lit(0.0))


def human_sort_key(s: Column | str) -> Column:
    """W4 — natural-sort key (stop.rs:168-195 line ordering): every digit
    run is rewritten so lexicographic order == numeric order for runs of
    ANY length ('2' < '10', 'A2' < 'A10')."""
    c = F.col(s) if isinstance(s, str) else s
    return _human_sort_key_expr(c)


def _human_sort_key_expr(c: Column) -> Column:
    # split into digit/non-digit runs; each digit run becomes
    # char(len(len)) || len || digits (leading zeros stripped) — a
    # two-level length prefix: the first char encodes how many digits the
    # length itself has (monotone single char, '1'..':'), then the length,
    # then the digits. Shorter numbers sort first, equal lengths compare
    # digit-wise, so ordering is pure numeric value with NO width cap — a
    # fixed-width lpad would silently TRUNCATE the length of runs beyond
    # the pad width (lpad truncates long inputs), reordering long ids.
    def _key(part):
        trimmed = F.regexp_replace(part, "^0+", "")
        n = F.length(trimmed).cast("string")
        return F.concat(F.char(F.length(n) + F.lit(48)), n, trimmed)

    return F.array_join(
        F.transform(
            F.split(F.lower(c), r"(?<=\D)(?=\d)|(?<=\d)(?=\D)"),
            lambda part: F.when(part.rlike("^[0-9]+$"), _key(part)).otherwise(part),
        ),
        "",
    )


def sort_lines(lines: Column | str) -> Column:
    """W4 — order stop lines by (sort_order nulls-last, human(code),
    human(name)) (stop.rs:168-195). Expects array<struct<sort_order:int,
    code:string, name:string,...>>; returns the sorted array."""
    ls = F.col(lines) if isinstance(lines, str) else lines
    keyed = F.transform(
        ls,
        lambda l: F.struct(
            F.coalesce(l["sort_order"].cast("long"), F.lit(2**60)).alias("k1"),
            _human_sort_key_expr(F.coalesce(l["code"], F.lit(""))).alias("k2"),
            _human_sort_key_expr(F.coalesce(l["name"], F.lit(""))).alias("k3"),
            l.alias("line"),
        ),
    )
    return F.transform(F.array_sort(keyed), lambda s: s["line"])
