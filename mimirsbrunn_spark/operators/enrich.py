"""Enrichment operators: labels, zip codes, weights, ids, street dedup.

Re-expresses the reference's per-document enrichment (applied between
the PIP join and the sink in every *2mimir pipeline) as pure Column
expressions over the ``admins`` array attached by operators/pip.py —
all JVM-side higher-order functions, no Python.

The ``admins`` array column is expected to be
``array<struct<id,name,level,zone_type,zip_codes,weight>>`` in
attachment order (zone rank ascending — city first), as produced by
``attach_admin_structs``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# cosmogony zone rank (geofinder.ZONE_TYPE_RANK, kept in sync)
_ZONE_RANK_SQL = (
    "CASE {c} WHEN 'suburb' THEN 0 WHEN 'city_district' THEN 1 WHEN 'city' THEN 2"
    " WHEN 'state_district' THEN 3 WHEN 'state' THEN 4 WHEN 'country_region' THEN 5"
    " WHEN 'country' THEN 6 WHEN 'non_administrative' THEN 7 ELSE -1 END"
)


def city_admin(admins: Column | str = "admins") -> Column:
    """First admin with zone_type city — the label/weight source
    (street.rs:74-84 set_weight_from_admins; labels.rs city pick)."""
    a = F.col(admins) if isinstance(admins, str) else admins
    cities = F.filter(a, lambda x: x["zone_type"] == "city")
    return F.try_element_at(cities, F.lit(1))


def format_label(name: Column | str, admins: Column | str = "admins") -> Column:
    """C1 — ``"{name} ({city})"`` (labels.rs:8-20): append the city admin's
    name in parentheses when present, else the bare name."""
    name = F.col(name) if isinstance(name, str) else name
    city = city_admin(admins)
    return F.when(city.isNotNull(), F.concat(name, F.lit(" ("), city["name"], F.lit(")"))).otherwise(
        name
    )


# Countries whose public address-formatter template puts the house number
# before the road (the OpenCageData address-formatting templates the
# reference's address_formatter crate embeds); everything else uses the
# reference's street-first default_name.
HN_FIRST_COUNTRIES = ["fr", "gb", "us", "ca", "au", "nz", "ie", "lu"]


def format_addr_name(
    house_number: Column | str,
    street: Column | str,
    country_code: Column | str | None = None,
) -> Column:
    """C3 — address_formatter port (labels.rs:75-89): the DEFAULT format
    is street-first ``"{street} {hn}"`` (``default_name``,
    labels.rs:121-124 — "the most common format (but not correct for
    france)"); countries whose template is house-number-first (France
    among them) flip to ``"{hn} {street}"``. Golden vectors ported from
    labels.rs tests: fr_addr → "20 rue hector malot"; nl_addr →
    "Herengracht 573"."""
    hn = F.col(house_number) if isinstance(house_number, str) else house_number
    st = F.col(street) if isinstance(street, str) else street
    if country_code is None:
        cc = F.lit(None).cast("string")
    elif isinstance(country_code, str):
        cc = F.lit(country_code.lower())
    else:
        cc = F.lower(country_code)
    return (
        F.when(hn.isNull() | (F.trim(hn) == ""), st)
        .when(cc.isin(HN_FIRST_COUNTRIES), F.concat_ws(" ", F.trim(hn), st))
        .otherwise(F.concat_ws(" ", st, F.trim(hn)))
    )


def zip_codes_from_admins(admins: Column | str = "admins") -> Column:
    """A1 — zips of the *max level having nonempty zip_codes*
    (libs/places/src/admin.rs:85-101): fold to find that level, then
    flatten exactly that level's zips."""
    a = F.col(admins) if isinstance(admins, str) else admins
    with_zips = F.filter(a, lambda x: F.size(x["zip_codes"]) > 0)
    max_level = F.array_max(F.transform(with_zips, lambda x: x["level"]))
    chosen = F.filter(with_zips, lambda x: x["level"] == max_level)
    return F.when(F.size(with_zips) > 0, F.flatten(F.transform(chosen, lambda x: x["zip_codes"]))).otherwise(
        F.array().cast("array<string>")
    )


def normalize_weight(weight: Column | str) -> Column:
    """A2 — clamp(weight / 1.4e9, 0, 1) (admin.rs:19,104-113; China's
    population as the normalizer)."""
    w = F.col(weight) if isinstance(weight, str) else weight
    return F.least(F.greatest(w / F.lit(1.4e9), F.lit(0.0)), F.lit(1.0))


def weight_from_city(admins: Column | str = "admins", fallback: Column | None = None) -> Column:
    """A4/A5 — take the city admin's weight, else keep the fallback
    (street.rs:74-84, poi.rs:269-279)."""
    city = city_admin(admins)
    fb = fallback if fallback is not None else F.lit(0.0)
    return F.when(city.isNotNull(), city["weight"]).otherwise(fb)


def split_zip_codes(zip_col: Column | str) -> Column:
    """C5 — split on ';', drop empties, sort (osm_reader/admin.rs:74-85;
    bano.rs:111 splits the BANO zip field the same way)."""
    z = F.col(zip_col) if isinstance(zip_col, str) else zip_col
    return F.array_sort(F.filter(F.split(z, ";"), lambda x: x != F.lit("")))


def format_zip_label(zips: Column | str) -> Column:
    """C4 — ``"(z)"`` for one zip, ``"(z1-z2)"`` for a range
    (osm_reader/admin.rs:62-72); empty string when no zips."""
    z = F.col(zips) if isinstance(zips, str) else zips
    first = F.try_element_at(z, F.lit(1))
    last = F.try_element_at(z, F.lit(-1))
    return (
        F.when(F.size(z) == 0, F.lit(""))
        .when(F.size(z) == 1, F.concat(F.lit(" ("), first, F.lit(")")))
        .otherwise(F.concat(F.lit(" ("), first, F.lit("-"), last, F.lit(")")))
    )


def addr_id(lon: Column | str, lat: Column | str, house_number: Column | str,
            id_precision: int = 0) -> Column:
    """C6 — ``addr:{lon};{lat}:{hn}`` with whitespace stripped from the
    house number and [/.:;] mapped to '-' (bano.rs:130-137). The
    stripped set is the reference's EXACT charset ``[' ','\\t','\\r',
    '\\n']`` — NOT regex ``\\s``, which would also strip ``\\x0B``/
    ``\\f`` and change the id of a house number carrying one. With
    ``id_precision > 0``, coordinates are fixed-point-formatted to that
    many decimals (the OpenAddresses precision-trimmed id variant,
    openaddresses.rs:101-117)."""
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    hn = F.col(house_number) if isinstance(house_number, str) else house_number
    cleaned = F.regexp_replace(F.regexp_replace(hn, "[ \t\r\n]+", ""), r"[/.:;]", "-")
    if id_precision > 0:
        fmt = f"%.{id_precision}f"
        lon_s = F.format_string(fmt, lon)
        lat_s = F.format_string(fmt, lat)
    else:
        lon_s, lat_s = lon.cast("string"), lat.cast("string")
    return F.concat(F.lit("addr:"), lon_s, F.lit(";"), lat_s, F.lit(":"), cleaned)


def admin_id(osm_id: Column | str, insee: Column | str | None = None,
             french_id_retrocompatibility: bool = False) -> Column:
    """J4 — admin id formatting (src/admin.rs:140-147): normally
    ``admin:osm:{id}``; with the french retro-compat flag, admins that
    carry an INSEE become ``admin:fr:{insee}`` (Navitia compatibility)."""
    oid = F.col(osm_id) if isinstance(osm_id, str) else osm_id
    base = F.concat(F.lit("admin:osm:"), oid)
    if not french_id_retrocompatibility or insee is None:
        return base
    ins = F.col(insee) if isinstance(insee, str) else insee
    return F.when(
        ins.isNotNull() & (F.length(ins) > 0), F.concat(F.lit("admin:fr:"), ins)
    ).otherwise(base)


def insee_fantoir(id_col: Column | str) -> tuple[Column, Column]:
    """F6 — insee = id[..5] with leading zeros stripped; fantoir = id[..10]
    (bano.rs:56-63)."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    insee = F.regexp_replace(F.substring(i, 1, 5), "^0+", "")
    fantoir = F.substring(i, 1, 10)
    return insee, fantoir


def dedup_streets(streets: DataFrame, name_col: str = "name", city_col: str = "city_id",
                  order_col: str = "ingest_order", id_col: str = "street_id") -> DataFrame:
    """W1 + W2 — street dedup by (name, city) keeping earliest insertion
    (street.rs:89-104: relations sort before ways, then osm id — callers
    encode that in ``order_col``), then unique-id suffixing ``id-{i}`` for
    ids shared across cities (street.rs:108-133)."""
    from pyspark.sql import Window

    w_dedup = Window.partitionBy(name_col, city_col).orderBy(F.col(order_col).asc())
    deduped = (
        streets.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    w_id = Window.partitionBy(id_col).orderBy(F.col(city_col).asc())
    w_cnt = Window.partitionBy(id_col)
    return (
        deduped.withColumn("__i", F.row_number().over(w_id) - 1)
        .withColumn("__n", F.count("*").over(w_cnt))
        .withColumn(
            id_col,
            F.when(F.col("__n") > 1, F.concat(F.col(id_col), F.lit("-"), F.col("__i"))).otherwise(
                F.col(id_col)
            ),
        )
        .drop("__i", "__n")
    )


def attach_admin_structs(attached: DataFrame, admins: DataFrame,
                         admin_ids_col: str = "admin_ids") -> DataFrame:
    """Resolve the ``admin_ids`` array from attach_admins into an ordered
    ``admins`` array<struct> (id, name, level, zone_type, zip_codes,
    weight) — the denormalized administrative_regions of the reference
    (SURVEY §1.4). Broadcast map-join via a scala map literal is overkill;
    explode + broadcast equi-join + re-collect keeps Catalyst in charge."""
    slim = admins.select(
        F.col("id").alias("__aid"),
        F.struct(
            F.col("id"), F.col("name"), F.col("level"), F.col("zone_type"),
            F.col("zip_codes"), F.col("weight"),
        ).alias("__astruct"),
    )
    # Deterministic, content-derived uid: monotonically_increasing_id is
    # nondeterministic and this plan evaluates `base` in two branches —
    # under task retry / AQE replanning the ids could diverge between the
    # branches and silently mis-zip rows. Two independent 64-bit hashes of
    # the row make collisions of *distinct* rows negligible even at
    # 100 TB. Map-typed columns are excluded (Spark forbids hashing maps);
    # that is safe: rows colliding on the uid are then identical in every
    # non-map column — including admin_ids — so their aggregated admins
    # arrays are identical, and the join fans each row back out with its
    # own map values intact.
    from pyspark.sql import types as T

    hash_cols = [
        F.col(f.name) for f in attached.schema.fields if not isinstance(f.dataType, T.MapType)
    ]
    uid = F.concat_ws("_", F.xxhash64(*hash_cols), F.xxhash64(F.lit(0x9E3779B9), *hash_cols))
    base = attached.withColumn("__uid", uid)
    exploded = base.select("__uid", F.posexplode(admin_ids_col).alias("__pos", "__aid"))
    resolved = (
        exploded.join(F.broadcast(slim), "__aid")
        .groupBy("__uid")
        .agg(
            F.transform(
                # array_distinct: identical input rows share a content uid,
                # so each contributes an identical (pos, struct) set — keep
                # one copy per position.
                F.array_distinct(F.sort_array(F.collect_list(F.struct("__pos", "__astruct")))),
                lambda s: s["__astruct"],
            ).alias("admins")
        )
    )
    return (
        base.join(resolved, "__uid", "left")
        .withColumn("admins", F.coalesce("admins", F.array().cast(resolved.schema["admins"].dataType)))
        .drop("__uid")
    )


def enrich_addresses(attached: DataFrame, country_code: Column | str = "fr",
                     id_is_fantoir: bool = True, id_precision: int = 0) -> DataFrame:
    """The bano2mimir enrichment block (bano.rs:64-150) over attached
    addresses: name/label (C1/C3), zips (C5 + A1 fallback), weight (A4),
    id (C6), insee/fantoir (F6). Expects columns: id, house_number,
    street, zip, lon, lat + ``admins`` array (attach_admin_structs).

    ``country_code`` (column or literal, default "fr" — BANO is a French
    dataset) keys the C3 name template; the reference derives it from the
    attached admins' ISO codes the same way.

    ``id_is_fantoir``: the F6 insee/fantoir slicing is a property of
    BANO's FANTOIR-shaped ids — OpenAddresses ids are hashes, so its
    indexer leaves both fields empty (openaddresses.rs has no F6);
    pass False for OA-shaped sources. ``id_precision`` feeds the C6
    fixed-point addr_id variant (openaddresses.rs:101-117)."""
    name = format_addr_name("house_number", "street", country_code)
    if id_is_fantoir:
        insee, fantoir = insee_fantoir("id")
    else:
        insee, fantoir = F.lit(None).cast("string"), F.lit(None).cast("string")
    own_zips = split_zip_codes("zip")
    zips = F.when(F.size(own_zips) > 0, own_zips).otherwise(zip_codes_from_admins())
    return (
        attached.withColumn("name", name)
        .withColumn("label", format_label("name"))
        .withColumn("zip_codes", zips)
        .withColumn("weight", weight_from_city())
        .withColumn("insee", insee)
        .withColumn("fantoir", fantoir)
        .withColumn(
            "addr_id",
            addr_id("lon", "lat", "house_number", id_precision=id_precision),
        )
    )
