"""Randomized sweep of the S10 partial-update sink (`merge_update` +
`apply_dotted_updates`, storage.rs:99-126 / update.rs:11-39) against
pure-Python oracles, over shapes the `merge_update` gate's closed-form
generator never produces: null-ridden targets (null scalars, null
whole-structs, null nested structs), partial update batches carrying a
random COLUMN SUBSET, whole-struct Sets racing column merges, update
keys absent from the target (inserts for merge_update, no-ops for
dotted updates), and multi-op (key, ident) streams ordered by ``seq``.

Oracle = dict arithmetic reimplementing the documented semantics
directly: non-null update columns win (merge), last-by-seq write wins
per (key, ident) with intermediate null structs materialized as
all-null objects (dotted). Out of scope by documented contract: a Set
op whose VALUE is null (the pivot cannot distinguish it from "no op
for this path" — callers encode deletes as typed sentinel values, as
the reference's config-sourced ops are non-null JSON scalars).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T

from mimirsbrunn_spark.sources.lifecycle import apply_dotted_updates, merge_update

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField(
            "props",
            T.StructType(
                [
                    T.StructField("image", T.StringType()),
                    T.StructField(
                        "gallery",
                        T.StructType(
                            [
                                T.StructField("url", T.StringType()),
                                T.StructField("n", T.LongType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)

_NAMES = [None, "", "poi", "gare de lyon", "祇園", "café"]
_URLS = [None, "http://a/1", "s3://b/2", ""]


def _rand_props(rng: random.Random):
    if rng.random() < 0.25:
        return None
    gallery = (
        None
        if rng.random() < 0.3
        else {"url": rng.choice(_URLS), "n": rng.choice([None, 0, 7, -3])}
    )
    return {"image": rng.choice(_URLS), "gallery": gallery}


def _rand_target(rng: random.Random, n: int):
    return [
        {
            "id": i,
            "name": rng.choice(_NAMES),
            "weight": rng.choice([None, 0.0, 0.5, -1.25]),
            "props": _rand_props(rng),
        }
        for i in range(n)
    ]


def _norm(row):
    """Row → plain nested dict (None-filled structs stay dicts)."""
    d = row.asDict(recursive=True)
    return d


@pytest.mark.parametrize("seed", [11, 37, 83, 191])
def test_merge_update_matches_dict_merge(spark, seed):
    rng = random.Random(seed)
    n = 20
    target_rows = _rand_target(rng, n)
    target = spark.createDataFrame(target_rows, TARGET_SCHEMA)

    # a random column subset rides in the update batch (partial documents);
    # id always present, one row per key (duplicates are refused — unit-
    # covered elsewhere), keys half existing / half new inserts
    upd_cols = [c for c in ("name", "weight", "props") if rng.random() < 0.7] or ["name"]
    upd_schema = T.StructType(
        [TARGET_SCHEMA["id"]] + [TARGET_SCHEMA[c] for c in upd_cols]
    )
    keys = rng.sample(range(n), k=8) + [n + j for j in range(4)]
    upd_rows = []
    for k in keys:
        r = {"id": k}
        for c in upd_cols:
            if c == "name":
                r[c] = rng.choice(_NAMES)
            elif c == "weight":
                r[c] = rng.choice([None, 2.5, -0.75])
            else:
                r[c] = _rand_props(rng)
        upd_rows.append(r)
    updates = spark.createDataFrame(upd_rows, upd_schema)

    # oracle: dict merge — non-null update columns win; new keys are
    # null-padded partial inserts
    expected = {r["id"]: dict(r) for r in target_rows}
    for r in upd_rows:
        k = r["id"]
        if k in expected:
            for c in upd_cols:
                if r[c] is not None:
                    expected[k][c] = r[c]
        else:
            expected[k] = {
                c.name: r.get(c.name) for c in TARGET_SCHEMA.fields
            }

    got = {r["id"]: _norm(r) for r in merge_update(target, updates, "id").collect()}
    assert set(got) == set(expected), f"seed {seed}: key sets differ"
    for k in expected:
        # struct values compare as nested dicts; a whole-struct update
        # must replace wholesale, not field-merge
        assert got[k] == expected[k], f"seed {seed} key {k}: {got[k]} != {expected[k]}"


def _oracle_dotted(target_rows, ops):
    """Pure-Python replay: last-by-seq write per (key, ident); missing
    intermediate objects materialize as all-null structs; keys absent
    from the target are no-ops (dotted updates never insert)."""
    last = {}
    for op in ops:
        key = (op["id"], op["ident"])
        if key not in last or op["seq"] > last[key]["seq"]:
            last[key] = op
    out = {r["id"]: {**r} for r in target_rows}
    for (doc, ident), op in sorted(last.items(), key=lambda kv: (kv[0][1].count("."), kv[0][1])):
        if doc not in out:
            continue
        val = op["value"]
        path = ident.split(".")
        if path == ["name"]:
            out[doc]["name"] = val
            continue
        assert path[0] == "props"
        props = out[doc]["props"]
        if props is None:
            props = {"image": None, "gallery": None}
        else:
            props = dict(props)
        if path[1] == "image":
            props["image"] = val
        else:
            gal = props["gallery"]
            gal = {"url": None, "n": None} if gal is None else dict(gal)
            if path[2] == "url":
                gal["url"] = val
            else:
                gal["n"] = int(val)  # string op value cast to the long field
            props["gallery"] = gal
        out[doc]["props"] = props
    return out


@pytest.mark.parametrize("seed", [5, 59, 127, 211])
def test_apply_dotted_updates_matches_nested_replay(spark, seed):
    rng = random.Random(seed)
    n = 18
    target_rows = _rand_target(rng, n)
    target = spark.createDataFrame(target_rows, TARGET_SCHEMA)

    idents = ["name", "props.image", "props.gallery.url", "props.gallery.n"]
    ops = []
    for seq in range(30):  # unique seq → deterministic last-write-wins
        ident = rng.choice(idents)
        ops.append(
            {
                # some ops target absent keys — ignored, never inserted
                "id": rng.randrange(n + 4),
                "ident": ident,
                "value": str(rng.randrange(100))
                if ident.endswith(".n")
                else rng.choice(["x", "réu", "http://z", ""]),
                "seq": seq,
            }
        )
    updates = spark.createDataFrame(
        ops, "id long, ident string, value string, seq long"
    )

    expected = _oracle_dotted(target_rows, ops)
    got = {
        r["id"]: _norm(r) for r in apply_dotted_updates(target, updates, "id").collect()
    }
    assert set(got) == set(expected), f"seed {seed}: dotted updates changed the key set"
    for k in expected:
        assert got[k] == expected[k], f"seed {seed} key {k}: {got[k]} != {expected[k]}"
