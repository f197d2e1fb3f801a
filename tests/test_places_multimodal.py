"""Street/POI/stop pipelines, multimodal stubs, ANN similarity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def octagon_admins(spark):
    from mimirsbrunn_spark import schemas
    from mimirsbrunn_spark.datagen import gen_admins

    pdf = gen_admins()
    return spark.createDataFrame(
        [tuple(r) for r in pdf.itertuples(index=False, name=None)], schema=schemas.ADMINS
    )


def test_streets_pipeline_semantics(spark, octagon_admins):
    """osm2mimir.rs:274-348 semantics: same-name merge (min id wins),
    bus_stop exclusion, nameless exclusion, boundary crossing → one row
    per city with suffixed ids."""
    from mimirsbrunn_spark.operators.places import streets_pipeline

    # city0:0:0 octagon at (-156,-16) size 0.4: interior ~(-154.4,-14.4)
    inside1 = [{"lon": -154.4, "lat": -14.4}, {"lon": -154.5, "lat": -14.5}]
    # a way whose middle node is in city0:0:1 (tx=-152+... octagon at (-152,-16))
    inside2 = [{"lon": -150.4, "lat": -14.4}]
    rows = [
        (1001, "way", "Rue A", "residential", None, inside1),
        (1002, "way", "Rue A", "residential", None, inside1),   # same name+city → merged, min id
        (1003, "way", None, "residential", None, inside1),      # nameless → dropped
        (1004, "way", "Rue B", "bus_stop", None, inside1),      # excluded highway → dropped
        (1005, "way", "Rue C", "residential", None, inside2),   # other city
    ]
    from mimirsbrunn_spark.schemas import STREETS_RAW

    df = spark.createDataFrame(rows, STREETS_RAW)
    out = streets_pipeline(df, octagon_admins).collect()
    names = sorted(r["name"] for r in out)
    assert names == ["Rue A", "Rue C"]
    rue_a = [r for r in out if r["name"] == "Rue A"][0]
    assert rue_a["street_id"] == "street:osm:way:1001"  # min id wins
    assert rue_a["city_id"] == "admin:osm:city:0:0:0"
    assert rue_a["branch_admin_ids"][0] == "admin:osm:city:0:0:0"
    assert "admin:osm:country:0" in rue_a["branch_admin_ids"]  # full parent chain


def test_street_boundary_crossing_one_row_per_city(spark, octagon_admins):
    from mimirsbrunn_spark.operators.places import streets_pipeline

    # overlap region of the two same-zone-type octagons (40/43 offsets):
    # middle node at (46,46) is inside both overlapA and overlapB
    nodes = [{"lon": 46.0, "lat": 46.0}]
    from mimirsbrunn_spark.schemas import STREETS_RAW

    df = spark.createDataFrame([(2001, "way", "Rue Frontière", "residential", None, nodes)], STREETS_RAW)
    out = streets_pipeline(df, octagon_admins).collect()
    assert len(out) == 2  # indexed once per city (osm2mimir.rs:336-348)
    ids = sorted(r["street_id"] for r in out)
    assert ids == ["street:osm:way:2001-0", "street:osm:way:2001-1"]
    cities = sorted(r["city_id"] for r in out)
    assert cities == ["admin:osm:overlap:a", "admin:osm:overlap:b"]


def test_street_zero_branches_not_built(spark, octagon_admins):
    """street.rs:255-266/:282-289: get_street_admin returning an empty
    Vec means the caller's `for admins in …` loop never builds the
    street — an ocean probe, an all-unresolvable node list, and a
    missing node list all produce no output row."""
    from mimirsbrunn_spark.operators.places import streets_pipeline

    rows = [
        # probe node far outside every fixture octagon
        (3001, "way", "Rue Ocean", "residential", None, [{"lon": 0.0, "lat": -89.0}]),
        # empty node list
        (3002, "way", "Rue Vide", "residential", None, []),
        # null node list (nullable schema variant: a reader that allows it)
        (3003, "way", "Rue Nulle", "residential", None, None),
        # all nodes unresolvable (null coords)
        (3004, "way", "Rue Irres", "residential", None, [{"lon": None, "lat": None}]),
        # control: resolvable node inside city0_0_0
        (3005, "way", "Rue OK", "residential", None, [{"lon": -154.4, "lat": -14.4}]),
    ]
    df = spark.createDataFrame(
        rows,
        "osm_id long, kind string, name string, highway string, "
        "public_transport string, node_points array<struct<lon:double,lat:double>>",
    )
    out = streets_pipeline(df, octagon_admins).collect()
    assert [r["name"] for r in out] == ["Rue OK"]


def test_poi_classification_first_match_and_fallbacks(spark, octagon_admins):
    from mimirsbrunn_spark.operators.places import classify_pois, pois_pipeline
    from mimirsbrunn_spark.schemas import POIS_RAW

    rows = [
        (1, "node", {"amenity": "parking", "name": "P1"}, -154.4, -14.4),
        (2, "node", {"amenity": "townhall"}, -154.4, -14.4),                # no name → type name
        (3, "node", {"shop": "bakery", "name": "X"}, -154.4, -14.4),        # unmatched → dropped
        (4, "node", {"leisure": "garden", "name": "G", "addr:postcode": "99999"}, -154.4, -14.4),
    ]
    df = spark.createDataFrame(rows, POIS_RAW)
    classified = classify_pois(df)
    assert classified.count() == 3
    out = {r["osm_id"]: r for r in pois_pipeline(df, octagon_admins).collect()}
    assert out[2]["name"] == "town hall"            # poi.rs:214-217 fallback
    assert out[4]["zip_codes"] == ["99999"]         # poi.rs:220-223 override
    assert out[1]["zip_codes"] == ["10001"]         # admin zips
    assert out[1]["label"] == "P1 (city0_0_0)"


def test_poi_nearest_address_join(spark, octagon_admins):
    from mimirsbrunn_spark.operators.places import pois_pipeline
    from mimirsbrunn_spark.schemas import POIS_RAW

    pois = spark.createDataFrame(
        [(1, "node", {"amenity": "parking", "name": "P"}, -154.4, -14.4),
         (2, "node", {"amenity": "parking", "name": "Q"}, -150.4, -14.4)],
        POIS_RAW,
    )
    addrs = spark.createDataFrame(
        [("addr:1", -154.4005, -14.4)],  # ~54 m from P, ~430 km from Q
        "addr_id string, lon double, lat double",
    )
    out = {r["osm_id"]: r for r in pois_pipeline(pois, octagon_admins, addrs).collect()}
    assert out[1]["nearest_addr_id"] == "addr:1"
    assert out[1]["nearest_addr_distance_m"] < 100
    assert out[2]["nearest_addr_id"] is None  # beyond max_distance_reverse → kept without address


def test_stops_weights(spark, octagon_admins):
    from mimirsbrunn_spark.operators.places import stops_pipeline
    from mimirsbrunn_spark.schemas import STOPS_RAW

    rows = [
        ("SA:1", "Gare", -154.4, -14.4, ["sp1", "sp2", "sp3", "sp4"], ["Metro", "Bus"]),
        ("SA:2", "Arret", -154.5, -14.5, ["sp5"], ["Bus"]),
    ]
    df = spark.createDataFrame(rows, STOPS_RAW)
    out = {r["stop_area_id"]: r for r in stops_pipeline(df, octagon_admins).collect()}
    # make_weight parity (stops.rs:138-160): RAW mode sums 6.0 and 1.0
    # (Metro 5 + Bus 1; Bus 1) averaged with the city weight 0.2 — the
    # reference never normalizes by the corpus max
    assert out["SA:1"]["mode_weight"] == 6.0
    assert out["SA:2"]["mode_weight"] == 1.0
    assert abs(out["SA:1"]["weight"] - (6.0 + 0.2) / 2) < 1e-9
    assert abs(out["SA:2"]["weight"] - (1.0 + 0.2) / 2) < 1e-9
    assert out["SA:1"]["label"] == "Gare (city0_0_0)"


def test_insee_override(spark, octagon_admins):
    from mimirsbrunn_spark.operators.enrich import attach_admin_structs
    from mimirsbrunn_spark.operators.pip import attach_admins
    from mimirsbrunn_spark.operators.places import insee_override

    pts = spark.createDataFrame(
        [(-154.4, -14.4, "10001")], "lon double, lat double, insee string"
    )
    resolved = attach_admin_structs(attach_admins(pts, octagon_admins), octagon_admins)
    # override with a DIFFERENT admin that has insee 10001... use 10002's insee
    pts2 = pts.withColumn("insee", F.lit("10002"))
    resolved2 = attach_admin_structs(attach_admins(pts2, octagon_admins), octagon_admins)
    out = insee_override(resolved2, octagon_admins).collect()[0]
    ids = [a["id"] for a in out["admins"]]
    # the level-8 admin got replaced by the insee-10002 city, appended last
    assert ids[-1] == "admin:osm:city:0:0:1"
    assert "admin:osm:city:0:0:0" not in ids


def test_resolve_admin_hierarchy(spark, octagon_admins):
    from mimirsbrunn_spark.operators.places import resolve_admin_hierarchy

    out = {r["id"]: r["parent_ids"] for r in resolve_admin_hierarchy(octagon_admins).collect()}
    assert out["admin:osm:city:0:0:0"] == ["admin:osm:state:0:0", "admin:osm:country:0"]
    assert out["admin:osm:country:0"] == []


def test_multimodal_stub_plumbing(spark, fixtures_dir):
    from mimirsbrunn_spark.operators.multimodal import (
        decode_image, image_features, media_table_from_docs, sample_video_frames,
    )

    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    media = media_table_from_docs(docs)
    kinds = {r["media_kind"] for r in media.select("media_kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"} and len(kinds) >= 2

    decoded = decode_image(media, width=8, height=8)
    row = decoded.first()
    assert len(row["pixels"]) == 64 and row["width"] == 8
    feats = image_features(decoded, dim=4)
    assert len(feats.first()["embedding"]) == 4

    frames = sample_video_frames(media)
    if media.filter(F.col("media_kind") == "video").count() > 0:
        assert frames.count() >= 1
        assert len(frames.first()["frame"]) == 32

    # strict mode: codec absence surfaces as NotImplementedError, not a silent fake
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        decode_image(media, strict=True).count()


def test_ann_lsh_matches_bruteforce_topk(spark):
    from mimirsbrunn_spark.operators.similarity import ann_lsh_topk, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(queries, emb, k=3)
    # near-orthogonal random embeddings are the LSH worst case: per-bit
    # collision ~0.6 → use few bits + many tables to get usable recall
    approx = ann_lsh_topk(queries, emb, k=3, bits=4, tables=12, dim=64)
    e = {(r["query_vec"], r["neighbor_vec"]) for r in exact.collect()}
    a = {(r["query_vec"], r["neighbor_vec"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"ANN recall too low: {recall}"
    # and the scores it does return are the exact cosines
    ex = {(r["query_vec"], r["neighbor_vec"]): r["cosine"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["query_vec"], r["neighbor_vec"])
        if key in ex:
            assert abs(ex[key] - r["cosine"]) < 1e-9


def test_multimodal_audio_stub_plumbing(spark, fixtures_dir):
    from mimirsbrunn_spark.operators.multimodal import (
        audio_features, decode_audio, media_table_from_docs,
    )

    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    media = media_table_from_docs(docs)
    decoded = decode_audio(media, sample_rate=4000, seconds=0.5)
    rows = decoded.limit(5).collect()
    assert rows and all(len(r["waveform"]) == 2000 and r["sample_rate"] == 4000 for r in rows)
    assert all(-1.0 <= v <= 1.0 for v in rows[0]["waveform"][:50])
    feats = audio_features(decoded.limit(5), n_bands=8).collect()
    assert all(len(r["embedding"]) == 8 for r in feats)
    # determinism: same media_ref → same embedding
    again = audio_features(decode_audio(media, sample_rate=4000, seconds=0.5).limit(5), n_bands=8).collect()
    assert {r["media_ref"]: r["embedding"] for r in feats} == {r["media_ref"]: r["embedding"] for r in again}
    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_audio(media, strict=True).count()


def test_resize_image_block_mean(spark, fixtures_dir):
    from mimirsbrunn_spark.operators.multimodal import (
        decode_image, media_table_from_docs, resize_image,
    )
    import numpy as np

    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    media = media_table_from_docs(docs)
    decoded = decode_image(media, width=16, height=16)
    small = resize_image(decoded, out_width=4, out_height=4)
    a = {r["media_ref"]: r for r in decoded.limit(3).collect()}
    b = {r["media_ref"]: r for r in small.filter(
        small["media_ref"].isin(list(a))).collect()}
    for ref, row in a.items():
        big = np.array(row["pixels"], dtype=np.float32).reshape(16, 16)
        want = big.reshape(4, 4, 4, 4).mean(axis=(1, 3)).ravel()
        got = np.array(b[ref]["pixels"], dtype=np.float32)
        assert b[ref]["width"] == 4 and b[ref]["height"] == 4
        assert np.allclose(got, want, atol=1e-6)


def test_codec_backend_selection_with_injected_modules():
    """VERDICT r02 #6: the decoder factories must pick the REAL codec when
    the wheel is importable and the deterministic fake otherwise — proven
    with injected stand-in modules (no Spark, no wheels needed)."""
    import io

    import numpy as np
    import pytest

    from mimirsbrunn_spark.operators.multimodal import (
        audio_decoder, image_decoder, video_frame_sampler,
    )

    class _FakeImg:
        def __init__(self, px):
            self._px = px

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, wh):
            self._wh = wh
            return self

        def __array__(self, dtype=None):
            w, h = self._wh
            return np.full((h, w), self._px, dtype=dtype or np.uint8)

    class _FakePIL:
        @staticmethod
        def open(fh):
            return _FakeImg(fh.read()[0])  # first byte = gray level

    dec = image_decoder(4, 2, backend="auto", image_mod=_FakePIL())
    px = dec(bytes([51, 0, 0]))
    assert len(px) == 8 and all(abs(v - 51 / 255.0) < 1e-6 for v in px)

    class _FakeSoundfile:
        @staticmethod
        def read(fh):
            n = len(fh.read())
            return np.linspace(-1.0, 1.0, 2 * n, dtype=np.float32), 8000

    adec = audio_decoder(sample_rate=4000, n=16, backend="auto", audio_mod=_FakeSoundfile())
    wav = adec(b"x" * 32)  # 64 samples @8k -> 32 @4k -> trimmed to 16
    assert len(wav) == 16 and wav[0] == pytest.approx(-1.0, abs=1e-6)

    class _FakeFrame:
        def __init__(self, i):
            self._i = i

        def to_ndarray(self, format):
            assert format == "rgb24"
            return np.full((1, 1, 3), self._i, dtype=np.uint8)

    class _FakeContainer:
        def decode(self, video):
            return (_FakeFrame(i) for i in range(7))

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeAV:
        @staticmethod
        def open(fh):
            return _FakeContainer()

    vs = video_frame_sampler(every_n=3, backend="auto", video_mod=_FakeAV())
    frames = vs(b"blob")
    assert [i for i, _ in frames] == [0, 3, 6]
    assert frames[1][1] == bytes([3, 3, 3])

    # wheel absent (mod=None injected is not possible — None means "probe";
    # this container genuinely lacks PIL) -> auto falls back to the fake,
    # real refuses
    fallback = image_decoder(4, 2, backend="auto")
    assert len(fallback(b"abc")) == 8
    with pytest.raises(NotImplementedError, match="PIL"):
        image_decoder(4, 2, backend="real")
    # forced fake even WITH a wheel available
    forced = image_decoder(4, 2, backend="fake", image_mod=_FakePIL())
    assert forced(b"abc") == fallback(b"abc")


def test_feature_extractors_tolerate_empty_inputs(spark):
    """Degenerate decode outputs must not crash a task or poison
    downstream cosines: an empty/null waveform yields the all-zero
    embedding (reshape of a size-0 slice used to raise), and a pixel
    array shorter than dim pools its empty blocks to 0.0 instead of NaN
    (mean() of an empty slice)."""
    import math

    from mimirsbrunn_spark.operators.multimodal import audio_features, image_features

    decoded_audio = spark.createDataFrame(
        [("a:empty", [], 16000), ("a:null", None, 16000), ("a:ok", [0.5, -0.5, 0.25, -0.25], 16000)],
        "media_ref string, waveform array<float>, sample_rate int",
    )
    af = {r["media_ref"]: r["embedding"] for r in audio_features(decoded_audio, n_bands=4).collect()}
    assert af["a:empty"] == [0.0] * 4 and af["a:null"] == [0.0] * 4
    assert all(math.isfinite(v) for v in af["a:ok"])

    decoded_img = spark.createDataFrame(
        [("i:short", [0.5, 1.0], 2, 1), ("i:empty", [], 0, 0)],
        "media_ref string, pixels array<float>, width int, height int",
    )
    imf = {r["media_ref"]: r["embedding"] for r in image_features(decoded_img, dim=8).collect()}
    assert len(imf["i:short"]) == 8
    assert all(math.isfinite(v) for v in imf["i:short"])
    assert imf["i:empty"] == [0.0] * 8
