"""A/B: geo-span extraction over 2.4M interleaved docs at local[32].

Variants: (a) Catalyst explode+split (flagship), (b) whole-batch
mapInArrow kernels (shipped, commit aff248e), (c) the pre-aff248e
per-row-loop mapInPandas (reconstructed from git for the A/B).
Equality first (checksum agg), then interleaved timing, 4 reps each.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
from collections.abc import Iterator
from pyspark.sql import functions as F
from mimirsbrunn_spark.session import get_spark
from mimirsbrunn_spark.operators.spans import (
    extract_geo_points, extract_geo_points_arrow, GEO_POINT_SCHEMA)

def extract_legacy_perrow(docs):
    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids, offsets, texts = [], [], []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                for sp in spans:
                    if sp["kind"] == "geo":
                        doc_ids.append(doc_id)
                        offsets.append(sp["offset"])
                        texts.append(sp["text"])
            if not doc_ids:
                continue
            split = pd.Series(texts).str.split(";", n=1, expand=True)
            lon = pd.to_numeric(split[0], errors="coerce")
            lat = pd.to_numeric(split[1] if 1 in split else pd.Series([None]*len(split)), errors="coerce")
            out = pd.DataFrame({"doc_id": doc_ids,
                                "span_offset": np.asarray(offsets, dtype=np.int32),
                                "lon": lon.to_numpy(dtype=np.float64),
                                "lat": lat.to_numpy(dtype=np.float64)})
            ok = (out.lon.notna() & out.lat.notna()
                  & out.lon.between(-180.0, 180.0) & out.lat.between(-90.0, 90.0))
            yield out[ok]
    return docs.mapInPandas(gen, schema=GEO_POINT_SCHEMA)

spark = get_spark(app_name="ab_arrow", cpus=32, shuffle_partitions=32)
docs = spark.read.parquet("/root/repo/.bench_cache/scaling/sf1.6/docs.parquet")

def checksum(df):
    r = df.select(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("doc_id", "span_offset",
                         F.format_string("%.9f", "lon"),
                         F.format_string("%.9f", "lat"))).alias("h")).collect()[0]
    return (r["n"], r["h"])

variants = {"catalyst": extract_geo_points,
            "arrow_batch": extract_geo_points_arrow,
            "perrow_legacy": extract_legacy_perrow}
sums = {k: checksum(fn(docs)) for k, fn in variants.items()}
print("checksums:", sums, flush=True)
assert len(set(sums.values())) == 1, "variant outputs differ!"

times = {k: [] for k in variants}
for rep in range(4):
    for k, fn in variants.items():
        t0 = time.perf_counter()
        fn(docs).select(F.count("*")).collect()
        times[k].append(round(time.perf_counter() - t0, 3))
n = sums["catalyst"][0]
out = {k: {"times": v, "best": min(v), "rows_per_sec": round(n / min(v))}
       for k, v in times.items()}
print(json.dumps({"n_geo_rows": n, "variants": out}))
