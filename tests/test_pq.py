"""Unit coverage for product quantization (operators/similarity:
train_pq_codebooks / pq_encode / pq_adc_topk) — the properties the
hash-exact gates can't isolate: centroid fixed points, the ADC
lower-bound (an exact duplicate always ranks first), and recall
against the numpy exact-L2 ground truth on a trained codebook.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    PQ_SUB,
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)


def _cb_df(spark, cents):
    rows = [
        (m, k, [float(x) for x in cents[m][k]])
        for m in range(cents.shape[0])
        for k in range(cents.shape[1])
    ]
    return spark.createDataFrame(rows, "subspace int, code int, centroid array<double>")


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_centroid_vectors_encode_to_their_code(spark):
    rng = np.random.default_rng(3)
    cents = np.round(rng.normal(size=(PQ_M, PQ_K, PQ_SUB)), 6)
    cb = _cb_df(spark, cents)
    # build vectors whose every subspace IS centroid k -> codes all k
    vecs = [np.concatenate([cents[m][k] for m in range(PQ_M)]) for k in range(PQ_K)]
    out = {r["vec_id"]: r["codes"] for r in pq_encode(_vec_df(spark, vecs), cb).collect()}
    for k in range(PQ_K):
        assert out[k] == [k] * PQ_M


def test_adc_duplicate_ranks_first(spark):
    # ADC(query, v) >= sum of per-subspace minima, with equality exactly
    # when v's codes are the query's own argmin codes — so an exact
    # duplicate of the query is always rank 1 (ties broken by id asc)
    rng = np.random.default_rng(11)
    cents = np.round(rng.normal(size=(PQ_M, PQ_K, PQ_SUB)), 6)
    cb = _cb_df(spark, cents)
    base = rng.normal(size=64)
    vecs = [base] + [rng.normal(size=64) for _ in range(30)] + [base.copy()]
    df = _vec_df(spark, vecs)
    codes = pq_encode(df, cb)
    top = pq_adc_topk(df.filter(F.col("vec_id") == 0), codes, cb, k=3).collect()
    assert top[0]["neighbor_vec"] == 31  # the duplicate (id 31) first
    assert top[0]["rank"] == 1


def test_trained_shortlist_recall_vs_exact_l2(spark):
    # ADC is the SHORTLIST stage of a PQ pipeline (shortlist → exact
    # re-rank, Jégou et al. §V): with a codebook trained on a clustered
    # corpus, the exact-L2 nearest neighbor must land inside the ADC
    # top-20-of-120 shortlist for nearly every query. (Plain ADC top-5
    # measures ~0.6 here — within-cluster ordering is exactly what the
    # 16-code-per-subspace quantization blurs, which is why real
    # deployments re-rank the shortlist with exact distances.)
    rng = np.random.default_rng(7)
    centers = rng.normal(scale=2.0, size=(6, 64))
    vecs = [centers[i % 6] + rng.normal(scale=0.15, size=64) for i in range(120)]
    df = _vec_df(spark, vecs)
    cents = train_pq_codebooks(df)
    assert cents.shape == (PQ_M, PQ_K, PQ_SUB)
    cb = _cb_df(spark, cents)
    codes = pq_encode(df, cb)
    got = pq_adc_topk(df.filter(F.col("vec_id") < 15), codes, cb, k=20).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_vec"], []).append(r["neighbor_vec"])
    m = np.stack(vecs)
    hits = 0
    for q in range(15):
        d = ((m - m[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        true_nn = int(np.argmin(d))
        hits += true_nn in by_q[q]
    assert hits / 15 >= 0.85, f"ADC shortlist recall@20 degraded: {hits}/15"


def test_encode_deterministic_across_runs(spark):
    rng = np.random.default_rng(19)
    cents = np.round(rng.normal(size=(PQ_M, PQ_K, PQ_SUB)), 6)
    cb = _cb_df(spark, cents)
    df = _vec_df(spark, [rng.normal(size=64) for _ in range(40)])
    a = sorted((r["vec_id"], tuple(r["codes"])) for r in pq_encode(df, cb).collect())
    b = sorted((r["vec_id"], tuple(r["codes"])) for r in pq_encode(df, cb).collect())
    assert a == b
