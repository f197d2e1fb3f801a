"""Randomized sweep of the similarity operators vs bit-exact Python replays.

The similarity family (cosine top-k, hyperplane-LSH ANN/near-dup, IVF
codebook serving — `operators/similarity.py`) is hash-gated against
DuckDB on ONE fixed embeddings table per scale factor. This sweep runs
the same operators over random clustered embedding clouds — with exact
duplicates, a zero vector (the NaN-guard branch), and per-seed random
shapes — against oracles that replay the engine's arithmetic exactly:

- dot/norm are SEQUENTIAL left folds in float64, in array order, the
  same operation sequence `aggregate(zip_with(...))` executes on the
  JVM, so oracle and engine are bit-identical (both IEEE 754 binary64);
- `round(x, 6)` is replayed as HALF_UP on the shortest decimal repr —
  what Spark's Round does for DoubleType (BigDecimal.decimal(x) =
  new BigDecimal(Double.toString(x)); Python's repr is the same
  shortest round-trip string);
- LSH signatures replay the seeded LCG hyperplane recurrence
  (`_hyperplane_component_sql`) digit for digit.

Any mismatch is therefore an operator defect (bucketing, dedup of
candidate pairs, tie-breaks, the zero-norm guard), never float noise.
Reference role: these operators are the repo's beyond-reference
training-data-pipeline surface (brief: dedup + similarity search).
"""

from __future__ import annotations

import decimal
import math

import numpy as np
import pytest

from mimirsbrunn_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    ivf_topk_codebook,
    lsh_neardup_pairs,
)

_A, _C, _M = 1103515245, 12345, 2_147_483_647
_Q6 = decimal.Decimal("0.000001")


def _round6(x: float) -> float:
    return float(decimal.Decimal(repr(x)).quantize(_Q6, rounding=decimal.ROUND_HALF_UP))


def _fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _fold_norm(a) -> float:
    acc = 0.0
    for x in a:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def _cos(a, b) -> float:
    na, nb = _fold_norm(a), _fold_norm(b)
    if na * nb == 0.0:
        return 0.0
    return _fold_dot(a, b) / (na * nb)


def _hcomp(t: int, b: int, i: int) -> float:
    x = t * 1009 + b * 101 + i
    return ((_A * x + _C) % _M) / float(_M) - 0.5


def _sig(vec, t: int, bits: int) -> int:
    s = 0
    for b in range(bits):
        acc = 0.0
        for i, x in enumerate(vec):
            acc = acc + float(x) * _hcomp(t, b, i)
        if acc >= 0:
            s += 1 << b
    return s


def _candidate_pairs(vecs: dict[int, list[float]], tables: int, bits: int):
    """Replay of bucketize + per-table bucket self-join: the distinct
    unordered id pairs sharing a (table, signature) bucket."""
    pairs: set[tuple[int, int]] = set()
    for t in range(tables):
        buckets: dict[int, list[int]] = {}
        for vid, v in vecs.items():
            buckets.setdefault(_sig(v, t, bits), []).append(vid)
        for ids in buckets.values():
            ids.sort()
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    pairs.add((a, b))
    return pairs


def _cloud(rng: np.random.Generator, n: int, dim: int, n_clusters: int) -> np.ndarray:
    """Clustered cloud with ~5% exact duplicates and one zero vector."""
    centers = rng.normal(0.0, 1.0, (n_clusters, dim))
    vecs = centers[rng.integers(0, n_clusters, n)] + rng.normal(0.0, 0.15, (n, dim))
    ndup = max(2, n // 20)
    vecs[n - ndup:] = vecs[rng.integers(0, n - ndup, ndup)]
    vecs[0] = 0.0
    return np.round(vecs, 6)


def _emb_df(spark, vecs: np.ndarray, ids=None):
    ids = range(len(vecs)) if ids is None else ids
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id int, embedding array<double>",
    )


CASES = [
    # (seed, n, dim, n_clusters)
    (11, 120, 8, 5),
    (23, 160, 12, 3),
    (47, 90, 16, 8),
]


@pytest.mark.parametrize("seed,n,dim,n_clusters", CASES)
def test_cosine_topk_matches_fold_oracle(spark, seed, n, dim, n_clusters):
    rng = np.random.default_rng(seed)
    vecs = _cloud(rng, n, dim, n_clusters)
    n_q = 25
    corpus = _emb_df(spark, vecs)
    queries = _emb_df(spark, vecs[:n_q])
    k = int(rng.integers(2, 6))

    expected = set()
    for qi in range(n_q):
        scored = sorted(
            ((-_round6(_cos(vecs[qi], vecs[ti])), ti) for ti in range(n) if ti != qi)
        )[:k]
        for r, (negcos, ti) in enumerate(scored):
            expected.add((qi, ti, -negcos, r + 1))

    got = {
        (r["query_vec"], r["neighbor_vec"], r["cosine"], r["rank"])
        for r in cosine_topk(queries, corpus, k=k).collect()
    }
    assert got == expected, f"seed={seed} diff={got ^ expected}"


@pytest.mark.parametrize("seed,n,dim,n_clusters", CASES)
def test_lsh_neardup_pairs_match_bucket_replay(spark, seed, n, dim, n_clusters):
    rng = np.random.default_rng(seed)
    vecs = _cloud(rng, n, dim, n_clusters)
    bits = int(rng.integers(4, 6))
    tables = int(rng.integers(2, 5))
    threshold = float(rng.choice([0.8, 0.9, 0.95]))
    vmap = {i: [float(x) for x in v] for i, v in enumerate(vecs)}

    expected = set()
    for a, b in _candidate_pairs(vmap, tables, bits):
        c = _round6(_cos(vmap[a], vmap[b]))
        if c >= threshold:
            expected.add((a, b, c))
    assert expected, "degenerate seed: no near-dup candidates"

    got = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in lsh_neardup_pairs(
            _emb_df(spark, vecs), threshold=threshold, bits=bits, tables=tables, dim=dim
        ).collect()
    }
    assert got == expected, f"seed={seed} diff={got ^ expected}"

    # the docstring's recall-1.0-for-exact-dups claim: every identical
    # non-zero pair shares every bucket, so it must be in the output
    for a in vmap:
        for b in vmap:
            if a < b and vmap[a] == vmap[b] and any(x != 0.0 for x in vmap[a]):
                assert (a, b, 1.0) in got, f"seed={seed} exact dup ({a},{b}) missed"


@pytest.mark.parametrize("seed,n,dim,n_clusters", CASES)
def test_ann_lsh_topk_matches_bucket_replay(spark, seed, n, dim, n_clusters):
    rng = np.random.default_rng(seed)
    vecs = _cloud(rng, n, dim, n_clusters)
    n_q, k = 20, 3
    bits = int(rng.integers(4, 6))
    tables = int(rng.integers(2, 5))
    vmap = {i: [float(x) for x in v] for i, v in enumerate(vecs)}

    # replay: candidates = ids sharing any (table, sig) bucket with the
    # query (including id==query, filtered), exact re-rank inside
    expected = set()
    for qi in range(n_q):
        qsigs = {t: _sig(vmap[qi], t, bits) for t in range(tables)}
        cand = {
            ti
            for ti, v in vmap.items()
            if ti != qi and any(_sig(v, t, bits) == qsigs[t] for t in range(tables))
        }
        scored = sorted((-_round6(_cos(vmap[qi], vmap[ti])), ti) for ti in cand)[:k]
        for r, (negcos, ti) in enumerate(scored):
            expected.add((qi, ti, -negcos, r + 1))

    got = {
        (r["query_vec"], r["neighbor_vec"], r["cosine"], r["rank"])
        for r in ann_lsh_topk(
            _emb_df(spark, vecs[:n_q]), _emb_df(spark, vecs),
            k=k, bits=bits, tables=tables, dim=dim,
        ).collect()
    }
    assert got == expected, f"seed={seed} diff={got ^ expected}"


@pytest.mark.parametrize("seed,n,dim,n_clusters", CASES)
def test_ivf_codebook_serving_matches_replay(spark, seed, n, dim, n_clusters):
    """The pure-Catalyst IVF serving path (gate `ivf_ann_topk` runs it on
    the committed codebook) replayed over random clouds and random
    codebooks: assignment = argmax raw-fold cosine (tie: cluster asc),
    probing = top-n_probe of the same ranking, re-rank = rounded cosine
    (tie: neighbor asc)."""
    rng = np.random.default_rng(seed)
    vecs = _cloud(rng, n, dim, n_clusters)
    cents = np.round(rng.normal(0.0, 1.0, (8, dim)), 6)
    n_q, k, n_probe = 20, 3, int(rng.integers(2, 5))
    vmap = {i: [float(x) for x in v] for i, v in enumerate(vecs)}
    cmap = {c: [float(x) for x in v] for c, v in enumerate(cents)}

    def nearest(v, m):
        return sorted(((-_cos(v, cv), c) for c, cv in cmap.items()))[:m]

    assigned: dict[int, int] = {i: nearest(v, 1)[0][1] for i, v in vmap.items()}
    expected = set()
    for qi in range(n_q):
        probes = {c for _, c in nearest(vmap[qi], n_probe)}
        cand = {ti for ti, cl in assigned.items() if cl in probes and ti != qi}
        scored = sorted((-_round6(_cos(vmap[qi], vmap[ti])), ti) for ti in cand)[:k]
        for r, (negcos, ti) in enumerate(scored):
            expected.add((qi, ti, -negcos, r + 1))

    codebook = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in enumerate(cents)],
        "cluster int, centroid array<double>",
    )
    got = {
        (r["query_vec"], r["neighbor_vec"], r["cosine"], r["rank"])
        for r in ivf_topk_codebook(
            _emb_df(spark, vecs[:n_q]), _emb_df(spark, vecs), codebook,
            k=k, n_probe=n_probe,
        ).collect()
    }
    assert got == expected, f"seed={seed} diff={got ^ expected}"
