"""Randomized sweep of ``neardup_components`` (the dedup DECISION
stage) against a test-local union-find oracle, over graph shapes the
`dedup_components` gate's datagen never produces: long chains (diameter
approaching the iteration guard), cycles, star hubs, bridged clusters,
and isolated pairs — plus a pin that a chain beyond ``max_iter`` RAISES
(the documented pathological-chain guard) instead of silently returning
under-converged labels."""

from __future__ import annotations

import random

import pytest

from mimirsbrunn_spark.operators.dedup import neardup_components


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _graph(rng: random.Random) -> list[tuple[int, int]]:
    edges: list[tuple[int, int]] = []
    nxt = 0
    for _ in range(rng.randrange(2, 6)):
        shape = rng.choice(["chain", "cycle", "star", "pair", "blob"])
        n = rng.randrange(2, 20)
        ids = [nxt + i for i in range(n)]
        nxt += n
        if shape == "chain":
            edges += list(zip(ids, ids[1:]))
        elif shape == "cycle":
            edges += list(zip(ids, ids[1:])) + [(ids[-1], ids[0])]
        elif shape == "star":
            edges += [(ids[0], i) for i in ids[1:]]
        elif shape == "pair":
            edges.append((ids[0], ids[1]))
        else:  # blob: random extra edges over a chain
            edges += list(zip(ids, ids[1:]))
            edges += [
                (rng.choice(ids), rng.choice(ids)) for _ in range(n // 2)
            ]
    # occasionally bridge two clusters
    if len(edges) > 4 and rng.random() < 0.7:
        edges.append((edges[0][0], edges[-1][1]))
    # drop self-loops, dedup
    return sorted({(a, b) for a, b in edges if a != b})


@pytest.mark.parametrize("seed", [3, 13, 37, 71])
def test_components_match_union_find(spark, seed):
    rng = random.Random(seed)
    edges = _graph(rng)
    want = _union_find(edges)
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in neardup_components(pairs).collect()
    }
    assert got == want, f"seed {seed}: {dict(sorted(set(got.items()) ^ set(want.items())))}"


def test_components_reliable_checkpoint_path(spark, tmp_path, monkeypatch):
    """On a real cluster the loop must survive executor loss, which a
    non-replicated localCheckpoint block does not — with a checkpoint
    dir configured the loop routes through DataFrame.checkpoint
    (reliable storage). Pin that the reliable path executes (checkpoint
    files appear under the dir) and yields the same labels. r6: the
    driver union-find shortcut never checkpoints, so force the
    distributed loop by zeroing the shortcut threshold."""
    from mimirsbrunn_spark.operators import dedup as dedup_mod

    monkeypatch.setattr(dedup_mod, "DRIVER_CC_MAX_EDGES", 0)
    rng = random.Random(7)
    edges = _graph(rng)
    want = _union_find(edges)
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    ckpt = tmp_path / "ckpt"
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(ckpt))
    try:
        got = {
            r["doc_id"]: r["component"]
            for r in neardup_components(pairs).collect()
        }
        assert got == want
        written = [p for p in ckpt.rglob("*") if p.is_file()]
        assert written, "reliable checkpoint dir stayed empty — loop did not route through it"
    finally:
        # the session is shared across the suite — don't leak the dir
        # (the scala setter has a $-mangled name, hence getattr)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
        assert sc.getCheckpointDir() is None


def test_components_long_chain_raises_not_truncates(spark, monkeypatch):
    """Diameter > max_iter must RAISE — an under-converged label set
    would silently merge fewer docs than the graph demands. r6: small
    graphs take the driver union-find shortcut (which cannot
    under-converge), so the raise pin forces the distributed loop by
    zeroing the shortcut threshold."""
    from mimirsbrunn_spark.operators import dedup as dedup_mod

    chain = [(i, i + 1) for i in range(8)]
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    # converges: diameter 8 < default guard (driver shortcut path)
    out = {r["doc_id"]: r["component"] for r in neardup_components(pairs).collect()}
    assert set(out.values()) == {0}
    monkeypatch.setattr(dedup_mod, "DRIVER_CC_MAX_EDGES", 0)
    # distributed-loop path: same labels when it converges…
    out2 = {r["doc_id"]: r["component"] for r in neardup_components(pairs).collect()}
    assert out2 == out
    # …and a hard error, never truncation, when it cannot
    with pytest.raises(Exception, match="max_iter|converge"):
        neardup_components(pairs, max_iter=2)
