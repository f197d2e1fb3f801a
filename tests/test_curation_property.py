"""Randomized cross-engine sweeps of the curation gate family
(semdedup_keep / line_dedup / pack_sequences / ppl_buckets /
stratified_sample / hash_rate_sample / temperature_mix /
embed_int8_codes) over input shapes the driver's fixed corpus never
produces: oversize documents that exercise the packing isolation
branch, zero and duplicate embeddings through the cosine guard and
keep tie-break, whitespace/unicode/boundary-length lines, identical
texts forcing ntile score ties, negative doc ids through the portable
hash, and strata smaller than their quota.

Same engine-vs-DuckDB comparison the driver runs (sorted repr-tuple
equality on the gate's own query + oracle), seeded like the other
property sweeps.
"""

from __future__ import annotations

import random

import duckdb
import pytest

import mimirsbrunn_spark.gate as g


def _compare(spark, tmp_path, name, tables):
    """Write the synthesized tables, run the gate fn and its oracle on
    them, and assert sorted-row equality (the driver's compare)."""
    sf_dir = str(tmp_path / name)
    for tname, (df_rows, schema) in tables.items():
        spark.createDataFrame(df_rows, schema).write.mode("overwrite").parquet(
            f"{sf_dir}/{tname}.parquet"
        )
    fn, sql = g.QUERIES[name]
    got = fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    for tname in tables:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{tname}.parquet/*.parquet')"
        )
    exp = con.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    rg = sorted(tuple(repr(r[c]) for c in cols) for r in got.to_dict("records"))
    re_ = sorted(tuple(repr(r[c]) for c in cols) for r in exp.to_dict("records"))
    assert len(rg) == len(re_), f"{name}: {len(rg)} vs {len(re_)} rows"
    assert rg == re_, f"{name}: value mismatch"
    return got


_WORDS = ["rue", "gare", "café", "北京", "line", "Straße", "emoji🚀", "x"]


def _random_docs(rng, n=60, multiline=True):
    rows = []
    shared = [
        "shared boilerplate alpha block",
        "shared boilerplate beta block!",
        "  padded shared gamma line  ",
        "tiny dup",  # under the 10-char eligibility floor
    ]
    for i in range(n):
        doc_id = i - 10  # negative ids through the portable hash
        n_lines = rng.choice([1, 1, 2, 3, 5]) if multiline else 1
        lines = []
        for _ in range(n_lines):
            kind = rng.random()
            if kind < 0.25:
                lines.append(rng.choice(shared))
            elif kind < 0.35:
                lines.append("")  # blank line
            elif kind < 0.45:
                lines.append("   ")  # whitespace-only
            elif kind < 0.5:
                lines.append("exactly10c")  # == min_chars boundary
            else:
                k = rng.choice([0, 1, 3, 8, 30, 250])  # 250 >> pack budget
                lines.append(" ".join(rng.choice(_WORDS) for _ in range(k)))
        text = "\n".join(lines)
        if rng.random() < 0.1 and i > 0:
            text = rows[rng.randrange(len(rows))][1]  # exact dup text
        rows.append((doc_id, text, rng.choice(["en", "fr", "zh"]), "synth", len(text)))
    return rows, "doc_id long, text string, lang string, source string, n_chars long"


@pytest.mark.parametrize("seed", [3, 11, 23])
def test_line_dedup_property(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs, schema = _random_docs(rng)
    _compare(spark, tmp_path, "line_dedup", {"documents": (docs, schema)})


@pytest.mark.parametrize("seed", [7, 19, 31])
def test_pack_sequences_property(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs, schema = _random_docs(rng)
    got = _compare(spark, tmp_path, "pack_sequences", {"documents": (docs, schema)})
    # the sweep corpus contains >budget docs: the isolation branch ran
    assert (got["n_tokens"] > 200).any()
    over = got[got["n_tokens"] > 200]
    sizes = got.groupby(["lang", "bin"]).size()
    assert all(sizes[(r["lang"], r["bin"])] == 1 for _, r in over.iterrows())


@pytest.mark.parametrize("seed", [3, 11])
def test_decontam_vocab_property(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs, schema = _random_docs(rng)
    _compare(spark, tmp_path, "decontaminate", {"documents": (docs, schema)})
    _compare(spark, tmp_path, "vocab_topk", {"documents": (docs, schema)})


@pytest.mark.parametrize("seed", [5, 13, 41])
def test_ppl_buckets_property(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs, schema = _random_docs(rng)
    # force score ties: several identical docs within one language
    docs += [(1000 + j, "tie tie tie words", "en", "synth", 17) for j in range(4)]
    _compare(spark, tmp_path, "ppl_buckets", {"documents": (docs, schema)})


@pytest.mark.parametrize("seed", [2, 17])
def test_sampling_property(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs, schema = _random_docs(rng)
    # a stratum smaller than the 25-quota: keep only 3 'zh' docs
    docs = [d for d in docs if d[2] != "zh"] + [
        (9000 + j, "zh doc", "zh", "synth", 6) for j in range(3)
    ]
    _compare(spark, tmp_path, "stratified_sample", {"documents": (docs, schema)})
    _compare(spark, tmp_path, "hash_rate_sample", {"documents": (docs, schema)})
    _compare(spark, tmp_path, "temperature_mix", {"documents": (docs, schema)})


def _random_embeddings(rng, n=40):
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.1:
            vec = [0.0] * 64  # zero vector -> cosine guard
        elif r < 0.3 and rows:
            vec = list(rows[rng.randrange(len(rows))][1])  # exact duplicate
        else:
            vec = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i, vec, f"l{i % 3}"))
    return rows, "vec_id long, embedding array<double>, label string"


@pytest.mark.parametrize("seed", [29, 37, 53])
def test_semdedup_property(spark, tmp_path, seed):
    rng = random.Random(seed)
    emb, schema = _random_embeddings(rng)
    got = _compare(spark, tmp_path, "semdedup_keep", {"embeddings": (emb, schema)})
    # keep-rule sanity on the randomized set: one keeper per component
    ks = got.groupby("component")["keep"].sum()
    assert (ks == 1).all()


@pytest.mark.parametrize("seed", [47, 59])
def test_pq_property(spark, tmp_path, seed):
    rng = random.Random(seed)
    emb, schema = _random_embeddings(rng)
    _compare(spark, tmp_path, "pq_codes", {"embeddings": (emb, schema)})
    _compare(spark, tmp_path, "pq_ann_topk", {"embeddings": (emb, schema)})


@pytest.mark.parametrize("seed", [43, 61])
def test_int8_codes_property(spark, tmp_path, seed):
    rng = random.Random(seed)
    emb, schema = _random_embeddings(rng)
    # add tiny-magnitude vectors (scale << 1) on top of zeros and dups
    emb += [(500 + j, [rng.uniform(-1e-6, 1e-6) for _ in range(64)], "t")
            for j in range(3)]
    got = _compare(spark, tmp_path, "embed_int8_codes", {"embeddings": (emb, schema)})
    assert got["code"].abs().max() <= 127
