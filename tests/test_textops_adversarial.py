"""Adversarial-corpus replay of the text/dedup gate family: every
documents-only gate query re-run Spark-vs-DuckDB over a synthetic nasty
corpus — multilingual unicode (accents, CJK, Cyrillic, astral-plane
emoji), CRLF, tabs, repeated spam, exact and near duplicates, PII
shapes, empty / whitespace-only / null text.

The driver gate proves these ops exact on datagen documents; datagen
text is well-behaved ASCII-ish prose. This sweep re-drives the SAME
gate pairs (queries() vs oracle_sql(), the driver's own compare) where
engine seams actually differ: codepoint-vs-byte length units, regex
dialect corners, unicode case folding, hash folds over multibyte
chars. A mismatch here is a silent cross-engine wrong answer waiting
for a real-world corpus."""

from __future__ import annotations

import random
from pathlib import Path

import duckdb
import pandas as pd
import pytest

from test_gate_oracle import _canon, _values_equal

# documents-only gate queries (everything in the registry whose Spark
# side and oracle read just the documents table)
TEXT_GATES = [
    "lang_guess", "quality_score", "stopword_ratio", "token_count",
    "token_count_bpe", "doc_fingerprint", "gopher_quality",
    "repetition_3gram", "shared_ngram_docs", "pii_scrub", "dedup_exact",
    "simhash16", "minhash_signature", "minhash_lsh_pairs",
    "ngram_jaccard_lsh", "dedup_components",
]

EN = ["the", "be", "to", "of", "and", "that", "have", "with", "quick",
      "brown", "fox", "jumps", "over", "lazy", "dog", "Hello", "WORLD"]
FR = ["café", "naïve", "mañana", "être", "déjà", "garçon", "œuvre"]
CJK = ["東京", "日本語", "北京", "漢字", "구글", "서울"]
CYR = ["Москва", "привет", "мир", "Россия"]
EMOJI = ["🚀", "😀", "🧭", "🗺️"]
PII = ["bob@example.com", "alice.smith@mail.fr", "+33 6 12 34 56 78",
       "555-867-5309", "(212) 555-0123"]


def _sentence(rng: random.Random, pool) -> str:
    return " ".join(rng.choice(pool) for _ in range(rng.randrange(3, 40)))


def _text(rng: random.Random, i: int, base_cache: list) -> str | None:
    r = rng.random()
    if r < 0.30:
        pool = rng.choice([EN, EN, EN + FR, EN + CJK, EN + CYR, EN + EMOJI])
        t = _sentence(rng, pool)
        base_cache.append(t)
        return t
    if r < 0.45 and base_cache:  # near-duplicate of an earlier doc
        words = rng.choice(base_cache).split(" ")
        if len(words) > 4:
            words[rng.randrange(len(words))] = rng.choice(EN)
        return " ".join(words)
    if r < 0.55 and base_cache:  # exact duplicate
        return rng.choice(base_cache)
    if r < 0.65:  # repetition spam
        unit = _sentence(rng, EN[:6])
        return (" " + unit) * rng.randrange(3, 12)
    if r < 0.75:  # PII-bearing prose
        return f"contact {rng.choice(PII)} or {rng.choice(PII)} re {_sentence(rng, EN)}"
    if r < 0.83:  # CRLF / tab / mixed-whitespace document
        nl = rng.choice(["\n", "\r\n"])
        return nl.join(_sentence(rng, EN + FR) for _ in range(rng.randrange(1, 6)))
    if r < 0.85:  # vertical-tab / form-feed bearing document: Java \s
        # includes \x0B, RE2's does not — the explicit WS_RX class must
        # keep both engines token-identical on these
        sep = rng.choice(["\x0b", "\f", " \x0b ", "\f\x0b"])
        return sep.join(_sentence(rng, EN) for _ in range(rng.randrange(2, 5)))
    if r < 0.92:
        return rng.choice(["", " ", "\t", "  \r\n ", "...", "- ", "a", "\x0b", "\f- x"])
    if r < 0.97:
        return _sentence(rng, EN + FR + CJK + CYR + EMOJI)
    return None


@pytest.fixture(scope="module")
def nasty_dir(tmp_path_factory, spark):
    rng = random.Random(77)
    base: list = []
    rows = []
    for i in range(400):
        t = _text(rng, i, base)
        # int64 ids, matching the testdata schema (some gate queries
        # derive synthetic fields from doc_id arithmetic)
        rows.append((i, t, "xx", "sweep", len(t) if t else 0))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    out = tmp_path_factory.mktemp("nasty")
    pdf.to_parquet(out / "documents.parquet", index=False)
    return str(out)


@pytest.fixture(scope="module")
def nasty_duck(nasty_dir):
    con = duckdb.connect()
    p = Path(nasty_dir) / "documents.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", TEXT_GATES)
def test_text_gate_on_adversarial_corpus(name, nasty_dir, nasty_duck, spark):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _canon(q(spark, nasty_dir).toPandas())
    want = _canon(nasty_duck.execute(sql).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} spark vs {len(want)} duckdb rows"
    assert _values_equal(got, want), (
        f"{name}: value mismatch; first spark rows:\n{got.head(3)}\n"
        f"first duckdb rows:\n{want.head(3)}"
    )
