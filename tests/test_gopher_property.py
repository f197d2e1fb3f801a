"""Randomized cross-engine sweep of the Gopher rule set: Spark
``gopher_quality_flags`` vs the DuckDB ``GOPHER_QUALITY_SQL`` oracle on
adversarial text — unicode words, CRLF, tabs, unusual whitespace,
bullets/ellipses, whitespace-only and empty/null docs — plus the
predicate≡flags row-set equivalence on the same corpus.

The driver gate runs this comparison on datagen documents only; this
sweep drives the regex/split/trim seams with text shapes datagen never
produces, hunting Java-vs-RE2 dialect drift in the oracle mirror."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from mimirsbrunn_spark.gate import GOPHER_QUALITY_SQL
from mimirsbrunn_spark.operators.textprep import (
    gopher_pass_predicate,
    gopher_quality_flags,
)

WORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with",  # stop words
    "naïve", "café", "東京", "mañana", "Zürich", "word", "x", "#",
    "...", "Hello", "WORLD", "a" * 30, "12345", "efghij",
]
LINE_STARTS = ["", "- ", "* ", "• ", "  - ", "\t", "   "]
LINE_ENDS = ["", "...", ".", "!"]
SEPS = [" ", "  ", "\t", " \t "]


def _line(rng: random.Random) -> str:
    n = rng.randrange(0, 12)
    body = rng.choice(SEPS).join(rng.choice(WORDS) for _ in range(n))
    return rng.choice(LINE_STARTS) + body + rng.choice(LINE_ENDS)


def _text(rng: random.Random) -> str | None:
    r = rng.random()
    if r < 0.04:
        return None
    if r < 0.08:
        return rng.choice(["", " ", "  \t ", "\n", "\n\n", " \n "])
    nl = rng.choice(["\n", "\n", "\n", "\r\n"])  # CRLF minority
    return nl.join(_line(rng) for _ in range(rng.randrange(1, 15)))


COLS = [
    "doc_id", "n_words", "total_word_len", "n_sym", "n_alpha_words",
    "n_lines", "n_bullet_lines", "n_ellipsis_lines", "n_stop_words",
    "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
    "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
    "ok_stop_words", "gopher_pass",
]


@pytest.mark.parametrize("seed", range(5))
def test_gopher_flags_match_duckdb_on_adversarial_text(spark, seed):
    rng = random.Random(1000 + seed)
    rows = [(f"d{i}", _text(rng)) for i in range(300)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])

    sdf = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None))
    got = {
        tuple(r) for r in gopher_quality_flags(sdf).select(*COLS).collect()
    }

    con = duckdb.connect()
    con.register("documents", pdf)
    want = {tuple(r) for r in con.execute(
        f"SELECT {', '.join(COLS)} FROM ({GOPHER_QUALITY_SQL})"
    ).fetchall()}

    assert got == want, (
        f"seed {seed}: {len(got ^ want)} differing rows; "
        f"example: {next(iter(got ^ want))}"
    )

    # predicate ≡ flags on the same adversarial corpus
    via_pred = {
        r["doc_id"]
        for r in sdf.filter(gopher_pass_predicate(sdf["text"])).select("doc_id").collect()
    }
    via_flags = {t[0] for t in got if t[-1]}
    assert via_pred == via_flags
