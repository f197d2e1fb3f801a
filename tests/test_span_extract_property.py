"""Randomized property sweep: the two span-extraction paths —
``extract_geo_points`` (pure Catalyst, the 100-TB default) and
``extract_geo_points_arrow`` (whole-batch mapInArrow kernels, the
BASELINE.json input_hint API) — must agree row-for-row on the standard
decimal/scientific numeric dialect, across random span arrays that mix
well-formed coordinates, malformed text, wrong-kind spans, null texts,
null span elements, and empty docs.

The generator deliberately stays OFF the documented engine-specific
numeric-literal extensions where the paths diverge by design (see the
``extract_geo_points_arrow`` docstring): no trailing [dDfF] on numeric
strings, no hex floats, no underscore separators, no Infinity/NaN
spellings — junk alphabet avoids the letters that could form them.
Everything else is fair game: the fixed-vector test
(test_pipeline_ops.test_extract_geo_points_arrow_matches_catalyst)
pins the known edges; this sweep hunts the unknown ones."""

from __future__ import annotations

import random

import pytest

from mimirsbrunn_spark.operators.spans import (
    extract_geo_points,
    extract_geo_points_arrow,
)
from mimirsbrunn_spark.schemas import DOCS

N_DOCS = 200
JUNK = "ghjklmpqrs;., -"  # no d/f/n/i/e/x: cannot spell 1d, 0x.., inf, nan


def _num(rng: random.Random) -> str:
    """A numeric literal in the shared dialect, sometimes out of range."""
    v = rng.choice(
        [
            rng.uniform(-200, 200),  # mostly plausible coords, some out of range
            rng.uniform(-1e6, 1e6),  # far out of range
            float(rng.randint(-500, 500)),
            0.0,
        ]
    )
    style = rng.randrange(4)
    if style == 0:
        s = f"{v:.{rng.randrange(1, 9)}f}"
    elif style == 1:
        s = f"{v:e}"
    elif style == 2:
        s = str(int(v))
    else:
        s = repr(v)
    if rng.random() < 0.3:
        s = rng.choice(["+", ""]) + s if not s.startswith("-") else s
    if rng.random() < 0.3:
        s = " " * rng.randrange(3) + s + " " * rng.randrange(3)
    return s


def _geo_text(rng: random.Random) -> str | None:
    r = rng.random()
    if r < 0.55:  # well-formed '{lon};{lat}'
        return f"{_num(rng)};{_num(rng)}"
    if r < 0.65:  # extra ';' groups: 'a;b;c' must parse as (a, b)
        return ";".join(_num(rng) for _ in range(rng.randrange(3, 5)))
    if r < 0.75:  # one side junk / empty
        junk = "".join(rng.choice(JUNK.replace(";", "")) for _ in range(rng.randrange(4)))
        return rng.choice([f"{junk};{_num(rng)}", f"{_num(rng)};{junk}", f";{_num(rng)}"])
    if r < 0.85:  # no ';' at all: dropped by both
        return rng.choice([_num(rng), "", "lorem"])
    if r < 0.95:  # pure junk, may contain ';'
        return "".join(rng.choice(JUNK) for _ in range(rng.randrange(8)))
    return None  # null text


def _doc(rng: random.Random, i: int):
    spans = []
    for off in range(rng.randrange(5)):
        if rng.random() < 0.05:
            spans.append(None)  # null span element
            continue
        kind = rng.choice(["geo", "geo", "text", "media"])
        text = _geo_text(rng) if kind == "geo" else rng.choice(["lorem", "", None])
        ref = f"media:{i}" if kind == "media" else ""
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": off})
    return (f"d{i}", spans)


@pytest.mark.parametrize("seed", range(6))
def test_arrow_and_catalyst_extraction_agree_on_random_docs(spark, seed):
    rng = random.Random(seed)
    docs = spark.createDataFrame([_doc(rng, i) for i in range(N_DOCS)], DOCS)
    key = ["doc_id", "span_offset", "lon", "lat"]
    cat = sorted(tuple(r) for r in extract_geo_points(docs).select(*key).collect())
    arr = sorted(tuple(r) for r in extract_geo_points_arrow(docs).select(*key).collect())
    assert cat == arr, (
        f"seed {seed}: {len(cat)} catalyst vs {len(arr)} arrow rows; "
        f"first diff: {next(iter(set(cat) ^ set(arr)), None)}"
    )
    # the sweep must actually exercise the accept path, not just rejects
    assert len(cat) > 20, f"seed {seed} produced only {len(cat)} accepted points"
