"""Unit pins for the Gopher rule set (Rae et al. 2021 §A1.1), added for
ADVICE r04: the bullet rule drops at >90% bullet lines (not >10%), and
the stop-word rule (>= 2 occurrences of the/be/to/of/and/that/have/with,
occurrence-count semantics as in the public DataTrove reproduction) is
part of gopher_pass."""

from __future__ import annotations

from mimirsbrunn_spark.operators.textprep import gopher_quality_flags


def _flags(spark, texts, **kw):
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    rows = gopher_quality_flags(df, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


GOOD = ("the cat and the dog have been to the house of that man with hats "
        * 5).strip()  # 80 words, plenty of stop words


def test_good_doc_passes(spark):
    f = _flags(spark, [GOOD])["d0"]
    assert f["gopher_pass"] and f["ok_bullet_lines"] and f["ok_stop_words"]


def test_bullet_threshold_is_90_percent(spark):
    # 10 lines: 9 bullets = exactly 90% → PASS (10*9 <= 9*10);
    # 10 lines, 10 bullets = 100% → FAIL
    words = "the cat and the dog have fun here now ok"
    nine = "\n".join(["- " + words] * 9 + [words])
    ten = "\n".join(["- " + words] * 10)
    f = _flags(spark, [nine, ten], min_words=5)
    assert f["d0"]["ok_bullet_lines"] is True
    assert f["d0"]["n_bullet_lines"] == 9 and f["d0"]["n_lines"] == 10
    assert f["d1"]["ok_bullet_lines"] is False
    # a 20%-bullet doc (old wrong threshold would drop it) must pass
    two = "\n".join(["- " + words] * 2 + [words] * 8)
    f2 = _flags(spark, [two], min_words=5)["d0"]
    assert f2["ok_bullet_lines"] is True and f2["gopher_pass"] is True


def test_stop_word_rule(spark):
    # zero stop words → fail; one occurrence → fail; two occurrences
    # (even of the same word — occurrence semantics) → pass
    base = "cat dog bird fish cow horse goat sheep duck hen"
    zero = base
    one = base + " the"
    two_same = base + " the mouse the"
    f = _flags(spark, [zero, one, two_same], min_words=5)
    assert f["d0"]["ok_stop_words"] is False and f["d0"]["gopher_pass"] is False
    assert f["d1"]["n_stop_words"] == 1 and f["d1"]["ok_stop_words"] is False
    assert f["d2"]["n_stop_words"] == 2 and f["d2"]["ok_stop_words"] is True
    # case-folded match
    f2 = _flags(spark, [base + " The THE"], min_words=5)["d0"]
    assert f2["n_stop_words"] == 2 and f2["ok_stop_words"] is True
    # min_stop_words=0 disables the rule (non-English corpora)
    f3 = _flags(spark, [zero], min_words=5, min_stop_words=0)["d0"]
    assert f3["ok_stop_words"] is True and f3["gopher_pass"] is True


def test_null_and_blank_text_count_as_empty(spark):
    """NULL text must take the empty-doc path (all-zero stats), not leak
    NULL through the guard (size(split(NULL)) is -1 and would have made
    n_words=-1 with ok_bullet_lines=true); space-only text is the same
    empty case (trim is space-only in BOTH engines, so text containing
    just a newline is deliberately NOT empty — the engines agree)."""
    f = _flags(spark, [None, "     ", GOOD])
    for d in ("d0", "d1"):
        assert f[d]["n_words"] == 0 and f[d]["n_lines"] == 0
        assert f[d]["n_sym"] == 0 and f[d]["n_bullet_lines"] == 0
        assert f[d]["gopher_pass"] is False  # fails ok_word_count
    assert f["d2"]["gopher_pass"] is True


def test_predicate_equals_flags_filter(spark):
    """gopher_pass_predicate (the production job's direct filter — no
    flags projection, no left-semi join) must keep EXACTLY the rows
    gopher_quality_flags(...).filter('gopher_pass') keeps, across every
    rule's trigger and the empty/null edges, at min_words thresholds
    including 0 (where EMPTY docs legitimately pass — a predicate that
    short-circuits on empties would silently diverge there)."""
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.operators.textprep import gopher_pass_predicate

    texts = [
        None,                     # null text
        "",                       # empty
        "     ",                  # space-only (empty path)
        "\n",                     # newline-only (NOT empty; engines agree)
        GOOD,                     # passes everything
        "short doc only",         # fails word count at default threshold
        "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j",  # all-bullet
        "the be to of and that have with " * 10,             # stop-heavy
        "zz qq xx vv " * 30,                                 # no stop words
        "### ... ### ... " + GOOD,                           # symbol-heavy
        ("supercalifragilisticexpialidocious " * 60).strip(),  # long words
        "1 2 3 4 5 6 7 8 9 10 " * 10,                        # non-alpha words
        GOOD + "\nends with...\nalso ends with...\nplain line",
    ]
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    for kw in (
        {},
        {"min_words": 0, "min_stop_words": 0},
        {"min_words": 3, "min_stop_words": 0},
        {"min_words": 5, "max_words": 8, "min_stop_words": 1},
    ):
        via_flags = {
            r["doc_id"]
            for r in gopher_quality_flags(df, **kw).filter("gopher_pass").collect()
        }
        via_pred = {
            r["doc_id"]
            for r in df.filter(gopher_pass_predicate(F.col("text"), **kw)).collect()
        }
        assert via_pred == via_flags, (kw, via_pred ^ via_flags)


def test_predicate_filter_plan_has_no_join(spark):
    """The production doc-dropping stage must be a pure Filter over the
    scan — the point of the predicate spelling is eliminating the
    left-semi shuffle join back on doc_id."""
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.operators.textprep import gopher_pass_predicate

    df = spark.createDataFrame([("d0", GOOD)], "doc_id string, text string")
    plan = (
        df.filter(gopher_pass_predicate(F.col("text"), min_words=3))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Join" not in plan
    # the words/lines arrays appear once, lambda-bound — not once per count
    assert plan.count("split(trim(") == 1
