"""Gopher repetition signals (functions/repetition.py): kernel vs a
brute-force Python reference on planted repetition-heavy docs, DuckDB
oracle parity on NONZERO values (the driver testdata's word-salad docs
exercise only the top-gram columns), and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.functions import repetition

# Docs engineered so every signal family is nonzero somewhere:
DOCS = [
    # dup lines + dup 5..10-grams (verbatim repeated sentence of 12 tokens)
    (1, "the quick brown fox jumps over the lazy dog again and again\n"
        "some unique middle content sits here\n"
        "the quick brown fox jumps over the lazy dog again and again"),
    # heavy 2-gram repetition ("spam ham" x 8)
    (2, "spam ham spam ham spam ham spam ham spam ham spam ham spam ham spam ham"),
    # degenerate single-token doc (top-gram frac > 1 territory via overlap)
    (3, "a a a a a a a a"),
    # empty + whitespace-only edge cases
    (4, ""),
    (5, "   "),
    # short doc below every gram size
    (6, "tiny doc"),
    # a 6-token phrase repeated with distinct filler between
    (7, "alpha beta gamma delta epsilon zeta one filler two "
        "alpha beta gamma delta epsilon zeta three filler four "
        "alpha beta gamma delta epsilon zeta"),
]


def _tokens(text: str) -> list[str]:
    import re

    return [t for t in re.sub(r"[^\w]+", " ", text.lower()).split() if t]


def _brute(text: str) -> dict[str, float]:
    """Independent per-doc reference implementation (pure Python)."""
    lines = text.split("\n")
    n_dup = len(lines) - len(set(lines))
    lc = sum(len(x) for x in lines)
    dlc = lc - sum(len(x) for x in set(lines))
    toks = _tokens(text)
    c = sum(len(t) for t in toks)
    out = {
        "dup_line_frac": round(n_dup / len(lines), 6) if lines else 0.0,
        "dup_line_char_frac": round(dlc / lc, 6) if lc else 0.0,
    }
    for g in repetition.TOP_NS + repetition.DUP_NS:
        grams = [tuple(toks[i : i + g]) for i in range(len(toks) - g + 1)]
        counts: dict[tuple, int] = {}
        for gr in grams:
            counts[gr] = counts.get(gr, 0) + 1
        key = f"top{g}_gram_char_frac" if g in repetition.TOP_NS else f"dup{g}_gram_char_frac"
        if not grams or c == 0:
            out[key] = 0.0
        elif g in repetition.TOP_NS:
            best = max(
                counts[gr] * sum(len(t) for t in gr) for gr in counts
            )
            out[key] = round(best / c, 6)
        else:
            covered = set()
            for i, gr in enumerate(grams):
                if counts[gr] >= 2:
                    covered.update(range(i, i + g))
            out[key] = round(sum(len(toks[p]) for p in covered) / c, 6)
    return out


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    rows = (
        repetition.repetition_scores(df, "doc_id", "text")
        .orderBy("id")
        .collect()
    )
    return {r["id"]: r.asDict() for r in rows}


def test_kernel_matches_bruteforce(scored):
    for doc_id, text in DOCS:
        want = _brute(text)
        got = scored[doc_id]
        for k, v in want.items():
            assert got[k] == pytest.approx(v, abs=1e-9), (doc_id, k, got[k], v)


def test_planted_signals_are_nonzero(scored):
    assert scored[1]["dup_line_frac"] > 0
    assert scored[1]["dup_line_char_frac"] > 0
    assert scored[1]["dup10_gram_char_frac"] > 0  # 12-token repeated run
    assert scored[2]["top2_gram_char_frac"] > repetition.GOPHER_THRESHOLDS[
        "top2_gram_char_frac"
    ]
    assert not scored[2]["gopher_pass"]
    assert scored[3]["top2_gram_char_frac"] > 1.0  # overlap-counted product
    assert scored[7]["dup6_gram_char_frac"] > 0
    assert scored[7]["dup7_gram_char_frac"] == 0.0  # phrase is only 6 long


def test_edge_docs_are_all_zero_and_pass(scored):
    for doc_id in (4, 5):  # empty / whitespace-only
        row = scored[doc_id]
        assert all(
            row[k] == 0.0 for k in repetition.GOPHER_THRESHOLDS
        ), row
        assert row["gopher_pass"]
    # a 2-token doc's single 2-gram IS its whole text: top2 == 1.0 — the
    # signal legitimately flags degenerate-short docs (Gopher applies a
    # separate min-length gate before these filters)
    assert scored[6]["top2_gram_char_frac"] == 1.0
    assert scored[6]["top3_gram_char_frac"] == 0.0
    assert not scored[6]["gopher_pass"]


def test_duckdb_oracle_parity_on_nonzero_values(spark, tmp_path):
    """The sf0.01 driver gate sees zeros in the dup columns (word-salad
    docs); this re-runs the SAME oracle SQL against the planted docs so
    the parity evidence covers nonzero values of every column."""
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    path = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(path)
    got = (
        repetition.repetition_scores(df, "doc_id", "text", "md5")
        .orderBy("id")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = con.sql(
        repetition.sql_repetition_scores("documents", "doc_id", "text")
        + " ORDER BY doc_id"
    ).df()
    assert list(got["id"]) == list(want["doc_id"])
    for col in want.columns:
        if col == "doc_id":
            continue
        assert (got[col].values == want[col].values).all(), col


def test_paragraph_signals(spark):
    df = spark.createDataFrame(
        [(1, "para one here\n\npara two body\n\npara one here")],
        "doc_id bigint, text string",
    )
    row = repetition.repetition_scores(
        df, "doc_id", "text", include_paragraphs=True
    ).collect()[0]
    assert row["dup_para_frac"] == pytest.approx(round(1 / 3, 6))
    assert row["dup_para_frac"] > 0


def test_plan_is_one_kernel_pass_no_shuffle(spark):
    """Scorer = projection + ONE Arrow kernel (PythonMapInArrow), no
    exchange and no row-wise Python — the embarrassingly-parallel shape
    that holds at any corpus size."""
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    plan = (
        repetition.repetition_scores(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInArrow") == 1
    assert "Exchange" not in plan


def test_gopher_filter_drops_spam_keeps_schema(spark):
    """gopher_filter removes repetition-heavy docs, keeps clean ones, and
    preserves the input schema (all original columns ride through the
    kernel batch)."""
    # clean doc must be realistically long: on a short doc even a
    # count-1 top 2-gram exceeds 20% of the characters (Gopher gates on
    # >= 50 words before applying these filters)
    clean = " ".join(f"word{i:02d} item{i:02d}" for i in range(30))
    df = spark.createDataFrame(
        [
            (1, clean, "en"),
            (2, "buy now " * 30, "en"),  # dup-2-gram spam
        ],
        "doc_id bigint, text string, lang string",
    )
    out = repetition.gopher_filter(df, "doc_id", "text")
    assert out.columns == ["doc_id", "text", "lang"]
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["lang"] == "en"


def test_gopher_filter_plan_is_zero_shuffle(spark):
    """The quality gate is a pure map: projection + one Arrow kernel +
    filter — no Exchange, no join back on id, no row Python."""
    df = spark.createDataFrame(
        [(1, "some text here", "en")], "doc_id bigint, text string, lang string"
    )
    plan = (
        repetition.gopher_filter(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInArrow") == 1
