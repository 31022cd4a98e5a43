"""Corpus line-level dedup (operators/linededup.py) — semantics, document
preservation, plan shape, and behavior on the synthetic web corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.operators import linededup
from entity_deduplication_hack_main_spark.sources import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_keep_first_semantics(spark):
    """Only the globally first occurrence (by (id, line_no)) of each line
    survives; later occurrences — within the same doc or across docs —
    are removed."""
    docs = _docs(
        spark,
        [
            (1, "alpha\nshared\nalpha"),  # within-doc repeat of 'alpha'
            (2, "shared\nbeta"),  # cross-doc repeat of 'shared'
            (3, "gamma"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in linededup.dedup_lines(docs)
        .withColumnRenamed("id", "doc_id")
        .collect()
    }
    assert out[1]["text"] == "alpha\nshared"
    assert out[1]["n_removed"] == 1  # the second 'alpha'
    assert out[2]["text"] == "beta"  # 'shared' first occurred in doc 1
    assert out[2]["n_removed"] == 1
    assert out[3]["text"] == "gamma"
    assert out[3]["n_removed"] == 0


def test_boilerplate_rule_drops_all_occurrences(spark):
    """max_doc_freq removes a line EVERYWHERE once it appears in more
    than k distinct docs — including its first occurrence."""
    docs = _docs(
        spark,
        [
            (1, "banner\nbody one"),
            (2, "banner\nbody two"),
            (3, "banner\nbody three"),
        ],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in linededup.dedup_lines(
            docs, keep_first=False, max_doc_freq=2
        )
        .withColumnRenamed("id", "doc_id")
        .collect()
    }
    assert out == {1: "body one", 2: "body two", 3: "body three"}


def test_all_docs_preserved_even_when_emptied(spark):
    docs = _docs(spark, [(1, "same"), (2, "same"), (3, "same")])
    out = (
        linededup.dedup_lines(docs, keep_first=False, max_doc_freq=1)
        .orderBy("id")
        .collect()
    )
    assert [r["id"] for r in out] == [1, 2, 3]
    assert all(r["text"] == "" and r["n_kept"] == 0 for r in out)


def test_duplicate_line_stats_counts(spark):
    docs = _docs(
        spark, [(1, "x\ny\nx"), (2, "x\nz"), (3, "unique line")]
    )
    stats = {
        r["line"]: (r["n_docs"], r["n_occurrences"])
        for r in linededup.duplicate_line_stats(docs).collect()
    }
    assert stats == {"x": (2, 3)}


def test_no_python_and_partial_agg_in_plan(spark):
    """The line-dedup plan is pure JVM (no BatchEvalPython) and the
    per-line aggregate partially aggregates (map-side combine) so hot
    boilerplate lines never concentrate raw occurrences on a reducer."""
    docs = _docs(spark, [(1, "a\nb"), (2, "a\nc")])
    plan = (
        linededup.dedup_lines(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "partial_" in plan  # partial min/count before the shuffle


def test_line_dedup_on_synthetic_corpus_removes_shared_sentences(spark):
    """On the Common-Crawl-style corpus, exact-copy duplicates lose ALL
    their lines to their original (keep-first), while originals keep
    theirs; originals' texts are reconstructed byte-exactly."""
    docs = corpus.synthesize_corpus(
        spark, n_docs=60, dup_fraction=0.4, seed=7
    ).cache()
    out = linededup.dedup_lines(docs, id_col="doc_id", text_col="text")
    joined = (
        out.withColumnRenamed("text", "text_dedup")
        .join(docs.select("doc_id", "text", "variation_type"), out["id"] == F.col("doc_id"))
        .collect()
    )
    exact = [r for r in joined if r["variation_type"] == "exact_copy"]
    originals = [r for r in joined if r["variation_type"] == "original"]
    assert exact, "fixture must contain exact copies"
    # exact copies: every line already occurred in the original (lower id)
    assert all(r["n_kept"] == 0 for r in exact)
    # originals whose lines are unique: byte-exact reconstruction
    untouched = [r for r in originals if r["n_removed"] == 0]
    assert untouched, "some originals must be untouched"
    assert all(r["text_dedup"] == r["text"] for r in untouched)
    docs.unpersist()


def test_pipeline_line_dedup_preserves_recall(spark, tmp_path):
    """A boilerplate banner line planted into EVERY doc is removed by the
    line_dedup pre-stage (doc-frequency rule) and dup-pair recall stays
    1.0 — the rule never empties a genuine 2-copy duplicate pair. Also
    covers the quality_filter stage wiring (word-salad docs pass)."""
    from entity_deduplication_hack_main_spark.config import DedupConfig
    from entity_deduplication_hack_main_spark.operators import evaluate
    from entity_deduplication_hack_main_spark.plans.pipeline import run_pipeline

    n = 200
    base = corpus.synthesize_corpus(
        spark, n_docs=n, dup_fraction=0.4, seed=11
    )
    banner = "accept all cookies to continue reading this site"
    docs = base.withColumn(
        "text", F.concat(F.lit(banner + "\n"), F.col("text"))
    ).cache()
    docs.count()
    res = run_pipeline(
        spark,
        docs,
        DedupConfig(),
        workdir=str(tmp_path / "wd"),
        line_dedup_max_doc_freq=8,
        gopher_filter=True,
    )
    stage_names = [e["stage"] for e in res.committer.events]
    assert "line_dedup" in stage_names and "quality_filter" in stage_names
    golden = corpus.golden_pairs(spark, n, 0.4)
    recall = evaluate.cluster_recall(res.assignments, golden)
    assert recall >= 0.99, recall
    # no document was dropped: banner removal never empties these docs
    assert res.assignments.count() == n
    docs.unpersist()
