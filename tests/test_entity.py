"""Entity-record verification tests — reference semantics parity
(similarity_utils.py:58-104, output_utils.py:60-73)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.operators import entity


FIELDS = ["name", "email", "birthDate"]


@pytest.fixture(scope="module")
def records(spark):
    a = spark.createDataFrame(
        [
            ("a1", "alice cooper", "alice@x.com", "1990-01-01"),
            ("a2", "bob dylan", "bob@x.com", "1980-05-05"),
            ("a3", "carol king", "", "1970-03-03"),
            ("a4", "General Hospital", "gh@x.com", ""),
        ],
        f"id string, {', '.join(f + ' string' for f in FIELDS)}",
    )
    b = spark.createDataFrame(
        [
            ("b1", "alice cooper", "alice@x.com", "1990-01-01"),  # exact
            ("b2", "bob dilan", "bob@x.com", "1980-05-05"),       # near
            ("b3", "xavier zz", "zz@y.org", "2000-12-12"),        # conflict
            ("b4", "GH", "gh@x.com", None),                       # acronym
            ("b5", "carol king", None, None),                     # 1 common
        ],
        f"id string, {', '.join(f + ' string' for f in FIELDS)}",
    )
    return a, b


def _verify(spark, records, pairs, **kw):
    a, b = records
    pdf = spark.createDataFrame(pairs, "id1 string, id2 string")
    return {
        (r["id1"], r["id2"]): r.asDict()
        for r in entity.verify_entity_pairs(pdf, a, b, FIELDS, **kw).collect()
    }


def test_exact_pair_is_true_duplicate(spark, records):
    out = _verify(spark, records, [("a1", "b1")])
    r = out[("a1", "b1")]
    assert r["is_exact"] and r["dup_type"] == "true_duplicate"
    assert r["status"] == "pass" and r["avg_sim"] == 1.0 and r["n_common"] == 3


def test_near_duplicate_classification(spark, records):
    out = _verify(spark, records, [("a2", "b2")])
    r = out[("a2", "b2")]
    assert not r["is_exact"]
    assert r["dup_type"] == "near-exact duplicate"
    assert r["status"] == "pass"


def test_conflict_dropped_in_filter_mode(spark, records):
    # a1 vs b3: 3 common fields, all dissimilar → fail + dropped (C3)
    out = _verify(spark, records, [("a1", "b3")])
    assert ("a1", "b3") not in out
    out2 = _verify(spark, records, [("a1", "b3")], filter_mode=False)
    r = out2[("a1", "b3")]
    assert r["status"] == "fail" and r["dup_type"] == "conflicting entry"


def test_acronym_boost(spark, records):
    # a4 name 'General Hospital' vs b4 'GH' → boosted to >= 0.95 (P7)
    out = _verify(spark, records, [("a4", "b4")])
    r = out[("a4", "b4")]
    assert r["sim_name"] >= 0.95
    assert r["status"] == "pass"


def test_adaptive_threshold_single_field(spark, records):
    # a3 vs b5: only 'name' common (b5 email/birthDate null, a3 email "")
    out = _verify(spark, records, [("a3", "b5")])
    r = out[("a3", "b5")]
    assert r["n_common"] == 1 and r["threshold"] == 0.4
    assert r["status"] == "pass"


def test_exact_requires_equal_populated_counts(spark, records):
    # a1 (3 fields) vs b4 (2 fields): even if sims were 1.0, not exact (C1)
    out = _verify(spark, records, [("a1", "b4")], filter_mode=False)
    r = out[("a1", "b4")]
    assert not r["is_exact"]


def test_sequence_matcher_mode(spark, records):
    out = _verify(spark, records, [("a2", "b2")], use_sequence_matcher=True)
    r = out[("a2", "b2")]
    from difflib import SequenceMatcher

    expected = SequenceMatcher(None, "bob dylan", "bob dilan").ratio()
    assert abs(r["sim_name"] - expected) < 1e-9


def test_match_report_structure(spark, records):
    a, b = records
    pairs = spark.createDataFrame([("a1", "b1")], "id1 string, id2 string")
    v = entity.verify_entity_pairs(pairs, a, b, FIELDS)
    rep = entity.match_report(v, a, b, FIELDS).collect()
    assert len(rep) == 1
    row = rep[0]
    assert row["duplication_type"] == "true_duplicate"
    e1 = row["entities"]["entity1"]
    assert e1["subject"] == "a1"
    assert {p["predicate"] for p in e1["predicates"]} == set(FIELDS)
    assert isinstance(row["avg_literal_similarity"], str)  # stringified
