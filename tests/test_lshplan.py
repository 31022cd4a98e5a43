"""LSH band-plan chooser (operators/lsh.py plan_bands): the recall gate
reproduces the shipped config, weights steer the trade-off, and the
S-curve areas are internally consistent. Pure driver math — no Spark."""

from __future__ import annotations

from entity_deduplication_hack_main_spark.config import DedupConfig
from entity_deduplication_hack_main_spark.operators.lsh import plan_bands


def test_gated_pick_reproduces_shipped_config():
    cfg = DedupConfig()
    best = plan_bands(cfg.bands * cfg.rows_per_band, 0.7)[0]
    assert (best["bands"], best["rows_per_band"]) == (
        cfg.bands,
        cfg.rows_per_band,
    )
    assert best["meets_recall_gate"] and best["p_at_threshold"] >= 0.999


def test_ungated_area_minimum_would_miss_threshold_pairs():
    """The plan the recall gate exists to reject: the raw area minimum at
    t=0.7 is 16x8 with P(t)=0.61 — documented in the docstring."""
    plans = plan_bands(128, 0.7)
    by_err = min(plans, key=lambda p: p["error"])
    assert (by_err["bands"], by_err["rows_per_band"]) == (16, 8)
    assert not by_err["meets_recall_gate"]
    assert plans[0] != by_err  # the gate overrode the raw minimum


def test_fp_weight_pushes_toward_more_rows_per_band():
    recall_first = plan_bands(128, 0.7, min_p_at_threshold=0.0)[0]
    precision_first = plan_bands(
        128, 0.7, min_p_at_threshold=0.0, fn_weight=1.0, fp_weight=20.0
    )[0]
    assert precision_first["rows_per_band"] >= recall_first["rows_per_band"]
    assert precision_first["fp_area"] <= recall_first["fp_area"]


def test_every_factorization_enumerated_and_areas_bounded():
    plans = plan_bands(64, 0.5)
    assert sorted(p["rows_per_band"] for p in plans) == [
        1, 2, 4, 8, 16, 32, 64,
    ]
    for p in plans:
        assert p["bands"] * p["rows_per_band"] == 64
        assert 0.0 <= p["fn_area"] <= 1.0 and 0.0 <= p["fp_area"] <= 1.0
