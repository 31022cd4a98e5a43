"""Learned document-quality classifier — the GPT-3/CCNet recipe.

The published curation stacks pair their RULE-based quality gates (Gopher
thresholds, CCNet perplexity buckets — both implemented in
functions/textstats.py and functions/lm.py) with a LEARNED one: a linear
classifier trained to score how much a crawl page resembles a
reference-quality corpus (GPT-3 trained LR over hashed features with
WebText as the positive class; CCNet a fastText model against Wikipedia).
This module is that operator, built on the same split as the learned pair
classifier (operators/learned.py, J5): the FIT is driver-side numpy IRLS
over a bounded labeled sample (reference docs = label 1, raw crawl =
label 0 — labels come from corpus membership, so they are free), and the
APPLY is a pure JVM expression over per-doc quality features, so scoring
10^12 docs stays inside whole-stage codegen with zero Python.

Features are the engine's existing one-pass quality signals (Gopher
columns + stopword/distinct ratios), NOT hashed bag-of-words: at 100 TB
the feature pass is the same narrow map the rule-based gates already pay,
and the model stays interpretable (a weight per named signal). Swapping in
a richer feature set (hashed n-grams via the shingle kernel) changes only
``doc_quality_features``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.functions import textnorm, textstats
from entity_deduplication_hack_main_spark.operators import learned

#: feature order is part of the model contract (weights are keyed by name)
QUALITY_FEATURES = [
    "log_n_words",
    "mean_word_len",
    "symbol_word_ratio",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "alpha_word_frac",
    "stopword_frac",
    "distinct_token_frac",
]


def doc_quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, <QUALITY_FEATURES>): per-doc quality signals, all JVM
    expressions, one raw-word split + one normalized tokenize per row."""
    g = textstats.gopher_quality_cols(F.col(text_col))
    toks = textnorm.tokens(textnorm.normalize(F.col(text_col)))
    nt = F.size(toks)

    def ratio(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    return docs.select(
        id_col,
        F.log1p(g["n_words"]).alias("log_n_words"),
        g["mean_word_len"].alias("mean_word_len"),
        g["symbol_word_ratio"].alias("symbol_word_ratio"),
        g["bullet_line_frac"].alias("bullet_line_frac"),
        g["ellipsis_line_frac"].alias("ellipsis_line_frac"),
        g["alpha_word_frac"].alias("alpha_word_frac"),
        ratio(g["n_stop_hits"], F.lit(len(textstats.GOPHER_STOPWORDS))).alias(
            "stopword_frac"
        ),
        ratio(F.size(F.array_distinct(toks)), nt).alias("distinct_token_frac"),
    )


def fit_quality_classifier(
    reference_docs: DataFrame,
    crawl_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_rows: int = 200_000,
) -> dict:
    """Fit the quality LR: reference corpus = 1, raw crawl = 0 (the GPT-3
    labeling — corpus membership IS the label, no human annotation).
    Returns the learned.py model dict ({"intercept", "weights", "n"});
    the deterministic hash-ordered subsample rule is inherited."""
    ref = doc_quality_features(reference_docs, id_col, text_col).withColumn(
        "label", F.lit(1)
    )
    crawl = doc_quality_features(crawl_docs, id_col, text_col).withColumn(
        "label", F.lit(0)
    )
    labeled = ref.unionByName(crawl).drop(id_col)
    return learned.fit_pair_classifier(
        labeled, QUALITY_FEATURES, max_rows=max_rows
    )


def quality_classifier_score(model: dict) -> Column:
    """JVM sigmoid score column over a doc_quality_features frame."""
    return learned.classifier_score(model)


def score_docs(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float | None = None,
) -> DataFrame:
    """(id_col, quality_prob[, keep]): apply the learned gate corpus-wide —
    one narrow JVM map, no shuffle, no Python. ``keep_threshold`` adds the
    GPT-3-style keep column (they additionally Pareto-sampled near the
    threshold; a caller can reproduce that with sampling.py)."""
    feats = doc_quality_features(docs, id_col, text_col)
    out = feats.select(
        id_col, quality_classifier_score(model).alias("quality_prob")
    )
    if keep_threshold is not None:
        out = out.withColumn(
            "keep", F.col("quality_prob") >= F.lit(float(keep_threshold))
        )
    return out
