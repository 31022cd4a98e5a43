"""Pairwise similarity scalar functions.

Reference parity (modular_methods/similarity_utils.py):
- P6 string similarity: the reference uses difflib.SequenceMatcher.ratio()
  (Ratcliff–Obershelp, despite being called "Levenshtein_filter",
  similarity_utils.py:35-39). We provide (a) a JVM normalized-Levenshtein
  expression for the hot path and (b) a bit-compatible SequenceMatcher
  pandas UDF for reference-parity verification (NOT a hot-path op).
- P7 acronym boost: similarity_utils.py:42-47, :77-80 — if one value's
  acronym equals the other with spaces stripped (either direction), similarity
  is boosted to max(sim, 0.95).
- P8 adaptive threshold: similarity_utils.py:49-54 — pass threshold depends
  on the number of compared fields {1:0.4, 2:0.55, 3:0.7, 4:0.8, else 0.85}.
- E6/E7 cosine: dedup_pipeline.py:45-48 — expressed as zip_with/aggregate
  over array<float> embedding columns (JVM, codegen).
"""

from __future__ import annotations

from collections.abc import Iterator
from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# --- string similarity (JVM hot path) ------------------------------------


def norm_levenshtein_sim(a: Column, b: Column) -> Column:
    """1 - levenshtein/max(len) on lowercased inputs, in [0, 1].

    Two empty strings compare as 1.0 (reference compares "" == "" → ratio 1).
    """
    la, lb = F.lower(a), F.lower(b)
    longest = F.greatest(F.length(la), F.length(lb))
    return F.when(longest == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(la, lb) / longest
    )


def sql_norm_levenshtein_sim(a: str, b: str) -> str:
    return (
        f"CASE WHEN greatest(length(lower({a})), length(lower({b}))) = 0 THEN 1.0 "
        f"ELSE 1.0 - levenshtein(lower({a}), lower({b})) "
        f"/ greatest(length(lower({a})), length(lower({b}))) END"
    )


def acronym(col: Column) -> Column:
    """First character of each word-character run, uppercased — parity with
    the reference's ``re.findall(r'\\b\\w', s)`` (similarity_utils.py:46-47):
    hyphenated/punctuated tokens each contribute ("foo-bar" → "FB"). The
    (?U) flag gives Java regex the same Unicode \\w as Python's re."""
    words = F.filter(F.split(col, r"(?U)\W+"), lambda w: w != F.lit(""))
    return F.upper(F.array_join(F.transform(words, lambda w: F.substring(w, 1, 1)), ""))


def acronym_match(a: Column, b: Column) -> Column:
    """True iff acronym(a) == collapse(b) or acronym(b) == collapse(a)
    (similarity_utils.py:79-80). Collapse removes literal spaces only, and
    single-word values participate too — both exactly as the reference."""
    collapse_a = F.upper(F.regexp_replace(a, r" ", ""))
    collapse_b = F.upper(F.regexp_replace(b, r" ", ""))
    return (acronym(a) == collapse_b) | (acronym(b) == collapse_a)


def acronym_boosted_sim(sim: Column, a: Column, b: Column) -> Column:
    return F.when(acronym_match(a, b), F.greatest(sim, F.lit(0.95))).otherwise(sim)


def sql_acronym(x: str) -> str:
    """DuckDB rendering of :func:`acronym`. RE2's ``\\W`` is ASCII where
    Java's ``(?U)\\W`` is Unicode — identical on ASCII record fields (the
    oracle tables), diverging only on non-ASCII word characters;
    array_to_string of an empty list is NULL in DuckDB, coalesced."""
    toks = f"list_filter(regexp_split_to_array({x}, '\\W+'), w -> w != '')"
    return (
        f"upper(coalesce(array_to_string("
        f"list_transform({toks}, w -> w[1]), ''), ''))"
    )


def sql_acronym_match(a: str, b: str) -> str:
    """DuckDB rendering of :func:`acronym_match`."""
    return (
        f"({sql_acronym(a)} = upper(replace({b}, ' ', '')) OR "
        f"{sql_acronym(b)} = upper(replace({a}, ' ', '')))"
    )


def adaptive_threshold(n_fields: Column) -> Column:
    """similarity_utils.py:49-54 literal_based_threshold as a CASE chain."""
    return (
        F.when(n_fields == 1, 0.4)
        .when(n_fields == 2, 0.55)
        .when(n_fields == 3, 0.7)
        .when(n_fields == 4, 0.8)
        .otherwise(0.85)
    )


def sql_adaptive_threshold(n: str) -> str:
    # ::DOUBLE: bare literals type the CASE as DECIMAL in DuckDB, which
    # the driver's schema/value-hash compare would flag against Spark's
    # DOUBLE column even though every value is numerically equal
    return (
        f"(CASE WHEN {n} = 1 THEN 0.4 WHEN {n} = 2 THEN 0.55 "
        f"WHEN {n} = 3 THEN 0.7 WHEN {n} = 4 THEN 0.8 ELSE 0.85 END)::DOUBLE"
    )


# --- reference-bit-compatible ratio (parity testing only, not hot path) ---


def sequence_matcher_udf():
    """Exact difflib.SequenceMatcher(None, a.lower(), b.lower()).ratio()
    (similarity_utils.py:35-39). Per-row by nature — used only in parity
    tests against the reference semantics, never in the scaled pipeline."""

    @F.pandas_udf(DoubleType())
    def _ratio(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for a, b in it:
            al = a.fillna("").str.lower()
            bl = b.fillna("").str.lower()
            yield pd.Series(
                [SequenceMatcher(None, x, y).ratio() for x, y in zip(al, bl)]
            )

    return _ratio


# --- vector similarity (JVM, codegen) ------------------------------------


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (E7,
    similarity_utils.py:9-20). Null-safe: 0 norm → null."""
    d = dot(a, b)
    n = l2_norm(a) * l2_norm(b)
    return F.when(n > 0, d / n)


def l2_normalize(a: Column) -> Column:
    """E6 (dedup_pipeline.py:45-46): unit-norm vector; zero vector → nulls."""
    n = l2_norm(a)
    return F.transform(a, lambda x: F.when(n > 0, x.cast("double") / n))


def fuse(text_vec: Column, graph_vec: Column, alpha: float = 0.5) -> Column:
    """E5 hybrid fusion (embedding_utils.py:39-51):
    alpha*text + (1-alpha)*graph; missing graph vector → text side scaled
    against zeros exactly like the reference's zeros(384) fallback."""
    fused = F.zip_with(
        text_vec,
        graph_vec,
        lambda t, g: alpha * t.cast("double") + (1.0 - alpha) * g.cast("double"),
    )
    zeros_fallback = F.transform(
        text_vec, lambda t: alpha * t.cast("double")
    )
    return F.when(graph_vec.isNotNull(), fused).otherwise(zeros_fallback)
