"""Deterministic corpus sampling for token-budget curation.

Two training-data curation primitives over a deduped corpus:

- :func:`proportional_token_sample`: keep a deterministic subset whose
  expected token mass equals a target budget. Selection rule: doc kept
  iff ``md5_long(id) < fraction * 2^60`` with
  ``fraction = budget_tokens / total_tokens`` — a pure function of the
  doc id, so the sample is stable across partitionings, executor counts,
  and re-runs (resume-safe), and any two budgets are NESTED (a 10%
  sample is a subset of the 20% sample — the property curriculum/scaling
  studies need from a sampler).
- :func:`balanced_source_sample`: equalize token mass across a group
  column (crawl snapshot, domain bucket, language): every group is
  sampled down to the SMALLEST group's token total, same hash rule with
  a per-group fraction.

Scale shape: one partial aggregation for the totals (rows = number of
groups, broadcast back), then a stateless per-row hash filter — NO
global sort. The obvious alternative (order by hash, take docs until the
running token sum hits the budget exactly) is a total ordering = one
reducer at 10^12 docs; the proportional rule trades exact-budget for a
(tight, Chernoff-bounded) expected budget and stays embarrassingly
parallel. Exactness at the margin is never worth a global sort on a
training corpus.

Both engines evaluate the SAME selection predicate (md5-based 60-bit
hash, double-precision threshold), so the sampled id set is bit-stable
cross-engine — the oracle checks membership, not just counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.functions import hashes, textnorm

_HASH_SPACE = float(1 << 60)


def _n_tokens(text: Column) -> Column:
    return textnorm.token_count(textnorm.normalize(text)).cast("bigint")


def proportional_token_sample(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens) of the kept docs; expected token mass =
    min(budget_tokens, total)."""
    toks = docs.select(
        F.col(id_col),
        hashes.md5_long(F.col(id_col).cast("string")).alias("_h"),
        _n_tokens(F.col(text_col)).alias("n_tokens"),
    )
    total = toks.agg(
        F.sum(F.col("n_tokens").cast("decimal(38,0)")).alias("_total")
    )
    frac = F.least(
        F.lit(1.0), F.lit(float(budget_tokens)) / F.col("_total").cast("double")
    )
    return (
        toks.crossJoin(F.broadcast(total))
        .where(F.col("_h") < frac * F.lit(_HASH_SPACE))
        .select(id_col, "n_tokens")
    )


def balanced_source_sample(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, group, n_tokens) sampled so every group's expected token
    mass equals the smallest group's total."""
    toks = docs.select(
        F.col(id_col),
        F.col(group_col),
        hashes.md5_long(F.col(id_col).cast("string")).alias("_h"),
        _n_tokens(F.col(text_col)).alias("n_tokens"),
    )
    per_group = toks.groupBy(group_col).agg(
        F.sum(F.col("n_tokens").cast("decimal(38,0)"))
        .cast("double")
        .alias("_gt")
    )
    target = per_group.agg(F.min("_gt").alias("_target"))
    fractions = per_group.crossJoin(F.broadcast(target)).select(
        group_col, (F.col("_target") / F.col("_gt")).alias("_frac")
    )
    return (
        toks.join(F.broadcast(fractions), group_col)
        .where(F.col("_h") < F.col("_frac") * F.lit(_HASH_SPACE))
        .select(id_col, group_col, "n_tokens")
    )


# --- DuckDB oracle renderings ---------------------------------------------


def sql_proportional_token_sample(
    budget_tokens: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    nt = f"len({textnorm.sql_tokens(textnorm.sql_normalize(text_expr))})"
    h = hashes.sql_md5_long(f"{id_col}::VARCHAR")
    return f"""
WITH t AS (SELECT {id_col}, {h} AS _h, {nt}::BIGINT AS n_tokens FROM {table}),
tot AS (SELECT sum(n_tokens)::DOUBLE AS _total FROM t)
SELECT {id_col}, n_tokens
FROM t, tot
WHERE _h < least(1.0, {float(budget_tokens)} / _total) * {_HASH_SPACE}
"""


def sql_balanced_source_sample(
    table: str = "documents",
    group_col: str = "source",
    id_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    nt = f"len({textnorm.sql_tokens(textnorm.sql_normalize(text_expr))})"
    h = hashes.sql_md5_long(f"{id_col}::VARCHAR")
    return f"""
WITH t AS (SELECT {id_col}, {group_col}, {h} AS _h,
                  {nt}::BIGINT AS n_tokens FROM {table}),
g AS (SELECT {group_col}, sum(n_tokens)::DOUBLE AS _gt FROM t GROUP BY 1),
m AS (SELECT min(_gt) AS _target FROM g),
f AS (SELECT {group_col}, _target / _gt AS _frac FROM g, m)
SELECT t.{id_col}, t.{group_col}, t.n_tokens
FROM t JOIN f USING ({group_col})
WHERE t._h < f._frac * {_HASH_SPACE}
"""


# --- GPT-3 quality-weighted Pareto sampling --------------------------------


def _int_pow(base, n: int, mul):
    """base**n as an explicit multiplication tree (binary exponentiation,
    n >= 1). Shared recursion for the Spark Column and the SQL string so
    both engines evaluate the SAME association order — identical IEEE
    rounding, no libm pow (whose last ulp differs across engines)."""
    if n == 1:
        return base
    half = _int_pow(base, n // 2, mul)
    sq = mul(half, half)
    return mul(sq, base) if n % 2 else sq


def pareto_quality_sample(
    docs: DataFrame,
    score_col: str,
    alpha: int = 9,
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-3's quality-weighted keep rule: a doc with quality score s in
    [0, 1] is kept iff ``pareto(alpha) > 1 - s`` (their appendix A:
    np.random.pareto(9) — low-scored docs survive with small probability
    instead of a hard threshold, which keeps the tail of the distribution
    represented). Evaluated DETERMINISTICALLY: the Pareto draw's inverse
    CDF turns the rule into ``u < (2 - s)^-alpha`` with u uniform; u comes
    from the same md5 60-bit hash as every other sampler here, and the
    predicate is rearranged to ``u * (2 - s)^alpha < 1`` with the integer
    power as an explicit multiplication tree — only +,*,/ on doubles, so
    the keep set is bit-stable across partitionings AND engines (the
    oracle replays membership exactly; libm pow would differ in the last
    ulp). Keep probability: 1 at s=1, 2^-alpha (~0.2% at alpha=9) at s=0.

    Output: docs + (pareto_u, kept). Stateless per-row filter — no
    shuffle, no sort, resume-safe, nested across alpha like the other
    samplers are across budgets.
    """
    u = hashes.md5_long(F.col(id_col).cast("string")).cast(
        "double"
    ) / F.lit(_HASH_SPACE)
    y = F.lit(2.0) - F.col(score_col).cast("double")
    p = _int_pow(y, int(alpha), lambda a, b: a * b)
    return docs.withColumn("pareto_u", u).withColumn(
        "kept", F.col("pareto_u") * p < F.lit(1.0)
    )


def sql_pareto_quality_sample_predicate(
    score_expr: str, alpha: int = 9, id_col: str = "doc_id"
) -> tuple[str, str]:
    """(u_expr, kept_expr) DuckDB twins of :func:`pareto_quality_sample` —
    same hash, same multiplication tree."""
    u = f"({hashes.sql_md5_long(f'{id_col}::VARCHAR')}::DOUBLE / {_HASH_SPACE})"
    y = f"(2.0 - ({score_expr})::DOUBLE)"
    p = _int_pow(y, int(alpha), lambda a, b: f"({a} * {b})")
    return u, f"({u} * {p} < 1.0)"
