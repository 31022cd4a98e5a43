"""BM25 top-k lexical search over the corpus.

A curation/analytics engine needs ranked lexical retrieval — auditing a
dedup decision ("show me the docs about X"), pulling quality probes, or
building weak labels all start from a corpus search. This is the
classic Okapi BM25 (Robertson & Walker, SIGIR'94 — public) expressed as
pure DataFrame ops: tokenize (the engine's normalizer, so search and
dedup agree on what a token is) → keep only query-term postings →
per-(doc, term) tf → per-term df → score → global top-k.

Scale shape (100 TB lens):
- the explode is immediately filtered to the query's terms: only
  matching postings survive the map side, so the tf shuffle carries
  O(matching tokens), not O(corpus tokens);
- df and the corpus stats (N, avgdl) are tiny aggregates, broadcast;
- the per-doc sum folds the per-term scores in SORTED TERM ORDER via a
  collected (bounded by |query|) struct array — bit-stable across
  partitionings and engines (the groupBy-sum float-order trap);
- top-k is TakeOrdered (orderBy + limit), never a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.functions import textnorm


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score, rank): top-k docs by BM25 over the normalized
    whitespace tokens. Docs containing none of the query terms score 0
    and are not returned. Ties break to the lower id (deterministic)."""
    terms = sorted(set(query_terms))
    base = docs.select(
        F.col(id_col).alias("id"),
        textnorm.tokens(textnorm.normalize(F.col(text_col))).alias("toks"),
    ).select("id", "toks", F.size("toks").cast("double").alias("dl"))

    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    tf = (
        base.select("id", "dl", F.explode("toks").alias("t"))
        .where(F.col("t").isin(terms))
        .groupBy("id", "dl", "t")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dft = tf.groupBy("t").agg(
        F.count("*").cast("double").alias("df")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(dft), "t")
        .join(F.broadcast(stats))
        .select("id", "t", term_score.alias("s"))
    )
    # fixed-order fold (sorted by term) so the float sum is bit-stable
    per_doc = (
        scored.groupBy("id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("t"), F.col("s")))
            ).alias("ts")
        )
        .select(
            "id",
            F.round(
                F.aggregate(
                    F.col("ts"), F.lit(0.0), lambda acc, x: acc + x["s"]
                ),
                6,
            ).alias("score"),
        )
    )
    topk = per_doc.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return topk.select(
        F.col("id").alias(id_col),
        "score",
        F.row_number().over(w).alias("rank"),
    )


def sql_bm25_topk(
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    doc_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bm25_topk`: same tokenizer, same formula,
    same sorted-term sum order, same tie-break."""
    terms = sorted(set(query_terms))
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = textnorm.sql_tokens(textnorm.sql_normalize(text_col))
    return f"""
WITH _base AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {doc_table}
),
_dl AS (SELECT id, len(toks)::DOUBLE AS dl, toks FROM _base),
_stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM _dl),
_tf AS (
  SELECT id, dl, t, count(*)::DOUBLE AS tf
  FROM (SELECT id, dl, unnest(toks) AS t FROM _dl)
  WHERE t IN ({term_list})
  GROUP BY id, dl, t
),
_df AS (SELECT t, count(*)::DOUBLE AS df FROM _tf GROUP BY t),
_scored AS (
  SELECT _tf.id, _tf.t,
         ln(1.0 + (_stats.n_docs - _df.df + 0.5) / (_df.df + 0.5))
         * (_tf.tf * ({k1} + 1.0)
            / (_tf.tf + {k1} * (1.0 - {b} + {b} * _tf.dl / _stats.avgdl)))
         AS s
  FROM _tf JOIN _df USING (t) CROSS JOIN _stats
),
_doc AS (
  SELECT id, round(list_sum(list(s ORDER BY t)), 6) AS score
  FROM _scored GROUP BY id
)
SELECT id AS {id_col}, score,
       row_number() OVER (ORDER BY score DESC, id ASC) AS rank
FROM _doc
ORDER BY score DESC, id ASC
LIMIT {k}
"""
