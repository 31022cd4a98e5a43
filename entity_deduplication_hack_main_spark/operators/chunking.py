"""Long-document chunking — the curation → training handoff for docs that
exceed a context budget.

Splits each document into token-windowed chunks (optionally overlapping,
the usual long-doc training recipe) over the engine's RAW-byte
decomposition (operators/suffix.py cut_spans_raw's coordinate system:
``text = sep[0] + tok[0] + sep[1] + … + tok[n-1] + sep[n]`` with tok = the
maximal ``[\\p{L}\\p{N}]+`` runs, byte-exact, original case). Chunk k
covers raw tokens [k·step, k·step + max_tokens) with
``step = max_tokens − overlap``; chunk_text carries the ORIGINAL bytes —
interior separators included, the doc's leading separator attached to
chunk 0 — so with ``overlap = 0`` concatenating a doc's chunks in
chunk_id order reconstructs the input byte-exactly (property-tested, the
same fidelity bar as raw span cutting).

Unlike span cutting, chunk boundaries are defined directly on the raw
runs (no normalized tokenization involved), so there is no alignment
hazard: every doc chunks, including empty/whitespace-only ones (one chunk
holding the text verbatim).

Scale: one regexp pass for runs + one for separators + an explode of
O(n_tokens / step) chunk indices per doc — narrow JVM expressions, zero
shuffle, zero Python. The explode's output volume is the corpus text
(+ overlap fraction), i.e. the same order as the corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.functions import textnorm  # noqa: F401

_RAW_TOKEN_PAT = r"[\p{L}\p{N}]+"


def chunk_docs(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text) — one row
    per chunk; 0 ≤ overlap < max_tokens."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    text = F.col(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract_all(text, F.lit(_RAW_TOKEN_PAT), 0).alias("_rt"),
        F.split(text, _RAW_TOKEN_PAT).alias("_seps"),
    )
    n = F.size("_rt")
    # ceil(max(n - max_tokens, 0) / step) + 1 chunks: the last chunk's end
    # reaches n, short tails allowed, no chunk fully inside its predecessor
    extra = F.greatest(n - F.lit(max_tokens), F.lit(0))
    n_chunks = (
        F.floor((extra + F.lit(step - 1)) / F.lit(step)).cast("int") + 1
    )
    pieces = F.zip_with(
        F.col("_rt"),
        F.slice(F.col("_seps"), 2, F.size("_rt")),
        lambda t, s: F.concat(t, s),
    )
    exploded = base.select(
        "doc_id",
        "_rt",
        "_seps",
        pieces.alias("_pieces"),
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    s = F.col("chunk_id") * F.lit(step)
    e = F.least(s + F.lit(max_tokens), F.col("_n"))
    body = F.array_join(F.slice("_pieces", s + 1, e - s), "")
    return exploded.select(
        "doc_id",
        "chunk_id",
        s.cast("int").alias("start_tok"),
        (e - s).cast("int").alias("n_chunk_tokens"),
        F.concat(
            F.when(F.col("chunk_id") == 0, F.element_at("_seps", 1)).otherwise(
                F.lit("")
            ),
            body,
        ).alias("chunk_text"),
    )


def sql_chunk_docs(
    max_tokens: int,
    overlap: int = 0,
    doc_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SELECT matching :func:`chunk_docs` byte-for-byte (same
    decomposition idioms as suffix.sql_cut_spans_raw; array_to_string of
    an empty list is NULL in DuckDB — coalesced)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    pat = "[\\p{L}\\p{N}]+"
    return f"""
WITH _docs AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all({text_col}, '{pat}') AS rt,
         string_split_regex({text_col}, '{pat}') AS seps
  FROM {doc_table}
),
_d AS (
  SELECT doc_id, seps,
         list_transform(rt, (t, i) -> t || seps[i + 1]) AS pieces,
         len(rt)::INT AS n,
         (floor((greatest(len(rt)::INT - {max_tokens}, 0) + {step - 1})
                / {step})::INT + 1) AS n_chunks
  FROM _docs
),
_e AS (
  SELECT doc_id, seps, pieces, n,
         unnest(range(n_chunks))::INT AS chunk_id
  FROM _d
)
SELECT doc_id, chunk_id,
       (chunk_id * {step})::INT AS start_tok,
       (least(chunk_id * {step} + {max_tokens}, n)
          - chunk_id * {step})::INT AS n_chunk_tokens,
       ((CASE WHEN chunk_id = 0 THEN coalesce(seps[1], '') ELSE '' END)
        || coalesce(array_to_string(
             pieces[chunk_id * {step} + 1 :
                    least(chunk_id * {step} + {max_tokens}, n)], ''), ''))
         AS chunk_text
FROM _e
"""
