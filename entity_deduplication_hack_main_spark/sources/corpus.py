"""Deterministic synthetic Common-Crawl-style corpus + golden oracle.

Mirrors the reference's golden-standard protocol (SURVEY.md §5): every
injected duplicate is an original perturbed by ONE labeled variation class
(FIXTURES.md §2 transposes the reference's 16 classes from
``data/test_golden_standard_high.csv`` to webtext), so recall is reportable
per class exactly as ``EvaluateVariations.ipynb cell 6`` does.

Determinism contract:
- doc ``i``'s content depends only on (seed, i) via ``np.random.default_rng
  ([seed, i])`` — independent of partitioning, executor count, or batch
  boundaries, so the corpus is reproducible at any scale and any
  parallelism (required for resume + the two-parallelism scaling evidence);
- duplicate wiring is arithmetic: ids [0, n_orig) are originals; id >= n_orig
  duplicates original ``(id * 2654435761) % n_orig`` with variation class
  ``id % len(VARIATIONS)`` — the golden_pairs table derives from the same
  formulas in pure SQL, no driver state.

Generation runs distributed via ``mapInPandas`` over ``spark.range``.
(Per-row Python inside the *fixture generator* is fine — it is test input,
not the dedup hot path.)

Schema (BASELINE.json input_hint):
  url string, warc_ts timestamp, html binary, text string, lang string
plus ground-truth helper columns doc_id, cluster_id, variation_type.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KNUTH = 2654435761  # Fibonacci-hashing multiplier for dup → orig wiring

VARIATIONS = (
    "exact_copy",
    "boilerplate_change",
    "typo",
    "token_swap",
    "abbreviation",
    "format_change",
    "expansion",
    "rename",
    "translation_stub",
    "truncation",
    "field_drop",
    "substring_containment",
)

# --- deterministic vocabulary --------------------------------------------

_CONS = ["b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t", "v", "z"]
_VOWS = ["a", "e", "i", "o", "u"]


def _build_vocab() -> list[str]:
    """~3000 deterministic words. A big vocabulary plus per-doc topic
    subsets (below) keeps independent docs' token distributions apart —
    like real topical web pages — so SimHash fingerprints separate."""
    syll = [c + v for c in _CONS for v in _VOWS]
    n = len(syll)  # 70
    vocab = []
    for i in range(3200):
        s1 = syll[i % n]
        s2 = syll[(i // n) % n]
        s3 = syll[(i * 13 + 11) % n]
        w = s1 + s2 + (s3 if i % 2 == 0 else "")
        vocab.append(w + ("x" if i % 5 == 0 else ""))
    return sorted(set(vocab))


VOCAB = _build_vocab()
TOPIC_WORDS = 160  # per-doc topical vocabulary size
EXPANSIONS = {"en": "english", "de": "german", "fr": "french", "es": "spanish", "nl": "dutch"}
TRANSLATIONS = {w: "tr" + w for w in VOCAB[:1500]}
LANG_STOPWORDS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "la"],
    "es": ["el", "que", "los"],
    "nl": ["de", "het", "een"],
}
LANGS = list(LANG_STOPWORDS)

_NAV_VARIANTS = [
    "<a href=/home>home</a> <a href=/about>about</a>",
    "<a href=/index>index</a> <a href=/contact>contact</a> <a href=/faq>faq</a>",
    "<span>menu</span>",
]
_FOOTER_VARIANTS = [
    "copyright 2024 example site",
    "all rights reserved - example network",
    "terms | privacy | imprint",
]

_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&#x27;")]


def _escape(text: str) -> str:
    for ch, ent in _ESCAPES:
        text = text.replace(ch, ent)
    return text


def _base_sentences(
    rng: np.random.Generator, lang: str, size_mult: int = 1
) -> list[list[str]]:
    """Sentences as token lists drawn from a doc-specific topical subset;
    each opens with lang stopwords (lang-ID signal). size_mult scales the
    sentence count (1 → ~10-25 sentences ≈ 230 tokens; real web pages run
    ~1-2k tokens, so benches use 3-6)."""
    n_sent = int(rng.integers(10, 26)) * size_mult
    topic = rng.choice(len(VOCAB), size=TOPIC_WORDS, replace=False)
    zipf_w = 1.0 / np.arange(1, TOPIC_WORDS + 1)
    zipf_w /= zipf_w.sum()
    sw = LANG_STOPWORDS[lang]
    sents = []
    for _ in range(n_sent):
        n_words = int(rng.integers(6, 15))
        words = [VOCAB[topic[j]] for j in rng.choice(TOPIC_WORDS, size=n_words, p=zipf_w)]
        words.insert(0, sw[int(rng.integers(0, len(sw)))])
        sents.append(words)
    # a date sentence (format_change target) placed mid-document, followed
    # by topical words so no long token run is shared across unrelated docs
    y, m, d = int(rng.integers(2015, 2025)), int(rng.integers(1, 13)), int(rng.integers(1, 29))
    mid = len(sents) // 2
    sents.insert(mid, ["published", "on", f"{y:04d}-{m:02d}-{d:02d}", "as", lang])
    return sents


def _orig_content(seed: int, doc_id: int, n_orig: int, size_mult: int = 1):
    rng = np.random.default_rng([seed, doc_id])
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    sents = _base_sentences(rng, lang, size_mult)
    title = " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), size=4))
    nav = _NAV_VARIANTS[int(rng.integers(0, len(_NAV_VARIANTS)))]
    footer = _FOOTER_VARIANTS[int(rng.integers(0, len(_FOOTER_VARIANTS)))]
    return lang, sents, title, nav, footer


def _apply_variation(
    variation: str,
    sents: list[list[str]],
    rng: np.random.Generator,
) -> list[list[str]]:
    sents = [list(s) for s in sents]
    if variation in ("exact_copy", "boilerplate_change"):
        return sents
    if variation == "typo":
        # ~2% of tokens get one char doubled → ~10% of 5-shingles touched
        for si, s in enumerate(sents):
            for wi, w in enumerate(s):
                if rng.random() < 0.02 and len(w) > 2:
                    pos = int(rng.integers(1, len(w)))
                    sents[si][wi] = w[:pos] + w[pos - 1] + w[pos:]
        return sents
    if variation == "token_swap":
        for s in sents:
            if len(s) > 3 and rng.random() < 0.3:
                i = int(rng.integers(1, len(s) - 1))
                s[i], s[i + 1] = s[i + 1], s[i]
        return sents
    if variation == "abbreviation":
        for s in sents:
            for wi, w in enumerate(s):
                if rng.random() < 0.02 and len(w) > 4:
                    s[wi] = w[0]
        return sents
    if variation == "format_change":
        for s in sents:
            for wi, w in enumerate(s):
                if len(w) == 10 and w[4] == "-" and w[7] == "-":
                    y, m, d = w.split("-")
                    s[wi] = f"{d}.{m}.{y}"
        return sents
    if variation == "expansion":
        for s in sents:
            for wi, w in enumerate(s):
                if w in EXPANSIONS:
                    s[wi] = EXPANSIONS[w]
        return sents
    if variation == "rename":
        # rename a *rare* token globally (alternative_naming analog) — a
        # frequent token would rewrite too many shingles to remain a near-dup
        from collections import Counter

        counts = Counter(w for s in sents for w in s)
        rare = sorted(w for w, c in counts.items() if c <= 3 and len(w) > 4)
        if rare:
            target = rare[int(rng.integers(0, len(rare)))]
            for s in sents:
                for wi, w in enumerate(s):
                    if w == target:
                        s[wi] = target + "corp"
        return sents
    if variation == "translation_stub":
        # light lexical substitution (~2% of tokens): hash-space dedup can
        # absorb sparse translations; dense translation is the embedding
        # channel's job (reference E1/E7 — see operators/knn.py)
        for s in sents:
            for wi, w in enumerate(s):
                if w in TRANSLATIONS and rng.random() < 0.04:
                    s[wi] = TRANSLATIONS[w]
        return sents
    if variation == "truncation":
        keep = max(3, int(len(sents) * (1.0 - 0.1 - 0.15 * rng.random())))
        return sents[:keep]
    if variation == "field_drop":
        if len(sents) > 5:
            i = int(rng.integers(1, len(sents) - 2))
            return sents[:i] + sents[i + 1 :]
        return sents
    if variation == "substring_containment":
        # duplicate = new prefix + original + new suffix (B superstring of A)
        extra_rng = rng
        pre = _base_sentences(extra_rng, "en")[:2]
        suf = _base_sentences(extra_rng, "en")[:2]
        return pre + sents + suf
    raise ValueError(variation)


def _render(sents: list[list[str]]) -> str:
    return "\n".join(" ".join(s) + "." for s in sents)


def _make_doc(seed: int, doc_id: int, n_orig: int, size_mult: int = 1) -> dict:
    if doc_id < n_orig:
        orig_id, variation = doc_id, "original"
        lang, sents, title, nav, footer = _orig_content(seed, doc_id, n_orig, size_mult)
    else:
        orig_id = (doc_id * _KNUTH) % n_orig
        variation = VARIATIONS[doc_id % len(VARIATIONS)]
        lang, sents, title, nav, footer = _orig_content(seed, orig_id, n_orig, size_mult)
        rng = np.random.default_rng([seed, doc_id, 1])
        sents = _apply_variation(variation, sents, rng)
        if variation == "boilerplate_change":
            nav = _NAV_VARIANTS[(_NAV_VARIANTS.index(nav) + 1) % len(_NAV_VARIANTS)]
            footer = _FOOTER_VARIANTS[
                (_FOOTER_VARIANTS.index(footer) + 1) % len(_FOOTER_VARIANTS)
            ]
    text = _render(sents)
    html = (
        f"<html><head><title>{_escape(title)}</title></head>"
        f"<body><nav>{nav}</nav><main>{_escape(text)}</main>"
        f"<footer>{footer}</footer></body></html>"
    ).encode("utf-8")
    ts = _dt.datetime(2024, 1, 1) + _dt.timedelta(
        days=int(doc_id % 30), seconds=int((doc_id * 7919) % 86400)
    )
    return {
        "doc_id": doc_id,
        "url": f"https://site{orig_id % 100}.example/p/{doc_id}",
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": lang,
        "cluster_id": orig_id,
        "variation_type": variation,
    }


CORPUS_SCHEMA = (
    "doc_id bigint, url string, warc_ts timestamp, html binary, "
    "text string, lang string, cluster_id bigint, variation_type string"
)


def synthesize_corpus(
    spark: SparkSession,
    n_docs: int = 2000,
    dup_fraction: float = 0.4,
    seed: int = 42,
    partitions: int | None = None,
    size_mult: int = 1,
) -> DataFrame:
    """Distributed deterministic corpus of *n_docs* pages.

    ids [0, n_orig) are originals, the rest labeled duplicates;
    n_orig = round(n_docs * (1 - dup_fraction)).
    """
    n_orig = max(1, round(n_docs * (1.0 - dup_fraction)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_make_doc(seed, int(i), n_orig, size_mult) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    rng_df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=CORPUS_SCHEMA)


def golden_pairs(spark: SparkSession, n_docs: int, dup_fraction: float = 0.4) -> DataFrame:
    """(original_id, duplicate_id, cluster_id, variation_type) — pure SQL
    derivation from the same wiring formulas; no generation needed."""
    n_orig = max(1, round(n_docs * (1.0 - dup_fraction)))
    nvar = len(VARIATIONS)
    var_map = F.array(*[F.lit(v) for v in VARIATIONS])
    return (
        spark.range(n_orig, n_docs)
        .select(
            ((F.col("id") * _KNUTH) % n_orig).alias("original_id"),
            F.col("id").alias("duplicate_id"),
            ((F.col("id") * _KNUTH) % n_orig).alias("cluster_id"),
            var_map[(F.col("id") % nvar).cast("int")].alias("variation_type"),
        )
    )
