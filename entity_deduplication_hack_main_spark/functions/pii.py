"""PII detection and redaction — the C4/Dolma-style curation pass.

Web-scale training corpora scrub personally identifiable information
before release (C4's badwords pass precedent; Dolma §2.3 runs exactly
this email/phone/IP regex triple and masks in place — public papers).
This module implements the detect + redact pair as pure JVM regex
expressions with DuckDB twins: zero Python on the hot path, and every
pattern is written in the RE2 ∩ java.util.regex common dialect (no
lookaround, no backrefs) so the oracle replays it bit-identically.

Patterns (deliberately conservative — curation favors precision so the
redaction does not destroy e.g. version strings):

- EMAIL: RFC-ish local@domain.tld, tld ≥ 2 alpha.
- IPV4: four 1-3 digit octets, word-bounded.
- PHONE: NANP-ish ``(415) 555-0123`` / ``415-555-0123`` / ``+1 415 555
  0123`` — 3-3-4 with (), space, dot or dash separators and an optional
  1-2 digit country prefix.

Redaction order matters and is fixed: EMAIL first (its local part may
contain digits a later pattern could bite), then IPV4 (dotted digits
that a naive phone pattern could partially match), then PHONE. The
placeholders contain no digits or ``@``, so passes cannot re-match each
other's output — replaces compose idempotently.

Scale: one ``regexp_extract_all``/``regexp_replace`` chain per row
inside whole-stage codegen; embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order is the redaction order (see module docstring).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d{0,2}[ .\-]?\(?\d{3}\)?[ .\-]\d{3}[ .\-]\d{4}\b",
}

PII_PLACEHOLDERS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def pii_count_cols(text: Column) -> dict[str, Column]:
    """{'n_email', 'n_ipv4', 'n_phone'}: match counts per category.

    Counts are taken in redaction order on the PROGRESSIVELY redacted
    text (email counted on raw, ipv4 on email-redacted, phone on
    email+ipv4-redacted) so overlapping byte ranges are attributed to
    exactly one category — the counts always equal what :func:`redact`
    replaces."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat in PII_PATTERNS.items():
        out[f"n_{name}"] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, PII_PLACEHOLDERS[name])
    return out


def redact(text: Column) -> Column:
    """Text with every PII match replaced by its category placeholder."""
    cur = text
    for name, pat in PII_PATTERNS.items():
        cur = F.regexp_replace(cur, pat, PII_PLACEHOLDERS[name])
    return cur


def _sql_escape(pat: str) -> str:
    # DuckDB standard string literals pass backslashes through verbatim —
    # only quotes need doubling (repo-wide oracle convention).
    return pat.replace("'", "''")


def sql_pii_count_exprs(text_expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`pii_count_cols` (same progressive
    redaction order)."""
    out: dict[str, str] = {}
    cur = text_expr
    for name, pat in PII_PATTERNS.items():
        p = _sql_escape(pat)
        out[f"n_{name}"] = (
            f"len(regexp_extract_all({cur}, '{p}'))::BIGINT"
        )
        cur = (
            f"regexp_replace({cur}, '{p}', "
            f"'{PII_PLACEHOLDERS[name]}', 'g')"
        )
    return out


def sql_redact_expr(text_expr: str) -> str:
    """DuckDB twin of :func:`redact`."""
    cur = text_expr
    for name, pat in PII_PATTERNS.items():
        p = _sql_escape(pat)
        cur = (
            f"regexp_replace({cur}, '{p}', "
            f"'{PII_PLACEHOLDERS[name]}', 'g')"
        )
    return cur
