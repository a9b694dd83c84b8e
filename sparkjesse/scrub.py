"""PII detection and redaction for training-data pipelines.

The standard scrub stage before a corpus is shipped to training:
find personally-identifying strings (emails, phone numbers, IP
addresses, national-id-shaped digit groups) and replace them with
typed placeholders, keeping an auditable count per document.

Everything is a chain of ``regexp_count`` / ``regexp_replace``
expressions — zero shuffle, zero Python, whole-stage codegen; at
10^12 docs the stage runs at scan speed and parallelizes with
partitions. Patterns deliberately use only the regex subset with
identical semantics in Java (Spark), RE2 (DuckDB — the oracle), and
PCRE: character classes, bounded quantifiers, ``\\b``, ``\\d`` (ASCII
in all three) — no lookaround, no backreferences.

Detection and redaction share one SEQUENTIAL contract: pattern ``i``
is counted and replaced on the text already redacted by patterns
``0..i-1``. That makes overlap handling deterministic (an IPv4 inside
an email's domain is part of the [EMAIL] span, not double-counted)
and guarantees ``pii_signals`` counts equal ``redact_pii`` replacement
counts by construction.

Reference scope note: jesse (the validation reference) has no scrub
stage; this module is part of the north-star training-pipeline
surface alongside dedup/similarity/quality (SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — ordered: earlier patterns win overlaps.
# Email before IPv4 so a numeric mail domain is one [EMAIL] span; the
# SSN-shaped 3-2-4 digit group before the phone's 3-3-4 so the two
# dash-grouped shapes never compete for the same span.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[ID]"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def _sequential(text: Column) -> tuple[dict[str, Column], Column]:
    """Shared fold: per-pattern counts on the progressively-redacted
    text, plus the final redacted column."""
    counts: dict[str, Column] = {}
    cur = text
    for name, pattern, placeholder in PII_PATTERNS:
        counts[name] = F.regexp_count(cur, F.lit(pattern))
        cur = F.regexp_replace(cur, pattern, placeholder)
    return counts, cur


def pii_signals(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII detection: ``(id, n_email, n_ssn, n_phone, n_ipv4,
    n_pii, has_pii)``. Counts follow the sequential contract above, so
    they sum to exactly what ``redact_pii`` would replace."""
    counts, _ = _sequential(F.col(text_col))
    total = None
    for name in counts:
        total = counts[name] if total is None else total + counts[name]
    return df.select(
        F.col(id_col),
        *[counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"))


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-doc redaction: ``(id, redacted, n_redacted)`` with every
    matched span replaced by its typed placeholder."""
    counts, redacted = _sequential(F.col(text_col))
    total = None
    for name in counts:
        total = counts[name] if total is None else total + counts[name]
    return df.select(F.col(id_col), redacted.alias("redacted"),
                     total.alias("n_redacted"))


def redact_cols(text: Column) -> tuple[Column, Column]:
    """Column-level redaction: ``(redacted, n_redacted)`` expression
    pair over any text column — for pipelines that want to scrub IN
    PLACE with ``withColumn`` instead of joining ``redact_pii``'s
    output back to the corpus (a corpus-wide shuffle that a pure
    per-row expression never needs; an inner join on the id also
    drops null-id rows and multiplies duplicate ids — round-3 ADVICE
    on ``tools/pipeline_job.py``). Same sequential contract as
    ``redact_pii``."""
    counts, redacted = _sequential(text)
    total = None
    for name in counts:
        total = counts[name] if total is None else total + counts[name]
    return redacted, total
