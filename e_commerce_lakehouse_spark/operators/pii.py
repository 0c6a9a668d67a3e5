"""PII detection and redaction — the scrubbing gate every
training-data pipeline runs before text leaves the curation layer
(engine extension; no reference analog — the reference never handles
free-text PII).

Four detector classes, all as pure Column regexps (JVM-side, codegen,
no UDFs), deliberately restricted to syntax that behaves identically
in java.util.regex (Spark) and RE2 (DuckDB oracle): character
classes, bounded repetition, non-capturing groups, word boundaries —
no backreferences or lookaround, which RE2 lacks:

  - email:  local@domain.tld
  - ipv4:   dotted quad (syntactic — no octet range check, matching
            the scrubbing convention of erring toward redaction)
  - phone:  NNN[-. ]NNN[-. ]NNNN (North-American shape)
  - ssn:    NNN-NN-NNNN

plus an "international" preset (PII_PRESETS) layering E.164 phone
numbers (+CC…, 7-15 digits) and IBAN-shaped account numbers on the
default classes — every surface takes ``patterns=`` so a deployment
picks (or extends) its preset without touching the operators.

Surfaces:
  - `detect_pii`: per-row match counts per class + `has_pii` flag.
  - `redact_pii`: per-row text with each match replaced by a typed
    token (`<EMAIL>`, `<IP>`, `<PHONE>`, `<SSN>`), email first so a
    dotted-quad inside an email local part cannot be double-redacted.
  - `pii_report`: corpus-level one-pass aggregate — per class: docs
    scanned, docs containing it, total matches, and the total
    redacted-text length (which pins the regexp_replace semantics,
    not just the match counts).

Scale: detection and redaction are stateless row maps (no shuffle at
any scale); the report is one scan with partial aggregation — the
same envelope as operators/text.py doc_profile.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .parallelize import spread_for_cpu

# class -> (pattern, redaction token); insertion order IS the
# redaction order (email first: its local/domain parts can contain
# dotted or dashed digit runs the later classes would re-match)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b(?:\d{1,3}\.)(?:\d{1,3}\.)(?:\d{1,3}\.)\d{1,3}\b", "<IP>"),
}

# Preset dicts (same java.regex ∩ RE2 discipline — no lookaround, no
# backreferences). "default" keeps the original North-America classes;
# "international" adds E.164 phone numbers (+CC then 7-15 digits; no
# leading \b — '+' is a non-word char, the trailing \b stops partial
# digit runs) and IBAN-shaped account numbers (ISO 13616 envelope:
# 2-letter country, 2 check digits, 11-30 alphanumeric BBAN). The
# iban class sits before the digit classes so a digits-heavy BBAN is
# consumed whole; e164 sits after phone so the NA separator shape
# keeps its own token.
PII_PRESETS: dict[str, dict[str, tuple[str, str]]] = {
    "default": PII_PATTERNS,
    "international": {
        "email": PII_PATTERNS["email"],
        "iban": (r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b", "<IBAN>"),
        "ssn": PII_PATTERNS["ssn"],
        "phone": PII_PATTERNS["phone"],
        "e164": (r"\+\d{7,15}\b", "<PHONE>"),
        "ipv4": PII_PATTERNS["ipv4"],
    },
}


def _matches(text: Column, kind: str, patterns: dict) -> Column:
    """Array of non-overlapping leftmost matches for one PII class."""
    pattern, _ = patterns[kind]
    return F.regexp_extract_all(text, F.lit(pattern), F.lit(0))


def detect_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Add per-class match-count columns (``n_email`` ...) and a
    ``has_pii`` flag. NULL text counts as clean (0 matches).
    ``patterns`` takes a PII_PRESETS entry (default: the
    North-America classes)."""
    patterns = PII_PATTERNS if patterns is None else patterns
    text = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    for kind in patterns:
        out = out.withColumn(f"n_{kind}", F.size(_matches(text, kind, patterns)))
    total = sum((F.col(f"n_{kind}") for kind in patterns), F.lit(0))
    return out.withColumn("has_pii", total > 0)


def redact_column(
    text: Column, patterns: dict[str, tuple[str, str]] | None = None
) -> Column:
    """The redacted form of a text Column: every PII match replaced by
    its typed token, classes applied in preset order."""
    patterns = PII_PATTERNS if patterns is None else patterns
    out = text
    for pattern, token in patterns.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Add ``out_col`` with all PII classes redacted; NULL text stays
    NULL (redaction must not materialize rows)."""
    return df.withColumn(out_col, redact_column(F.col(text_col), patterns))


def pii_report(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """One-pass corpus report: one row per PII class with
    (pii_type, n_docs, n_docs_with, n_matches, redacted_len).
    ``redacted_len`` sums length(regexp_replace(text, pat, token))
    over the corpus — a value-level pin on the replace semantics, not
    just the counter. NULL text counts as clean length-0."""
    patterns = PII_PATTERNS if patterns is None else patterns
    # the per-class regex battery is the heavy map of this operator
    # and runs before the (global) aggregate — keep an under-parallel
    # scan from serializing it on one core (no-op at scale)
    df = spread_for_cpu(df)
    text = F.coalesce(F.col(text_col), F.lit(""))
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for kind, (pattern, token) in patterns.items():
        n = F.size(_matches(text, kind, patterns))
        aggs.append(F.sum(F.when(n > 0, 1).otherwise(0)).alias(f"__with_{kind}"))
        aggs.append(F.sum(n).alias(f"__n_{kind}"))
        aggs.append(
            F.sum(F.length(F.regexp_replace(text, pattern, token))).alias(
                f"__len_{kind}"
            )
        )
    row = df.agg(*aggs)
    pairs = [
        F.struct(
            F.lit(kind).alias("pii_type"),
            F.col("n_docs").alias("n_docs"),
            F.col(f"__with_{kind}").alias("n_docs_with"),
            F.col(f"__n_{kind}").alias("n_matches"),
            F.col(f"__len_{kind}").alias("redacted_len"),
        )
        for kind in patterns
    ]
    return row.select(F.explode(F.array(*pairs)).alias("r")).select(
        "r.pii_type", "r.n_docs", "r.n_docs_with", "r.n_matches", "r.redacted_len"
    )
