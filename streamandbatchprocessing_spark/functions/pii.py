"""PII detection / redaction expression builders (training-data scrub).

A standard pre-training corpus pass: find personally-identifiable
spans (emails, phone numbers, IPv4 addresses, bare numeric ids) and
replace them with typed placeholder tokens before the text reaches a
tokenizer. Everything here composes JVM built-ins
(``regexp_extract_all`` / ``regexp_replace``), so the scrub runs inside
whole-stage codegen — no Python on the row path — and the same patterns
run verbatim in the DuckDB oracles (kept to the regex subset Java and
RE2 share: character classes, bounded quantifiers, no lookaround).

Pattern order matters and is part of the contract: emails are redacted
before phones/ids so an address's digit runs can't be double-counted,
and IPv4 before bare numbers for the same reason. ``scrub`` applies the
patterns in ``PII_PATTERNS`` order.

The driver fixtures contain only the numeric-id class (events ``props``
JSON); the email/phone/IPv4 paths are pinned by unit tests on synthetic
rows (tests/test_pii.py) — same approach as the multimodal codec stub:
the Spark-side machinery is real and tested even where the fixture
can't exercise it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, regex, placeholder) in application order. The regexes are
#: deliberately conservative (boundary-anchored, bounded quantifiers):
#: a scrub pass at 100 TB must never catastrophically backtrack, and
#: both Java's engine and RE2 run these in linear time.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("number", r"\b[0-9]{2,}\b", "<NUM>"),
)


def pii_count(col: Column, name: str) -> Column:
    """Match count for one pattern class (bigint).

    DuckDB equivalent: ``len(regexp_extract_all(x, '<pattern>'))``.
    Counts are taken on the text with every EARLIER pattern class
    already masked, mirroring ``scrub``'s order so a span is attributed
    to exactly one class.
    """
    masked = col
    for pname, pattern, placeholder in PII_PATTERNS:
        if pname == name:
            # group 0 = whole match (the patterns are group-free)
            return F.size(
                F.regexp_extract_all(masked, F.lit(pattern), 0)
            ).cast("long")
        masked = F.regexp_replace(masked, pattern, placeholder)
    raise KeyError(f"unknown PII pattern {name!r}")


def scrub(col: Column) -> Column:
    """Redact every pattern class in order, returning the scrubbed text.

    DuckDB equivalent: nested ``regexp_replace(..., 'g')`` in the same
    order (Spark's regexp_replace is global by default).
    """
    out = col
    for _, pattern, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def oracle_pii_count(expr: str, name: str) -> str:
    """DuckDB SQL mirroring ``pii_count`` (same masking order)."""
    masked = expr
    for pname, pattern, placeholder in PII_PATTERNS:
        if pname == name:
            return (
                f"CAST(len(regexp_extract_all({masked}, '{pattern}')) AS BIGINT)"
            )
        masked = f"regexp_replace({masked}, '{pattern}', '{placeholder}', 'g')"
    raise KeyError(f"unknown PII pattern {name!r}")


def oracle_scrub(expr: str) -> str:
    """DuckDB SQL mirroring ``scrub``."""
    out = expr
    for _, pattern, placeholder in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pattern}', '{placeholder}', 'g')"
    return out
