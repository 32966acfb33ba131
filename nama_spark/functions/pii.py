"""PII detection and redaction column functions — the standard scrubbing
pass a web-corpus pipeline runs before training-data release (emails, IPs,
phone numbers, US-SSN-shaped ids), as in C4/Dolma/FineWeb corpus builds.

Pure Column expressions over ``regexp_replace`` / ``regexp_extract_all`` —
JVM-side, no Python in the hot path. Every pattern is written in the
common Java-regex ∩ RE2 dialect (no lookaround, no backreferences, ASCII
classes only) so the identical pattern string drives the DuckDB oracle.

The redaction chain applies kinds in a FIXED order (email → ssn → phone →
ipv4); order matters where patterns could overlap, and the oracle applies
the same order, so parity is by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java-regex ∩ RE2 compatible patterns, applied in PII_KINDS order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

PII_KINDS = tuple(PII_PATTERNS)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_count(c: Column | str, kind: str) -> Column:
    """Number of ``kind`` matches in the column (long). Counted BEFORE any
    redaction — chain-order overlaps (an SSN inside an already-redacted
    email) are a redaction concern, not a counting one."""
    if kind not in PII_PATTERNS:
        raise ValueError(f"unknown PII kind {kind!r}; one of {PII_KINDS}")
    return F.size(F.regexp_extract_all(_col(c), F.lit(PII_PATTERNS[kind]), 0)).cast(
        "long"
    )


def redact_pii(
    c: Column | str,
    kinds: tuple[str, ...] = PII_KINDS,
    token_fmt: str = "<{kind}>",
) -> Column:
    """The column with every match of each requested kind replaced by a
    typed placeholder (``<EMAIL>`` …). Kinds apply in canonical PII_KINDS
    order regardless of the order given, so composition is deterministic."""
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; one of {PII_KINDS}")
    out = _col(c)
    for kind in PII_KINDS:
        if kind in kinds:
            out = F.regexp_replace(
                out, PII_PATTERNS[kind], token_fmt.format(kind=kind.upper())
            )
    return out
