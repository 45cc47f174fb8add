"""PII scrubbing — a standard training-data-pipeline operator (not in
the reference; part of the engine's LLM-pipeline extension, like dedup
and decontamination).

Pure JVM: per-type ``regexp_count`` on the original text + a sequential
``regexp_replace`` chain, all inside whole-stage codegen — no Python in
the hot path, so the scrubber runs at scan speed at 100 TB.

Patterns are deliberately restricted to syntax with IDENTICAL semantics
in Java regex (Spark) and RE2 (DuckDB — the correctness oracle): ASCII
classes, bounded quantifiers, non-capturing groups, ``\\b`` word
boundaries.  No backreferences, no lookaround (RE2 has neither).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) — counts are taken per-type on the
#: ORIGINAL text (order-independent); replacement is applied in list
#: order (the same order the oracle applies it)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+\d{1,3}[- ]\d{3}[- ]\d{4}\b", "[PHONE]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[ID]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
]


def scrub_pii(df: DataFrame, col: str = "text") -> DataFrame:
    """Adds ``n_<type>`` counts (on the original text) and replaces
    ``col`` with the redacted text.  One projection; Catalyst keeps all
    of it in codegen."""
    out = df
    for name, pattern, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(col), F.lit(pattern)).cast("long")
        )
    redacted = F.col(col)
    for _, pattern, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pattern, repl)
    return out.withColumn(col, redacted)
