"""Text-analysis column expressions (JVM-side, whole-stage-codegen).

Training-data-pipeline scalar functions over a text column: token
counting, quality counters, language-ID heuristic, fingerprinting.  All
built-in ``pyspark.sql.functions`` — no Python in these paths — mirroring
the reference's scalar function set (SURVEY.md §2.7) where applicable
(F2 hex, F3 algorithm inference) and extending it for corpus curation.

Counters are returned as INTEGERS (not ratios) so the DuckDB oracle can
reproduce them exactly without float-rounding hazards; ratio assembly is
a trivial client-side division.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: language marker tokens for the lang-ID heuristic (frozen; the DuckDB
#: oracle SQL in __spark_entry__ must use the same sets).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "des", "une"],
    "es": ["el", "los", "las", "que", "una", "por"],
    "en": ["the", "a", "of", "and", "to", "is"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def n_tokens(col: Column) -> Column:
    """Whitespace token count; empty/blank string counts 0."""
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


#: BPE-ish pre-tokenizer: word pieces OR single non-space-non-word chars —
#: the GPT-2-style pretokenization shape, minus byte-level merges (counts
#: approximate subword token volume for corpus budgeting)
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def n_tokens_bpe(col: Column) -> Column:
    """Approximate subword token count via the BPE-ish pre-tokenizer."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def n_punct(col: Column) -> Column:
    """Count of ASCII punctuation characters."""
    return F.regexp_count(col, F.lit(r"[!-/:-@\[-`{-~]"))


def n_digits(col: Column) -> Column:
    return F.regexp_count(col, F.lit(r"[0-9]"))


def n_stopwords(col: Column) -> Column:
    """Count of stopword tokens (word-boundary matched, case-sensitive)."""
    alt = "|".join(STOPWORDS)
    return F.regexp_count(col, F.lit(rf"\b({alt})\b"))


def total_token_chars(col: Column) -> Column:
    """Sum of token lengths == chars excluding whitespace."""
    return F.length(F.regexp_replace(col, r"\s+", ""))


def marker_count(col: Column, lang: str) -> Column:
    alt = "|".join(LANG_MARKERS[lang])
    return F.regexp_count(col, F.lit(rf"\b({alt})\b"))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: CJK/Cyrillic/Arabic by script, Latin
    languages by marker-token counts with a fixed tie-break order
    (de > fr > es, else en)."""
    cjk = F.regexp_count(col, F.lit(r"[一-鿿]"))
    cyr = F.regexp_count(col, F.lit(r"[Ѐ-ӿ]"))
    ara = F.regexp_count(col, F.lit(r"[؀-ۿ]"))
    de, fr, es = (marker_count(col, lang) for lang in ("de", "fr", "es"))
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(cyr > 0, F.lit("ru"))
        .when(ara > 0, F.lit("ar"))
        .when((de > fr) & (de > es), F.lit("de"))
        .when(fr > es, F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("en"))
    )


def fingerprint_md5(col: Column) -> Column:
    """Canonical-text fingerprint: md5 of lowercased, whitespace-collapsed
    text (quichash F1/P1 analog at the document level)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def algorithm_from_hash_length(col: Column) -> Column:
    """Reference F3: infer algorithm from hex digest length
    (/root/reference/src/database.rs:404-414)."""
    return (
        F.when(F.length(col) == 32, F.lit("md5"))
        .when(F.length(col) == 40, F.lit("sha1"))
        .when(F.length(col) == 56, F.lit("sha224"))
        .when(F.length(col) == 64, F.lit("sha256"))
        .when(F.length(col) == 96, F.lit("sha384"))
        .when(F.length(col) == 128, F.lit("sha512"))
        .otherwise(F.lit("unknown"))
    )
