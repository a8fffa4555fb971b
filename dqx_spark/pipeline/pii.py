"""PII scrubbing for training corpora — the transform-side complement of
``functions.row_checks.does_not_contain_pii`` (which only FLAGS rows).

Large-scale pipelines redact rather than drop: an email inside an otherwise
good document should not cost the document (the C4/RefinedWeb discipline,
and what Presidio's Anonymizer does after its Analyzer).  ``redact_pii``
is a pure Column expression — one chained ``regexp_replace`` per entity
over a single projected scan, no Python boundary, no shuffle — so it
composes into ``clean_corpus``-style lazy plans at 100 TB.

Scale note: redaction is deliberately regex-conservative (over-redaction is
the safe failure mode for training data).  The detection check's windowed-
Luhn verification and Presidio-NER rung remain detection-only: span-level
NER redaction needs presidio-anonymizer, absent in this environment —
``analyzer_redactor`` raises with an install hint rather than pretending.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dqx_spark.functions.row_checks import _PII_PATTERNS

__all__ = ["redact_pii", "PORTABLE_PII_ENTITIES"]

#: entities whose patterns avoid lookarounds and therefore behave
#: identically under Java regex (Spark) and RE2 (DuckDB/Go) — the
#: cross-engine-reproducible subset (CREDIT_CARD's run regex needs
#: lookarounds to avoid splitting longer digit runs)
PORTABLE_PII_ENTITIES = ("EMAIL_ADDRESS", "IP_ADDRESS", "PHONE_NUMBER", "US_SSN")


def redact_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    entities: list[str] | None = None,
    replacement: str = "[{entity}]",
    count_matches: bool = True,
) -> DataFrame:
    """Replace PII-looking spans with placeholders.

    Returns (id, ``{text_col}_redacted``, ``pii_redaction_count`` and, with
    ``count_matches``, one ``n_{entity}`` column per entity counting the
    matches in the ORIGINAL text).  Entities are applied in sorted order so
    the output is deterministic regardless of dict ordering; counts are
    measured per entity on the original text (an email also containing
    digits is counted once per entity that matches it).

    ``replacement`` may reference ``{entity}`` for typed placeholders
    (``[EMAIL_ADDRESS]``); a literal string redacts everything uniformly.
    """
    chosen = sorted(entities or _PII_PATTERNS)
    unknown = [e for e in chosen if e not in _PII_PATTERNS]
    if unknown:
        raise ValueError(f"unsupported PII entities: {unknown}; supported: {sorted(_PII_PATTERNS)}")
    col: Column = F.col(text_col)
    counts = []
    redacted = col
    for e in chosen:
        pat = _PII_PATTERNS[e]
        if count_matches:
            counts.append(F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).alias(f"n_{e.lower()}"))
        # Java Matcher.replaceAll treats '$' as a group reference and '\'
        # as an escape in the REPLACEMENT string — escape both so e.g.
        # '<$redacted>' substitutes literally instead of failing at task time
        repl = replacement.format(entity=e).replace("\\", "\\\\").replace("$", "\\$")
        redacted = F.regexp_replace(redacted, pat, repl)
    total = None
    if count_matches:
        total = sum((F.size(F.regexp_extract_all(col, F.lit(_PII_PATTERNS[e]), F.lit(0))) for e in chosen), F.lit(0))
    out = [F.col(id_col).alias("id"), redacted.alias(f"{text_col}_redacted")]
    if count_matches:
        out.append(total.alias("pii_redaction_count"))
        out.extend(counts)
    return df.select(*out)
