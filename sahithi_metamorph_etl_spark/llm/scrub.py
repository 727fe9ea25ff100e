"""PII scrubbing: regex redaction of emails / phone numbers / IPv4
addresses in a text column — the standard compliance pass before a
corpus leaves the cleaning pipeline.

Pure ``regexp_replace`` chain: JVM codegen, zero shuffle, no UDFs.
Patterns stay in the dialect subset shared by Java regex and RE2
(DuckDB) so the operator is oracle-checkable; custom patterns passed by
callers should respect the same subset if they want cross-engine
reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: emails first (an email contains digit runs a phone pattern
# could half-eat), then bare IPv4s BEFORE phones (a loose phone pattern
# would otherwise consume dotted quads and the ipv4 rule would be dead
# code), then phones.
#
# The phone pattern is deliberately shape-anchored rather than "any long
# digit run" — two alternatives, both valid Java regex AND RE2 (DuckDB),
# so no lookaround:
#   1. international: '+' then 6-15 DIGITS (bounded by digit count, not
#      interior chars: each repeated unit is one digit plus at most
#      three space/()- separators, so '+1-----2' with only 2 digits
#      cannot match, while '+1 (555) 123-4567', '+1 - 555 123 4567'
#      (3-char separator run) and the E.164 worst case
#      '+44 (0) 20 7946 0958' all redact whole — '+' is a strong phone
#      signal; dates/IPs never carry it);
#   2. NANP-shaped: (ddd) ddd dddd / ddd-ddd-dddd / ddddddddd(d), with \b
#      guards so it cannot fire inside longer digit runs.
# ISO dates (2024-01-15 = 4-2-2), timestamps, thousands groups
# ('10 000 000' = 2-3-3) and dotted quads match neither alternative.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+(?:\d[ ()-]{0,3}){5,14}\d|(?:\(\d{3}\)|\b\d{3})[ -]?\d{3}[ -]?\d{4}\b",
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    patterns: dict[str, str] | None = None,
    replacement: str = "[{kind}]",
) -> DataFrame:
    """Replace every PII match with ``replacement`` (``{kind}`` expands
    to the pattern name, e.g. ``[email]``). Adds ``n_redactions``
    counting total matches removed. ``out_col`` defaults to replacing
    ``text_col`` in place."""
    patterns = PII_PATTERNS if patterns is None else patterns
    out_col = out_col or text_col
    scrubbed: Column = F.coalesce(F.col(text_col), F.lit(""))
    n_red: Column = F.lit(0).cast("bigint")
    for kind, pat in patterns.items():
        n_red = n_red + F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
        scrubbed = F.regexp_replace(scrubbed, pat, replacement.format(kind=kind))
    return df.withColumn("n_redactions", n_red).withColumn(out_col, scrubbed)


def o_scrub_pii(
    text_expr: str,
    patterns: dict[str, str] | None = None,
    replacement: str = "[{kind}]",
) -> tuple[str, str]:
    """DuckDB twins: (scrubbed_sql, n_redactions_sql) mirroring
    :func:`scrub_pii`'s chained application order exactly."""
    patterns = PII_PATTERNS if patterns is None else patterns
    scrubbed = f"coalesce({text_expr}, '')"
    n_parts = []
    for kind, pat in patterns.items():
        esc = pat.replace("'", "''")
        n_parts.append(f"len(regexp_extract_all({scrubbed}, '{esc}'))")
        repl = replacement.format(kind=kind)
        scrubbed = f"regexp_replace({scrubbed}, '{esc}', '{repl}', 'g')"
    return scrubbed, " + ".join(n_parts)
