"""PII scrubbing — regex redaction of emails / phone numbers / IPv4.

A training-data pipeline's redaction pass is a pure map: match counts
and replacement run entirely in JVM regexp built-ins (regexp_count /
regexp_replace), so at 100 TB the scrub costs one scan with no
shuffle and no Python. Patterns are kept to the RE2-compatible subset
(no backreferences, no lookaround) so the DuckDB oracle replays them
verbatim.

The fixture corpus contains no PII by construction — the judged query
(plans/queries_text.py pii_redaction_stats) appends a deterministic
synthetic contact string per document before scrubbing so the
redaction path is value-checked end-to-end rather than trivially
zero.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"(\+1[-. ])?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"

REDACTIONS = [
    (EMAIL_RE, "[EMAIL]"),
    (IPV4_RE, "[IP]"),  # before PHONE: dotted digit runs must not half-match
    (PHONE_RE, "[PHONE]"),
]


def pii_count(text: Column, pattern: str) -> Column:
    return F.regexp_count(text, F.lit(pattern))


def pii_scrub(text: Column) -> Column:
    """All PII spans replaced by type tokens, in a fixed order so the
    result is deterministic regardless of pattern overlap."""
    out = text
    for pattern, token in REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out
