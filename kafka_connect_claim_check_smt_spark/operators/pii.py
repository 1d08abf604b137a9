"""PII redaction for training corpora: emails, IPv4 addresses, phone-like
numbers replaced by typed placeholder tokens, with per-kind match counts.

Pure Catalyst (`regexp_replace` / `regexp_count`) — scan-speed, no UDF, no
shuffle. The patterns are written in the REGEX SUBSET WHERE JAVA (Spark) AND
RE2 (DuckDB) AGREE: no lookaround, no backreferences, no shorthand classes
whose definitions differ (`\\s`/`\\w` are Unicode-aware in Java but ASCII in
RE2 — spelled as explicit character classes instead; the repo's tokenizer
learned the same lesson). That keeps the full redacted text
hash-oracle-checkable in DuckDB.

Deliberately pattern-based and conservative: names/addresses need an NER
model (not available here and genuinely fuzzy); emails/IPs/phones are the
mechanical 90% every corpus pipeline scrubs first.

Order matters and is fixed: emails first (their local part may contain
digits a phone pattern would chew), then IPs (dotted digits a phone pattern
would also match), then phones over the remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java/RE2-portable patterns (no lookaround, explicit classes)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
IPV4_RE = (
    "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    "(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"
)
PHONE_RE = "\\+[0-9][0-9()\\- ]{7,14}[0-9]"

_KINDS: list[tuple[str, str, str]] = [
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ips", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
]


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id_col, text_col redacted, n_emails, n_ips, n_phones)`` — counts
    are matches actually replaced, measured stage by stage so an email's
    digits are never double-counted as a phone."""
    out = docs.select(id_col, text_col)
    counts = []
    for name, pat, token in _KINDS:
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
        out = out.withColumn(text_col, F.regexp_replace(text_col, pat, token))
        counts.append(f"n_{name}")
    return out.select(id_col, text_col, *[F.col(c).cast("long").alias(c) for c in counts])


def redact_pii_sql(
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`redact_pii` — same staged order, same patterns."""
    t = text_col
    cols = [id_col]
    stages = []
    prev = t
    for name, pat, token in _KINDS:
        stages.append(
            f"CAST(len(regexp_extract_all({prev}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        prev = f"regexp_replace({prev}, '{pat}', '{token}', 'g')"
    return f"""
SELECT {id_col}, {prev} AS {t}, {', '.join(stages)}
FROM {docs_table}
"""
