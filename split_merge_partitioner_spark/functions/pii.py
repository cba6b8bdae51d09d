"""PII detection and redaction over the documents table.

The standard pre-training safety pass (C4 and most production corpora run
a variant): count and strip email addresses, phone-like numbers, and IPv4
literals before anything else sees the text.  Pure JVM ``regexp_extract_all``
/ ``regexp_replace`` — whole-stage codegen, zero UDFs, zero shuffles for
the per-doc pass and ONE map-side-combined exchange for the corpus
rollup, so the operator is scan-bound at any scale.

Pattern notes: each regex is written in the common subset of Java regex
(Spark) and RE2 (DuckDB) — explicit character classes, bounded
repetition, word-boundary anchors — so the oracle replays the exact same
match set.  Patterns are deliberately conservative (precision over
recall): a corpus-scale PII pass prefers leaving an ambiguous token
unredacted to mangling prose, and the counts feed a *rate* monitor, not a
compliance guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared Spark/DuckDB-portable patterns (no \d, no lookaround, no backrefs)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()./ -]{6,}[0-9]"

_KINDS = [("email", EMAIL_RE), ("ipv4", IPV4_RE), ("phone", PHONE_RE)]


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, has_pii) — non-overlapping
    leftmost match counts per kind.  IPv4 is counted before phone would
    be (the patterns can both fire on dotted digit runs), but counts are
    independent per kind: a string may legitimately count under two
    kinds, exactly as both engines' extract-all semantics report it."""
    cnt = {
        kind: F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        for kind, pat in _KINDS
    }
    return docs.select(
        "doc_id",
        cnt["email"].alias("n_emails"),
        cnt["ipv4"].alias("n_ipv4"),
        cnt["phone"].alias("n_phones"),
        (cnt["email"] + cnt["ipv4"] + cnt["phone"] > 0).alias("has_pii"),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Input columns plus ``redacted`` — text with each PII kind replaced
    by its typed placeholder.  Redaction order email -> ipv4 -> phone:
    emails are redacted before the phone pass can eat digit runs inside
    them, and ipv4 before phone so dotted quads get the more specific
    tag."""
    red = F.col(text_col)
    for kind, pat in _KINDS:
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    return docs.withColumn("redacted", red)


def pii_rates(docs: DataFrame, by: str = "source", text_col: str = "text") -> DataFrame:
    """Corpus-level PII rate monitor: per ``by`` group, document count,
    docs with any PII, and total matches per kind.  One partial-agg
    exchange over the group key."""
    cnt = {
        kind: F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        for kind, pat in _KINDS
    }
    s = docs.select(
        by,
        cnt["email"].alias("n_emails"),
        cnt["ipv4"].alias("n_ipv4"),
        cnt["phone"].alias("n_phones"),
        (cnt["email"] + cnt["ipv4"] + cnt["phone"] > 0).alias("has_pii"),
    )
    return (
        s.groupBy(by)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("has_pii").cast("long")).cast("long").alias("n_docs_with_pii"),
            F.sum("n_emails").cast("long").alias("total_emails"),
            F.sum("n_ipv4").cast("long").alias("total_ipv4"),
            F.sum("n_phones").cast("long").alias("total_phones"),
        )
    )
