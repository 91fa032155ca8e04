"""PII scrubbing: the redaction pass every training corpus runs.

Emails, IPv4 addresses, and long ID-number runs are replaced by typed
placeholder tokens before text reaches a training mix. Everything is
built-in `regexp_replace` / `regexp_count` — JVM whole-stage codegen,
zero Python, embarrassingly parallel (no shuffle until the caller
aggregates).

Cross-engine contract: the patterns deliberately use only the regex
subset where Java regex (Spark) and RE2 (DuckDB) agree — character
classes, bounded counts, alternation-free groups; no lookaround, no
backrefs. The oracle runs the SAME patterns through DuckDB, so the
driver row is a real regex-equivalence check between the two engines,
not a fixture pin.

No external data (build brief): the synthetic corpus contains no PII,
so the query leg first INJECTS deterministic, SQL-computable PII
(email/IP/ID derived from doc_id, spliced mid-text at n_chars/2) and
the oracle reproduces injection + redaction independently. A zero-PII
corpus would make the check vacuous; this makes every row exercise
every pattern.

Scale (100 TB): pure projection — the only plan nodes are scan +
codegen'd Project (asserted in tests); filters/columns still push down
through it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table, spread_scan

# Java-regex / RE2 common-subset patterns (see module doc)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "(\\d{1,3}\\.){3}\\d{1,3}"
IDNUM_RE = "\\d{9,}"

# replacement order matters: emails first (their local part may hold
# digit runs), then dotted IPs, then bare long digit runs.
_PASSES = (
    (EMAIL_RE, "<EMAIL>", "n_emails"),
    (IPV4_RE, "<IP>", "n_ips"),
    (IDNUM_RE, "<IDNUM>", "n_idnums"),
)


def redact_pii(text: Column) -> Column:
    """Text with all three PII classes replaced by typed tokens."""
    out = text
    for pattern, token, _ in _PASSES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict:
    """{count_col: Column} of per-class match counts (pre-redaction)."""
    counts = {}
    remaining = text
    for pattern, token, name in _PASSES:
        counts[name] = F.regexp_count(remaining, F.lit(pattern))
        remaining = F.regexp_replace(remaining, pattern, token)
    return counts


@register(
    "pii_redact",
    priority=15,  # new this round: into the checked window
    sql=f"""
    WITH injected AS (
        SELECT doc_id,
               substr(text, 1, n_chars // 2)
               || ' reach user' || CAST(doc_id AS VARCHAR)
               || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com from '
               || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
               || CAST((doc_id * 13) % 256 AS VARCHAR) || '.'
               || CAST((doc_id * 29) % 256 AS VARCHAR) || '.'
               || CAST(doc_id % 200 + 1 AS VARCHAR)
               || ' ref ' || CAST(100000000 + doc_id * 937 AS VARCHAR) || ' '
               || substr(text, n_chars // 2 + 1) AS pii_text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(pii_text,
               '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IPV4_RE}', '<IP>', 'g'),
               '{IDNUM_RE}', '<IDNUM>', 'g') AS clean_text,
           len(regexp_extract_all(pii_text, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(regexp_replace(pii_text,
               '{EMAIL_RE}', '<EMAIL>', 'g'), '{IPV4_RE}')) AS n_ips,
           len(regexp_extract_all(regexp_replace(regexp_replace(pii_text,
               '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IPV4_RE}', '<IP>', 'g'), '{IDNUM_RE}')) AS n_idnums
    FROM injected
    ORDER BY doc_id
    """,
    doc=(
        "training-data op: PII redaction — emails, IPv4, long ID runs "
        "replaced by typed tokens via codegen regexp_replace (no Python, "
        "no shuffle). Deterministic SQL-computable PII is injected first "
        "so every row exercises every pattern; the oracle re-runs the "
        "same patterns in RE2, making the row a Java-regex-vs-RE2 "
        "equivalence check."
    ),
)
def pii_redact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r6: spread the single-row-group scan so the three codegen regex
    # passes parallelize (measured 10.0 s near-serial at sf1.0); a no-op
    # on a many-split production table (sources/tables.spread_scan)
    docs = spread_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars"
        )
    )
    d = F.col("doc_id")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.expr("substr(text, 1, n_chars DIV 2)"),
            F.lit(" reach user"), d.cast("string"),
            F.lit("@mail"), (d % 7).cast("string"), F.lit(".example.com from "),
            ((d * 7) % 256).cast("string"), F.lit("."),
            ((d * 13) % 256).cast("string"), F.lit("."),
            ((d * 29) % 256).cast("string"), F.lit("."),
            (d % 200 + 1).cast("string"),
            F.lit(" ref "), (d * 937 + 100000000).cast("string"), F.lit(" "),
            F.expr("substr(text, n_chars DIV 2 + 1)"),
        ).alias("pii_text"),
    )
    counts = pii_counts(F.col("pii_text"))
    return injected.select(
        "doc_id",
        redact_pii(F.col("pii_text")).alias("clean_text"),
        counts["n_emails"].cast("long").alias("n_emails"),
        counts["n_ips"].cast("long").alias("n_ips"),
        counts["n_idnums"].cast("long").alias("n_idnums"),
    ).orderBy("doc_id")
